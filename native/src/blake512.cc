// BLAKE-512 (the original SHA-3-finalist BLAKE, not BLAKE2).
//
// Twin of infimum_tpu/utils/blake512.py (golden-tested against it):
// circomlib/maci derive EdDSA signing scalars and nonces with BLAKE-512,
// two digests per signature — the second-largest Python cost in the
// message-publication hot loop after curve mults.
#include "blake512.h"

#include <cstring>

namespace inf {
namespace {

using u64 = uint64_t;

const u64 kC[16] = {
    0x243F6A8885A308D3ULL, 0x13198A2E03707344ULL, 0xA4093822299F31D0ULL,
    0x082EFA98EC4E6C89ULL, 0x452821E638D01377ULL, 0xBE5466CF34E90C6CULL,
    0xC0AC29B7C97C50DDULL, 0x3F84D5B5B5470917ULL, 0x9216D5D98979FB1BULL,
    0xD1310BA698DFB5ACULL, 0x2FFD72DBD01ADFB7ULL, 0xB8E1AFED6A267E96ULL,
    0xBA7C9045F12C7F99ULL, 0x24A19947B3916CF7ULL, 0x0801F2E2858EFC16ULL,
    0x636920D871574E69ULL};

const int kSigma[10][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0}};

const u64 kIV[8] = {0x6A09E667F3BCC908ULL, 0xBB67AE8584CAA73BULL,
                    0x3C6EF372FE94F82BULL, 0xA54FF53A5F1D36F1ULL,
                    0x510E527FADE682D1ULL, 0x9B05688C2B3E6C1FULL,
                    0x1F83D9ABFB41BD6BULL, 0x5BE0CD19137E2179ULL};

inline u64 rotr(u64 x, int n) { return (x >> n) | (x << (64 - n)); }
inline u64 be64(const uint8_t* b) {
  u64 w = 0;
  for (int j = 0; j < 8; ++j) w = (w << 8) | b[j];
  return w;
}

// t is the 128-bit message-bit counter split into (lo, hi).
void compress(u64 h[8], const uint8_t* block, u64 t_lo, u64 t_hi) {
  u64 m[16], v[16];
  for (int i = 0; i < 16; ++i) m[i] = be64(block + 8 * i);
  for (int i = 0; i < 8; ++i) v[i] = h[i];
  v[8] = kC[0];
  v[9] = kC[1];
  v[10] = kC[2];
  v[11] = kC[3];
  v[12] = t_lo ^ kC[4];
  v[13] = t_lo ^ kC[5];
  v[14] = t_hi ^ kC[6];
  v[15] = t_hi ^ kC[7];

  for (int r = 0; r < 16; ++r) {
    const int* s = kSigma[r % 10];
    auto g = [&](int a, int b, int c, int d, int i) {
      v[a] = v[a] + v[b] + (m[s[2 * i]] ^ kC[s[2 * i + 1]]);
      v[d] = rotr(v[d] ^ v[a], 32);
      v[c] = v[c] + v[d];
      v[b] = rotr(v[b] ^ v[c], 25);
      v[a] = v[a] + v[b] + (m[s[2 * i + 1]] ^ kC[s[2 * i]]);
      v[d] = rotr(v[d] ^ v[a], 16);
      v[c] = v[c] + v[d];
      v[b] = rotr(v[b] ^ v[c], 11);
    };
    g(0, 4, 8, 12, 0);
    g(1, 5, 9, 13, 1);
    g(2, 6, 10, 14, 2);
    g(3, 7, 11, 15, 3);
    g(0, 5, 10, 15, 4);
    g(1, 6, 11, 12, 5);
    g(2, 7, 8, 13, 6);
    g(3, 4, 9, 14, 7);
  }
  for (int i = 0; i < 8; ++i) h[i] ^= v[i] ^ v[i + 8];
}

}  // namespace

void blake512(const uint8_t* data, size_t len, uint8_t* out64) {
  u64 h[8];
  std::memcpy(h, kIV, sizeof(h));
  // 128-bit message bit length, big-endian 16 bytes
  uint8_t msglen[16] = {0};
  u64 bitlen = (u64)len * 8;
  for (int i = 0; i < 8; ++i) msglen[15 - i] = (uint8_t)(bitlen >> (8 * i));

  size_t pos = 0;
  u64 counter = 0;
  while (len - pos > 128) {
    counter += 1024;
    compress(h, data + pos, counter, 0);
    pos += 128;
  }
  size_t rest = len - pos;
  counter += rest * 8;

  uint8_t pad[128];
  // padding: 0x80, zeros, 0x01, 128-bit bit length; a block containing no
  // message bits is compressed with t = 0 (matches blake512.py:90-103).
  if (rest == 128) {
    compress(h, data + pos, counter, 0);
    std::memset(pad, 0, 128);
    pad[0] = 0x80;
    pad[111] = 0x01;
    std::memcpy(pad + 112, msglen, 16);
    compress(h, pad, 0, 0);
  } else if (rest == 111) {
    std::memcpy(pad, data + pos, 111);
    pad[111] = 0x81;
    std::memcpy(pad + 112, msglen, 16);
    compress(h, pad, counter, 0);
  } else if (rest <= 110) {
    std::memset(pad, 0, 128);
    std::memcpy(pad, data + pos, rest);
    pad[rest] = 0x80;
    pad[111] = 0x01;
    std::memcpy(pad + 112, msglen, 16);
    compress(h, pad, counter, 0);
  } else {
    std::memset(pad, 0, 128);
    std::memcpy(pad, data + pos, rest);
    pad[rest] = 0x80;
    compress(h, pad, counter, 0);
    std::memset(pad, 0, 128);
    pad[111] = 0x01;
    std::memcpy(pad + 112, msglen, 16);
    compress(h, pad, 0, 0);
  }
  for (int i = 0; i < 8; ++i)
    for (int j = 0; j < 8; ++j)
      out64[8 * i + j] = (uint8_t)(h[i] >> (8 * (7 - j)));
}

}  // namespace inf
