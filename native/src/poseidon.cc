#include "poseidon.h"

#include <array>
#include <map>

namespace inf {
namespace {

// 80-bit Grain LFSR stream from the Poseidon reference generation procedure
// (the circomlib profile: GF(p) tag, x^alpha S-box, n=254).
class Grain {
 public:
  Grain(int t, int r_f, int r_p, int n = 254) {
    int pos = 0;
    auto push = [&](u64 x, int width) {
      for (int i = 0; i < width; ++i)
        state_[pos++] = (x >> (width - 1 - i)) & 1;
    };
    push(1, 2);    // field tag: prime field
    push(0, 4);    // sbox tag: x^alpha
    push(n, 12);   // field bits
    push(t, 12);   // width
    push(r_f, 10); // full rounds
    push(r_p, 10); // partial rounds
    for (int i = 0; i < 30; ++i) state_[pos++] = 1;
    for (int i = 0; i < 160; ++i) raw_bit();
  }

  int bit() {
    // decimation: raw 1 -> emit next raw bit, raw 0 -> discard next raw bit
    for (;;) {
      if (raw_bit() == 1) return raw_bit();
      raw_bit();
    }
  }

  // 254-bit rejection-sampled element < r (round constants)
  U256 field_element(const Mont& F) {
    for (;;) {
      U256 x = draw();
      if (cmp(x, F.mod) < 0) return x;
    }
  }

  // raw 254-bit draw reduced mod r (MDS xs/ys)
  U256 field_element_mod(const Mont& F) {
    U256 x = draw();
    while (cmp(x, F.mod) >= 0) subb(x, x, F.mod);
    return x;
  }

 private:
  int raw_bit() {
    int n = state_[62] ^ state_[51] ^ state_[38] ^ state_[23] ^ state_[13] ^
            state_[0];
    for (int i = 0; i < 79; ++i) state_[i] = state_[i + 1];
    state_[79] = (uint8_t)n;
    return n;
  }

  U256 draw() {
    U256 x;
    for (int i = 0; i < 254; ++i) {
      // shift left by 1 then or the next bit (MSB first)
      u64 carry = 0;
      for (int w = 0; w < 4; ++w) {
        u64 nc = x.v[w] >> 63;
        x.v[w] = (x.v[w] << 1) | carry;
        carry = nc;
      }
      x.v[0] |= (u64)bit();
    }
    return x;
  }

  std::array<uint8_t, 80> state_{};
};

}  // namespace

const PoseidonParams& poseidon_params(int t) {
  static std::map<int, PoseidonParams> cache;
  auto it = cache.find(t);
  if (it != cache.end()) return it->second;

  const Mont& F = FR();
  int r_p = POSEIDON_PARTIAL_ROUNDS[t - 2];
  Grain g(t, POSEIDON_FULL_ROUNDS, r_p);
  PoseidonParams p;
  p.t = t;
  int rounds = POSEIDON_FULL_ROUNDS + r_p;
  p.ark.reserve(rounds * t);
  for (int i = 0; i < rounds * t; ++i)
    p.ark.push_back(F.to_mont(g.field_element(F)));
  // Cauchy MDS from the continuing stream: M[i][j] = 1/(x_i + y_j)
  std::vector<U256> xs(t), ys(t);
  for (int i = 0; i < t; ++i) xs[i] = g.field_element_mod(F);
  for (int i = 0; i < t; ++i) ys[i] = g.field_element_mod(F);
  p.mds.assign(t, std::vector<U256>(t));
  for (int i = 0; i < t; ++i)
    for (int j = 0; j < t; ++j) {
      U256 s = F.to_mont(F.add(xs[i], ys[j]));  // plain add ok: both < r
      p.mds[i][j] = F.inv(s);
    }
  return cache.emplace(t, std::move(p)).first->second;
}

void poseidon_perm(U256* state, int t) {
  const Mont& F = FR();
  const PoseidonParams& p = poseidon_params(t);
  int r_p = POSEIDON_PARTIAL_ROUNDS[t - 2];
  int half = POSEIDON_FULL_ROUNDS / 2;
  int rounds = POSEIDON_FULL_ROUNDS + r_p;

  std::vector<U256> s(t), ns(t);
  for (int i = 0; i < t; ++i) s[i] = F.to_mont(state[i]);

  auto x5 = [&](const U256& x) {
    U256 x2 = F.sqr(x);
    return F.mul(F.sqr(x2), x);
  };

  for (int r = 0; r < rounds; ++r) {
    for (int i = 0; i < t; ++i) s[i] = F.add(s[i], p.ark[r * t + i]);
    bool full = r < half || r >= half + r_p;
    s[0] = x5(s[0]);
    if (full)
      for (int i = 1; i < t; ++i) s[i] = x5(s[i]);
    for (int i = 0; i < t; ++i) {
      U256 acc{};
      for (int j = 0; j < t; ++j) acc = F.add(acc, F.mul(p.mds[i][j], s[j]));
      ns[i] = acc;
    }
    std::swap(s, ns);
  }
  for (int i = 0; i < t; ++i) state[i] = F.from_mont(s[i]);
}

U256 poseidon_hash(const U256* inputs, int n) {
  std::vector<U256> state(n + 1);
  state[0] = U256{};
  for (int i = 0; i < n; ++i) state[i + 1] = inputs[i];
  poseidon_perm(state.data(), n + 1);
  return state[0];
}

}  // namespace inf
