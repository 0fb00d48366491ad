#include "serde.h"

namespace inf {
namespace {

// field elements on the wire are plain (non-Montgomery) LE bytes
bool read_fq(const uint8_t* b, U256* out, bool mask_flags) {
  uint8_t tmp[32];
  std::memcpy(tmp, b, 32);
  if (mask_flags) tmp[31] &= 0x3f;
  U256 x = from_le32(tmp);
  if (cmp(x, FQ().mod) >= 0) return false;
  *out = FQ().to_mont(x);
  return true;
}

void write_fq(const U256& x_m, uint8_t* b) { to_le32(FQ().from_mont(x_m), b); }

}  // namespace

bool deserialize_g1(const uint8_t* b, G1* out, bool validate) {
  uint8_t flags = b[63] & 0xc0;
  if (flags & INFINITY_FLAG) {
    *out = G1{};
    return true;
  }
  G1 p;
  p.inf = false;
  if (!read_fq(b, &p.x, false)) return false;
  if (!read_fq(b + 32, &p.y, true)) return false;
  if (validate && !g1_on_curve(p)) return false;
  *out = p;
  return true;
}

bool deserialize_g2(const uint8_t* b, G2* out, bool validate) {
  uint8_t flags = b[127] & 0xc0;
  if (flags & INFINITY_FLAG) {
    *out = G2{};
    return true;
  }
  G2 p;
  p.inf = false;
  if (!read_fq(b, &p.x.c0, false)) return false;
  if (!read_fq(b + 32, &p.x.c1, false)) return false;
  if (!read_fq(b + 64, &p.y.c0, false)) return false;
  if (!read_fq(b + 96, &p.y.c1, true)) return false;
  if (validate) {
    if (!g2_on_curve(p)) return false;
    if (!g2_in_subgroup(p)) return false;
  }
  *out = p;
  return true;
}

namespace {

// arkworks "positive" convention for the Y-sign flag: y > -y
bool fq_is_positive(const U256& y_m) {
  U256 y = FQ().from_mont(y_m);
  U256 ny = FQ().from_mont(FQ().neg(y_m));
  return cmp(y, ny) > 0;
}

bool fq2_is_positive(const Fq2& y) {
  if (!y.c1.is_zero()) return fq_is_positive(y.c1);
  return fq_is_positive(y.c0);
}

}  // namespace

void serialize_g1(const G1& p, uint8_t* b) {
  std::memset(b, 0, 64);
  if (p.inf) {
    b[63] = INFINITY_FLAG;
    return;
  }
  write_fq(p.x, b);
  write_fq(p.y, b + 32);
  if (fq_is_positive(p.y)) b[63] |= YNEG_FLAG;
}

void serialize_g2(const G2& p, uint8_t* b) {
  std::memset(b, 0, 128);
  if (p.inf) {
    b[127] = INFINITY_FLAG;
    return;
  }
  write_fq(p.x.c0, b);
  write_fq(p.x.c1, b + 32);
  write_fq(p.y.c0, b + 64);
  write_fq(p.y.c1, b + 96);
  if (fq2_is_positive(p.y)) b[127] |= YNEG_FLAG;
}

}  // namespace inf
