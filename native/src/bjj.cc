// BabyJubJub twisted Edwards curve over BN254 Fr (native host ops).
//
// Twin of infimum_tpu/curve/babyjubjub.py (golden-tested against it):
// a*x^2 + y^2 = 1 + d*x^2*y^2 with a=168700, d=168696 (reference
// circuits/utils/babyjub.circom). Scalar mult + addition are the host hot
// loop of EdDSA signing / ECDH during message publication and event
// replay — a Python double-and-add costs ~2.3 ms per full-width scalar.
#include "bjj.h"

namespace inf {
namespace {

struct BjjConsts {
  U256 a_m, d_m;  // curve coefficients, Montgomery form
  BjjConsts() {
    const Mont& F = FR();
    U256 a{{168700, 0, 0, 0}}, d{{168696, 0, 0, 0}};
    a_m = F.to_mont(a);
    d_m = F.to_mont(d);
  }
};

const BjjConsts& C() {
  static BjjConsts c;
  return c;
}

}  // namespace

// Unified extended-coordinate addition (X, Y, T, Z), Hisil et al.
// "add-2008-hwcd" — complete for BabyJubJub (d non-square, a square).
BjjExt bjj_ext_add(const BjjExt& p, const BjjExt& q) {
  const Mont& F = FR();
  U256 a = F.mul(p.x, q.x);
  U256 b = F.mul(p.y, q.y);
  U256 c = F.mul(F.mul(C().d_m, p.t), q.t);
  U256 dd = F.mul(p.z, q.z);
  U256 e = F.sub(F.sub(F.mul(F.add(p.x, p.y), F.add(q.x, q.y)), a), b);
  U256 f = F.sub(dd, c);
  U256 g = F.add(dd, c);
  U256 h = F.sub(b, F.mul(C().a_m, a));
  return {F.mul(e, f), F.mul(g, h), F.mul(e, h), F.mul(f, g)};
}

BjjExt bjj_identity() {
  const Mont& F = FR();
  return {U256{}, F.one_m, U256{}, F.one_m};
}

BjjExt bjj_from_affine(const U256& x, const U256& y) {
  const Mont& F = FR();
  U256 xm = F.to_mont(x), ym = F.to_mont(y);
  return {xm, ym, F.mul(xm, ym), F.one_m};
}

void bjj_to_affine(const BjjExt& p, U256* x, U256* y) {
  const Mont& F = FR();
  if (p.z.is_zero()) {
    *x = U256{};
    *y = U256{{1, 0, 0, 0}};
    return;
  }
  U256 zi = F.inv(p.z);
  *x = F.from_mont(F.mul(p.x, zi));
  *y = F.from_mont(F.mul(p.y, zi));
}

// Scalar multiplication, double-and-add over the full scalar width.
BjjExt bjj_mul(const BjjExt& p, const U256& n) {
  BjjExt acc = bjj_identity();
  BjjExt base = p;
  int bits = n.bit_length();
  for (int i = 0; i < bits; ++i) {
    if (n.bit(i)) acc = bjj_ext_add(acc, base);
    base = bjj_ext_add(base, base);
  }
  return acc;
}

}  // namespace inf
