// BabyJubJub twisted Edwards ops over BN254 Fr. See bjj.cc.
#pragma once

#include "bn254.h"

namespace inf {

// Extended twisted Edwards coordinates (X, Y, T, Z), Montgomery form.
struct BjjExt {
  U256 x, y, t, z;
};

BjjExt bjj_identity();
BjjExt bjj_from_affine(const U256& x, const U256& y);
void bjj_to_affine(const BjjExt& p, U256* x, U256* y);
BjjExt bjj_ext_add(const BjjExt& p, const BjjExt& q);
BjjExt bjj_mul(const BjjExt& p, const U256& n);

}  // namespace inf
