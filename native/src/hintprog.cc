// Native witness hint-program evaluator over BN254 Fr.
//
// The circuit builder (infimum_tpu/groth16/r1cs.py) registers per-gate
// hints from a closed op set; witnessing replays them in topo order —
// SURVEY.md §3.2 hot loop #1 (the reference runs circom's WASM witness
// calculator here, cli/src/utils.ts:69-73). The Python interpreter costs
// ~1.2 s per reference process batch; this evaluator runs the identical
// program in C++ (~0.2 s), golden-tested against the Python twin.
//
// Program encoding (built once per ConstraintSystem by groth16/nativewit.py):
//   ops:   n_ops rows of 7 int64: opcode, param, out, a_off, a_len,
//          b_off, b_len — (off, len) index the flattened term arrays of
//          the op's input linear combinations.
//   terms: term_idx (uint32 wire index) + term_coeff (32B BE, plain form).
// Opcodes: 0 mul, 1 inv0 (x^-1 or 0), 2 isz (x==0), 3 bit (x>>k & 1),
//          4 div0 (n*d^-1 or 0), 5 digit5 ((x / 5^k) % 5).
//
// All wire values are held in Montgomery form; bit/digit ops convert
// their input to plain form first. Inversion is binary extended GCD
// (HAC 14.61) on the plain value — ~10x over Fermat for the ~13k
// inversions per process batch.
#include "hintprog.h"

#include <cstring>
#include <vector>

namespace inf {
namespace {

// (x + p) / 2 over 257 bits (x < p so the sum fits 256 bits + 1 carry)
inline U256 half_mod_add(const U256& x, const U256& p) {
  U256 s;
  u64 carry = addc(s, x, p);
  for (int i = 0; i < 3; ++i) s.v[i] = (s.v[i] >> 1) | (s.v[i + 1] << 63);
  s.v[3] = (s.v[3] >> 1) | (carry << 63);
  return s;
}

inline void shr1(U256& x) {
  for (int i = 0; i < 3; ++i) x.v[i] = (x.v[i] >> 1) | (x.v[i + 1] << 63);
  x.v[3] >>= 1;
}

// a^{-1} mod p for odd prime p, a in (0, p), plain form (HAC Alg. 14.61).
U256 inv_binary(const U256& a, const U256& p) {
  U256 u = a, v = p;
  U256 x1{{1, 0, 0, 0}}, x2{};
  U256 one{{1, 0, 0, 0}};
  while (u != one && v != one) {
    while (!(u.v[0] & 1)) {
      shr1(u);
      if (x1.v[0] & 1)
        x1 = half_mod_add(x1, p);
      else
        shr1(x1);
    }
    while (!(v.v[0] & 1)) {
      shr1(v);
      if (x2.v[0] & 1)
        x2 = half_mod_add(x2, p);
      else
        shr1(x2);
    }
    if (cmp(u, v) >= 0) {
      subb(u, u, v);
      if (subb(x1, x1, x2)) addc(x1, x1, p);
    } else {
      subb(v, v, u);
      if (subb(x2, x2, x1)) addc(x2, x2, p);
    }
  }
  return (u == one) ? x1 : x2;
}

// x / 5^k and remainder-of-final-digit: long division by a u64.
inline u64 div_small(U256& x, u64 d) {
  u128 rem = 0;
  for (int i = 3; i >= 0; --i) {
    u128 cur = (rem << 64) | x.v[i];
    x.v[i] = (u64)(cur / d);
    rem = cur % d;
  }
  return (u64)rem;
}

}  // namespace

struct HintProg {
  std::vector<int64_t> ops;  // 7 per op
  std::vector<uint32_t> term_idx;
  std::vector<U256> term_coeff_m;  // Montgomery
  int num_vars = 0;
};

HintProg* hintprog_new(const int64_t* ops, int n_ops,
                       const uint32_t* term_idx, const uint8_t* term_coeff_be,
                       int n_terms, int num_vars) {
  const Mont& F = FR();
  HintProg* h = new HintProg;
  h->ops.assign(ops, ops + 7 * (size_t)n_ops);
  h->term_idx.assign(term_idx, term_idx + n_terms);
  h->term_coeff_m.resize(n_terms);
  for (int i = 0; i < n_terms; ++i) {
    U256 c = from_be32(term_coeff_be + 32 * i);
    if (cmp(c, F.mod) >= 0) {
      delete h;
      return nullptr;
    }
    h->term_coeff_m[i] = F.to_mont(c);
  }
  h->num_vars = num_vars;
  return h;
}

void hintprog_free(HintProg* h) { delete h; }

int hintprog_run(const HintProg* h, const uint32_t* in_idx,
                 const uint8_t* in_vals_be, int n_in, uint8_t* out_be) {
  const Mont& F = FR();
  std::vector<U256> w(h->num_vars);  // Montgomery form
  w[0] = F.one_m;
  for (int i = 0; i < n_in; ++i) {
    U256 v = from_be32(in_vals_be + 32 * i);
    if (cmp(v, F.mod) >= 0 || in_idx[i] >= (uint32_t)h->num_vars) return 1;
    w[in_idx[i]] = F.to_mont(v);
  }

  auto eval_lc = [&](int64_t off, int64_t len) {
    U256 acc{};
    for (int64_t j = off; j < off + len; ++j)
      acc = F.add(acc, F.mul(h->term_coeff_m[j], w[h->term_idx[j]]));
    return acc;
  };
  auto inv0_m = [&](const U256& am) {
    if (am.is_zero()) return U256{};
    U256 plain = F.from_mont(am);
    return F.to_mont(inv_binary(plain, F.mod));
  };

  size_t n_ops = h->ops.size() / 7;
  for (size_t i = 0; i < n_ops; ++i) {
    const int64_t* op = &h->ops[7 * i];
    int64_t code = op[0], param = op[1], out = op[2];
    if (out <= 0 || out >= h->num_vars) return 2;
    U256 a = eval_lc(op[3], op[4]);
    U256 r{};
    switch (code) {
      case 0:  // mul
        r = F.mul(a, eval_lc(op[5], op[6]));
        break;
      case 1:  // inv0
        r = inv0_m(a);
        break;
      case 2:  // isz
        r = a.is_zero() ? F.one_m : U256{};
        break;
      case 3: {  // bit k
        U256 plain = F.from_mont(a);
        r = plain.bit((int)param) ? F.one_m : U256{};
        break;
      }
      case 4:  // div0
        r = F.mul(a, inv0_m(eval_lc(op[5], op[6])));
        break;
      case 5: {  // digit5 k
        if (param < 0 || param > 27) return 3;  // 5^27 is the u64 bound
        U256 plain = F.from_mont(a);
        u64 pow5 = 1;
        for (int64_t k = 0; k < param; ++k) pow5 *= 5;
        div_small(plain, pow5);
        u64 digit = div_small(plain, 5);
        U256 d{{digit, 0, 0, 0}};
        r = F.to_mont(d);
        break;
      }
      default:
        return 3;
    }
    w[out] = r;
  }
  for (int i = 0; i < h->num_vars; ++i)
    to_be32(F.from_mont(w[i]), out_be + 32 * (size_t)i);
  return 0;
}

}  // namespace inf
