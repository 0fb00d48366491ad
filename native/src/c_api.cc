// C ABI for the native library (consumed via ctypes from
// infimum_tpu/native). All field scalars cross the boundary as 32-byte
// big-endian (the pallet HashBytes convention); points as arkworks
// uncompressed bytes (G1 64B, G2 128B).
#include <cstring>
#include <vector>

#include "bjj.h"
#include "blake512.h"
#include "hintprog.h"
#include "imt.h"
#include "pairing.h"
#include "poseidon.h"
#include "serde.h"

using namespace inf;

extern "C" {

// ---- poseidon -------------------------------------------------------------

// inputs: n contiguous 32-byte BE field elements; out: 32 bytes BE.
// returns 0 on success, nonzero on bad arity.
int inf_poseidon(const uint8_t* inputs, int n, uint8_t* out) {
  if (n < 1 || n > POSEIDON_MAX_WIDTH - 1) return 1;
  std::vector<U256> in(n);
  for (int i = 0; i < n; ++i) {
    in[i] = from_be32(inputs + 32 * i);
    if (cmp(in[i], FR().mod) >= 0) return 2;
  }
  to_be32(poseidon_hash(in.data(), n), out);
  return 0;
}

// batched 2-input hash: pairs (2n x 32B) -> n x 32B
int inf_poseidon2_batch(const uint8_t* inputs, int n, uint8_t* out) {
  for (int i = 0; i < n; ++i) {
    U256 in[2] = {from_be32(inputs + 64 * i), from_be32(inputs + 64 * i + 32)};
    to_be32(poseidon_hash(in, 2), out + 32 * i);
  }
  return 0;
}

// full permutation: state (t x 32B BE) permuted in place into out (t x 32B).
// The Poseidon duplex cipher consumes all t output elements
// (reference circuits/utils/poseidon-cipher.circom:164-218).
int inf_poseidon_perm(const uint8_t* state, int t, uint8_t* out) {
  if (t < 2 || t > POSEIDON_MAX_WIDTH) return 1;
  std::vector<U256> s(t);
  for (int i = 0; i < t; ++i) {
    s[i] = from_be32(state + 32 * i);
    if (cmp(s[i], FR().mod) >= 0) return 2;
  }
  poseidon_perm(s.data(), t);
  for (int i = 0; i < t; ++i) to_be32(s[i], out + 32 * i);
  return 0;
}

// batched width-n hash: m rows of n contiguous 32-byte BE elements.
// Amortizes the ctypes boundary for host tree building / replay loops.
int inf_poseidon_batch(const uint8_t* inputs, int n, int m, uint8_t* out) {
  if (n < 1 || n > POSEIDON_MAX_WIDTH - 1) return 1;
  std::vector<U256> in(n);
  for (int r = 0; r < m; ++r) {
    for (int i = 0; i < n; ++i) {
      in[i] = from_be32(inputs + 32 * (r * n + i));
      if (cmp(in[i], FR().mod) >= 0) return 2;
    }
    to_be32(poseidon_hash(in.data(), n), out + 32 * r);
  }
  return 0;
}

// ---- BabyJubJub + BLAKE-512 (EdDSA/ECDH host hot path) --------------------

// p = (x||y) 64B BE affine, scalar 32B BE (any value < 2^256); out 64B.
int inf_bjj_mul(const uint8_t* p, const uint8_t* scalar, uint8_t* out) {
  U256 x = from_be32(p), y = from_be32(p + 32);
  if (cmp(x, FR().mod) >= 0 || cmp(y, FR().mod) >= 0) return 1;
  U256 n = from_be32(scalar);
  BjjExt r = bjj_mul(bjj_from_affine(x, y), n);
  U256 ox, oy;
  bjj_to_affine(r, &ox, &oy);
  to_be32(ox, out);
  to_be32(oy, out + 32);
  return 0;
}

int inf_bjj_add(const uint8_t* p, const uint8_t* q, uint8_t* out) {
  U256 px = from_be32(p), py = from_be32(p + 32);
  U256 qx = from_be32(q), qy = from_be32(q + 32);
  if (cmp(px, FR().mod) >= 0 || cmp(py, FR().mod) >= 0 ||
      cmp(qx, FR().mod) >= 0 || cmp(qy, FR().mod) >= 0)
    return 1;
  BjjExt r = bjj_ext_add(bjj_from_affine(px, py), bjj_from_affine(qx, qy));
  U256 ox, oy;
  bjj_to_affine(r, &ox, &oy);
  to_be32(ox, out);
  to_be32(oy, out + 32);
  return 0;
}

void inf_blake512(const uint8_t* data, uint64_t len, uint8_t* out) {
  blake512(data, (size_t)len, out);
}

// ---- amortized IMT --------------------------------------------------------

void* inf_imt_new(int arity, int full_depth, int zero_seed) {
  return new AmortizedIMT(arity, full_depth, zero_seed != 0);
}

void inf_imt_free(void* t) { delete static_cast<AmortizedIMT*>(t); }

int inf_imt_insert(void* t, const uint8_t* leaf_be32) {
  return static_cast<AmortizedIMT*>(t)->insert(from_be32(leaf_be32));
}

int inf_imt_merge(void* t, int to_depth) {
  return static_cast<AmortizedIMT*>(t)->merge(to_depth != 0);
}

// returns 1 if root set (written to out), 0 otherwise
int inf_imt_root(void* t, uint8_t* out_be32) {
  auto* imt = static_cast<AmortizedIMT*>(t);
  if (!imt->root) return 0;
  to_be32(*imt->root, out_be32);
  return 1;
}

int inf_imt_depth(void* t) { return static_cast<AmortizedIMT*>(t)->depth; }
uint64_t inf_imt_count(void* t) { return static_cast<AmortizedIMT*>(t)->count; }

int inf_merkle_zero(int arity, int depth, uint8_t* out_be32) {
  if (depth < 0 || depth >= 33) return 1;
  to_be32(merkle_zeros(arity)[depth], out_be32);
  return 0;
}

// ---- witness hint program -------------------------------------------------

void* inf_hintprog_new(const int64_t* ops, int n_ops,
                       const uint32_t* term_idx,
                       const uint8_t* term_coeff_be, int n_terms,
                       int num_vars) {
  return hintprog_new(ops, n_ops, term_idx, term_coeff_be, n_terms, num_vars);
}

void inf_hintprog_free(void* h) { hintprog_free(static_cast<HintProg*>(h)); }

// inputs: n_in (index, 32B BE value) pairs; out: num_vars x 32B BE witness.
int inf_hintprog_run(void* h, const uint32_t* in_idx,
                     const uint8_t* in_vals_be, int n_in, uint8_t* out_be) {
  return hintprog_run(static_cast<HintProg*>(h), in_idx, in_vals_be, n_in,
                      out_be);
}

// ---- serde ----------------------------------------------------------------

// validate+roundtrip: returns 0 ok, nonzero = malformed
int inf_g1_validate(const uint8_t* b) {
  G1 p;
  return deserialize_g1(b, &p) ? 0 : 1;
}

int inf_g2_validate(const uint8_t* b) {
  G2 p;
  return deserialize_g2(b, &p) ? 0 : 1;
}

int inf_g1_roundtrip(const uint8_t* in, uint8_t* out) {
  G1 p;
  if (!deserialize_g1(in, &p)) return 1;
  serialize_g1(p, out);
  return 0;
}

int inf_g2_roundtrip(const uint8_t* in, uint8_t* out) {
  G2 p;
  if (!deserialize_g2(in, &p)) return 1;
  serialize_g2(p, out);
  return 0;
}

// ---- groth16 verify -------------------------------------------------------

// vk: alpha(64) beta(128) gamma(128) delta(128) ic(n_ic*64)
// proof: a(64) b(128) c(64); publics: n_pub * 32B BE Fr.
// returns 1 = valid, 0 = invalid, negative = malformed input.
int inf_groth16_verify(const uint8_t* vk_alpha, const uint8_t* vk_beta,
                       const uint8_t* vk_gamma, const uint8_t* vk_delta,
                       const uint8_t* vk_ic, int n_ic, const uint8_t* proof_a,
                       const uint8_t* proof_b, const uint8_t* proof_c,
                       const uint8_t* publics, int n_pub) {
  VerifyingKey vk;
  Proof pr;
  if (!deserialize_g1(vk_alpha, &vk.alpha_g1)) return -1;
  if (!deserialize_g2(vk_beta, &vk.beta_g2)) return -1;
  if (!deserialize_g2(vk_gamma, &vk.gamma_g2)) return -1;
  if (!deserialize_g2(vk_delta, &vk.delta_g2)) return -1;
  vk.ic.resize(n_ic);
  for (int i = 0; i < n_ic; ++i)
    if (!deserialize_g1(vk_ic + 64 * i, &vk.ic[i])) return -1;
  if (!deserialize_g1(proof_a, &pr.a)) return -2;
  if (!deserialize_g2(proof_b, &pr.b)) return -2;
  if (!deserialize_g1(proof_c, &pr.c)) return -2;
  std::vector<U256> pub(n_pub);
  for (int i = 0; i < n_pub; ++i) {
    pub[i] = from_be32(publics + 32 * i);
    if (cmp(pub[i], FR().mod) >= 0) return -3;
  }
  return groth16_verify(vk, pr, pub) ? 1 : 0;
}

}  // extern "C"
