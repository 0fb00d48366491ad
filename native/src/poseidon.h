// Circom-compatible Poseidon over BN254 Fr, parameters generated natively
// by the Grain LFSR procedure (same profile the reference's light-poseidon
// fork hardcodes 43k lines of constants for: pallet/src/hash/parameters.rs,
// provenance documented at parameters.rs:1-15). Widths t=2..13, x^5 S-box,
// 8 full rounds, per-width partial rounds.
#pragma once

#include <vector>

#include "bn254.h"

namespace inf {

constexpr int POSEIDON_FULL_ROUNDS = 8;
constexpr int POSEIDON_MAX_WIDTH = 13;  // reference MAX_X5_LEN
inline const int POSEIDON_PARTIAL_ROUNDS[15] = {56, 57, 56, 60, 60, 63, 64, 63,
                                                60, 66, 60, 65, 70, 60, 64};

struct PoseidonParams {
  int t;
  std::vector<U256> ark;               // (rounds * t), Montgomery form
  std::vector<std::vector<U256>> mds;  // t x t, Montgomery form
};

// Cached per-width parameters (generated on first use).
const PoseidonParams& poseidon_params(int t);

// Permutation in place over plain (non-Montgomery) Fr values.
void poseidon_perm(U256* state, int t);

// Hash: width = n+1, domain tag 0, output element 0. Inputs/outputs plain Fr.
U256 poseidon_hash(const U256* inputs, int n);

}  // namespace inf
