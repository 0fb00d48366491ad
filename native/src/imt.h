// Amortized incremental Merkle tree, the native equivalent of the on-chain
// tree (reference: pallet/src/poll/state.rs:176-281): O(log n) storage of
// (depth, hash) frontier pairs, greedy collapse on insert, zero-padded merge.
#pragma once

#include <optional>
#include <vector>

#include "poseidon.h"

namespace inf {

enum MerkleError {
  MERKLE_OK = 0,
  TREE_ALREADY_FULL = 1,
  TREE_ALREADY_MERGED = 2,
  MERGE_FAILED = 4,
};

// zeros[d] for the amortized trees: binary from the MACI blank state leaf,
// quinary from NOTHING_UP_MY_SLEEVE (reference: pallet/src/poll/zeroes.rs).
const std::vector<U256>& merkle_zeros(int arity);

struct AmortizedIMT {
  int arity;
  int full_depth;
  int depth = 0;
  uint64_t count = 0;
  std::vector<std::pair<int, U256>> hashes;
  std::optional<U256> root;

  AmortizedIMT(int arity_, int full_depth_, bool zero_seed)
      : arity(arity_), full_depth(full_depth_) {
    if (zero_seed) hashes.push_back({0, merkle_zeros(arity_)[0]});
  }

  int insert(const U256& leaf);
  int merge(bool to_depth);
};

}  // namespace inf
