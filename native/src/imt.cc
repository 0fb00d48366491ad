#include "imt.h"

#include <map>

namespace inf {

static constexpr int MAX_ZERO_DEPTH = 33;

// MACI padding public key / nothing-up-my-sleeve seeds (tree/zeros.py
// derivation, verified against the reference byte tables zeroes.rs:1-79).
static U256 pad_key_x() {
  return from_hex(
      "171e826ad4a870fd925e0bf0e87884e70e080879c2205ef10114f28a3b6f6dd7");
}
static U256 pad_key_y() {
  return from_hex(
      "2bd407d897fbbca9f88adfd2d15252e69de8c1564eb4d3d27162e259172f1a1d");
}
static U256 nothing_up_my_sleeve() {
  return from_hex(
      "12817f4161f2f5ded33f26c55735a77e80e4f8975483c8c2704745128417f711");
}

const std::vector<U256>& merkle_zeros(int arity) {
  static std::map<int, std::vector<U256>> cache;
  auto it = cache.find(arity);
  if (it != cache.end()) return it->second;
  std::vector<U256> out;
  U256 zero;
  if (arity == 2) {
    U256 in[4] = {pad_key_x(), pad_key_y(), U256{}, U256{}};
    zero = poseidon_hash(in, 4);  // blank state leaf
  } else {
    zero = nothing_up_my_sleeve();
  }
  out.push_back(zero);
  for (int d = 1; d < MAX_ZERO_DEPTH; ++d) {
    std::vector<U256> in(arity, out.back());
    out.push_back(poseidon_hash(in.data(), arity));
  }
  return cache.emplace(arity, std::move(out)).first->second;
}

int AmortizedIMT::insert(const U256& leaf) {
  if (root) return TREE_ALREADY_FULL;
  ++count;
  hashes.push_back({0, leaf});

  while ((int)hashes.size() >= arity) {
    int d = hashes[hashes.size() - arity].first;
    bool uniform = true;
    for (size_t i = hashes.size() - arity; i < hashes.size(); ++i)
      uniform = uniform && hashes[i].first == d;
    if (!uniform) break;
    std::vector<U256> group;
    for (size_t i = hashes.size() - arity; i < hashes.size(); ++i)
      group.push_back(hashes[i].second);
    U256 parent = poseidon_hash(group.data(), arity);
    hashes.resize(hashes.size() - arity);
    hashes.push_back({d + 1, parent});
    if (depth < d + 1) depth = d + 1;
  }

  if (hashes.size() == 1 && hashes[0].first == full_depth) {
    root = hashes[0].second;
    hashes.clear();
  }
  return MERKLE_OK;
}

int AmortizedIMT::merge(bool to_depth) {
  if (root) return TREE_ALREADY_MERGED;
  const std::vector<U256>& zeros = merkle_zeros(arity);
  while (!hashes.empty()) {
    int d = hashes.back().first;
    if (hashes.size() == 1 && (!to_depth || d == full_depth)) break;
    // rightmost run of equal-depth nodes, in insertion order
    size_t start = hashes.size();
    while (start > 0 && hashes[start - 1].first == d) --start;
    std::vector<U256> group;
    for (size_t i = start; i < hashes.size(); ++i)
      group.push_back(hashes[i].second);
    size_t size = group.size();
    while ((int)group.size() < arity) group.push_back(zeros[d]);
    U256 parent = poseidon_hash(group.data(), arity);
    hashes.resize(hashes.size() - size);
    hashes.push_back({d + 1, parent});
    // NB: merge does NOT update `depth` (reference state.rs:230-281) —
    // only insert's greedy collapse does; prepare_public_inputs relies on
    // the insert-time depth as actualStateTreeDepth.
  }
  if (hashes.size() == 1) {
    root = hashes[0].second;
    hashes.clear();
    return MERKLE_OK;
  }
  return MERGE_FAILED;
}

}  // namespace inf
