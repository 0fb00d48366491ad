"""Distributed Merkle tree build over a device mesh.

Level-synchronous tree reduction (SURVEY.md §2.5 row "Quinary/binary Merkle
build + merge"): leaves are sharded over the mesh axis, each device builds
its local subtree with the batched Poseidon device kernel, the per-device
subtree roots are all_gathered over ICI, and the (small) top of the tree is
finished replicated on every device — one jit, one collective.

The mesh axis size must be a power of the tree arity (binary trees shard
over 2^j devices, quinary over 5^j), so device boundaries coincide with
node-group boundaries at every level.

Zero-padding follows the pallet's fixed-depth semantics (reference
pallet/src/poll/state.rs:230-281 `merge`, zero tables zeroes.rs:1-79):
callers pad the leaf count to arity^depth with the zero-leaf cascade —
`sharded_tree_root` does it for you on the host when given fewer leaves.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ff.fp import FR_CTX
from ..ff.limbs import NLIMBS
from ..hash.poseidon import merkle_level_device
from ..hash.poseidon_host import poseidon


def _axis_levels(arity: int, axis_size: int) -> int:
    """j with arity^j == axis_size (validates the mesh/arity contract)."""
    j = round(math.log(axis_size, arity))
    if arity**j != axis_size:
        raise ValueError(
            f"mesh axis size {axis_size} is not a power of arity {arity}")
    return j


def make_tree_builder(mesh: Mesh, axis: str, arity: int, depth: int):
    """Returns jitted fn: (arity^depth, NLIMBS) encoded leaves -> (NLIMBS,)
    encoded root. Leaves must be sharded (or shardable) over `axis`."""
    axis_size = mesh.shape[axis]
    j = _axis_levels(arity, axis_size)
    if depth < j:
        raise ValueError(f"depth {depth} < log_arity(devices) {j}")
    local_depth = depth - j

    def local(leaves):                      # (arity^local_depth, NLIMBS)
        nodes = leaves
        for _ in range(local_depth):
            nodes = merkle_level_device(nodes, arity)
        # (1, NLIMBS) local subtree root -> gather all devices' roots
        roots = jax.lax.all_gather(nodes, axis, axis=0, tiled=True)
        for _ in range(j):
            roots = merkle_level_device(roots, arity)
        return roots                         # (1, NLIMBS), replicated value

    shard_map_fn = jax.shard_map(
        local, mesh=mesh, in_specs=P(axis), out_specs=P(axis))

    @jax.jit
    def build(leaves):
        # out_specs=P(axis) stacks one identical copy per device; take row 0
        return shard_map_fn(leaves)[0]

    return build


def sharded_tree_root(mesh: Mesh, axis: str, arity: int, depth: int,
                      leaves: list[int]) -> int:
    """Host convenience: int leaves -> int root, zero-cascade padded to the
    fixed depth (bit-exact vs tree/full.py FullTree and the pallet merge)."""
    n_full = arity**depth
    assert len(leaves) <= n_full, "too many leaves for depth"
    padded = list(leaves) + [0] * (n_full - len(leaves))
    enc = np.asarray(FR_CTX.encode(padded))
    build = make_tree_builder(mesh, axis, arity, depth)
    sharding = NamedSharding(mesh, P(axis))
    out = build(jax.device_put(jnp.asarray(enc), sharding))
    return FR_CTX.decode(np.asarray(out)[None])[0]


def host_tree_root(arity: int, depth: int, leaves: list[int]) -> int:
    """Reference root (zero-leaf = 0 cascade), for cross-checks."""
    zeros = [0]
    for _ in range(depth):
        zeros.append(poseidon([zeros[-1]] * arity))
    nodes = list(leaves)
    for lvl in range(depth):
        pad = (-len(nodes)) % arity if nodes else arity
        nodes = nodes + [zeros[lvl]] * pad
        nodes = [poseidon(nodes[i:i + arity])
                 for i in range(0, len(nodes), arity)]
    return nodes[0] if nodes else zeros[depth]
