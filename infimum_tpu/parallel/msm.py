"""Multi-chip sharded Pippenger MSM over a jax.sharding.Mesh.

The reference prover is single-process (snarkjs in one Node.js worker,
cli/src/utils.ts:67-94); this is the scale-out design SURVEY.md §2.5 calls
for: points are sharded across the mesh's data axis, each device runs the
full window/bucket kernel on its shard (msm/pippenger.py), and the per-device
window sums — (windows, 3) curve points, a few KB — are combined with an
`all_gather` over ICI followed by a local tree reduction. EC addition is not
a `psum`-able monoid for XLA, but the collective payload is tiny, so the
bucket accumulation (the O(N) part) still scales linearly.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..curve.proj import CurveDev, G1_DEV
from ..msm.pippenger import (
    window_sums,
    encode_msm_inputs,
    combine_windows,
)


def _tree_reduce_axis0(curve: CurveDev, pts):
    """Reduce (D, ...) projective points over axis 0 (D need not be pow2).

    Fixed-shape masked halving in one fori_loop: the complete-add formula is
    traced once (unrolled shrinking-shape halving costs one add *instance*
    per level, and XLA:CPU compile time is ~linear in add instances)."""
    x, y, z = pts
    d = x.shape[0]
    nfdims = len(curve.fshape())
    batch_rest = x.shape[1 : x.ndim - nfdims]
    target = 1 << (d - 1).bit_length() if d > 1 else 1
    if target != d:
        ix, iy, iz = curve.infinity((target - d, *batch_rest))
        x = jnp.concatenate([x, ix], axis=0)
        y = jnp.concatenate([y, iy], axis=0)
        z = jnp.concatenate([z, iz], axis=0)
        d = target
    if d == 1:
        return (x[0], y[0], z[0])
    idx = jnp.arange(d).reshape(d, *([1] * len(batch_rest)))

    def body(j, b):
        stride = jnp.int32(d) >> (j + 1)
        rolled = tuple(jnp.roll(comp, -stride, axis=0) for comp in b)
        added = curve.add(b, rolled)
        return curve.select(jnp.broadcast_to(idx < stride, b[0].shape[: idx.ndim]),
                            added, b)

    logd = d.bit_length() - 1
    x, y, z = jax.lax.fori_loop(0, logd, body, (x, y, z))
    return (x[0], y[0], z[0])


def reduction_comm_bytes(ndev: int, curve: CurveDev = G1_DEV, c: int = 8,
                         reduce: str = "auto") -> dict:
    """Per-device communication volume of the window reduction, per MSM.

    The O(N) bucket accumulation is embarrassingly parallel; only the
    per-device window sums cross the interconnect. all_gather delivers
    (D-1) partial results to every device; recursive halving (ppermute)
    moves one (W, point) payload per round over log2(D) rounds — the model
    the weak-scaling artifact reports (BASELINE.md >=70% multi-host
    target's communication side)."""
    import math

    w = -(-256 // c)                 # windows for 254-bit scalars
    felt = 4 * int(np.prod(curve.fshape()))
    point = 3 * felt                 # projective (x, y, z)
    payload = w * point
    mode = reduce
    if mode == "auto":
        mode = "permute" if ndev & (ndev - 1) == 0 else "gather"
    if mode == "gather":
        per_dev = (ndev - 1) * payload
        rounds = 1
    else:
        rounds = max(0, int(math.log2(ndev)))
        per_dev = rounds * payload
    return {"mode": mode, "window_payload_bytes": payload,
            "per_device_bytes": per_dev, "rounds": rounds}


def make_sharded_window_sums(mesh: Mesh, axis: str = "dp",
                             curve: CurveDev = G1_DEV, c: int = 8,
                             lanes: int = 8, reduce: str = "auto"):
    """Returns a jittable (pts, sc) -> window sums fn sharded over `axis`.

    pts (N, 2, *fshape) and sc (N, NLIMBS) must have N divisible by
    mesh.shape[axis] * lanes. Output shard 0 carries the full reduction.

    reduce: "gather" all_gathers every device's window sums and reduces
    locally ((D-1) x W points received per device); "permute" does
    recursive halving with ppermute (log2(D) rounds of W points each —
    strictly less traffic for D > 2, and the partial sums ride the ICI
    neighbor links). "auto" picks permute for power-of-two meshes.
    """
    ndev = mesh.shape[axis]
    if reduce == "auto":
        reduce = "permute" if ndev & (ndev - 1) == 0 else "gather"

    def local_gather(pts_l, sc_l):
        wins = window_sums(curve, c, lanes, pts_l, sc_l)
        gathered = jax.lax.all_gather(wins, axis)       # (D, W, *fshape) x3
        red = _tree_reduce_axis0(curve, gathered)       # (W, *fshape) x3
        # every device holds the identical reduction, but the vma system
        # cannot *infer* replication through all_gather + EC adds, so return
        # a per-device leading axis and slice shard 0 outside the shard_map
        return tuple(comp[None] for comp in red)

    def local_permute(pts_l, sc_l):
        acc = window_sums(curve, c, lanes, pts_l, sc_l)  # (W, *fshape) x3
        me = jax.lax.axis_index(axis)
        stride = ndev >> 1
        while stride >= 1:            # unrolled: perm pairs differ per round
            perm = [(i + stride, i) for i in range(stride)]
            part = tuple(jax.lax.ppermute(comp, axis, perm) for comp in acc)
            added = curve.add(acc, part)
            # devices >= stride received zeros (not the EC identity): a
            # scalar where() keeps their previous acc, which is dead anyway
            keep = me < stride
            acc = tuple(jnp.where(keep, a, b) for a, b in zip(added, acc))
            stride >>= 1
        return tuple(comp[None] for comp in acc)

    sm = shard_map(
        local_permute if reduce == "permute" and ndev > 1 else local_gather,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )

    def fn(pts, sc):
        return tuple(comp[0] for comp in sm(pts, sc))

    return fn


def msm_sharded(points, scalars, mesh: Mesh, axis: str = "dp",
                curve: CurveDev = G1_DEV, c: int = 8, lanes: int = 8):
    """Host-level sharded MSM: encode, shard over the mesh, combine on host."""
    ndev = mesh.shape[axis]
    pts, sc = encode_msm_inputs(points, scalars, curve, ndev * lanes)
    fn = jax.jit(make_sharded_window_sums(mesh, axis, curve, c, lanes))
    sharding = NamedSharding(mesh, P(axis))
    pts = jax.device_put(jnp.asarray(pts), sharding)
    sc = jax.device_put(jnp.asarray(sc), sharding)
    wins = fn(pts, sc)
    return combine_windows(curve, wins, c)
