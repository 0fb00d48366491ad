"""Pippenger multi-scalar multiplication on TPU for BN254 G1/G2.

The MSM dominates Groth16 proving (SURVEY.md §3.2 "hot loop #3": snarkjs runs
it in JS/WASM, reference cli/src/utils.ts:69-92). TPUs have no efficient
random scatter, so bucket accumulation is reformulated so that every EC add is
batched across vector lanes and the whole kernel is O(N) curve adds per
window — the Pippenger optimum — with a compile-friendly graph (every add
formula is traced exactly once, inside loop bodies):

  per c-bit window (all windows in one `lax.scan`):
    1. digit extraction + argsort by digit (XLA sort, no scatter)
    2. points reshaped lane-major: lane l owns a contiguous sorted chunk
    3. one `lax.scan` over chunk position: each lane keeps a running
       (digit, partial-sum) accumulator and *emits* the finished run when its
       digit changes. Sorted order makes every (lane, digit) emission unique.
    4. emissions land in a dense (buckets × lanes) table via one XLA scatter
       (unique indices, dropped out-of-range sentinels)
    5. lanes are tree-reduced; the weighted bucket sum sum_k k*B_k falls out
       of two Hillis–Steele suffix scans (`fori_loop`, one add instance each)
  window results are combined on the host (W doublings/adds of one point).

EC arithmetic is the branchless complete projective add (curve/proj.py), so
lane collisions (P+P, P-P, infinity) are all handled by construction.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..ff.limbs import NLIMBS, LIMB_BITS, batch_to_limbs
from ..ff.bn254 import FR_MOD
from ..curve.bn254_host import g1_add, g1_mul
from ..curve.proj import CurveDev, G1_DEV, G2_DEV

_I32 = jnp.int32


# -- host reference -----------------------------------------------------------

def msm_host(points, scalars):
    """Reference MSM via double-and-add; points affine (x, y)/None."""
    acc = None
    for p, s in zip(points, scalars):
        if p is None or s == 0:
            continue
        acc = g1_add(acc, g1_mul(p, s))
    return acc


# -- device kernel ------------------------------------------------------------

def window_sums(curve: CurveDev, c: int, lanes: int, pts, sc, nwin: int = 0):
    """Per-window weighted bucket sums; pure and traceable (jit or shard_map).

    pts: (Npad, 2, *fshape) Montgomery affine, sc: (Npad, NLIMBS) scalar limbs,
    with Npad a multiple of `lanes`. Returns a (X, Y, Z) tuple of (W, *fshape)
    projective window sums, windows least-significant first. `nwin` limits the
    window count (0 = cover all 256 scalar bits).
    """
    nb = 1 << c
    per_limb = LIMB_BITS // c
    nwin = nwin or (NLIMBS * LIMB_BITS) // c
    fsh = curve.fshape()
    L = lanes
    T = pts.shape[0] // L
    assert pts.shape[0] == L * T

    def window_body(_, w):
        limb = w // per_limb
        shift = (w % per_limb) * c
        digits = ((jnp.take(sc, limb, axis=1) >> shift) & (nb - 1)).astype(_I32)
        order = jnp.argsort(digits)
        sdig = jnp.moveaxis(digits[order].reshape(L, T), 1, 0)      # (T, L)
        spts = jnp.moveaxis(pts[order].reshape(L, T, 2, *fsh), 1, 0)

        def step(carry, xs):
            ax, ay, az, adig = carry
            p, d = xs
            px, py = p[:, 0], p[:, 1]
            sx, sy, sz = curve.add_mixed((ax, ay, az), (px, py))
            same = d == adig
            fresh = (px, py, curve.one((L,)))
            nxt = curve.select(same, (sx, sy, sz), fresh)
            # suppressed emissions use sentinel `nb`: a POSITIVE out-of-range
            # index, genuinely dropped by mode="drop" (negative indices wrap
            # Python-style in JAX scatter and would corrupt bucket nb-1)
            emit_dig = jnp.where(same, jnp.full_like(adig, nb), adig)
            return (*nxt, d), (emit_dig, ax, ay, az)

        # init carry derived from the (possibly device-varying) inputs rather
        # than fresh constants: under shard_map, a constant init would be
        # unvarying while the scan's carry output is varying over the mesh
        # axis, which jax rejects (carry types must match exactly).
        zf = spts[0, :, 0] * 0                      # varying zeros, (L, *fsh)
        init = (zf, zf + curve.one((L,)), zf,
                sdig[0] * 0 + jnp.int32(nb))
        (fx, fy, fz, fdig), (edig, ex, ey, ez) = jax.lax.scan(
            step, init, (spts, sdig)
        )
        edig = jnp.concatenate([edig, fdig[None]], axis=0)          # (T+1, L)
        ex = jnp.concatenate([ex, fx[None]], axis=0)
        ey = jnp.concatenate([ey, fy[None]], axis=0)
        ez = jnp.concatenate([ez, fz[None]], axis=0)

        lane = jnp.broadcast_to(jnp.arange(L, dtype=_I32), edig.shape)
        lin = (edig * L + lane).reshape(-1)                         # <0 dropped
        bx = jnp.zeros((nb * L, *fsh), jnp.uint32).at[lin].set(
            ex.reshape(-1, *fsh), mode="drop")
        by = curve.one((nb * L,)).at[lin].set(ey.reshape(-1, *fsh), mode="drop")
        bz = jnp.zeros((nb * L, *fsh), jnp.uint32).at[lin].set(
            ez.reshape(-1, *fsh), mode="drop")

        # One fused reduction loop — lane tree-reduce, bucket shift, and the
        # two weighted-sum suffix scans — so the complete-add formula is
        # traced exactly ONCE here (XLA:CPU compile time is ~linear in the
        # number of field-op instances, so three separate reduction loops
        # tripled compile time for zero runtime benefit). Phases:
        #   j < logl:              lane halving on axis 1, masked
        #   j == logl (pre-step):  arr[i] = B_{i+1}, arr[nb-1] = infinity
        #   j in [logl, logl+2c):  two Hillis-Steele suffix scans on axis 0
        # Result (the weighted bucket sum sum_k k*B_k) lands at [0, 0].
        bx = bx.reshape(nb, L, *fsh)
        by = by.reshape(nb, L, *fsh)
        bz = bz.reshape(nb, L, *fsh)
        lane_idx = jnp.arange(L)
        bucket_idx = jnp.arange(nb)
        logl = L.bit_length() - 1
        inf_full = curve.infinity((nb, L))
        shift_mask = jnp.broadcast_to(bucket_idx[:, None] < nb - 1, (nb, L))

        def red_body(j, b):
            shifted = tuple(jnp.roll(comp, -1, axis=0) for comp in b)
            pre = curve.select(shift_mask, shifted, inf_full)
            b = tuple(jnp.where(j == logl, pc, bc) for pc, bc in zip(pre, b))

            lane_phase = j < logl
            lane_stride = jnp.int32(L) >> (jnp.minimum(j, logl - 1) + 1)
            jsuf = jnp.maximum(j - logl, 0)
            s = jnp.left_shift(1, jnp.where(jsuf < c, jsuf, jsuf - c))
            s0 = jnp.where(lane_phase, 0, s)
            s1 = jnp.where(lane_phase, lane_stride, 0)
            partner = tuple(
                jnp.roll(comp, (-s0, -s1), axis=(0, 1)) for comp in b)
            added = curve.add(b, partner)
            mask = jnp.where(lane_phase,
                             lane_idx[None, :] < lane_stride,
                             (bucket_idx[:, None] + s) < nb)
            return curve.select(mask, added, b)

        bx, by, bz = jax.lax.fori_loop(0, logl + 2 * c, red_body,
                                       (bx, by, bz))
        return None, (bx[0, 0], by[0, 0], bz[0, 0])

    _, wins = jax.lax.scan(window_body, None, jnp.arange(nwin, dtype=_I32))
    return wins


@functools.lru_cache(maxsize=None)
def _window_kernel(curve_name: str, c: int, lanes: int, steps: int):
    """Jitted window_sums with shapes fixed by (lanes, steps)."""
    curve = {"g1": G1_DEV, "g2": G2_DEV}[curve_name]
    return jax.jit(functools.partial(window_sums, curve, c, lanes))


def encode_msm_inputs(points, scalars, curve: CurveDev, multiple: int):
    """Encode + pad host points/scalars to a multiple; padding has scalar 0
    (digit 0 never enters the weighted bucket sum)."""
    n = len(points)
    npad = multiple * math.ceil(n / multiple)
    pts = np.zeros((npad, 2, *curve.fshape()), dtype=np.uint32)
    pts[:n] = curve.encode_affine(points)
    sc = np.zeros((npad, NLIMBS), dtype=np.uint32)
    sc[:n] = batch_to_limbs([s % FR_MOD for s in scalars])
    return pts, sc


def combine_windows(curve: CurveDev, wins, c: int):
    """Device window sums -> one host affine point via Horner over windows."""
    win_pts = curve.decode(wins)
    total = None
    for wpt in reversed(win_pts):
        if total is not None:
            for _ in range(c):
                total = curve.host_double(total)
        total = curve.host_add(total, wpt)
    return total


def msm_device(points, scalars, c: int | None = None,
               curve: CurveDev = G1_DEV, lanes: int = 256):
    """MSM of host affine points and int scalars; returns host affine/None.

    `lanes` bounds the vector width of the accumulation scan. Window width
    `c` defaults by problem size: the per-window bucket reduction costs
    O(2^c) EC adds regardless of N, so small problems want small windows.
    """
    n = len(points)
    if n == 0:
        return None
    if c is None:
        c = 8 if n >= 4096 else 4
    assert LIMB_BITS % c == 0
    L = max(1, min(lanes, 1 << (n - 1).bit_length()))
    # pad the scan length to a power of two: kernel shapes (and their
    # compile-cache entries) then only vary logarithmically with n
    T = 1 << (max(1, -(-n // L)) - 1).bit_length()
    pts, sc = encode_msm_inputs(points, scalars, curve, L * T)
    kernel = _window_kernel(curve.name, c, L, T)
    wins = kernel(jnp.asarray(pts), jnp.asarray(sc))
    return combine_windows(curve, wins, c)
