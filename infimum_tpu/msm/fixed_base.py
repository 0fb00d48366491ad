"""Batched fixed-base scalar multiplication on TPU (G1/G2).

Computes [s_i * B] for one fixed base B and many scalars — the workload of
Groth16 setup (every proving/verifying key element is a known scalar times a
generator) and of key derivation. Windowed-table formulation: the host
precomputes tab[w][d] = d * 2^(c*w) * B once per (base, c); the device then
just gathers one point per window per scalar and tree-reduces the W windows
with the branchless complete add (curve/proj.py) — no doublings at all.

Replaces the snarkjs/arkworks host-side scalar muls of the reference setup
path (zkey generation; behavioral anchor cli/src/utils.ts:57-94)."""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..ff.limbs import NLIMBS, LIMB_BITS, batch_to_limbs
from ..ff.bn254 import FR_MOD
from ..curve.proj import CurveDev, G1_DEV, G2_DEV
from ..curve.bn254_host import G1_GEN, G2_GEN

_I32 = jnp.int32


@functools.lru_cache(maxsize=None)
def _window_table(curve_name: str, c: int):
    """(W * 2^c, 2, *fshape) Montgomery affine table; row w*2^c is unused
    (digit 0 -> infinity, handled by masking Z)."""
    curve = {"g1": G1_DEV, "g2": G2_DEV}[curve_name]
    gen = {"g1": G1_GEN, "g2": G2_GEN}[curve_name]
    nb = 1 << c
    nwin = (NLIMBS * LIMB_BITS) // c
    rows = []
    base = gen
    for _ in range(nwin):
        acc = None
        row = []
        for _d in range(nb):
            row.append(acc if acc is not None else gen)  # d=0 slot: dummy
            acc = curve.host_add(acc, base)
        rows.extend(row)
        base = curve.host_mul(base, nb)
    return jnp.asarray(curve.encode_affine(rows))


@functools.lru_cache(maxsize=None)
def _kernel(curve_name: str, c: int, n: int):
    curve = {"g1": G1_DEV, "g2": G2_DEV}[curve_name]
    nb = 1 << c
    per_limb = LIMB_BITS // c
    nwin = (NLIMBS * LIMB_BITS) // c
    tab = _window_table(curve_name, c)

    @jax.jit
    def kernel(sc):  # (n, NLIMBS) scalar limbs
        limb = jnp.arange(nwin, dtype=_I32) // per_limb
        shift = (jnp.arange(nwin, dtype=_I32) % per_limb) * c
        digits = ((sc[:, limb] >> shift[None, :]) & (nb - 1)).astype(_I32)
        rows = jnp.arange(nwin, dtype=_I32)[None, :] * nb + digits  # (n, W)
        pts = tab[rows]                       # (n, W, 2, *fshape)
        live = digits != 0
        # digit-0 rows must become the CANONICAL infinity (0, 1, 0): a z=0
        # point with nonzero x is not a valid projective point and the
        # complete-add formulas are only complete over valid points
        ix, iy, iz = curve.infinity((n, nwin))
        x = curve.F.select(live, pts[:, :, 0], ix)
        y = curve.F.select(live, pts[:, :, 1], iy)
        z = curve.F.select(live, curve.one((n, nwin)), iz)
        # reduce the W windows with a scan so the complete-add formula is
        # traced exactly once (an unrolled tree reduce makes XLA:CPU compiles
        # take minutes; W sequential batched adds cost the same FLOPs)
        xs = (jnp.moveaxis(x, 1, 0), jnp.moveaxis(y, 1, 0),
              jnp.moveaxis(z, 1, 0))

        def step(acc, w_pt):
            return curve.add(acc, w_pt), None

        acc, _ = jax.lax.scan(step, curve.infinity((n,)), xs)
        return acc

    return kernel


def fixed_base_mul_batch(scalars, curve: CurveDev = G1_DEV, c: int = 8,
                         chunk: int | None = None,
                         host_threshold: int | None = None):
    """[s * GEN for s in scalars] as host affine points (None for 0).

    Processes in fixed-size chunks so one compiled kernel shape serves every
    batch size. Batches below `host_threshold` run on the host's windowed-
    table path: compiling the device kernel costs far more than the work
    (threshold defaults per platform — XLA:CPU compiles of the bignum graphs
    take minutes on small hosts, so CPU favors the host path much longer)."""
    from ..utils.backend import device_threshold, fixed_base_chunk
    from ..curve.bn254_host import fixed_base_mul_host

    if chunk is None:
        chunk = fixed_base_chunk()
    n = len(scalars)
    if n == 0:
        return []
    if n < (host_threshold if host_threshold is not None
            else device_threshold()):
        return fixed_base_mul_host(scalars, curve.name, c)
    npad = chunk * math.ceil(n / chunk)
    sc = np.zeros((npad, NLIMBS), dtype=np.uint32)
    sc[:n] = batch_to_limbs([s % FR_MOD for s in scalars])
    kernel = _kernel(curve.name, c, chunk)
    # enqueue every chunk first (async dispatch overlaps device work), then
    # decode once so the batched Z-inversion amortizes over the full set
    outs = [kernel(jnp.asarray(sc[i : i + chunk]))
            for i in range(0, npad, chunk)]
    stacked = tuple(jnp.concatenate([o[i] for o in outs]) for i in range(3))
    return curve.decode(stacked)[:n]
