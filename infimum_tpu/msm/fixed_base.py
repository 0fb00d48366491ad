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
        w = nwin
        while w > 1:
            half = w // 2
            left = (x[:, :half], y[:, :half], z[:, :half])
            right = (x[:, half:w], y[:, half:w], z[:, half:w])
            x, y, z = curve.add(left, right)
            w = half
        return x[:, 0], y[:, 0], z[:, 0]

    return kernel


def fixed_base_mul_batch(scalars, curve: CurveDev = G1_DEV, c: int = 8,
                         chunk: int = 256):
    """[s * GEN for s in scalars] as host affine points (None for 0).

    Processes in fixed-size chunks so one compiled kernel shape serves every
    batch size."""
    n = len(scalars)
    if n == 0:
        return []
    npad = chunk * math.ceil(n / chunk)
    sc = np.zeros((npad, NLIMBS), dtype=np.uint32)
    sc[:n] = batch_to_limbs([s % FR_MOD for s in scalars])
    kernel = _kernel(curve.name, c, chunk)
    parts = []
    for i in range(0, npad, chunk):
        out = kernel(jnp.asarray(sc[i : i + chunk]))
        parts.extend(curve.decode(out))
    return parts[:n]
