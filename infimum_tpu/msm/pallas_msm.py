"""Throughput-oriented Pippenger MSM for BN254 G1 on TPU via Pallas.

Replaces the latency-bound XLA kernel (msm/pippenger.py) on TPU. The
structure per c=8-bit window (all windows in one jit call — host<->device
traffic through the runtime is expensive, so inputs cross once):

  1. XLA: digit extraction + sort_key_val + row gather + transpose to the
     limb-major chunk layout (T, 32, 8, W); lane l = s*W + w owns the
     contiguous sorted range [l*T, (l+1)*T).
  2. Pallas accumulation kernel (grid T, accumulator in VMEM scratch):
     run-emission — each lane keeps a running (digit, partial-sum) and
     emits the finished run when its digit changes. Emitted digit 0 means
     "dead" (bucket 0 has weight 0, so digit-0 runs and garbage from
     padding never contribute).
  3. XLA compaction: globally-sorted order bounds live emissions by
     nb + L - 1, so a flag/cumsum/scatter packs them into Kpad rows.
  4. Pallas weighted-sum kernel (grid over windows): per entry computes
     digit*P by double-and-add (weights ARE the bucket indices:
     sum_d d*B_d == sum_e d_e*P_e over run emissions), then tree-reduces
     all entries. Partner access inside the fixed-trip reduction loop is
     via 0/1 shift matrices on the MXU (f32 HIGHEST — exact for 16-bit
     limbs), which keeps the traced graph small (one add instance).

Window results combine on the host (Horner, c doublings per window).

Reference anchor: this is the snarkjs Pippenger replacement for Groth16
proving hot loop #3 (cli/src/utils.ts:69-92; SURVEY.md §2.5 row "MSM").
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ff.bn254 import FQ_MOD, FR_MOD
from ..ff.limbs import batch_to_limbs, from_limbs
from .pallas_field import Fq, FieldConsts, NLIMBS, rcb_add, rcb_add_mixed

C_BITS = 8              # window width; 32 windows cover 254-bit scalars
N_BUCKETS = 1 << C_BITS
N_WINDOWS = 32

_FQ = Fq(FieldConsts(FQ_MOD))
_U32 = jnp.uint32
_I32 = jnp.int32


# -- kernel 1: run-emission accumulation over sorted chunks --------------------

def _accum_kernel(dig_ref, pts_ref, edig_ref, ept_ref, fdig_ref, fpt_ref,
                  acc_ref, adig_ref):
    F = _FQ
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _init():
        adig_ref[...] = dig_ref[0] * 0
        zero = pts_ref[0, 0] * 0
        for i in range(48):
            acc_ref[i] = zero

    d = dig_ref[0]                                   # (8, W) uint32
    px = tuple(pts_ref[0, i] for i in range(16))
    py = tuple(pts_ref[0, 16 + i] for i in range(16))
    ax = tuple(acc_ref[i] for i in range(16))
    ay = tuple(acc_ref[16 + i] for i in range(16))
    az = tuple(acc_ref[32 + i] for i in range(16))
    ad = adig_ref[...]

    sx, sy, sz = rcb_add_mixed(F, F.mul9, (ax, ay, az), (px, py))
    same = d == ad

    # emit the finished run (digit 0 = suppressed/dead, dropped downstream)
    edig_ref[0] = jnp.where(same, ad * 0, ad)
    for i in range(16):
        ept_ref[0, i] = ax[i]
        ept_ref[0, 16 + i] = ay[i]
        ept_ref[0, 32 + i] = az[i]

    one = F.one(px)
    nx = tuple(jnp.where(same, sx[i], px[i]) for i in range(16))
    ny = tuple(jnp.where(same, sy[i], py[i]) for i in range(16))
    nz = tuple(jnp.where(same, sz[i], one[i]) for i in range(16))
    for i in range(16):
        acc_ref[i] = nx[i]
        acc_ref[16 + i] = ny[i]
        acc_ref[32 + i] = nz[i]
    adig_ref[...] = d

    @pl.when(t == T - 1)
    def _final():
        fdig_ref[...] = d
        for i in range(16):
            fpt_ref[i] = nx[i]
            fpt_ref[16 + i] = ny[i]
            fpt_ref[32 + i] = nz[i]


def _accum_call(spts, sdig, T, W, interpret):
    """spts (T, 32, 8, W), sdig (T, 8, W) -> emissions incl. final row."""
    edig, ept, fdig, fpt = pl.pallas_call(
        _accum_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32, 8, W), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 48, 8, W), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, W), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((48, 8, W), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 8, W), _U32),
            jax.ShapeDtypeStruct((T, 48, 8, W), _U32),
            jax.ShapeDtypeStruct((8, W), _U32),
            jax.ShapeDtypeStruct((48, 8, W), _U32),
        ],
        scratch_shapes=[
            pltpu.VMEM((48, 8, W), _U32),
            pltpu.VMEM((8, W), _U32),
        ],
        interpret=interpret,
    )(sdig, spts)
    edig_all = jnp.concatenate([edig, fdig[None]], axis=0)
    ept_all = jnp.concatenate([ept, fpt[None]], axis=0)
    return edig_all, ept_all


# -- kernel 2: per-entry digit*P then tree reduction ---------------------------

def _shift_mats(S2):
    """0/1 partner-shift matrices for the flat (S2*128) halving reduction."""
    n_sub = int(math.log2(S2)) if S2 > 1 else 0
    sub = np.zeros((max(n_sub, 1), S2, S2), np.float32)
    for j in range(n_sub):
        r = S2 >> (j + 1)
        for s in range(S2 - r):
            sub[j, s, s + r] = 1.0          # shifted[s] = x[s + r]
    lane = np.zeros((7, 128, 128), np.float32)
    for j in range(7):
        v = 64 >> j
        for w in range(128 - v):
            lane[j, w + v, w] = 1.0         # shifted[:, w] = x[:, w + v]
    return n_sub, sub, lane


def _make_weighted_kernel(S2, n_sub):
    F = _FQ

    def kernel(dig_ref, pts_ref, sub_ref, lane_ref, out_ref):
        d = dig_ref[0]                                  # (S2, 128)
        P = tuple(
            tuple(pts_ref[0, 16 * c + i] for i in range(16))
            for c in range(3)
        )
        zero = d * 0
        inf = (tuple(zero for _ in range(16)),
               tuple(zero + o for o in F.c.ONE),
               tuple(zero for _ in range(16)))

        def bit_body(k, acc):
            accd = rcb_add(F, F.mul9, acc, acc)
            added = rcb_add(F, F.mul9, accd, P)
            bit = (d >> (C_BITS - 1 - k)) & 1
            sel = bit == 1
            return tuple(
                tuple(jnp.where(sel, a, b) for a, b in zip(ca, cb))
                for ca, cb in zip(added, accd)
            )

        acc = jax.lax.fori_loop(0, C_BITS, bit_body, inf)

        # tree-reduce the (S2, 128) lanes of acc down to flat index [0, 0]
        rows = jax.lax.broadcasted_iota(_I32, (S2, 128), 0)
        cols = jax.lax.broadcasted_iota(_I32, (S2, 128), 1)
        flat = rows * 128 + cols
        total_steps = n_sub + 7

        def red_body(j, acc):
            stride = (S2 * 128) >> (j + 1)

            # Mosaic has no u32<->f32 cast; hop through i32 (limbs < 2^16,
            # so every cast is value-preserving).
            def shift_sub(x):
                m = sub_ref[jnp.minimum(j, max(n_sub - 1, 0))]
                xf = x.astype(_I32).astype(jnp.float32)
                return jnp.dot(m, xf,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST
                               ).astype(_I32).astype(_U32)

            def shift_lane(x):
                m = lane_ref[jnp.clip(j - n_sub, 0, 6)]
                xf = x.astype(_I32).astype(jnp.float32)
                return jnp.dot(xf, m,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST
                               ).astype(_I32).astype(_U32)

            use_sub = j < n_sub
            part = tuple(
                tuple(
                    jax.lax.cond(use_sub, shift_sub, shift_lane, comp)
                    for comp in coord
                )
                for coord in acc
            )
            added = rcb_add(F, F.mul9, acc, part)
            keep = flat < stride
            return tuple(
                tuple(jnp.where(keep, a, b) for a, b in zip(ca, cb))
                for ca, cb in zip(added, acc)
            )

        acc = jax.lax.fori_loop(0, total_steps, red_body, acc)
        for c in range(3):
            for i in range(16):
                out_ref[0, 16 * c + i] = jnp.broadcast_to(
                    acc[c][i][0:1, :], (8, 128))

    return kernel


def _weighted_call(cdig, cpts, nwin, S2, interpret):
    """cdig (nwin, S2, 128), cpts (nwin, 48, S2, 128) -> (nwin, 48, 8, 128)."""
    n_sub, sub, lane = _shift_mats(S2)
    return pl.pallas_call(
        _make_weighted_kernel(S2, n_sub),
        grid=(nwin,),
        in_specs=[
            pl.BlockSpec((1, S2, 128), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 48, S2, 128), lambda w: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sub.shape, lambda w: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lane.shape, lambda w: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 48, 8, 128), lambda w: (w, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nwin, 48, 8, 128), _U32),
        interpret=interpret,
    )(cdig, cpts, jnp.asarray(sub), jnp.asarray(lane))


# -- orchestration --------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _msm_fn(T, W, nwin, interpret):
    """Jitted (pts_rows (N,32), sc (N,16)) -> (nwin, 48) window-sum limbs."""
    L = 8 * W
    N = T * L
    Kpad = 128
    while Kpad < N_BUCKETS + L:
        Kpad *= 2
    S2 = Kpad // 128

    @jax.jit
    def run(pts_rows, sc):
        def body(_, w):
            limb = w // 2
            shift = ((w % 2) * 8).astype(_U32)
            digits = (jnp.take(sc, limb, axis=1) >> shift) & (N_BUCKETS - 1)
            sdig, order = jax.lax.sort_key_val(
                digits, jnp.arange(N, dtype=_I32))
            srows = jnp.take(pts_rows, order, axis=0)
            spts = srows.reshape(L, T, 32).transpose(1, 2, 0) \
                        .reshape(T, 32, 8, W)
            sdig_b = sdig.reshape(L, T).T.reshape(T, 8, W)
            edig, ept = _accum_call(spts, sdig_b, T, W, interpret)
            flat_dig = edig.reshape(-1)
            flags = flat_dig > 0
            dest = jnp.where(flags, jnp.cumsum(flags) - 1, Kpad) \
                      .astype(_I32)
            rows = ept.transpose(0, 2, 3, 1).reshape(-1, 48)
            cpts = jnp.zeros((Kpad, 48), _U32).at[dest].set(
                rows, mode="drop")
            cdig = jnp.zeros((Kpad,), _U32).at[dest].set(
                flat_dig, mode="drop")
            return None, (cdig.reshape(S2, 128),
                          cpts.T.reshape(48, S2, 128))

        _, (cdigs, cptss) = jax.lax.scan(
            body, None, jnp.arange(nwin, dtype=_U32))
        wins = _weighted_call(cdigs, cptss, nwin, S2, interpret)
        return wins[:, :, 0, 0]                        # (nwin, 48)

    return run


def _decode_window(limbs48) -> tuple | None:
    """(48,) uint32 Montgomery projective limbs -> host affine point/None."""
    from ..ff.bn254 import fq_inv
    from ..ff.fp import FQ_CTX

    x = FQ_CTX.from_mont_int(from_limbs(limbs48[0:16]))
    y = FQ_CTX.from_mont_int(from_limbs(limbs48[16:32]))
    z = FQ_CTX.from_mont_int(from_limbs(limbs48[32:48]))
    if z == 0:
        return None
    zi = fq_inv(z)
    return (x * zi % FQ_MOD, y * zi % FQ_MOD)


def combine_window_points(win_limbs) -> tuple | None:
    """(nwin, 48) window sums (LSW first) -> one affine point via Horner."""
    from ..curve.bn254_host import g1_add, g1_double

    total = None
    for wl in reversed(np.asarray(win_limbs)):
        if total is not None:
            for _ in range(C_BITS):
                total = g1_double(total)
        total = g1_add(total, _decode_window(wl))
    return total


def encode_inputs(points, scalars, L):
    """Host points/ints -> ((Npad, 32) rows, (Npad, 16) scalar limbs)."""
    from ..curve.proj import G1_DEV

    n = len(points)
    T = max(1, math.ceil(n / L))
    npad = T * L
    rows = np.zeros((npad, 32), dtype=np.uint32)
    rows[:n] = G1_DEV.encode_affine(points).reshape(n, 32)
    sc = np.zeros((npad, NLIMBS), dtype=np.uint32)
    sc[:n] = batch_to_limbs([s % FR_MOD for s in scalars])
    return rows, sc, T


def msm_pallas(points, scalars, lanes: int = 1024, nwin: int = N_WINDOWS,
               interpret: bool = False):
    """MSM of host affine points and int scalars via the Pallas pipeline."""
    if len(points) == 0:
        return None
    assert lanes % 8 == 0
    W = lanes // 8
    rows, sc, T = encode_inputs(points, scalars, lanes)
    fn = _msm_fn(T, W, nwin, interpret)
    wins = fn(jnp.asarray(rows), jnp.asarray(sc))
    return combine_window_points(np.asarray(wins))
