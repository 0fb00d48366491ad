"""Throughput-oriented Pippenger MSM for BN254 G1 and G2 on TPU via Pallas.

Replaces the latency-bound XLA kernel (msm/pippenger.py) on TPU. The
structure per c=8-bit window (all windows in one jit call — host<->device
traffic through the runtime is expensive, so inputs cross once):

  1. XLA: digit extraction + sort_key_val + row gather + transpose to the
     limb-major chunk layout (T, AF_ROWS, 8, W); lane l = s*W + w owns the
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

Field elements are limb tuples (pallas_field.py): G1 coordinates are one
Fq (16 rows), G2 coordinates are Fq2 pairs (32 rows); the kernels are
generic over the curve spec.

Reference anchor: this is the snarkjs Pippenger replacement for Groth16
proving hot loop #3 (cli/src/utils.ts:69-92; SURVEY.md §2.5 row "MSM").
Measured (tunneled v5e, 2^20 G1, full-width scalars): 553k pts/s vs 18.5k
for the round-1 XLA kernel.
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
from .pallas_field import Fq, Fq2, FieldConsts, NLIMBS, rcb_add, rcb_add_mixed

# Signed-digit windows: width-c digits recoded to [-2^(c-1), 2^(c-1)], so
# ceil(254/c) windows cover 254-bit scalars — the per-window sorted gather
# is the measured pipeline bottleneck (PERF.md §1, index-rate-bound at
# ~40M rows/s in XLA), and signed digits cut both the gather count and the
# accumulation adds for one extra negation select per point (negating an
# affine point is y -> -y). The width balances accumulation (fewer
# windows) against the weighted kernel (2^(c-1) buckets per window): G1's
# cheap adds favor c=13 (20 windows); G2's 3x-cost Fq2 adds in the
# weighted kernel favor c=10 (26 windows, 16x fewer bucket entries).
C_BITS = 13                     # G1 (back-compat alias; see CurveSpec)
N_BUCKETS = 1 << (C_BITS - 1)
N_WINDOWS = -(-254 // C_BITS)   # 20

_U32 = jnp.uint32
_I32 = jnp.int32

_FQ = Fq(FieldConsts(FQ_MOD))


def _b3_g2_mont():
    from ..curve.bn254_host import B2
    from ..ff.fp import FQ_CTX

    def limbs(v):
        m = FQ_CTX.to_mont_int(v % FQ_MOD)
        return [(m >> (16 * i)) & 0xFFFF for i in range(NLIMBS)]

    return (limbs(3 * B2[0]), limbs(3 * B2[1]))


_FQ2 = Fq2(_FQ, _b3_g2_mont())


class CurveSpec:
    """Static curve parameters binding the generic kernels to G1 or G2."""

    def __init__(self, name: str, F, rf: int, c_bits: int = C_BITS):
        self.name = name
        self.F = F
        self.RF = rf              # limb rows per field element
        self.AF = 2 * rf          # rows per affine point
        self.PR = 3 * rf          # rows per projective point
        self.c_bits = c_bits
        self.n_buckets = 1 << (c_bits - 1)
        self.n_windows = -(-254 // c_bits)

    # felt <-> rows (rows accessed through `get(row_index)`)
    def read_felt(self, get, base):
        if self.RF == NLIMBS:
            return tuple(get(base + i) for i in range(NLIMBS))
        return (tuple(get(base + i) for i in range(NLIMBS)),
                tuple(get(base + NLIMBS + i) for i in range(NLIMBS)))

    def felt_rows(self, felt):
        if self.RF == NLIMBS:
            return list(felt)
        return list(felt[0]) + list(felt[1])

    def host_ops(self):
        from ..curve import bn254_host as H

        if self.name == "g1":
            return H.g1_add, H.g1_double
        return H.g2_add, H.g2_double

    def decode_felt(self, limbs):
        from ..ff.fp import FQ_CTX

        if self.RF == NLIMBS:
            return FQ_CTX.from_mont_int(from_limbs(limbs))
        return (FQ_CTX.from_mont_int(from_limbs(limbs[:NLIMBS])),
                FQ_CTX.from_mont_int(from_limbs(limbs[NLIMBS:])))

    def felt_is_zero(self, v):
        return v == 0 if self.RF == NLIMBS else (v[0] == 0 and v[1] == 0)

    def felt_inv(self, v):
        if self.RF == NLIMBS:
            from ..ff.bn254 import fq_inv
            return fq_inv(v)
        from ..curve.bn254_host import _fq2_inv
        return _fq2_inv(v)

    def felt_mul(self, a, b):
        if self.RF == NLIMBS:
            return a * b % FQ_MOD
        from ..curve.bn254_host import _fq2_mul
        return _fq2_mul(a, b)

    def encode_affine_rows(self, points) -> np.ndarray:
        from ..curve.proj import G1_DEV, G2_DEV

        dev = G1_DEV if self.name == "g1" else G2_DEV
        return dev.encode_affine(points).reshape(len(points), self.AF)


G1_SPEC = CurveSpec("g1", _FQ, NLIMBS, c_bits=13)
G2_SPEC = CurveSpec("g2", _FQ2, 2 * NLIMBS, c_bits=10)

_SPECS = {"g1": G1_SPEC, "g2": G2_SPEC}


# -- kernel 1: run-emission accumulation over sorted chunks --------------------

def _make_accum_kernel(spec: CurveSpec):
    F = spec.F
    RF, AF, PR = spec.RF, spec.AF, spec.PR

    def kernel(dig_ref, sgn_ref, pts_ref, edig_ref, ept_ref, fdig_ref,
               fpt_ref, acc_ref, adig_ref):
        t = pl.program_id(0)
        T = pl.num_programs(0)

        @pl.when(t == 0)
        def _init():
            adig_ref[...] = dig_ref[0] * 0
            zero = pts_ref[0, 0] * 0
            for i in range(PR):
                acc_ref[i] = zero

        d = dig_ref[0]                                   # (8, W) uint32
        px = spec.read_felt(lambda r: pts_ref[0, r], 0)
        py = spec.read_felt(lambda r: pts_ref[0, r], RF)
        # signed digit: bucket is |d|, the sign negates the point (y -> -y)
        py = F.select(sgn_ref[0] != 0, F.sub(F.zero(py), py), py)
        ax = spec.read_felt(lambda r: acc_ref[r], 0)
        ay = spec.read_felt(lambda r: acc_ref[r], RF)
        az = spec.read_felt(lambda r: acc_ref[r], 2 * RF)
        ad = adig_ref[...]

        sx, sy, sz = rcb_add_mixed(F, F.b3, (ax, ay, az), (px, py))
        same = d == ad

        # emit the finished run (digit 0 = suppressed/dead)
        edig_ref[0] = jnp.where(same, ad * 0, ad)
        for i, row in enumerate(spec.felt_rows(ax) + spec.felt_rows(ay)
                                + spec.felt_rows(az)):
            ept_ref[0, i] = row

        one = F.one(px)
        nx = F.select(same, sx, px)
        ny = F.select(same, sy, py)
        nz = F.select(same, sz, one)
        rows = spec.felt_rows(nx) + spec.felt_rows(ny) + spec.felt_rows(nz)
        for i, row in enumerate(rows):
            acc_ref[i] = row
        adig_ref[...] = d

        @pl.when(t == T - 1)
        def _final():
            fdig_ref[...] = d
            for i, row in enumerate(rows):
                fpt_ref[i] = row

    return kernel


def _accum_call(spec: CurveSpec, spts, sdig, ssgn, T, W, interpret):
    """spts (T, AF, 8, W), sdig/ssgn (T, 8, W) -> emissions incl. final."""
    AF, PR = spec.AF, spec.PR
    edig, ept, fdig, fpt = pl.pallas_call(
        _make_accum_kernel(spec),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, AF, 8, W), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PR, 8, W), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, W), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PR, 8, W), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 8, W), _U32),
            jax.ShapeDtypeStruct((T, PR, 8, W), _U32),
            jax.ShapeDtypeStruct((8, W), _U32),
            jax.ShapeDtypeStruct((PR, 8, W), _U32),
        ],
        scratch_shapes=[
            pltpu.VMEM((PR, 8, W), _U32),
            pltpu.VMEM((8, W), _U32),
        ],
        interpret=interpret,
    )(sdig, ssgn, spts)
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


def _make_weighted_kernel(spec: CurveSpec, n_sub):
    """Grid (nwin, chunks): each step weights 1024 compacted entries
    ((8, 128) lanes, digit*P by double-and-add) and folds them into a VMEM
    scratch accumulator; the last chunk tree-reduces the (8, 128) lanes.
    Chunking bounds the per-step VMEM footprint — one whole-window block
    at Kpad=8192 x PR rows exceeds the scoped-vmem limit for G2."""
    F = spec.F
    PR, RF = spec.PR, spec.RF

    def kernel(dig_ref, pts_ref, sub_ref, lane_ref, out_ref, acc_ref):
        c = pl.program_id(1)
        C = pl.num_programs(1)
        d = dig_ref[0, 0]                               # (8, 128)
        P = tuple(
            spec.read_felt(lambda r: pts_ref[0, r, 0], cc * RF)
            for cc in range(3)
        )
        zero = d * 0
        zf = tuple(zero for _ in range(NLIMBS))
        zfelt = zf if RF == NLIMBS else (zf, zf)
        inf = (F.zero(zfelt), F.one(zfelt), F.zero(zfelt))

        def bit_body(k, acc):
            accd = rcb_add(F, F.b3, acc, acc)
            added = rcb_add(F, F.b3, accd, P)
            sel = ((d >> (spec.c_bits - 1 - k)) & 1) == 1
            return tuple(
                F.select(sel, a, b) for a, b in zip(added, accd)
            )

        part = jax.lax.fori_loop(0, spec.c_bits, bit_body, inf)

        @pl.when(c == 0)
        def _init():
            rows = (spec.felt_rows(inf[0]) + spec.felt_rows(inf[1])
                    + spec.felt_rows(inf[2]))
            for i, row in enumerate(rows):
                acc_ref[i] = row

        prev = tuple(
            spec.read_felt(lambda r: acc_ref[r], cc * RF) for cc in range(3)
        )
        acc = rcb_add(F, F.b3, prev, part)
        for i, row in enumerate(spec.felt_rows(acc[0])
                                + spec.felt_rows(acc[1])
                                + spec.felt_rows(acc[2])):
            acc_ref[i] = row

        @pl.when(c == C - 1)
        def _final():
            # tree-reduce the (8, 128) lanes down to flat index [0, 0]
            rows = jax.lax.broadcasted_iota(_I32, (8, 128), 0)
            cols = jax.lax.broadcasted_iota(_I32, (8, 128), 1)
            flat = rows * 128 + cols
            total_steps = n_sub + 7

            def red_body(j, acc):
                stride = (8 * 128) >> (j + 1)

                # Mosaic has no u32<->f32 cast; hop through i32 (limbs
                # < 2^16, so every cast is value-preserving).
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

                def shift_felt(felt):
                    if RF == NLIMBS:
                        return tuple(
                            jax.lax.cond(use_sub, shift_sub, shift_lane, cx)
                            for cx in felt)
                    return tuple(
                        tuple(jax.lax.cond(use_sub, shift_sub, shift_lane,
                                           cx)
                              for cx in comp)
                        for comp in felt)

                part = tuple(shift_felt(coord) for coord in acc)
                added = rcb_add(F, F.b3, acc, part)
                keep = flat < stride
                return tuple(
                    F.select(keep, a, b) for a, b in zip(added, acc)
                )

            red = jax.lax.fori_loop(0, total_steps, red_body, acc)
            all_rows = (spec.felt_rows(red[0]) + spec.felt_rows(red[1])
                        + spec.felt_rows(red[2]))
            for i, row in enumerate(all_rows):
                out_ref[0, i] = jnp.broadcast_to(row[0:1, :], (8, 128))

    return kernel


def _weighted_call(spec: CurveSpec, cdig, cpts, nwin, S2, interpret):
    """cdig (nwin, S2, 128), cpts (nwin, PR, S2, 128) -> (nwin, PR, 8, 128)."""
    PR = spec.PR
    assert S2 % 8 == 0, "Kpad must be a multiple of 1024"
    chunks = S2 // 8
    n_sub, sub, lane = _shift_mats(8)
    cdig_c = cdig.reshape(nwin, chunks, 8, 128)
    cpts_c = cpts.reshape(nwin, PR, chunks, 8, 128)
    return pl.pallas_call(
        _make_weighted_kernel(spec, n_sub),
        grid=(nwin, chunks),
        in_specs=[
            pl.BlockSpec((1, 1, 8, 128), lambda w, c: (w, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PR, 1, 8, 128), lambda w, c: (w, 0, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sub.shape, lambda w, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lane.shape, lambda w, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PR, 8, 128), lambda w, c: (w, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nwin, PR, 8, 128), _U32),
        scratch_shapes=[pltpu.VMEM((PR, 8, 128), _U32)],
        interpret=interpret,
    )(cdig_c, cpts_c, jnp.asarray(sub), jnp.asarray(lane))


# -- orchestration --------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _msm_fn(T, W, nwin, interpret, curve: str = "g1"):
    """Jitted (pts_rows (N, AF), sc (N, 16)) -> (nwin, PR) window-sum limbs.
    nwin=None uses the curve's own window count (spec.n_windows)."""
    spec = _SPECS[curve]
    AF, PR = spec.AF, spec.PR
    L = 8 * W
    N = T * L
    # emission bound: one run per bucket id (0..N_BUCKETS inclusive) plus
    # one unfinished run per lane plus the final row; the chunked weighted
    # kernel needs a multiple of 1024, not a power of two
    if nwin is None:
        nwin = spec.n_windows
    Kpad = -(-(spec.n_buckets + 1 + L + 1) // 1024) * 1024
    S2 = Kpad // 128

    def run(pts_rows, sc):
        # signed windowed recoding, LSB window first: raw 13-bit digit +
        # carry-in d in [0, 2^13]; d > 2^12 becomes digit d - 2^13 with
        # carry-out 1, stored as (magnitude 2^13 - d, sign 1). Scalars are
        # reduced mod r < 2^254, so the top window never carries out.
        half = jnp.uint32(spec.n_buckets)
        full = jnp.uint32(2 * spec.n_buckets)

        def recode(carry, w):
            bitpos = spec.c_bits * w
            limb = bitpos // 16
            sh = bitpos % 16
            lo = jnp.take(sc, limb, axis=1)
            hi = jnp.where(limb + 1 < sc.shape[1],
                           jnp.take(sc, jnp.minimum(limb + 1, sc.shape[1] - 1),
                                    axis=1), 0)
            comb = lo | (hi << 16)
            d = ((comb >> sh) & ((1 << spec.c_bits) - 1)) + carry
            neg = d > half
            mag = jnp.where(neg, full - d, d)
            return neg.astype(_U32), (mag, neg.astype(_U32))

        _, (mags, sgns) = jax.lax.scan(
            recode, jnp.zeros((N,), _U32), jnp.arange(nwin, dtype=_U32))

        def body(_, wi):
            digits = jnp.take(mags, wi, axis=0)
            sdig, order = jax.lax.sort_key_val(
                digits, jnp.arange(N, dtype=_I32))
            srows = jnp.take(pts_rows, order, axis=0)
            ssgn = jnp.take(jnp.take(sgns, wi, axis=0), order, axis=0)
            spts = srows.reshape(L, T, AF).transpose(1, 2, 0) \
                        .reshape(T, AF, 8, W)
            sdig_b = sdig.reshape(L, T).T.reshape(T, 8, W)
            ssgn_b = ssgn.reshape(L, T).T.reshape(T, 8, W)
            edig, ept = _accum_call(spec, spts, sdig_b, ssgn_b, T, W,
                                    interpret)
            flat_dig = edig.reshape(-1)
            flags = flat_dig > 0
            dest = jnp.where(flags, jnp.cumsum(flags) - 1, Kpad) \
                      .astype(_I32)
            rows = ept.transpose(0, 2, 3, 1).reshape(-1, PR)
            cpts = jnp.zeros((Kpad, PR), _U32).at[dest].set(
                rows, mode="drop")
            cdig = jnp.zeros((Kpad,), _U32).at[dest].set(
                flat_dig, mode="drop")
            return None, (cdig.reshape(S2, 128),
                          cpts.T.reshape(PR, S2, 128))

        _, (cdigs, cptss) = jax.lax.scan(
            body, None, jnp.arange(nwin, dtype=_U32))
        wins = _weighted_call(spec, cdigs, cptss, nwin, S2, interpret)
        return wins[:, :, 0, 0]                        # (nwin, PR)

    if interpret:
        return jax.jit(run)
    # AOT export cache: re-tracing this pipeline costs minutes per process
    # (utils/aot.py); the exported module deserializes in ~0 s
    from ..utils.aot import aot_jit

    return aot_jit(f"msm_{curve}_t{T}_w{W}_n{nwin}", run)


def _decode_window(spec: CurveSpec, limbs):
    """(PR,) uint32 Montgomery projective limbs -> host affine point/None."""
    RF = spec.RF
    x = spec.decode_felt(limbs[0:RF])
    y = spec.decode_felt(limbs[RF:2 * RF])
    z = spec.decode_felt(limbs[2 * RF:3 * RF])
    if spec.felt_is_zero(z):
        return None
    zi = spec.felt_inv(z)
    return (spec.felt_mul(x, zi), spec.felt_mul(y, zi))


def combine_window_points(win_limbs, curve: str = "g1"):
    """(nwin, PR) window sums (LSW first) -> one affine point via Horner."""
    spec = _SPECS[curve]
    host_add, host_double = spec.host_ops()
    total = None
    for wl in reversed(np.asarray(win_limbs)):
        if total is not None:
            for _ in range(spec.c_bits):
                total = host_double(total)
        total = host_add(total, _decode_window(spec, wl))
    return total


def encode_inputs(points, scalars, L, curve: str = "g1"):
    """Host points/ints -> ((Npad, AF) rows, (Npad, 16) scalar limbs, T)."""
    spec = _SPECS[curve]
    n = len(points)
    T = max(1, math.ceil(n / L))
    npad = T * L
    rows = np.zeros((npad, spec.AF), dtype=np.uint32)
    rows[:n] = spec.encode_affine_rows(points)
    sc = np.zeros((npad, NLIMBS), dtype=np.uint32)
    sc[:n] = batch_to_limbs([s % FR_MOD for s in scalars])
    return rows, sc, T


def msm_pallas(points, scalars, lanes: int = 1024, nwin: int | None = None,
               interpret: bool = False, curve: str = "g1"):
    """MSM of host affine points and int scalars via the Pallas pipeline."""
    if len(points) == 0:
        return None
    assert lanes % 8 == 0
    W = lanes // 8
    rows, sc, T = encode_inputs(points, scalars, lanes, curve)
    fn = _msm_fn(T, W, nwin, interpret, curve)
    wins = fn(jnp.asarray(rows), jnp.asarray(sc))
    return combine_window_points(np.asarray(wins), curve)


def msm_pallas_rows_async(rows, sc, lanes: int, curve: str = "g1",
                          nwin: int | None = None, interpret: bool = False):
    """Dispatch the MSM pipeline and return the (nwin, PR) window-sum device
    array WITHOUT syncing — callers pipeline several MSMs back-to-back and
    decode with combine_window_points when the results are needed."""
    assert lanes % 8 == 0 and rows.shape[0] == sc.shape[0]
    T = rows.shape[0] // lanes
    fn = _msm_fn(T, lanes // 8, nwin, interpret, curve)
    return fn(jnp.asarray(rows), jnp.asarray(sc))


def msm_pallas_rows(rows, sc, lanes: int, curve: str = "g1",
                    nwin: int | None = None, interpret: bool = False):
    """MSM from pre-encoded inputs: rows (Npad, AF) affine limb rows and
    sc (Npad, 16) scalar limbs, Npad = T*lanes. The hot path for the Groth16
    prover, whose five query point sets are fixed per key — encode once,
    reuse every proof (scalar-0 entries are dead in the kernel, so padding
    and masked-out points cost nothing but bandwidth)."""
    wins = msm_pallas_rows_async(rows, sc, lanes, curve, nwin, interpret)
    return combine_window_points(np.asarray(wins), curve)
