"""Fused circom-Poseidon permutation as a hand-written Pallas TPU kernel.

The XLA path (hash/poseidon.py) leaves layout and fusion to the compiler;
this kernel pins the efficient choice: limb-major (t, NLIMBS, B) state with
the batch on the 128-lane axis, the whole 8+r_p round permutation executed
in VMEM with zero HBM round-trips, S-box and MDS multiplies lowered through
the exact-f32 MXU column matmul (ff/pallas_fp.py). One grid step processes a
lane block of independent hashes — Merkle levels, leaf batches and
commitment chains all map onto it.

Off TPU the kernel runs in interpreter mode (slow, for correctness tests);
use hash/poseidon.py on CPU.

Behavioral contract: identical to the reference Poseidon
(pallet/src/hash/poseidon.rs:162-208, circom side
circuits/utils/poseidon-cipher.circom:164-218).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..ff.limbs import NLIMBS, to_limbs
from ..ff.fp import FR_CTX
from ..ff.pallas_fp import FR_CTX_T
from ..utils.backend import platform
from .grain import poseidon_params, FULL_ROUNDS, PARTIAL_ROUNDS

def _lane_block() -> int:
    """Hashes per grid step. 512 lanes on TPU; tiny in interpreter mode
    (off-TPU correctness tests), where block size only adds padding work."""
    from ..utils.backend import platform

    return 512 if platform() == "tpu" else 8


_FUSED_MAX_T = 8  # 8-bit-split dot stays f32-exact while t*32*255^2 < 2^24


@functools.lru_cache(maxsize=None)
def _mds8_matrix(t: int) -> np.ndarray:
    """Fused MDS-times-column-scatter constant: (t*64, t*32) f32 0..255.

    Row i*64+k, column j*32+b holds byte k-b of the Montgomery form of
    M[i][j], so one matmul against the 8-bit-split state computes the raw
    product columns of every MDS row sum: since multiplication by a
    constant is linear over the state's limbs, the t x t field multiplies
    AND the cross-element accumulation collapse into a single MXU op per
    round, with ONE Montgomery reduction per output element instead of one
    per (i, j) product (t^2 -> t reductions; ~4x fewer matmul FLOPs per
    permutation at t=6). Exactness: every entry < 2^8 and every 8-bit state
    limb < 2^8, so products < 2^16 and each column accumulates at most
    t*32 <= 256 of them < 2^24 — exact in f32 (guarded by _FUSED_MAX_T)."""
    # exactness guards (comment-only bounds would silently corrupt hashes
    # if _FUSED_MAX_T or the limb split ever widened):
    #  - each f32 matmul column accumulates <= t*32 byte-products < 2^24,
    #    so the fused dot is integer-exact in f32
    #  - redc_cols then adds these columns to mn product columns
    #    (<= 32 halves * (2^16-1) each) in uint32; the sum must stay < 2^32
    max_t_col = t * 32 * 255 * 255
    max_mn_col = 32 * ((1 << 16) - 1)
    assert max_t_col < 1 << 24, (t, max_t_col)
    assert max_t_col + max_mn_col < 1 << 32, (t, max_t_col + max_mn_col)
    _, mds = poseidon_params(t)
    m = np.zeros((t * 64, t * 32), dtype=np.float32)
    for i in range(t):
        for j in range(t):
            mont = FR_CTX.to_mont_int(mds[i][j])
            for a in range(32):
                byte = (mont >> (8 * a)) & 0xFF
                if byte == 0:
                    continue
                for b in range(32):
                    k = a + b
                    m[i * 64 + k, j * 32 + b] = byte
    return m


@functools.lru_cache(maxsize=None)
def _extra_subs(t: int) -> int:
    """REDC of a lazily-accumulated t-term sum leaves the result below
    (1 + t*N/R)*N; ceil(t*N/R) conditional subtracts are needed in total,
    the first of which redc_cols always performs."""
    n = FR_CTX.modulus
    r = FR_CTX.R
    return max(0, -(-(t * n) // r) - 1)


@functools.lru_cache(maxsize=None)
def _params_limb_major(t: int):
    """ark (rounds, t, NLIMBS, 1), mds (t, t, NLIMBS, 1) Montgomery-form,
    is_full (rounds, 1, 1, 1) — ready to broadcast over the lane axis."""
    ark, mds = poseidon_params(t)
    r_p = PARTIAL_ROUNDS[t - 2]
    rounds = FULL_ROUNDS + r_p
    half = FULL_ROUNDS // 2
    ark_arr = np.zeros((rounds, t, NLIMBS, 1), dtype=np.uint32)
    for r in range(rounds):
        for i in range(t):
            ark_arr[r, i, :, 0] = to_limbs(FR_CTX.to_mont_int(ark[r * t + i]))
    mds_arr = np.zeros((t, t, NLIMBS, 1), dtype=np.uint32)
    for i in range(t):
        for j in range(t):
            mds_arr[i, j, :, 0] = to_limbs(FR_CTX.to_mont_int(mds[i][j]))
    is_full = np.array(
        [r < half or r >= half + r_p for r in range(rounds)], dtype=np.bool_,
    ).reshape(rounds, 1, 1, 1)
    return ark_arr, mds_arr, is_full


def _perm_body(state, t, F, load_ark, mds_apply, r_p):
    """The permutation on a t-tuple of (NLIMBS, B) blocks, traced inside the
    kernel. F is a bound FpCtxT; load_ark(r, i) -> (NLIMBS, 1) round constant
    (r may be a traced index); mds_apply(parts) -> t-tuple of mixed outputs.

    Three fori_loop phases (full/partial/full) instead of one lax.scan over
    per-round constants: Mosaic cannot lower scans with extensive inputs
    (nor dynamic_slice on values) inside a pallas_call, so constants are
    fetched by indexing their *refs* — dynamic on the round axis, static
    elsewhere — and the state stays a tuple (value integer-indexing would
    also hit dynamic_slice). The static phase split removes the per-element
    full/partial select."""

    def sbox(x):
        x2 = F.mont_sqr(x)
        x4 = F.mont_sqr(x2)
        return F.mont_mul(x4, x)

    def phase(full: bool):
        def round_fn(r, s):
            parts = []
            for i in range(t):
                x = F.add(s[i], jnp.broadcast_to(load_ark(r, i), s[i].shape))
                # partial rounds S-box only element 0 (static per phase)
                parts.append(sbox(x) if (full or i == 0) else x)
            return mds_apply(parts)

        return round_fn

    half = FULL_ROUNDS // 2
    s = jax.lax.fori_loop(0, half, phase(True), state)
    s = jax.lax.fori_loop(half, half + r_p, phase(False), s)
    return jax.lax.fori_loop(half + r_p, half + r_p + half, phase(True), s)


def _mds_apply_fused(F, t, mds8):
    """One-matmul MDS (see _mds8_matrix): split state to 8-bit limbs, one
    exact-f32 dot for all t outputs' raw product columns, t lazy REDCs."""
    extra = _extra_subs(t)

    def apply(parts):
        b = parts[0].shape[-1]
        sp = []
        for p in parts:
            lo = p & jnp.uint32(0xFF)
            hi = p >> 8
            sp.append(jnp.stack([lo, hi], axis=1).reshape(2 * NLIMBS, b))
        sp8 = jnp.concatenate(sp, axis=0).astype(jnp.int32) \
                 .astype(jnp.float32)                       # (t*32, B)
        c8 = jax.lax.dot_general(
            mds8, sp8, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32).astype(jnp.uint32)              # (t*64, B)
        c8r = c8.reshape(t * 2 * NLIMBS, 2, b)
        even = jax.lax.squeeze(
            jax.lax.slice_in_dim(c8r, 0, 1, axis=1), (1,))
        odd = jax.lax.squeeze(
            jax.lax.slice_in_dim(c8r, 1, 2, axis=1), (1,))
        c16 = even + (odd << 8)                             # (t*32, B)
        out = []
        for i in range(t):
            cols = jax.lax.slice_in_dim(
                c16, i * 2 * NLIMBS, (i + 1) * 2 * NLIMBS, axis=0)
            out.append(F.redc_cols(cols, extra_subs=extra))
        return tuple(out)

    return apply


def _mds_apply_looped(F, t, load_mds):
    """t^2 constant mont_muls + adds (widths above _FUSED_MAX_T, where the
    fused dot's f32 accumulation would no longer be exact)."""

    def apply(parts):
        acc = [None] * t
        for i in range(t):
            for j in range(t):
                p = F.mont_mul(
                    jnp.broadcast_to(load_mds(i, j), parts[j].shape),
                    parts[j])
                acc[i] = p if acc[i] is None else F.add(acc[i], p)
        return tuple(acc)

    return apply


def _perm_kernel(t: int, r_p: int):
    fused = t <= _FUSED_MAX_T

    def kernel(state_ref, ark_ref, mds_ref,
               n_ref, nprime_ref, m16_ref, m32_ref, out_ref):
        F = FR_CTX_T.bind(n_ref[:], nprime_ref[:], m16_ref[:], m32_ref[:])
        state = tuple(state_ref[i] for i in range(t))
        if fused:
            mds_apply = _mds_apply_fused(F, t, mds_ref[:])
        else:
            mds_apply = _mds_apply_looped(F, t, lambda i, j: mds_ref[i, j])
        out = _perm_body(state, t, F,
                         lambda r, i: ark_ref[r, i], mds_apply, r_p)
        for i in range(t):
            out_ref[i] = out[i]

    return kernel


@functools.partial(jax.jit, static_argnames=("t", "interpret"))
def _perm_call(state, t: int, interpret: bool):
    """state (t, NLIMBS, B) with B a multiple of the lane block."""
    b = state.shape[2]
    blk = _lane_block()
    grid = b // blk
    ark, mds, _ = _params_limb_major(t)
    if t <= _FUSED_MAX_T:
        mds = _mds8_matrix(t)
    consts = FR_CTX_T.consts()
    operands = (state, ark, mds, *consts)
    in_specs = [pl.BlockSpec((t, NLIMBS, blk), lambda i: (0, 0, i))]
    in_specs += [pl.BlockSpec(o.shape, lambda i, nd=o.ndim: (0,) * nd)
                 for o in operands[1:]]
    return pl.pallas_call(
        _perm_kernel(t, PARTIAL_ROUNDS[t - 2]),
        out_shape=jax.ShapeDtypeStruct((t, NLIMBS, b), jnp.uint32),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t, NLIMBS, blk), lambda i: (0, 0, i)),
        interpret=interpret,
    )(*operands)


def poseidon_perm_pallas(state):
    """Poseidon permutation on (t, B, NLIMBS) Montgomery state (the
    hash/poseidon.py layout); pads the batch to the lane block."""
    t, b, _ = state.shape
    blk = _lane_block()
    bp = max(blk, -(-b // blk) * blk)
    lm = jnp.transpose(state, (0, 2, 1))                      # (t, NLIMBS, B)
    lm = jnp.pad(lm, ((0, 0), (0, 0), (0, bp - b)))
    out = _perm_call(lm, t, platform() != "tpu")
    return jnp.transpose(out, (0, 2, 1))[:, :b]


def poseidon_hash_pallas(inputs):
    """Batched circom Poseidon: (n, B, NLIMBS) Montgomery -> (B, NLIMBS)."""
    n, b = inputs.shape[0], inputs.shape[1]
    zero = jnp.zeros((1, b, NLIMBS), dtype=jnp.uint32)
    state = jnp.concatenate([zero, inputs], axis=0)
    return poseidon_perm_pallas(state)[0]
