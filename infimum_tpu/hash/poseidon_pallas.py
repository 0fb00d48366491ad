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


def _perm_body(state, t, F, load_ark, load_mds, r_p):
    """The permutation on a t-tuple of (NLIMBS, B) blocks, traced inside the
    kernel. F is a bound FpCtxT; load_ark(r, i) -> (NLIMBS, 1) round constant
    (r may be a traced index), load_mds(i, j) -> (NLIMBS, 1).

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
            acc = [None] * t
            for i in range(t):
                for j in range(t):
                    p = F.mont_mul(
                        jnp.broadcast_to(load_mds(i, j), parts[j].shape),
                        parts[j])
                    acc[i] = p if acc[i] is None else F.add(acc[i], p)
            return tuple(acc)

        return round_fn

    half = FULL_ROUNDS // 2
    s = jax.lax.fori_loop(0, half, phase(True), state)
    s = jax.lax.fori_loop(half, half + r_p, phase(False), s)
    return jax.lax.fori_loop(half + r_p, half + r_p + half, phase(True), s)


def _perm_kernel(t: int, r_p: int):
    def kernel(state_ref, ark_ref, mds_ref,
               n_ref, nprime_ref, m16_ref, m32_ref, out_ref):
        F = FR_CTX_T.bind(n_ref[:], nprime_ref[:], m16_ref[:], m32_ref[:])
        state = tuple(state_ref[i] for i in range(t))
        out = _perm_body(state, t, F,
                         lambda r, i: ark_ref[r, i],
                         lambda i, j: mds_ref[i, j], r_p)
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
