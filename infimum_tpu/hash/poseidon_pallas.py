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


def _perm_body(state, t, F, ark, is_full):
    """The permutation on a (t, NLIMBS, B) block; traced inside the kernel.
    F is a bound FpCtxT; ark (rounds, t, NLIMBS, 1), is_full (rounds, 1)."""

    def sbox(x):
        x2 = F.mont_sqr(x)
        x4 = F.mont_sqr(x2)
        return F.mont_mul(x4, x)

    def body(s, xs):
        ark_r, full = xs
        parts = []
        for i in range(t):
            x = F.add(s[i], jnp.broadcast_to(ark_r[i], s[i].shape))
            x5 = sbox(x)
            # partial rounds S-box only element 0
            parts.append(x5 if i == 0 else jnp.where(full[0] != 0, x5, x))
        return jnp.stack(parts), None

    def mds_round(s, ark_r, full):
        parts, _ = body(s, (ark_r, full))
        acc = [None] * t
        mds = F.mds  # (t, t, NLIMBS, 1), bound alongside the field consts
        for i in range(t):
            for j in range(t):
                p = F.mont_mul(
                    jnp.broadcast_to(mds[i, j], parts[j].shape), parts[j])
                acc[i] = p if acc[i] is None else F.add(acc[i], p)
        return jnp.stack(acc)

    def scan_body(s, xs):
        ark_r, full = xs
        return mds_round(s, ark_r, full), None

    out, _ = jax.lax.scan(scan_body, state, (ark, is_full))
    return out


def _perm_kernel(t: int):
    def kernel(state_ref, ark_ref, full_ref, mds_ref,
               n_ref, nprime_ref, m16_ref, m32_ref, out_ref):
        F = FR_CTX_T.bind(n_ref[:], nprime_ref[:], m16_ref[:], m32_ref[:])
        F.mds = mds_ref[:]
        out_ref[:] = _perm_body(state_ref[:], t, F, ark_ref[:], full_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("t", "interpret"))
def _perm_call(state, t: int, interpret: bool):
    """state (t, NLIMBS, B) with B a multiple of the lane block."""
    b = state.shape[2]
    blk = _lane_block()
    grid = b // blk
    ark, mds, is_full = _params_limb_major(t)
    consts = FR_CTX_T.consts()
    operands = (state, ark, is_full.astype(np.uint32).reshape(-1, 1), mds,
                *consts)
    in_specs = [pl.BlockSpec((t, NLIMBS, blk), lambda i: (0, 0, i))]
    in_specs += [pl.BlockSpec(o.shape, lambda i, nd=o.ndim: (0,) * nd)
                 for o in operands[1:]]
    return pl.pallas_call(
        _perm_kernel(t),
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
