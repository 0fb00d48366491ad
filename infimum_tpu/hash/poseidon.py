"""Batched circom-Poseidon as a JAX/XLA device kernel.

The reference hashes one leaf at a time on-chain (pallet/src/hash/poseidon.rs);
here hashing is vectorized over a batch axis so Merkle-tree construction, witness
generation and commitment chains can hash 10^4-10^6 leaves per dispatch. State
layout is (t, B, NLIMBS) uint32 in Montgomery form: the limb products vectorize
over the B lanes on the TPU VPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ff.fp import FR_CTX
from ..ff.limbs import NLIMBS, to_limbs
from .grain import poseidon_params, FULL_ROUNDS, PARTIAL_ROUNDS


@functools.lru_cache(maxsize=None)
def _device_params(t: int):
    """ark (rounds, t, NLIMBS), mds (t, t, NLIMBS) Montgomery form, full-round mask."""
    ark, mds = poseidon_params(t)
    r_p = PARTIAL_ROUNDS[t - 2]
    rounds = FULL_ROUNDS + r_p
    half = FULL_ROUNDS // 2
    ark_arr = np.zeros((rounds, t, NLIMBS), dtype=np.uint32)
    for r in range(rounds):
        for i in range(t):
            ark_arr[r, i] = to_limbs(FR_CTX.to_mont_int(ark[r * t + i]))
    mds_arr = np.zeros((t, t, NLIMBS), dtype=np.uint32)
    for i in range(t):
        for j in range(t):
            mds_arr[i, j] = to_limbs(FR_CTX.to_mont_int(mds[i][j]))
    full_mask = np.array(
        [1 if (r < half or r >= half + r_p) else 0 for r in range(rounds)],
        dtype=np.bool_,
    )
    # numpy (not jnp) so the lru_cache never captures tracers from a jit scope
    return ark_arr, mds_arr, full_mask


def _sbox(x):
    x2 = FR_CTX.mont_sqr(x)
    x4 = FR_CTX.mont_sqr(x2)
    return FR_CTX.mont_mul(x4, x)


def poseidon_perm_device(state):
    """Poseidon permutation on (t, B, NLIMBS) Montgomery-form state.

    One lax.scan over the rounds keeps the traced graph small; the partial-round
    S-box is realized by computing the full S-box and masking, which costs a few
    extra muls per round but keeps the scan body branch-free.
    """
    t = state.shape[0]
    ark, mds, full_mask = _device_params(t)

    def body(s, xs):
        ark_r, is_full = xs
        s = FR_CTX.add(s, ark_r[:, None, :])
        sboxed = _sbox(s)
        partial = jnp.concatenate([sboxed[:1], s[1:]], axis=0)
        s = jnp.where(is_full, sboxed, partial)
        # MDS: new[i] = sum_j M[i][j] * s[j]
        prods = FR_CTX.mont_mul(mds[:, :, None, :], s[None, :, :, :])
        acc = prods[:, 0]
        for j in range(1, t):
            acc = FR_CTX.add(acc, prods[:, j])
        return acc, None

    state, _ = jax.lax.scan(body, state, (ark, full_mask))
    return state


def poseidon_hash_device(inputs):
    """Batched circom Poseidon: inputs (n, B, NLIMBS) Montgomery form -> (B, NLIMBS).

    n is the arity (t = n+1, domain tag 0); output stays in Montgomery form.
    """
    n, b = inputs.shape[0], inputs.shape[1]
    zero = jnp.zeros((1, b, NLIMBS), dtype=jnp.uint32)
    state = jnp.concatenate([zero, inputs], axis=0)
    return poseidon_perm_device(state)[0]


@functools.partial(jax.jit, static_argnames=("arity",))
def merkle_level_device(nodes, arity: int):
    """One Merkle level: (K*arity, NLIMBS) Montgomery nodes -> (K, NLIMBS) parents."""
    k = nodes.shape[0] // arity
    grouped = nodes.reshape(k, arity, NLIMBS).transpose(1, 0, 2)
    return poseidon_hash_device(grouped)


# -- host-facing batch helper -------------------------------------------------

def poseidon_batch(columns: list[list[int]]) -> list[int]:
    """Hash B independent n-input tuples: columns[i] is the list of i-th inputs.

    Returns plain ints. Encodes to Montgomery, dispatches one jit call.
    """
    n = len(columns)
    enc = jnp.asarray(
        np.stack([FR_CTX.encode(col) for col in columns])
    )  # (n, B, NLIMBS)
    out = _jit_hash(enc)
    return FR_CTX.decode(out)


@jax.jit
def _jit_hash(enc):
    return poseidon_hash_device(enc)
