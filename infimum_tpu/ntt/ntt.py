"""Radix-2 NTT / iNTT over BN254 Fr, host reference + batched device kernel.

This is the QAP evaluation/interpolation engine of the prover — the replacement
for snarkjs's JS/WASM FFT inside groth16.fullProve (reference:
cli/src/utils.ts:69-92). Fr has 2-adicity 28, so power-of-two domains up to 2^28.

Device form: iterative Cooley-Tukey (decimation in time) on (N, NLIMBS) uint32
Montgomery-form arrays. A bit-reversal gather up front, then log2(N) butterfly
stages; each stage is one reshape + one batched field mul + add/sub — pure
vector work that XLA fuses per stage. Twiddles are precomputed per stage on the
host and closed over as constants.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ff.bn254 import FR_MOD, FR_TWO_ADICITY, FR_TWO_ADIC_ROOT, fr_inv
from ..ff.fp import FR_CTX
from ..ff.limbs import NLIMBS, batch_to_limbs


def _root_of_unity(n: int) -> int:
    """Primitive n-th root of unity in Fr (n a power of two <= 2^28)."""
    logn = n.bit_length() - 1
    assert 1 << logn == n and logn <= FR_TWO_ADICITY
    w = FR_TWO_ADIC_ROOT
    for _ in range(FR_TWO_ADICITY - logn):
        w = w * w % FR_MOD
    return w


# -- host reference -----------------------------------------------------------

def ntt_host(coeffs: list[int], invert: bool = False) -> list[int]:
    """In-order DIT NTT: out[i] = sum_j a_j w^(ij) (or inverse with 1/n scale)."""
    n = len(coeffs)
    a = [c % FR_MOD for c in coeffs]
    w = _root_of_unity(n)
    if invert:
        w = fr_inv(w)
    # bit reversal
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    length = 2
    while length <= n:
        wlen = pow(w, n // length, FR_MOD)
        for i in range(0, n, length):
            wn = 1
            for k in range(length // 2):
                u = a[i + k]
                v = a[i + k + length // 2] * wn % FR_MOD
                a[i + k] = (u + v) % FR_MOD
                a[i + k + length // 2] = (u - v) % FR_MOD
                wn = wn * wlen % FR_MOD
        length <<= 1
    if invert:
        n_inv = fr_inv(n)
        a = [x * n_inv % FR_MOD for x in a]
    return a


def intt_host(evals: list[int]) -> list[int]:
    return ntt_host(evals, invert=True)


# -- device kernel ------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _stage_consts(logn: int, invert: bool):
    """Per-stage twiddle tables (numpy, Montgomery) + bit-reversal permutation."""
    n = 1 << logn
    w = _root_of_unity(n)
    if invert:
        w = fr_inv(w)
    rev = np.zeros(n, dtype=np.int32)
    for i in range(n):
        r = 0
        x = i
        for _ in range(logn):
            r = (r << 1) | (x & 1)
            x >>= 1
        rev[i] = r
    twiddles = []
    for s in range(1, logn + 1):
        length = 1 << s
        wlen = pow(w, n // length, FR_MOD)
        tw = [1]
        for _ in range(length // 2 - 1):
            tw.append(tw[-1] * wlen % FR_MOD)
        twiddles.append(
            batch_to_limbs([FR_CTX.to_mont_int(t) for t in tw])
        )  # (length/2, NLIMBS)
    n_inv = np.asarray(batch_to_limbs([FR_CTX.to_mont_int(fr_inv(n))]))[0]
    return rev, twiddles, n_inv


def _ntt_core(a, logn: int, invert: bool):
    n = 1 << logn
    rev, twiddles, n_inv = _stage_consts(logn, invert)
    a = a[rev]
    for s in range(1, logn + 1):
        length = 1 << s
        half = length // 2
        tw = twiddles[s - 1]  # (half, NLIMBS)
        blocks = a.reshape(n // length, length, NLIMBS)
        even = blocks[:, :half]
        odd = blocks[:, half:]
        v = FR_CTX.mont_mul(odd, tw[None, :, :])
        new_even = FR_CTX.add(even, v)
        new_odd = FR_CTX.sub(even, v)
        a = jnp.concatenate([new_even, new_odd], axis=1).reshape(n, NLIMBS)
    if invert:
        a = FR_CTX.mont_mul(a, n_inv[None, :])
    return a


@functools.partial(jax.jit, static_argnames=("logn", "invert"))
def ntt_device(a, logn: int, invert: bool = False):
    """NTT of (N, NLIMBS) Montgomery-form coefficients, N = 2^logn."""
    return _ntt_core(a, logn, invert)


def intt_device(a, logn: int):
    return ntt_device(a, logn, invert=True)


@functools.lru_cache(maxsize=None)
def _coset_consts(logn: int, g: int, invert: bool):
    """Powers g^i (or inverse powers with 1/n folded out) as Montgomery limbs."""
    n = 1 << logn
    gg = fr_inv(g) if invert else g
    pows = [1]
    for _ in range(n - 1):
        pows.append(pows[-1] * gg % FR_MOD)
    return batch_to_limbs([FR_CTX.to_mont_int(p) for p in pows])


@functools.partial(jax.jit, static_argnames=("logn", "g"))
def coset_ntt_device(a, logn: int, g: int):
    """Evaluate on the coset g*<w>: NTT(a_i * g^i)."""
    scaled = FR_CTX.mont_mul(a, jnp.asarray(_coset_consts(logn, g, False)))
    return _ntt_core(scaled, logn, False)


@functools.partial(jax.jit, static_argnames=("logn", "g"))
def coset_intt_device(a, logn: int, g: int):
    """Inverse of coset_ntt_device."""
    coeffs = _ntt_core(a, logn, True)
    return FR_CTX.mont_mul(coeffs, jnp.asarray(_coset_consts(logn, g, True)))
