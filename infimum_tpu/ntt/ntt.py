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
    """Packed twiddle table + bit-reversal permutation (numpy, Montgomery).

    Twiddles for all stages are packed into ONE (n-1, NLIMBS) array (stage s
    occupies rows [2^(s-1)-1, 2^s-1)) and shipped to the kernels as a runtime
    ARGUMENT — embedding them as closed-over constants made the traced HLO
    carry tens of MB of literals, which multiplied both compile time and
    persistent-cache entry size (a 2^18 H-pipeline graph serialized to 207MB)."""
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
    flat = []
    for s in range(1, logn + 1):
        length = 1 << s
        wlen = pow(w, n // length, FR_MOD)
        tw = [1]
        for _ in range(length // 2 - 1):
            tw.append(tw[-1] * wlen % FR_MOD)
        flat.extend(FR_CTX.to_mont_int(t) for t in tw)
    tw_flat = batch_to_limbs(flat) if flat else np.zeros((0, NLIMBS), np.uint32)
    n_inv = np.asarray(batch_to_limbs([FR_CTX.to_mont_int(fr_inv(n))]))[0]
    return rev, tw_flat, n_inv


@functools.lru_cache(maxsize=None)
def _stage_consts_dev(logn: int, invert: bool):
    """Device-resident copies of _stage_consts (transferred once)."""
    rev, tw_flat, n_inv = _stage_consts(logn, invert)
    return jnp.asarray(rev), jnp.asarray(tw_flat), jnp.asarray(n_inv)


def _ntt_core(a, logn: int, invert: bool, rev=None, tw_flat=None, n_inv=None):
    """Iterative DIT NTT; rev/tw_flat/n_inv are runtime arrays (fetched from
    the device-side cache when not passed; explicit args let callers thread
    them through jit).

    Two lowerings, chosen at trace time by platform:
      - TPU: stages unrolled (reshape/concat butterflies — pure vector work
        that Mosaic/XLA pipelines well; the compile is paid once and cached).
      - CPU: ONE traced stage inside fori_loop with dynamic pair indices and
        a scatter. XLA:CPU compile time of the unrolled form (logn inlined
        mont_mul graphs) dominated the whole test suite; the loop form
        compiles ~20x faster and throughput on CPU is irrelevant.
    """
    n = 1 << logn
    if rev is None:
        rev, tw_flat, n_inv = _stage_consts_dev(logn, invert)
    from ..utils.backend import platform

    a = a[rev]
    if platform() == "tpu":
        for s in range(1, logn + 1):
            length = 1 << s
            half = length // 2
            tw = jax.lax.slice_in_dim(tw_flat, half - 1, length - 1)
            blocks = a.reshape(n // length, length, NLIMBS)
            even = blocks[:, :half]
            odd = blocks[:, half:]
            v = FR_CTX.mont_mul(odd, tw[None, :, :])
            a = jnp.concatenate(
                [FR_CTX.add(even, v), FR_CTX.sub(even, v)], axis=1
            ).reshape(n, NLIMBS)
    elif n > 1:
        j = jnp.arange(n // 2, dtype=jnp.int32)

        def stage(s0, a):
            half = jnp.int32(1) << s0
            # pair j -> (lower, upper): insert a 0 bit at position s0
            lower = ((j >> s0) << (s0 + 1)) | (j & (half - 1))
            upper = lower | half
            u = jnp.take(a, lower, axis=0)
            t = jnp.take(a, upper, axis=0)
            w = jnp.take(tw_flat, (half - 1) + (j & (half - 1)), axis=0)
            v = FR_CTX.mont_mul(t, w)
            idx = jnp.concatenate([lower, upper])
            vals = jnp.concatenate([FR_CTX.add(u, v), FR_CTX.sub(u, v)])
            return a.at[idx].set(vals, unique_indices=True)

        a = jax.lax.fori_loop(0, logn, stage, a)
    if invert:
        a = FR_CTX.mont_mul(a, n_inv[None, :])
    return a


@functools.partial(jax.jit, static_argnames=("logn", "invert"))
def _ntt_device_jit(a, rev, tw_flat, n_inv, logn: int, invert: bool):
    return _ntt_core(a, logn, invert, rev, tw_flat, n_inv)


def ntt_device(a, logn: int, invert: bool = False):
    """NTT of (N, NLIMBS) Montgomery-form coefficients, N = 2^logn."""
    rev, tw_flat, n_inv = _stage_consts_dev(logn, invert)
    return _ntt_device_jit(a, rev, tw_flat, n_inv, logn, invert)


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


@functools.lru_cache(maxsize=None)
def _coset_consts_dev(logn: int, g: int, invert: bool):
    return jnp.asarray(_coset_consts(logn, g, invert))


@functools.partial(jax.jit, static_argnames=("logn",))
def _coset_ntt_jit(a, cosets, rev, tw_flat, n_inv, logn: int):
    scaled = FR_CTX.mont_mul(a, cosets)
    return _ntt_core(scaled, logn, False, rev, tw_flat, n_inv)


def coset_ntt_device(a, logn: int, g: int):
    """Evaluate on the coset g*<w>: NTT(a_i * g^i)."""
    rev, tw_flat, n_inv = _stage_consts_dev(logn, False)
    return _coset_ntt_jit(a, _coset_consts_dev(logn, g, False),
                          rev, tw_flat, n_inv, logn)


@functools.partial(jax.jit, static_argnames=("logn",))
def _coset_intt_jit(a, cosets, rev, tw_flat, n_inv, logn: int):
    coeffs = _ntt_core(a, logn, True, rev, tw_flat, n_inv)
    return FR_CTX.mont_mul(coeffs, cosets)


def coset_intt_device(a, logn: int, g: int):
    """Inverse of coset_ntt_device."""
    rev, tw_flat, n_inv = _stage_consts_dev(logn, True)
    return _coset_intt_jit(a, _coset_consts_dev(logn, g, True),
                           rev, tw_flat, n_inv, logn)
