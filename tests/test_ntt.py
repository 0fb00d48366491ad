"""NTT/iNTT: host reference vs naive evaluation, device vs host, coset rounds."""

import numpy as np
import jax.numpy as jnp
import pytest

from infimum_tpu.ff.bn254 import FR_MOD, fr_pow
from infimum_tpu.ff.fp import FR_CTX
from infimum_tpu.ntt import (
    ntt_host, intt_host, ntt_device, intt_device,
    coset_ntt_device, coset_intt_device,
)
from infimum_tpu.ntt.ntt import _root_of_unity


def test_host_ntt_matches_naive_eval(rng):
    n = 8
    coeffs = [rng.randrange(FR_MOD) for _ in range(n)]
    w = _root_of_unity(n)
    evals = ntt_host(coeffs)
    for i in range(n):
        x = fr_pow(w, i)
        want = sum(c * fr_pow(x, j) for j, c in enumerate(coeffs)) % FR_MOD
        assert evals[i] == want


def test_host_roundtrip(rng):
    n = 64
    coeffs = [rng.randrange(FR_MOD) for _ in range(n)]
    assert intt_host(ntt_host(coeffs)) == coeffs


@pytest.mark.parametrize("logn", [4, 8, 10])
def test_device_matches_host(rng, logn):
    n = 1 << logn
    coeffs = [rng.randrange(FR_MOD) for _ in range(n)]
    a = jnp.asarray(FR_CTX.encode(coeffs))
    got = FR_CTX.decode(ntt_device(a, logn))
    assert got == ntt_host(coeffs)
    back = FR_CTX.decode(intt_device(ntt_device(a, logn), logn))
    assert back == coeffs


def test_coset_roundtrip_and_semantics(rng):
    logn, g = 5, 5
    n = 1 << logn
    coeffs = [rng.randrange(FR_MOD) for _ in range(n)]
    a = jnp.asarray(FR_CTX.encode(coeffs))
    evals = FR_CTX.decode(coset_ntt_device(a, logn, g))
    w = _root_of_unity(n)
    for i in [0, 1, n - 1]:
        x = g * fr_pow(w, i) % FR_MOD
        want = sum(c * fr_pow(x, j) for j, c in enumerate(coeffs)) % FR_MOD
        assert evals[i] == want
    back = FR_CTX.decode(
        coset_intt_device(jnp.asarray(FR_CTX.encode(evals)), logn, g)
    )
    assert back == coeffs
