"""Pallas kernel correctness: limb-major field ops and the fused Poseidon
permutation against the host reference (interpret mode off-TPU)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from infimum_tpu.ff.bn254 import FR_MOD
from infimum_tpu.ff.fp import FR_CTX
from infimum_tpu.ff.limbs import NLIMBS, batch_to_limbs, batch_from_limbs
from infimum_tpu.ff.pallas_fp import FR_CTX_T
from infimum_tpu.hash.poseidon_host import poseidon
from infimum_tpu.hash.poseidon_pallas import poseidon_hash_pallas


@pytest.fixture
def rng():
    return random.Random(20260818)


def _enc_T(xs):
    """ints -> (NLIMBS, B) Montgomery limb-major."""
    return jnp.asarray(FR_CTX.encode(xs)).T


def _dec_T(a):
    return FR_CTX.decode(np.asarray(a).T)


def test_limb_major_mul_add_sub(rng):
    n = 64
    xs = [rng.randrange(FR_MOD) for _ in range(n)]
    ys = [rng.randrange(FR_MOD) for _ in range(n)]
    xs[0], ys[0] = 0, 0
    xs[1], ys[1] = FR_MOD - 1, FR_MOD - 1
    a, b = _enc_T(xs), _enc_T(ys)
    assert _dec_T(FR_CTX_T.mont_mul(a, b)) == [
        (x * y) % FR_MOD for x, y in zip(xs, ys)]
    assert _dec_T(FR_CTX_T.add(a, b)) == [
        (x + y) % FR_MOD for x, y in zip(xs, ys)]
    assert _dec_T(FR_CTX_T.sub(a, b)) == [
        (x - y) % FR_MOD for x, y in zip(xs, ys)]


@pytest.mark.parametrize("n_inputs", [1, 2, 4, 5])
def test_poseidon_pallas_matches_host(rng, n_inputs):
    b = 8
    cols = [[rng.randrange(FR_MOD) for _ in range(b)] for _ in range(n_inputs)]
    enc = jnp.asarray(np.stack([FR_CTX.encode(c) for c in cols]))
    out = FR_CTX.decode(poseidon_hash_pallas(enc))
    want = [poseidon([cols[i][k] for i in range(n_inputs)]) for k in range(b)]
    assert out == want


@pytest.mark.slow
def test_poseidon_pallas_nonfused_width(rng):
    # t=9: the first width above _FUSED_MAX_T, exercising the non-fused
    # constant-MDS branch (same code path as the widest t=13 instantiation;
    # interpret-mode cost scales ~t^2 per round and t=13 alone costs >16
    # minutes on a 2-core host, so the narrowest non-fused width is tested)
    cols = [[rng.randrange(FR_MOD)] for _ in range(8)]
    enc = jnp.asarray(np.stack([FR_CTX.encode(c) for c in cols]))
    out = FR_CTX.decode(poseidon_hash_pallas(enc))
    assert out == [poseidon([c[0] for c in cols])]
