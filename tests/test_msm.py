"""Device complete-projective G1/G2 ops and Pippenger MSM vs host ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from infimum_tpu.ff.bn254 import FR_MOD
from infimum_tpu.curve.bn254_host import (
    G1_GEN, G2_GEN, g1_add, g1_mul, g2_add, g2_mul,
)
from infimum_tpu.curve.proj import G1_DEV, G2_DEV
from infimum_tpu.msm.pippenger import msm_host, msm_device


def _enc1(curve, pt):
    x, y = jnp.asarray(curve.encode_affine([pt]))[0]
    return (x, y, curve.one((1,))[0])


@pytest.mark.parametrize("curve,gen,add,mul", [
    (G1_DEV, G1_GEN, g1_add, g1_mul),
    (G2_DEV, G2_GEN, g2_add, g2_mul),
])
def test_proj_complete_add(curve, gen, add, mul):
    p = mul(gen, 5)
    q = mul(gen, 11)
    assert curve.decode_one(curve.add(_enc1(curve, p), _enc1(curve, q))) == mul(gen, 16)
    # doubling through the same complete formula
    assert curve.decode_one(curve.add(_enc1(curve, p), _enc1(curve, p))) == mul(gen, 10)
    # cancellation P + (-P) = infinity
    assert curve.decode_one(curve.add(_enc1(curve, p), curve.neg(_enc1(curve, p)))) is None
    # infinity absorbs on both sides
    inf = curve.infinity()
    assert curve.decode_one(curve.add(_enc1(curve, p), inf)) == p
    assert curve.decode_one(curve.add(inf, _enc1(curve, q))) == q
    # mixed addition, including acc = infinity
    xy = (_enc1(curve, q)[0], _enc1(curve, q)[1])
    assert curve.decode_one(curve.add_mixed(_enc1(curve, p), xy)) == mul(gen, 16)
    assert curve.decode_one(curve.add_mixed(inf, xy)) == q


@pytest.mark.parametrize("n", [1, 2, 64, 100])
def test_msm_matches_host(rng, n):
    points = [g1_mul(G1_GEN, rng.randrange(1, FR_MOD)) for _ in range(n)]
    scalars = [rng.randrange(0, FR_MOD) for _ in range(n)]
    scalars[0] = 0  # zero-scalar edge
    want = msm_host(points, scalars)
    got = msm_device(points, scalars, lanes=8)
    assert got == want


def test_msm_all_zero_scalars():
    points = [G1_GEN, g1_mul(G1_GEN, 2)]
    assert msm_device(points, [0, 0], lanes=2) is None


def test_msm_duplicate_points(rng):
    # many equal points force doubling lanes inside the scan
    points = [G1_GEN] * 32
    scalars = [rng.randrange(0, 2**16) for _ in range(32)]
    want = g1_mul(G1_GEN, sum(scalars) % FR_MOD)
    assert msm_device(points, scalars, lanes=4) == want


def test_msm_g2_matches_host(rng):
    # the prover's helper routes small inputs to the host Pippenger
    # (utils/backend.py thresholds); check it against the naive host sum
    from infimum_tpu.groth16.groth16 import _msm
    from infimum_tpu.curve.bn254_host import g2_mul_fast

    n = 16
    points = [g2_mul_fast(G2_GEN, rng.randrange(1, FR_MOD)) for _ in range(n)]
    scalars = [rng.randrange(0, FR_MOD) for _ in range(n)]
    acc = None
    for p, s in zip(points, scalars):
        acc = g2_add(acc, g2_mul_fast(p, s))
    got = _msm(points, scalars, curve=G2_DEV)
    assert got == acc


def test_host_pippenger_and_fixed_base(rng):
    from infimum_tpu.curve.bn254_host import (
        msm_host_fast, fixed_base_mul_host, g2_mul_fast,
    )

    n = 24
    points = [g1_mul(G1_GEN, rng.randrange(1, FR_MOD)) for _ in range(n)]
    scalars = [rng.randrange(0, FR_MOD) for _ in range(n)]
    scalars[3] = 0
    assert msm_host_fast(points, scalars) == msm_host(points, scalars)
    assert msm_host_fast(points, [0] * n) is None
    sc = [0, 1, 2, rng.randrange(FR_MOD)]
    assert fixed_base_mul_host(sc) == [
        None if s == 0 else g1_mul(G1_GEN, s) for s in sc]
    assert fixed_base_mul_host(sc, "g2") == [
        None if s == 0 else g2_mul_fast(G2_GEN, s) for s in sc]
