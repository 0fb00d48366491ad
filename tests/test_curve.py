"""BN254 group laws and pairing bilinearity."""

import pytest

from infimum_tpu.ff.bn254 import FR_MOD
from infimum_tpu.curve.bn254_host import (
    G1_GEN, G2_GEN,
    g1_add, g1_double, g1_mul, g1_neg, g1_is_on_curve,
    g2_add, g2_double, g2_mul, g2_neg, g2_is_on_curve,
)
from infimum_tpu.curve.pairing import pairing, miller_loop, final_exponentiate, FQ12


def test_g1_group_law():
    assert g1_is_on_curve(G1_GEN)
    p2 = g1_double(G1_GEN)
    assert g1_is_on_curve(p2)
    assert g1_add(G1_GEN, G1_GEN) == p2
    assert g1_mul(G1_GEN, 2) == p2
    assert g1_add(p2, g1_neg(G1_GEN)) == G1_GEN
    # order
    assert g1_mul(G1_GEN, FR_MOD) is None
    # associativity sample
    a, b = g1_mul(G1_GEN, 5), g1_mul(G1_GEN, 7)
    assert g1_add(a, b) == g1_mul(G1_GEN, 12)


def test_g2_group_law():
    assert g2_is_on_curve(G2_GEN)
    p2 = g2_double(G2_GEN)
    assert g2_is_on_curve(p2)
    assert g2_mul(G2_GEN, 2) == p2
    assert g2_mul(G2_GEN, FR_MOD) is None
    a, b = g2_mul(G2_GEN, 11), g2_mul(G2_GEN, 31)
    assert g2_add(a, b) == g2_mul(G2_GEN, 42)


@pytest.mark.slow
def test_pairing_bilinearity():
    e = pairing(G1_GEN, G2_GEN)
    assert e != FQ12.one()
    # e(2P, Q) == e(P, Q)^2 == e(P, 2Q)
    e2a = pairing(g1_mul(G1_GEN, 2), G2_GEN)
    assert e2a == e * e
    e2b = pairing(G1_GEN, g2_mul(G2_GEN, 2))
    assert e2b == e * e
    # e(aP, bQ) == e(P, Q)^(ab)
    eab = pairing(g1_mul(G1_GEN, 3), g2_mul(G2_GEN, 5))
    assert eab == e ** 15


@pytest.mark.slow
def test_pairing_nondegenerate_order():
    e = pairing(G1_GEN, G2_GEN)
    assert e ** FR_MOD == FQ12.one()
