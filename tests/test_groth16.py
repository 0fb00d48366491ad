"""Groth16 end-to-end on toy circuits: setup -> TPU prove -> pairing verify.

Mirrors the proving/verification contract of the reference: snarkjs
groth16.fullProve (cli/src/utils.ts:69-92) and the pallet's arkworks
verifier (pallet/src/lib.rs:815-827)."""

import random

import pytest

from infimum_tpu.ff.bn254 import FR_MOD
from infimum_tpu.groth16.r1cs import ConstraintSystem, LC
from infimum_tpu.groth16.groth16 import setup, prove, verify, compute_h

P = FR_MOD


def _toy_circuit():
    """Prove knowledge of x, y with x*y = prod and x + y = total (publics)."""
    cs = ConstraintSystem()
    prod = cs.alloc_public()
    total = cs.alloc_public()
    x = cs.alloc()
    y = cs.alloc()
    cs.enforce(LC.var(x), LC.var(y), LC.var(prod))
    cs.enforce_zero(LC.var(x) + LC.var(y) - LC.var(total))
    return cs, prod, total, x, y


def _cubic_circuit():
    """x^3 + x + 5 = out (the classic example), with a bit decomposition."""
    cs = ConstraintSystem()
    out = cs.alloc_public()
    x = cs.alloc()
    x2 = cs.mul(LC.var(x), LC.var(x))
    x3 = cs.mul(x2, LC.var(x))
    cs.enforce_zero(x3 + LC.var(x) + LC.const(5) - LC.var(out))
    cs.num2bits(LC.var(x), 8)
    return cs, out, x


def test_witness_and_qap():
    cs, prod, total, x, y = _toy_circuit()
    w = cs.compute_witness({prod: 21, total: 10, x: 3, y: 7})
    assert cs.check(w)
    h = compute_h(cs, w)
    assert len(h) >= 1


@pytest.mark.slow
def test_groth16_roundtrip_toy():
    rng = random.Random(42)
    cs, prod, total, x, y = _toy_circuit()
    pk = setup(cs, rng)
    w = cs.compute_witness({prod: 21, total: 10, x: 3, y: 7})
    assert cs.check(w)
    proof = prove(pk, cs, w, rng)
    assert verify(pk.vk, proof, [21, 10])
    # wrong public input rejected
    assert not verify(pk.vk, proof, [22, 10])
    assert not verify(pk.vk, proof, [21, 11])


@pytest.mark.slow
def test_groth16_roundtrip_cubic():
    rng = random.Random(7)
    cs, out, x = _cubic_circuit()
    pk = setup(cs, rng)
    xv = 47
    w = cs.compute_witness({out: (xv**3 + xv + 5) % P, x: xv})
    assert cs.check(w)
    proof = prove(pk, cs, w, rng)
    assert verify(pk.vk, proof, [(xv**3 + xv + 5) % P])
    assert not verify(pk.vk, proof, [(xv**3 + xv + 6) % P])


@pytest.mark.slow
def test_tampered_proof_rejected():
    rng = random.Random(3)
    cs, prod, total, x, y = _toy_circuit()
    pk = setup(cs, rng)
    w = cs.compute_witness({prod: 55, total: 16, x: 5, y: 11})
    proof = prove(pk, cs, w, rng)
    from infimum_tpu.groth16.groth16 import Proof
    from infimum_tpu.curve.bn254_host import g1_add, G1_GEN

    bad = Proof(a=g1_add(proof.a, G1_GEN), b=proof.b, c=proof.c)
    assert not verify(pk.vk, bad, [55, 16])


def test_compute_h_host_matches_device():
    """compute_h_host (the large-domain CPU fallback) is bit-exact vs the
    device NTT pipeline on the same witness."""
    from infimum_tpu.groth16.groth16 import compute_h_host

    cs, prod, total, x, y = _toy_circuit()
    cs.num2bits(LC.var(x), 8)         # widen the domain a little
    w = cs.compute_witness({prod: 21, total: 10, x: 3, y: 7})
    assert compute_h_host(cs, w) == compute_h(cs, w)
