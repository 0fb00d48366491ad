"""snarkjs artifact interop: .wtns/.r1cs/.zkey binary roundtrips and proving
from an ingested zkey (SURVEY.md §7 io layer; reference ceremony flow
circuits/README.md:10-33, prover contract cli/src/utils.ts:69-92)."""

import random

import pytest

from infimum_tpu.ff.bn254 import FR_MOD
from infimum_tpu.groth16.r1cs import ConstraintSystem, LC
from infimum_tpu.groth16.groth16 import verify
from infimum_tpu.groth16.zkey import generate_zkey, prove_zkey, vk_from_zkey
from infimum_tpu.io.snarkjs import (
    read_r1cs, read_wtns, read_zkey, write_r1cs, write_wtns, write_zkey,
)

P = FR_MOD


def _toy_circuit():
    cs = ConstraintSystem()
    prod = cs.alloc_public()
    total = cs.alloc_public()
    x = cs.alloc()
    y = cs.alloc()
    cs.enforce(LC.var(x), LC.var(y), LC.var(prod))
    cs.enforce_zero(LC.var(x) + LC.var(y) - LC.var(total))
    cs.num2bits(LC.var(x), 4)
    return cs, {prod: 21, total: 10, x: 3, y: 7}


def test_wtns_roundtrip():
    rng = random.Random(1)
    w = [1] + [rng.randrange(P) for _ in range(37)]
    assert read_wtns(write_wtns(w)) == w


def test_r1cs_roundtrip():
    cs, inputs = _toy_circuit()
    f = read_r1cs(write_r1cs(cs, n_outputs=1))
    assert f.n_vars == cs.num_vars
    assert f.n_public == cs.num_public
    assert f.n_outputs == 1 and f.n_pub_inputs == 1
    assert len(f.constraints) == len(cs.constraints)
    cs2 = f.to_constraint_system()
    w = cs.compute_witness(inputs)
    assert cs2.check(w)
    # corrupt the witness: constraints must reject
    bad = list(w)
    bad[3] = (bad[3] + 1) % P
    assert not cs2.check(bad)


def test_zkey_binary_roundtrip():
    rng = random.Random(2)
    cs, _ = _toy_circuit()
    zk = generate_zkey(cs, rng)
    zk2 = read_zkey(write_zkey(zk))
    assert zk2.n_vars == zk.n_vars
    assert zk2.n_public == zk.n_public
    assert zk2.domain_size == zk.domain_size
    assert zk2.alpha_g1 == zk.alpha_g1
    assert zk2.beta_g2 == zk.beta_g2
    assert zk2.ic == zk.ic
    assert zk2.coeffs == zk.coeffs
    assert zk2.a_query == zk.a_query
    assert zk2.b1_query == zk.b1_query
    assert zk2.b2_query == zk.b2_query
    assert zk2.c_query == zk.c_query
    assert zk2.h_query == zk.h_query


@pytest.mark.slow
def test_prove_from_ingested_zkey():
    """Setup -> serialize zkey -> reingest -> prove -> verify under the
    zkey's own vkey; wrong publics and a corrupted witness must fail."""
    rng = random.Random(3)
    cs, inputs = _toy_circuit()
    zk = read_zkey(write_zkey(generate_zkey(cs, rng)))
    w = cs.compute_witness(inputs)
    assert cs.check(w)
    proof = prove_zkey(zk, w, rng)
    vk = vk_from_zkey(zk)
    assert verify(vk, proof, [21, 10])
    assert not verify(vk, proof, [22, 10])
