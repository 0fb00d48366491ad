"""Proving-key disk cache (groth16/pkcache.py): byte-exact persistence, rng
alignment between hit and miss, and proofs from a loaded key.

The behavioral anchor is the reference's persisted-zkey workflow: snarkjs
writes the proving key once (circuits/README.md:10-33) and every proving run
loads it (cli/src/user/coordinator.ts:12-23) — setup is never recomputed."""

import random

from infimum_tpu.ff.bn254 import FR_MOD
from infimum_tpu.groth16.r1cs import ConstraintSystem, LC
from infimum_tpu.groth16.groth16 import setup, prove, verify
from infimum_tpu.groth16.pkcache import (
    circuit_fingerprint, load_pk, save_pk, setup_cached,
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
    return cs, prod, total, x, y


def _pk_equal(a, b):
    assert a.alpha_g1 == b.alpha_g1
    assert a.beta_g1 == b.beta_g1
    assert a.beta_g2 == b.beta_g2
    assert a.delta_g1 == b.delta_g1
    assert a.delta_g2 == b.delta_g2
    assert a.a_query == b.a_query
    assert a.b_g1_query == b.b_g1_query
    assert a.b_g2_query == b.b_g2_query
    assert a.l_query == b.l_query
    assert a.h_query == b.h_query
    assert a.vk.alpha_g1 == b.vk.alpha_g1
    assert a.vk.gamma_g2 == b.vk.gamma_g2
    assert a.vk.ic == b.vk.ic


def test_save_load_roundtrip(tmp_path):
    cs, *_ = _toy_circuit()
    pk = setup(cs, random.Random(42))
    path = str(tmp_path / "pk.npz")
    save_pk(pk, path)
    _pk_equal(load_pk(path), pk)


def test_setup_cached_hit_matches_miss(tmp_path):
    cs, prod, total, x, y = _toy_circuit()
    d = str(tmp_path)
    pk_miss = setup_cached(cs, random.Random(42), "toy", cache_dir=d)
    pk_hit = setup_cached(cs, random.Random(42), "toy", cache_dir=d)
    _pk_equal(pk_miss, pk_hit)
    # plain setup with the same seed produces the same trapdoor draws
    _pk_equal(pk_miss, setup(cs, random.Random(42)))


def test_rng_stream_aligned_after_hit(tmp_path):
    """A shared rng must advance identically on hit and miss so a second
    setup on the same rng yields the same key either way (the e2e pipeline
    runs setup_process then setup_tally off one rng)."""
    cs, *_ = _toy_circuit()
    d = str(tmp_path)
    r1 = random.Random(7)
    setup_cached(cs, r1, "toy", cache_dir=d)      # miss
    after_miss = r1.random()
    r2 = random.Random(7)
    setup_cached(cs, r2, "toy", cache_dir=d)      # hit
    assert r2.random() == after_miss


def test_prove_from_loaded_key(tmp_path):
    cs, prod, total, x, y = _toy_circuit()
    d = str(tmp_path)
    setup_cached(cs, random.Random(42), "toy", cache_dir=d)
    pk = setup_cached(cs, random.Random(42), "toy", cache_dir=d)  # from disk
    w = cs.compute_witness({prod: 21, total: 10, x: 3, y: 7})
    proof = prove(pk, cs, w, random.Random(1))
    assert verify(pk.vk, proof, [21, 10])
    assert not verify(pk.vk, proof, [22, 10])


def test_fingerprint_sensitivity():
    cs1, *_ = _toy_circuit()
    cs2, *_ = _toy_circuit()
    assert circuit_fingerprint(cs1) == circuit_fingerprint(cs2)
    cs2.enforce_zero(LC.const(0))
    assert circuit_fingerprint(cs1) != circuit_fingerprint(cs2)


def test_different_seed_different_entry(tmp_path):
    cs, *_ = _toy_circuit()
    d = str(tmp_path)
    pk_a = setup_cached(cs, random.Random(1), "toy", cache_dir=d)
    pk_b = setup_cached(cs, random.Random(2), "toy", cache_dir=d)
    assert pk_a.alpha_g1 != pk_b.alpha_g1
