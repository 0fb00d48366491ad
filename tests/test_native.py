"""Native C++ pallet-core (native/src) tests: Poseidon KATs, amortized IMT
golden roots, arkworks serde roundtrips, and Groth16 pairing verification of
the REAL reference proofs — the same consensus-critical contracts the Rust
pallet tests pin (reference pallet/src/tests/poseidon.rs:175-251,
extrinsics.rs:516,569, data.rs:15-141). Skips cleanly if the shared library
cannot be built (no compiler)."""

import json
import pathlib

import pytest

from infimum_tpu import native
from infimum_tpu.hash.poseidon_host import poseidon as py_poseidon
from infimum_tpu.tree.imt import AmortizedIMT
from infimum_tpu.tree.zeros import merkle_zeros

import ref_fixtures as fx

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler?)")

FIX_PATH = pathlib.Path(__file__).parent / "data" / "ref_groth16_fixtures.json"


def _fix():
    return json.loads(FIX_PATH.read_text())


def test_native_poseidon_matches_host():
    for width in range(1, 13):
        inputs = list(range(1, width + 1))
        assert native.poseidon(inputs) == py_poseidon(inputs)


def test_native_poseidon2_batch():
    pairs = [(i, i * 7 + 1) for i in range(32)]
    got = native.poseidon2_batch(pairs)
    assert got == [py_poseidon([a, b]) for a, b in pairs]


def test_native_zero_tables():
    # spot checks against the reference tables (pallet/src/poll/zeroes.rs)
    assert native.merkle_zero(2, 0) == fx.BINARY_ZEROES_0
    assert native.merkle_zero(5, 0) == fx.QUINARY_ZEROES_0
    assert native.merkle_zero(2, 32) == fx.BINARY_ZEROES_32
    assert native.merkle_zero(5, 32) == fx.QUINARY_ZEROES_32
    for arity in (2, 5):
        table = merkle_zeros(arity)
        for d in (1, 3, 10):
            assert native.merkle_zero(arity, d) == table[d]


def test_native_imt_golden_registration_root():
    """Replays the golden poll's registrations through the native tree and
    checks the hardcoded reference root (extrinsics.rs:516)."""
    tree = native.NativeIMT(2, fx.POLL_CONFIG["registration_depth"], zero_seed=True)
    py_tree = AmortizedIMT.new(2, fx.POLL_CONFIG["registration_depth"], zero_seed=True)
    for pk in fx.PARTICIPANTS:
        leaf = py_poseidon([pk[0], pk[1], 1, 2])
        tree.insert(leaf)
        py_tree.insert(leaf)
    tree.merge(False)
    py_tree.merge(False)
    assert tree.root == py_tree.root == fx.GOLDEN_REG_ROOT
    assert tree.count == len(fx.PARTICIPANTS)


def test_native_imt_golden_interaction_root():
    """Golden interaction root (extrinsics.rs:569): quinary tree, merge to
    full depth."""
    tree = native.NativeIMT(5, fx.POLL_CONFIG["interaction_depth"])
    data = fx.MESSAGE_DATA
    leaf = py_poseidon([
        py_poseidon(data[0:5]), py_poseidon(data[5:10]),
        fx.SHARED_PK[0], fx.SHARED_PK[1],
    ])
    tree.insert(leaf)
    tree.merge(True)
    assert tree.root == fx.GOLDEN_INT_ROOT


def test_native_imt_matches_python_random():
    import random

    rng = random.Random(99)
    nat = native.NativeIMT(5, 4)
    py = AmortizedIMT.new(5, 4)
    for _ in range(37):
        leaf = rng.randrange(fx.BINARY_ZEROES_32)  # any field element
        nat.insert(leaf)
        py.insert(leaf)
    assert nat.depth == py.depth
    nat.merge(True)
    py.merge(True)
    assert nat.root == py.root


def test_native_serde_roundtrips_fixture_vkeys():
    f = _fix()
    for circuit in ("process", "tally"):
        vkb = f["vkeys"][circuit]
        for g1 in [vkb["alpha_g1"], *vkb["gamma_abc_g1"]]:
            assert native.g1_validate(bytes(g1))
            assert native.g1_roundtrip(bytes(g1)) == bytes(g1)
        for g2 in (vkb["beta_g2"], vkb["gamma_g2"], vkb["delta_g2"]):
            assert native.g2_validate(bytes(g2))
            assert native.g2_roundtrip(bytes(g2)) == bytes(g2)


def test_native_groth16_accepts_reference_proof():
    from infimum_tpu.io.arkworks import fr_from_hash_bytes
    from infimum_tpu.maci.state import Poll, PollConfig

    f = _fix()
    poll = Poll(index=0, created_at=1, config=PollConfig(**fx.POLL_CONFIG))
    for pk in fx.PARTICIPANTS:
        poll.register_participant(pk, timestamp=2)
    poll.merge_registrations()
    poll.consume_interaction(fx.SHARED_PK, fx.MESSAGE_DATA)
    poll.merge_interactions()
    commitment = fr_from_hash_bytes(f["get_proof"]["process_commitment"])
    kind, inputs, _ = poll.prepare_public_inputs(fx.COORD_PK, commitment)
    assert kind == "process"

    vkb = f["vkeys"]["process"]
    pb = f["get_proof"]["process"]
    assert native.groth16_verify(vkb, pb, inputs)
    bad = list(inputs)
    bad[0] += 1
    assert not native.groth16_verify(vkb, pb, bad)


def test_native_hint_program_matches_python():
    """The native witness evaluator (native/src/hintprog.cc) must replay
    the hint program bit-identically to the Python interpreter across the
    full op set (mul/inv0/isz/bit/div0/digit5), including zero inverses."""
    import os
    import random

    from infimum_tpu.circuits.babyjubjub_gadget import _div
    from infimum_tpu.circuits.merkle_gadgets import quin_generate_path_indices
    from infimum_tpu.ff.bn254 import FR_MOD
    from infimum_tpu.groth16.r1cs import LC, ConstraintSystem

    cs = ConstraintSystem()
    x = cs.alloc_public()
    y = cs.alloc_public()
    cs.is_zero(LC.var(x) - 7)
    cs.is_zero(LC.var(x))
    cs.num2bits(LC.var(x), 32)
    cs.mul(LC.var(x) + 3, LC.var(y).scale(5) - 2)
    _div(cs, LC.var(x) + 1, LC.var(y) + 9)
    _div(cs, LC.var(x), LC.var(y))          # zero denominator when y=0
    quin_generate_path_indices(cs, LC.var(x), 5)
    assert cs._native_prog() is not None, "program should compile natively"

    rng = random.Random(11)
    cases = [(0, 0), (7, 1), (624, FR_MOD - 9),
             (rng.randrange(FR_MOD), rng.randrange(FR_MOD))]
    for xv, yv in cases:
        wn = cs.compute_witness({x: xv, y: yv})
        os.environ["INFIMUM_NATIVE_WITNESS"] = "0"
        cs.__dict__.pop("_native_prog_cache", None)
        try:
            wp = cs.compute_witness({x: xv, y: yv})
        finally:
            os.environ["INFIMUM_NATIVE_WITNESS"] = "1"
            cs.__dict__.pop("_native_prog_cache", None)
        assert wn == wp, f"witness mismatch at ({xv}, {yv})"
