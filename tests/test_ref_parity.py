"""Verifier/serialization parity with the reference pallet.

Deserializes the REAL Groth16 proofs and verifying keys hard-coded in the
reference test suite (pallet/src/tests/data.rs), derives the public inputs by
replaying the golden poll scenario through our chain-free state machine
(exactly the flow of pallet/src/tests/extrinsics.rs:651-699), and checks that
our pairing verifier accepts them — i.e. our whole verification stack is
bit-compatible with ark-groth16 `verify_with_processed_vk`
(pallet/src/lib.rs:815-827)."""

import json
import pathlib

import pytest

from infimum_tpu.io.arkworks import (
    deserialize_g1, deserialize_g2, serialize_g1, serialize_g2,
    deserialize_vkey, deserialize_proof, fr_from_hash_bytes,
)
from infimum_tpu.groth16.groth16 import verify
from infimum_tpu.maci.state import Poll, PollConfig

import ref_fixtures as fx

FIX = json.loads(
    (pathlib.Path(__file__).parent / "data" / "ref_groth16_fixtures.json").read_text()
)


def test_point_serialization_roundtrip():
    for circuit in ("process", "tally"):
        vkb = FIX["vkeys"][circuit]
        a = deserialize_g1(bytes(vkb["alpha_g1"]))
        assert serialize_g1(a) == bytes(vkb["alpha_g1"])
        b = deserialize_g2(bytes(vkb["beta_g2"]))
        assert serialize_g2(b) == bytes(vkb["beta_g2"])
        for icb in vkb["gamma_abc_g1"]:
            p = deserialize_g1(bytes(icb))
            assert serialize_g1(p) == bytes(icb)


def test_vkey_shapes():
    vk_p = deserialize_vkey(FIX["vkeys"]["process"])
    vk_t = deserialize_vkey(FIX["vkeys"]["tally"])
    # ProcessMessages has 9 public signals, TallyVotes 5 (main-*.circom:4)
    assert len(vk_p.ic) == 10
    assert len(vk_t.ic) == 6


def _golden_poll() -> Poll:
    poll = Poll(index=0, created_at=1, config=PollConfig(**fx.POLL_CONFIG))
    for pk in fx.PARTICIPANTS:
        poll.register_participant(pk, timestamp=2)
    poll.merge_registrations()
    poll.consume_interaction(fx.SHARED_PK, fx.MESSAGE_DATA)
    poll.merge_interactions()
    return poll


def test_reference_process_proof_verifies():
    vk = deserialize_vkey(FIX["vkeys"]["process"])
    proof = deserialize_proof(FIX["get_proof"]["process"])
    commitment = fr_from_hash_bytes(FIX["get_proof"]["process_commitment"])

    poll = _golden_poll()
    kind, inputs, new_c = poll.prepare_public_inputs(fx.COORD_PK, commitment)
    assert kind == "process"
    assert verify(vk, proof, inputs)


def test_reference_tally_proof_verifies():
    vk_p = deserialize_vkey(FIX["vkeys"]["process"])
    vk_t = deserialize_vkey(FIX["vkeys"]["tally"])
    p_proof = deserialize_proof(FIX["get_proof"]["process"])
    p_commit = fr_from_hash_bytes(FIX["get_proof"]["process_commitment"])
    t_proof = deserialize_proof(FIX["get_proof"]["tally"])
    t_commit = fr_from_hash_bytes(FIX["get_proof"]["tally_commitment"])

    poll = _golden_poll()
    kind, inputs, new_c = poll.prepare_public_inputs(fx.COORD_PK, p_commit)
    assert kind == "process" and verify(vk_p, p_proof, inputs)
    poll.commit(new_c)
    kind, inputs, new_c = poll.prepare_public_inputs(fx.COORD_PK, t_commit)
    assert kind == "tally"
    assert verify(vk_t, t_proof, inputs)


def test_corrupted_reference_proof_rejected():
    vk = deserialize_vkey(FIX["vkeys"]["process"])
    proof = deserialize_proof(FIX["get_proof"]["process"])
    commitment = fr_from_hash_bytes(FIX["get_proof"]["process_commitment"])
    poll = _golden_poll()
    _, inputs, _ = poll.prepare_public_inputs(fx.COORD_PK, commitment)
    bad = list(inputs)
    bad[0] += 1
    assert not verify(vk, proof, bad)
