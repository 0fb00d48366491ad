"""Native ProcessMessages circuit: witness satisfiability over real message
batches (encrypt -> decrypt -> validate -> apply, reverse order), chained
across batches. Full Groth16 proving of this circuit is a TPU-scale job
covered by the e2e bench; here we check the constraint system itself."""

import random

import pytest

from infimum_tpu.circuits.process import ProcessCircuit
from infimum_tpu.witness.process import ProcessWitnessBuilder
from infimum_tpu.maci.keys import Keypair
from infimum_tpu.maci.replay import MaciReplay, pack_command
from infimum_tpu.hash.cipher import poseidon_encrypt
from infimum_tpu.hash.poseidon_host import poseidon

COORD = Keypair(sk=777)
ALICE = Keypair(sk=111)
BOB = Keypair(sk=222)


def _vote_message(voter, state_index, vote_option, weight, nonce, salt=99,
                  new_pub=None):
    new_pub = new_pub or voter.pub
    packed = pack_command(state_index, vote_option, weight, nonce, 0,
                          new_pub, salt)
    sig_r8, sig_s = voter.sign(poseidon(packed))
    eph = Keypair(sk=salt * 31337 + 5)
    shared = eph.ecdh(COORD.pub)
    data = poseidon_encrypt(packed + [sig_r8[0], sig_r8[1], sig_s], shared, 0)
    return data, eph.pub


@pytest.fixture(scope="module")
def circuit():
    return ProcessCircuit(state_tree_depth=3, msg_tree_depth=2,
                          msg_batch_depth=1, vote_option_tree_depth=1)


def _replay(circuit):
    return MaciReplay(
        state_tree_depth=circuit.state_tree_depth,
        msg_tree_depth=circuit.msg_tree_depth,
        msg_batch_depth=circuit.msg_batch_depth,
        vote_option_tree_depth=circuit.vote_option_tree_depth,
        coordinator=COORD, poll_end_timestamp=25,
    )


@pytest.mark.slow
def test_process_witness_single_batch(circuit):
    rng = random.Random(1)
    r = _replay(circuit)
    r.sign_up(ALICE.pub, timestamp=2)
    data, eph = _vote_message(ALICE, 1, 3, 1, 1)
    r.publish(data, eph)
    builder = ProcessWitnessBuilder(circuit, r)
    batches = list(builder.batches(rng))
    assert len(batches) == 1
    values, meta = batches[0]
    w = circuit.assignment(values)
    assert circuit.cs.check(w), "process constraints unsatisfied"
    assert circuit.cs.public_values(w) == circuit.public_inputs(values)
    # the vote actually landed
    assert r.ballots[1].votes[3] == 1


@pytest.mark.slow
def test_process_witness_multi_batch_with_invalid(circuit):
    rng = random.Random(2)
    r = _replay(circuit)
    r.sign_up(ALICE.pub, timestamp=2)
    r.sign_up(BOB.pub, timestamp=3)
    # 6 messages -> 2 batches (batch size 5); includes an invalid signature
    # and a key-change + revote pair
    new_key = Keypair(sk=999)
    msgs = [
        _vote_message(ALICE, 1, 3, 1, 1, salt=11),
        _vote_message(BOB, 1, 2, 1, 1, salt=12),       # wrong signer: invalid
        _vote_message(BOB, 2, 4, 1, 1, salt=13),
        _vote_message(new_key, 1, 0, 1, 2, salt=14),   # revote with new key
        _vote_message(ALICE, 1, 0, 0, 1, salt=15, new_pub=new_key.pub),
        _vote_message(BOB, 2, 4, 1, 2, salt=16),
    ]
    for data, eph in msgs:
        r.publish(data, eph)
    builder = ProcessWitnessBuilder(circuit, r)
    metas = []
    for values, meta in builder.batches(rng):
        w = circuit.assignment(values)
        assert circuit.cs.check(w)
        metas.append((values, meta))
    assert len(metas) == 2
    # commitments chain: batch 2's new == batch 1's current
    assert metas[1][0]["currentSbCommitment"] == metas[0][1]["new_commitment"]
    # Alice rotated keys; her second vote (via new key) landed on option 0
    assert r.leaves[1].pub == new_key.pub
    assert r.ballots[1].votes[0] == 1
    assert r.ballots[2].votes[4] == 1


@pytest.mark.slow
def test_process_tampered_witness_rejected(circuit):
    rng = random.Random(3)
    r = _replay(circuit)
    r.sign_up(ALICE.pub, timestamp=2)
    data, eph = _vote_message(ALICE, 1, 2, 1, 1)
    r.publish(data, eph)
    builder = ProcessWitnessBuilder(circuit, r)
    values, _ = next(iter(builder.batches(rng)))
    values["newSbCommitment"] += 1
    w = circuit.assignment(values)
    assert not circuit.cs.check(w)
