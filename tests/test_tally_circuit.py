"""Native TallyVotes circuit: witness satisfiability, commitment chaining,
and a full Groth16 prove/verify round trip on a reduced instantiation.

Mirrors the reference statement (circuits/tally-votes.circom, instantiated by
main-tally.circom) and the batch-chaining flow of the coordinator CLI
(cli/src/utils.ts:104-126)."""

import random

import pytest

from infimum_tpu.circuits.tally import TallyCircuit
from infimum_tpu.witness.tally import (
    Ballot, TallyWitnessBuilder, tally_commitment,
)
from infimum_tpu.hash.poseidon_host import poseidon


@pytest.fixture(scope="module")
def small_circuit():
    # reduced instantiation: 8 ballots (depth 3), batch 2, 5 vote options
    return TallyCircuit(state_tree_depth=3, int_state_tree_depth=1,
                        vote_option_tree_depth=1)


def _builder(circ, rng):
    ballots = [
        Ballot(nonce=1, votes=[0, 1, 0, 0, 0]),
        Ballot(nonce=2, votes=[0, 0, 3, 0, 0]),
        Ballot(nonce=1, votes=[1, 0, 0, 0, 1]),
    ]
    state_root = poseidon([7, 8])  # arbitrary nonzero state root
    return TallyWitnessBuilder(circ, state_root, sb_salt=12345,
                               ballots=ballots, num_signups=3)


def test_tally_witness_satisfies_all_batches(small_circuit, rng):
    b = _builder(small_circuit, rng)
    assert b.num_batches == 2
    for _ in range(b.num_batches):
        values, meta = b.batch_inputs(rng)
        w = small_circuit.assignment(values)
        assert small_circuit.cs.check(w), "constraints unsatisfied"
        pubs = small_circuit.public_inputs(values)
        assert small_circuit.cs.public_values(w) == pubs
    # final tally: option totals across all ballots
    assert b.results == [1, 1, 3, 0, 1]
    assert b.spent == 6


def test_tally_commitment_formula(small_circuit, rng):
    # commitment = Poseidon2(Poseidon2(resultsRoot, salt), Poseidon2(spent, salt))
    res = [1, 1, 3, 0, 1]
    c = tally_commitment(res, 11, 6, 22, 1)
    root = poseidon(res)
    assert c == poseidon([poseidon([root, 11]), poseidon([6, 22])])


def test_tally_bad_witness_rejected(small_circuit, rng):
    b = _builder(small_circuit, rng)
    values, _ = b.batch_inputs(rng)
    values["votes"][0][1] += 1  # tamper a vote: commitment chain must break
    w = small_circuit.assignment(values)
    assert not small_circuit.cs.check(w)


@pytest.mark.slow
def test_tally_groth16_roundtrip(small_circuit, rng):
    from infimum_tpu.groth16.groth16 import setup, prove, verify

    prng = random.Random(1234)
    pk = setup(small_circuit.cs, prng)
    b = _builder(small_circuit, prng)
    commitments = [0]
    for _ in range(b.num_batches):
        values, meta = b.batch_inputs(prng)
        w = small_circuit.assignment(values)
        proof = prove(pk, small_circuit.cs, w, prng)
        pubs = small_circuit.public_inputs(values)
        assert verify(pk.vk, proof, pubs)
        # proof chains on the previous commitment (batch-level checkpointing,
        # reference pallet/src/lib.rs:591-608)
        assert pubs[1] == commitments[-1]
        commitments.append(meta["new_commitment"])
    assert not verify(pk.vk, proof, [p + 1 for p in pubs])
