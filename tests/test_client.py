"""Client-layer e2e: the reference CLI lifecycle (cli/__tests__/e2e.test.ts:49-132)
chain-free, at the exact reference poll configuration.

`test_client_signal_parity` replays the whole poll through Coordinator /
Participant roles and checks that, for every proof batch the prover would
submit, the public inputs the pallet derives from its own storage
(provider.rs:141-216) are exactly the circuit's public inputs — i.e. proofs
generated from the client replay verify on-chain. (Groth16 proving itself is
covered by test_groth16/test_tally_circuit on CPU and by the full e2e below
on TPU: the reference circuit sizes — 2^18 domain — are TPU-scale.)

`test_client_full_e2e_groth16` is the complete native pipeline (setup ->
witness -> prove -> pallet verify -> outcome); enable with INFIMUM_E2E=1.
"""

import os
import random

import pytest

from infimum_tpu.client import Coordinator, Participant, PollProver, ProverKeys
from infimum_tpu.pallet import InfimumPallet

SIGNUP, VOTING = 12, 12
# reference instantiation: main-process.circom:4 / main-tally.circom:4
CONFIG = dict(registration_depth=10, interaction_depth=2,
              process_subtree_depth=1, tally_subtree_depth=1,
              vote_option_tree_depth=2)


def _lifecycle(pallet, coordinator, participants):
    """Blocks 1..26 of the reference e2e: register, create, sign up, vote,
    merge twice. Bob (state index 1) votes option 5."""
    coordinator.register(pallet)
    coordinator.create_poll(pallet, SIGNUP, VOTING)
    pallet.run_to_block(2)
    for p in participants:
        p.register(pallet, 0)
    pallet.run_to_block(14)
    coordinator.merge_poll_state(pallet)
    participants[0].vote(
        pallet, 0, coordinator.public_key,
        state_index=1, vote_option=5, weight=1, nonce=1)
    pallet.run_to_block(26)
    coordinator.merge_poll_state(pallet)


def test_client_signal_parity():
    keys = ProverKeys.dims_only(**CONFIG)
    pallet = InfimumPallet()
    coordinator = Coordinator("alice", sk=0xA11CE, keys=keys)
    # dims-only keys carry no vkeys; register with the reference fixtures
    import json, pathlib
    fix = json.loads((pathlib.Path(__file__).parent / "data" /
                      "ref_groth16_fixtures.json").read_text())
    pallet.register_as_coordinator("alice", coordinator.public_key,
                                   fix["vkeys"])
    coordinator.create_poll(pallet, SIGNUP, VOTING)
    participants = [Participant(n, sk) for n, sk in
                    (("bob", 0xB0B), ("charlie", 0xC0C), ("dave", 0xD0D))]
    pallet.run_to_block(2)
    for p in participants:
        p.register(pallet, 0)
    pallet.run_to_block(14)
    coordinator.merge_poll_state(pallet)
    participants[0].vote(pallet, 0, coordinator.public_key,
                         state_index=1, vote_option=5, weight=1, nonce=1)
    pallet.run_to_block(26)
    coordinator.merge_poll_state(pallet)

    poll = pallet.polls[0]
    prover = PollProver(keys, coordinator.keypair, poll.config,
                        poll_end_timestamp=poll.voting_period_end(),
                        rng=random.Random(7))
    prover.ingest_events(pallet.events, 0)
    process_batches, tally_batches, tb = prover.get_poll_results()

    assert len(process_batches) == poll.commitment.expected_process == 1
    assert len(tally_batches) == poll.commitment.expected_tally == 2

    # drive the pallet's commit loop (commit_outcome minus pairing) and
    # check the self-derived publics match the circuit's, batch by batch
    for values, meta in process_batches:
        kind, inputs, new_c = poll.prepare_public_inputs(
            coordinator.public_key, meta["new_commitment"])
        assert kind == "process"
        assert inputs == keys.process_circuit.public_inputs(values)
        poll.commit(new_c)
    for values, meta in tally_batches:
        kind, inputs, new_c = poll.prepare_public_inputs(
            coordinator.public_key, meta["new_commitment"])
        assert kind == "tally"
        assert inputs == keys.tally_circuit.public_inputs(values)
        poll.commit(new_c)

    outcome = prover._outcome(tb)
    assert poll.verify_outcome(outcome) == 5
    assert outcome.tally_results[5] == 1 and outcome.total_spent == 1


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("INFIMUM_E2E") != "1",
                    reason="full Groth16 e2e at reference circuit sizes is "
                           "TPU-scale; set INFIMUM_E2E=1 to run")
def test_client_full_e2e_groth16():
    keys = ProverKeys.generate(**CONFIG, rng=random.Random(99))
    pallet = InfimumPallet()
    coordinator = Coordinator("alice", sk=0xA11CE, keys=keys)
    participants = [Participant(n, sk) for n, sk in
                    (("bob", 0xB0B), ("charlie", 0xC0C), ("dave", 0xD0D))]
    _lifecycle(pallet, coordinator, participants)
    outcome_index = coordinator.prove_poll_results(
        pallet, 0, rng=random.Random(7))
    assert outcome_index == 5
    assert pallet.polls[0].outcome == 5


def test_client_signal_parity_beyond_reference_capacity():
    """Signal parity with 5 registrations and 11 messages (3 process + 3
    tally batches). This exercises the amortized-merge depth tracking fix
    (tree/imt.py merge): the reference never updates the tree's depth field
    during merge yet publishes it as actualStateTreeDepth
    (state.rs:230-281, provider.rs:182), so ITS polls with > 3 registrations
    derive a public input inconsistent with their own merged root. Ours must
    stay provable at any legal size."""
    keys = ProverKeys.dims_only(**CONFIG)
    pallet = InfimumPallet()
    coordinator = Coordinator("alice", sk=0xA11CE, keys=keys)
    import json, pathlib
    fix = json.loads((pathlib.Path(__file__).parent / "data" /
                      "ref_groth16_fixtures.json").read_text())
    pallet.register_as_coordinator("alice", coordinator.public_key,
                                   fix["vkeys"])
    coordinator.create_poll(pallet, SIGNUP, VOTING)
    participants = [Participant(n, sk) for n, sk in
                    (("bob", 0xB0B), ("charlie", 0xC0C), ("dave", 0xD0D),
                     ("erin", 0xE417), ("frank", 0xF7A4))]
    pallet.run_to_block(2)
    for p in participants:
        p.register(pallet, 0)
    pallet.run_to_block(14)
    coordinator.merge_poll_state(pallet)
    for i in range(11):
        participants[0].vote(pallet, 0, coordinator.public_key,
                             state_index=1, vote_option=5, weight=1,
                             nonce=1, salt=1000 + i)
    pallet.run_to_block(26)
    coordinator.merge_poll_state(pallet)
    poll = pallet.polls[0]
    assert poll.registrations.depth == 3      # 6 leaves: merge raised 2 -> 3
    prover = PollProver(keys, coordinator.keypair, poll.config,
                        poll_end_timestamp=poll.voting_period_end(),
                        rng=random.Random(7))
    prover.ingest_events(pallet.events, 0)
    process_batches, tally_batches, tb = prover.get_poll_results()
    assert len(process_batches) == 3 and len(tally_batches) == 3
    for kind, batches, circ in (
            ("process", process_batches, keys.process_circuit),
            ("tally", tally_batches, keys.tally_circuit)):
        for values, meta in batches:
            k, inputs, new_c = poll.prepare_public_inputs(
                coordinator.public_key, meta["new_commitment"])
            assert k == kind
            assert inputs == circ.public_inputs(values)
            poll.commit(new_c)
    outcome = prover._outcome(tb)
    assert poll.verify_outcome(outcome) == 5
