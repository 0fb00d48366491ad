"""Pallet-equivalent extrinsic tests, mirroring the reference test suite
(pallet/src/tests/extrinsics.rs): lifecycle guards, golden merge values, and
the REAL reference proofs accepted through commit_outcome
(extrinsics.rs:651-699 commit_outcome_single_batch, :856 process->tally)."""

import json
import pathlib

import pytest

from infimum_tpu.pallet import InfimumPallet, PalletError, Error

import ref_fixtures as fx

FIX = json.loads(
    (pathlib.Path(__file__).parent / "data" / "ref_groth16_fixtures.json").read_text()
)
ALICE, BOB, CHARLIE, DAVE = 0, 1, 2, 3


def _setup_poll(pallet: InfimumPallet):
    """Blocks 1..26 flow of extrinsics.rs:651-699."""
    pallet.register_as_coordinator(ALICE, fx.COORD_PK, FIX["vkeys"])
    pallet.create_poll(ALICE, 12, 12, 10, 2, 1, 1, 2, list(range(25)))
    pallet.run_to_block(2)
    for origin, pk in zip((BOB, CHARLIE, DAVE), fx.PARTICIPANTS):
        pallet.register_as_participant(origin, 0, pk)
    pallet.run_to_block(14)
    pallet.merge_poll_state(ALICE)
    pallet.interact_with_poll(BOB, 0, fx.SHARED_PK, fx.MESSAGE_DATA)
    pallet.run_to_block(26)
    pallet.merge_poll_state(ALICE)


def test_coordinator_registration_guards():
    p = InfimumPallet()
    p.register_as_coordinator(ALICE, fx.COORD_PK, FIX["vkeys"])
    with pytest.raises(PalletError) as e:
        p.register_as_coordinator(ALICE, fx.COORD_PK, FIX["vkeys"])
    assert e.value.error == Error.CoordinatorAlreadyRegistered
    with pytest.raises(PalletError) as e:
        p.create_poll(BOB, 12, 12, 10, 2, 1, 1, 2, list(range(25)))
    assert e.value.error == Error.CoordinatorNotRegistered


def test_malformed_vkeys_rejected():
    p = InfimumPallet()
    bad = {"process": {"alpha_g1": [0] * 64, "beta_g2": [], "gamma_g2": [],
                       "delta_g2": [], "gamma_abc_g1": []},
           "tally": FIX["vkeys"]["tally"]}
    with pytest.raises(PalletError) as e:
        p.register_as_coordinator(ALICE, fx.COORD_PK, bad)
    assert e.value.error == Error.MalformedKeys


def test_period_guards():
    p = InfimumPallet()
    p.register_as_coordinator(ALICE, fx.COORD_PK, FIX["vkeys"])
    p.create_poll(ALICE, 12, 12, 10, 2, 1, 1, 2, list(range(25)))
    # merging during registration period fails
    with pytest.raises(PalletError) as e:
        p.merge_poll_state(ALICE)
    assert e.value.error == Error.PollRegistrationInProgress
    # interaction before voting period fails
    with pytest.raises(PalletError) as e:
        p.interact_with_poll(BOB, 0, fx.SHARED_PK, fx.MESSAGE_DATA)
    assert e.value.error == Error.PollVotingHasEnded
    p.run_to_block(13)
    # registration after signup period fails
    with pytest.raises(PalletError) as e:
        p.register_as_participant(BOB, 0, fx.PARTICIPANTS[0])
    assert e.value.error == Error.PollRegistrationHasEnded


def test_golden_merge_roots():
    """extrinsics.rs:481-575 golden values via the extrinsic surface."""
    p = InfimumPallet()
    _setup_poll(p)
    poll = p.polls[0]
    assert poll.registrations.root == fx.GOLDEN_REG_ROOT
    assert poll.commitment.process == (0, fx.GOLDEN_PROCESS_COMMITMENT)
    assert poll.interactions.root == fx.GOLDEN_INT_ROOT
    assert poll.commitment.expected_process == 1
    assert poll.commitment.expected_tally == 2


def test_commit_outcome_single_batch_real_proof():
    """extrinsics.rs:651-699 with the actual reference proof bytes."""
    p = InfimumPallet()
    _setup_poll(p)
    batch = [(FIX["get_proof"]["process"],
              bytes(FIX["get_proof"]["process_commitment"]))]
    p.commit_outcome(ALICE, batch)
    poll = p.polls[0]
    assert poll.commitment.process == (
        1, int.from_bytes(bytes(FIX["get_proof"]["process_commitment"]), "big"))


def test_commit_outcome_process_then_tally():
    """extrinsics.rs:856-905: chained process -> tally with real proofs."""
    p = InfimumPallet()
    _setup_poll(p)
    batches = [
        (FIX["get_proof"]["process"],
         bytes(FIX["get_proof"]["process_commitment"])),
        (FIX["get_proof"]["tally"],
         bytes(FIX["get_proof"]["tally_commitment"])),
    ]
    p.commit_outcome(ALICE, batches)
    poll = p.polls[0]
    assert poll.commitment.process[0] == 1
    assert poll.commitment.tally[0] == 1


def test_commit_outcome_corrupted_proof_rejected():
    """extrinsics.rs:702-754."""
    p = InfimumPallet()
    _setup_poll(p)
    bad = dict(FIX["get_proof"]["process"])
    bad["pi_c"] = FIX["get_proof"]["tally"]["pi_c"]  # valid point, wrong proof
    with pytest.raises(PalletError) as e:
        p.commit_outcome(ALICE, [(bad, bytes(FIX["get_proof"]["process_commitment"]))])
    assert e.value.error == Error.MalformedProof


def test_commit_outcome_wrong_commitment_rejected():
    """extrinsics.rs:756-804."""
    p = InfimumPallet()
    _setup_poll(p)
    wrong = (123456789).to_bytes(32, "big")
    with pytest.raises(PalletError) as e:
        p.commit_outcome(ALICE, [(FIX["get_proof"]["process"], wrong)])
    assert e.value.error == Error.MalformedProof


def test_nullify_poll():
    p = InfimumPallet()
    _setup_poll(p)
    p.nullify_poll(ALICE)
    assert p.polls[0].tombstone
    with pytest.raises(PalletError):
        p.commit_outcome(ALICE, [])


def test_typed_dispatcher():
    """pallet/dispatch.py: typed schema validation + event decode, the
    extrinsic() surface of reference cli/src/extrinsic.ts:153-203."""
    from infimum_tpu.pallet.dispatch import Extrinsic, DispatchResult, dispatch

    p = InfimumPallet()
    res = dispatch(p, ALICE, Extrinsic.REGISTER_AS_COORDINATOR,
                   public_key=fx.COORD_PK, vkeys=FIX["vkeys"])
    assert isinstance(res, DispatchResult)
    assert res.event("CoordinatorRegistered").data["who"] == ALICE

    res = dispatch(p, ALICE, Extrinsic.CREATE_POLL,
                   signup_period=12, voting_period=12, registration_depth=10,
                   interaction_depth=2, process_subtree_depth=1,
                   tally_subtree_depth=1, vote_option_tree_depth=2,
                   vote_options=list(range(25)))
    assert res.event("PollCreated").data["index"] == 0

    # schema violations are TypeErrors (the TS compile-time guarantee)
    with pytest.raises(TypeError):
        dispatch(p, ALICE, Extrinsic.CREATE_POLL, signup_period=12)
    with pytest.raises(TypeError):
        dispatch(p, ALICE, Extrinsic.MERGE_POLL_STATE, bogus=1)

    # module errors decode as PalletError through the dispatcher
    p.run_to_block(2)
    res = dispatch(p, BOB, Extrinsic.REGISTER_AS_PARTICIPANT,
                   poll_id=0, public_key=fx.PARTICIPANTS[0])
    assert res.event("ParticipantRegistered").data["poll"] == 0
    with pytest.raises(PalletError) as e:
        dispatch(p, ALICE, Extrinsic.NULLIFY_POLL)
    assert isinstance(e.value.error, Error)
