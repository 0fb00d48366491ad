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


# -- adversarial proof-chain tests (extrinsics.rs:806-1005) -------------------

SCEN = json.loads(
    (pathlib.Path(__file__).parent / "data" / "ref_scenarios.json").read_text()
)


def _scenario_outcome(s):
    """ref_scenarios.json outcome dict -> maci PollOutcome (provider field
    semantics: coordinator.rs:53-75; path shape provider.rs:396-436)."""
    from infimum_tpu.maci.state import PollOutcome

    o = s["outcome"]
    return PollOutcome(
        tally_results=list(o["tally_results"]),
        tally_result_proofs=[
            [[fx.be(sib) for sib in level] for level in per_option]
            for per_option in o["tally_result_proofs"]
        ],
        total_spent=fx.be(o["total_spent"]),
        total_spent_salt=fx.be(o["total_spent_salt"]),
        tally_result_salt=fx.be(o["tally_result_salt"]),
        new_results_commitment=fx.be(o["new_results_commitment"]),
        spent_votes_hash=fx.be(o["spent_votes_hash"]),
    )


def _scenario_batches(s):
    return [({"pi_a": b["pi_a"], "pi_b": b["pi_b"], "pi_c": b["pi_c"]},
             bytes(b["commitment"])) for b in s["proof_batches"]]


def test_commit_outcome_mismatched_state():
    """extrinsics.rs:806-853: a valid proof against a poll whose chain state
    differs (only ONE participant registered instead of three) is rejected —
    the pallet derives the public inputs from ITS OWN storage."""
    p = InfimumPallet()
    p.register_as_coordinator(ALICE, fx.COORD_PK, FIX["vkeys"])
    p.create_poll(ALICE, 12, 12, 10, 2, 1, 1, 2, list(range(25)))
    p.run_to_block(2)
    p.register_as_participant(BOB, 0, fx.PARTICIPANTS[0])  # bob only
    p.run_to_block(14)
    p.merge_poll_state(ALICE)
    p.interact_with_poll(BOB, 0, fx.SHARED_PK, fx.MESSAGE_DATA)
    p.run_to_block(26)
    p.merge_poll_state(ALICE)
    with pytest.raises(PalletError) as e:
        p.commit_outcome(ALICE, [(FIX["get_proof"]["process"],
                                  bytes(FIX["get_proof"]["process_commitment"]))])
    assert e.value.error == Error.MalformedProof


def test_commit_outcome_permuted_rejected():
    """extrinsics.rs:960-1005: tally proof before process proof (out-of-order
    chain) is rejected — prepare_public_inputs decides the phase from the
    commitment cursors, so the tally proof is checked as a process proof."""
    p = InfimumPallet()
    _setup_poll(p)
    permuted = [
        (FIX["get_proof"]["tally"], bytes(FIX["get_proof"]["tally_commitment"])),
        (FIX["get_proof"]["process"],
         bytes(FIX["get_proof"]["process_commitment"])),
    ]
    with pytest.raises(PalletError) as e:
        p.commit_outcome(ALICE, permuted)
    assert e.value.error == Error.MalformedProof
    # nothing was committed: the chain is still at the initial cursors
    assert p.polls[0].commitment.process[0] == 0
    assert p.polls[0].commitment.tally[0] == 0


def test_commit_outcome_partial_with_outcome_left_unset():
    """extrinsics.rs:907-958 commit_outcome_partial_success: a partial chain
    of valid proofs verifies and advances the cursors, and the accompanying
    outcome is silently left unset (lib.rs:620-628 — verify_outcome None is
    not an error) because the poll is not fully proven yet."""
    p = InfimumPallet()
    _setup_poll(p)
    batches = [
        (FIX["get_proof"]["process"],
         bytes(FIX["get_proof"]["process_commitment"])),
        (FIX["get_proof"]["tally"], bytes(FIX["get_proof"]["tally_commitment"])),
    ]
    p.commit_outcome(ALICE, batches, _scenario_outcome(SCEN["0"]))
    poll = p.polls[0]
    assert poll.commitment.process[0] == 1
    assert poll.commitment.tally[0] == 1
    assert poll.outcome is None   # 1 of 2 expected tally batches proven


def test_commit_outcome_partial_then_resume():
    """Batch-level checkpoint/resume (SURVEY.md §5): the commitment cursors
    persist across commit_outcome calls, so a coordinator can crash between
    batches and resume from storage (lib.rs:591-608 chaining)."""
    p = InfimumPallet()
    _setup_poll(p)
    p.commit_outcome(ALICE, [(FIX["get_proof"]["process"],
                              bytes(FIX["get_proof"]["process_commitment"]))])
    assert p.polls[0].commitment.process[0] == 1
    # resume in a second call: the tally proof chains on the stored cursor
    p.commit_outcome(ALICE, [(FIX["get_proof"]["tally"],
                              bytes(FIX["get_proof"]["tally_commitment"]))])
    assert p.polls[0].commitment.tally[0] == 1
    # replaying the process proof from the beginning now fails (cursor moved)
    with pytest.raises(PalletError) as e:
        p.commit_outcome(ALICE, [(FIX["get_proof"]["process"],
                                  bytes(FIX["get_proof"]["process_commitment"]))])
    assert e.value.error == Error.MalformedProof


def test_commit_outcome_empty_call_rejected():
    """lib.rs:588: at least one of (batches, outcome) must be provided."""
    p = InfimumPallet()
    _setup_poll(p)
    with pytest.raises(PalletError) as e:
        p.commit_outcome(ALICE, [])
    assert e.value.error == Error.MalformedInput


@pytest.mark.parametrize("sid", ["1", "2"])
def test_poll_scenario(sid):
    """Scenario-table runner mirroring invoke_test_poll_scenario!
    (extrinsics.rs:1007-1068): replay the fixture scenario's interactions,
    commit its real proof batches + outcome, assert the expected winner
    (scenario 1 -> option 5, scenario 2 -> option 23; data.rs:187-275)."""
    s = SCEN[sid]
    p = InfimumPallet()
    p.register_as_coordinator(ALICE, fx.COORD_PK, FIX["vkeys"])
    p.create_poll(ALICE, 12, 12, 10, 2, 1, 1, 2, list(range(25)))
    for origin, pk in zip((BOB, CHARLIE, DAVE), fx.PARTICIPANTS):
        p.register_as_participant(origin, 0, pk)
    p.run_to_block(13)
    p.merge_poll_state(ALICE)
    for inter in s["interactions"]:
        p.interact_with_poll(BOB, 0, tuple(fx.be(c) for c in inter["pk"]),
                             [fx.be(w) for w in inter["data"]])
    p.run_to_block(26)
    p.merge_poll_state(ALICE)
    p.commit_outcome(ALICE, _scenario_batches(s), _scenario_outcome(s))
    assert p.polls[0].outcome == s["expected"]


def test_capacity_boundary_registrations_and_interactions():
    """Pin the capacity-boundary semantics (reference lib.rs:679-736,
    provider.rs:329-337): max_registrations = 2^registration_depth with ONE
    slot reserved for the pre-seeded blank leaf (`count >=
    max_registrations - 1` rejects), while interactions fill the quinary
    tree completely (`count >= max_interactions` = 5^interaction_depth)."""
    p = InfimumPallet()
    p.register_as_coordinator(ALICE, fx.COORD_PK, FIX["vkeys"])
    # registration_depth=2 (max 4 regs => 3 usable), interaction_depth=1
    # (max 5 interactions); tally_subtree_depth=1 <= 2, vote depth 2
    p.create_poll(ALICE, 12, 12, 2, 1, 1, 1, 2, list(range(25)))
    p.run_to_block(2)
    pk = fx.PARTICIPANTS[0]
    for i in range(3):                       # counts 1..3 accepted
        p.register_as_participant(BOB + i, 0, pk)
    with pytest.raises(PalletError) as e:    # count==3 >= 4-1: reject
        p.register_as_participant(ALICE, 0, pk)
    assert e.value.error == Error.ParticipantRegistrationLimitReached
    p.run_to_block(14)
    # reference QUIRK, pinned deliberately: blank leaf + (max-1) real
    # registrations completely fills the tree, so insert auto-roots it
    # (state.rs:219-223) and merge_poll_state's registration branch — the
    # only place the process commitment is seeded (provider.rs:298-308) —
    # is skipped (lib.rs:496 checks root.is_none()); the merge call falls
    # through to the interactions branch and errors until the poll is over.
    assert p.polls[0].registrations.root is not None
    with pytest.raises(PalletError) as e:
        p.merge_poll_state(ALICE)
    assert e.value.error == Error.PollVotingInProgress
    for _ in range(5):                       # 5^1 interactions all accepted
        p.interact_with_poll(BOB, 0, fx.SHARED_PK, fx.MESSAGE_DATA)
    with pytest.raises(PalletError) as e:    # count==5 >= 5: reject
        p.interact_with_poll(BOB, 0, fx.SHARED_PK, fx.MESSAGE_DATA)
    assert e.value.error == Error.ParticipantInteractionLimitReached


def test_capacity_below_boundary_merges_normally():
    """One registration below the blank-leaf boundary: the tree does NOT
    auto-root, merge_poll_state seeds the process commitment, and the
    interaction tree at exactly-full capacity (auto-rooted) still merges —
    merge(true) is only needed when the root is unset (lib.rs:519-546)."""
    p = InfimumPallet()
    p.register_as_coordinator(ALICE, fx.COORD_PK, FIX["vkeys"])
    p.create_poll(ALICE, 12, 12, 2, 1, 1, 1, 2, list(range(25)))
    p.run_to_block(2)
    for i in range(2):                       # max-2: below the boundary
        p.register_as_participant(BOB + i, 0, fx.PARTICIPANTS[i])
    p.run_to_block(14)
    p.merge_poll_state(ALICE)
    assert p.polls[0].registrations.root is not None
    assert p.polls[0].commitment.process[1] != 0
    for _ in range(5):
        p.interact_with_poll(BOB, 0, fx.SHARED_PK, fx.MESSAGE_DATA)
    assert p.polls[0].interactions.root is not None  # quinary auto-root
    p.run_to_block(26)
    # second reference QUIRK at exactly-full interaction capacity, pinned:
    # with the root auto-set, the interactions branch is skipped and the
    # merge call lands on the final else => PollDataEmpty (lib.rs:549) —
    # merge_interactions (and its expected-proof-count bookkeeping,
    # provider.rs:319-324) never runs, yet is_merged() is true
    # (provider.rs:373-376: both roots set).
    with pytest.raises(PalletError) as e:
        p.merge_poll_state(ALICE)
    assert e.value.error == Error.PollDataEmpty
    assert p.polls[0].is_merged()


def test_create_poll_depth_exceeding_runtime_bound_rejected():
    """lib.rs:388-398: 2^registration_depth must fit MaxPollRegistrations."""
    from infimum_tpu.pallet.chain import RuntimeConfig

    p = InfimumPallet(RuntimeConfig(max_poll_registrations=1024,
                                    max_poll_interactions=1024))
    p.register_as_coordinator(ALICE, fx.COORD_PK, FIX["vkeys"])
    with pytest.raises(PalletError) as e:   # 2^11 > 1024
        p.create_poll(ALICE, 12, 12, 11, 2, 1, 1, 2, list(range(25)))
    assert e.value.error == Error.PollConfigInvalid
    with pytest.raises(PalletError) as e:   # 5^5 > 1024
        p.create_poll(ALICE, 12, 12, 10, 5, 1, 1, 2, list(range(25)))
    assert e.value.error == Error.PollConfigInvalid
    p.create_poll(ALICE, 12, 12, 10, 4, 1, 1, 2, list(range(25)))  # 5^4 ok
