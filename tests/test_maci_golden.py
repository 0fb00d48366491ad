"""Golden-value tests: replay the reference pallet's test scenario chain-free and
assert bit-exact roots, commitments and public signals
(reference: pallet/src/tests/extrinsics.rs:481-645)."""

from infimum_tpu.maci.state import Poll, PollConfig
from infimum_tpu.tree.zeros import (
    blank_state_leaf,
    merkle_zeros,
    empty_ballot_root,
    NOTHING_UP_MY_SLEEVE,
)

import ref_fixtures as fx


def make_poll() -> Poll:
    return Poll(index=0, created_at=1, config=PollConfig(**fx.POLL_CONFIG))


def register_all(poll: Poll):
    for pk in fx.PARTICIPANTS:
        poll.register_participant(pk, timestamp=2)  # registered at block 2


def test_zero_tables_match_reference():
    assert blank_state_leaf() == fx.BINARY_ZEROES_0
    assert NOTHING_UP_MY_SLEEVE == fx.QUINARY_ZEROES_0
    assert merkle_zeros(2)[0] == fx.BINARY_ZEROES_0
    assert merkle_zeros(2)[32] == fx.BINARY_ZEROES_32
    assert merkle_zeros(5)[32] == fx.QUINARY_ZEROES_32
    for i in range(5):
        assert empty_ballot_root(i) == fx.EMPTY_BALLOT_ROOTS[i]


def test_merge_registration_state():
    # reference: extrinsics.rs:481-521 merge_registration_state_success
    poll = make_poll()
    register_all(poll)
    poll.merge_registrations()
    assert poll.registrations.root == fx.GOLDEN_REG_ROOT
    assert poll.commitment.process == (0, fx.GOLDEN_PROCESS_COMMITMENT)


def test_merge_interaction_state():
    # reference: extrinsics.rs:525-575 merge_interaction_state_success
    poll = make_poll()
    register_all(poll)
    poll.merge_registrations()
    poll.consume_interaction(fx.SHARED_PK, fx.MESSAGE_DATA)
    poll.merge_interactions()
    assert poll.interactions.root == fx.GOLDEN_INT_ROOT
    assert poll.commitment.expected_process == 1
    assert poll.commitment.expected_tally == 2


def test_process_public_signals():
    # reference: extrinsics.rs:579-649 process_messages_public_signals
    poll = make_poll()
    register_all(poll)
    poll.merge_registrations()
    poll.consume_interaction(fx.SHARED_PK, fx.MESSAGE_DATA)
    poll.merge_interactions()

    new_commitment = fx.GOLDEN_PROCESS_SIGNALS[8]
    kind, inputs, new_c = poll.prepare_public_inputs(fx.COORD_PK, new_commitment)
    assert kind == "process"
    assert inputs == fx.GOLDEN_PROCESS_SIGNALS
    assert new_c.process == (1, new_commitment)

    # after committing the process proof, the next batch is a tally batch
    poll.commit(new_c)
    kind2, inputs2, new_c2 = poll.prepare_public_inputs(fx.COORD_PK, 12345)
    assert kind2 == "tally"
    assert inputs2 == [new_commitment, 0, 12345, 0, 4]
    poll.commit(new_c2)
    kind3, inputs3, new_c3 = poll.prepare_public_inputs(fx.COORD_PK, 777)
    assert kind3 == "tally"
    assert inputs3 == [new_commitment, 12345, 777, 2, 4]
    poll.commit(new_c3)
    assert poll.is_proven()


def test_period_predicates():
    poll = make_poll()
    assert poll.is_registration_period(1)
    assert poll.is_registration_period(12)
    assert not poll.is_registration_period(13)
    assert poll.is_voting_period(13)
    assert not poll.is_voting_period(25)
    assert poll.voting_period_end() == 25
    assert poll.is_over(26)
    assert not poll.is_over(25)
