"""Offchain MACI replay: encrypt -> publish -> process -> tally, with our own
key material (the coordinator/participant flow of cli/__tests__/e2e.test.ts)."""

import pytest

from infimum_tpu.maci.keys import Keypair
from infimum_tpu.maci.replay import (
    MaciReplay, pack_command, unpack_command_word, decrypt_message,
)
from infimum_tpu.hash.cipher import poseidon_encrypt
from infimum_tpu.hash.poseidon_host import poseidon


COORD = Keypair(sk=123456789)
ALICE = Keypair(sk=111)
BOB = Keypair(sk=222)


def _vote_message(voter: Keypair, state_index: int, vote_option: int,
                  weight: int, nonce: int, salt: int = 42, new_pub=None):
    """Build an encrypted MACI vote message (PCommand.encrypt flow)."""
    new_pub = new_pub or voter.pub
    packed = pack_command(state_index, vote_option, weight, nonce, 0,
                          new_pub, salt)
    sig_r8, sig_s = voter.sign(poseidon(packed))
    eph = Keypair(sk=salt * 7919 + 1)
    shared = eph.ecdh(COORD.pub)
    data = poseidon_encrypt(packed + [sig_r8[0], sig_r8[1], sig_s],
                            shared, 0)
    return data, eph.pub


def _poll(**kw):
    args = dict(state_tree_depth=10, msg_tree_depth=2, msg_batch_depth=1,
                vote_option_tree_depth=2, coordinator=COORD,
                poll_end_timestamp=25)
    args.update(kw)
    return MaciReplay(**args)


def test_pack_unpack_roundtrip():
    w0 = pack_command(3, 7, 9, 1, 0, (1, 2), 5)[0]
    assert unpack_command_word(w0) == (3, 7, 9, 1, 0)


def test_decrypt_roundtrip():
    data, eph_pub = _vote_message(ALICE, 1, 5, 1, 1)
    cmd = decrypt_message(data, COORD, eph_pub)
    assert cmd.state_index == 1
    assert cmd.vote_option_index == 5
    assert cmd.new_vote_weight == 1
    assert cmd.nonce == 1
    assert cmd.new_pub == ALICE.pub


def test_valid_vote_applies():
    poll = _poll()
    poll.sign_up(ALICE.pub, timestamp=2)
    data, eph_pub = _vote_message(ALICE, 1, 5, 1, 1)
    poll.publish(data, eph_pub)
    poll.process_all()
    assert poll.ballots[1].votes[5] == 1
    assert poll.ballots[1].nonce == 1
    assert poll.leaves[1].voice_credits == 0


def test_invalid_signature_ignored():
    poll = _poll()
    poll.sign_up(ALICE.pub, timestamp=2)
    # Bob signs a command claiming Alice's state index: signature check fails
    data, eph_pub = _vote_message(BOB, 1, 3, 1, 1)
    poll.publish(data, eph_pub)
    poll.process_all()
    assert poll.ballots[1].votes == [0] * 25


def test_wrong_nonce_ignored():
    poll = _poll()
    poll.sign_up(ALICE.pub, timestamp=2)
    data, eph_pub = _vote_message(ALICE, 1, 3, 1, 2)  # nonce must start at 1
    poll.publish(data, eph_pub)
    poll.process_all()
    assert poll.ballots[1].votes == [0] * 25


def test_insufficient_credits_ignored():
    poll = _poll()
    poll.sign_up(ALICE.pub, timestamp=2)
    data, eph_pub = _vote_message(ALICE, 1, 3, 2, 1)  # weight 2 > balance 1
    poll.publish(data, eph_pub)
    poll.process_all()
    assert poll.ballots[1].votes == [0] * 25


def test_reverse_order_last_message_wins():
    """Messages apply in reverse: the LAST published message is applied FIRST,
    so an earlier message with the same nonce is rejected afterwards."""
    poll = _poll()
    poll.sign_up(ALICE.pub, timestamp=2)
    d1 = _vote_message(ALICE, 1, 3, 1, 1)
    d2 = _vote_message(ALICE, 1, 7, 1, 1)
    poll.publish(*[*d1])
    poll.publish(*[*d2])
    poll.process_all()
    # d2 (published later) is processed first and wins; d1 then has stale nonce
    assert poll.ballots[1].votes[7] == 1
    assert poll.ballots[1].votes[3] == 0


def test_key_change_then_vote():
    """MACI collusion resistance: rotate key (nonce 1), then vote with the
    new key (nonce 2); published in that order means the VOTE must be
    published first to be applied last... i.e. messages are submitted in
    reverse of intended application order."""
    poll = _poll()
    poll.sign_up(ALICE.pub, timestamp=2)
    new_key = Keypair(sk=999)
    # intended application order: (1) rotate to new_key, (2) vote with new_key
    rotate = _vote_message(ALICE, 1, 0, 0, 1, new_pub=new_key.pub)
    vote = _vote_message(new_key, 1, 9, 1, 2)
    # publish in reverse of application order
    poll.publish(*vote)
    poll.publish(*rotate)
    poll.process_all()
    assert poll.leaves[1].pub == new_key.pub
    assert poll.ballots[1].votes[9] == 1


def test_sb_commitment_and_trees():
    poll = _poll()
    poll.sign_up(ALICE.pub, timestamp=2)
    poll.sign_up(BOB.pub, timestamp=2)
    data, eph = _vote_message(ALICE, 1, 5, 1, 1)
    poll.publish(data, eph)
    poll.process_all()
    # state tree contains blank leaf + two users; depth grows organically
    assert poll.num_signups == 3
    assert poll.actual_state_tree_depth == 2
    c = poll.sb_commitment(777)
    assert c == poseidon([poll.state_tree().root, poll.ballot_tree().root, 777])
