"""Verification consumer script: drives the package end-to-end at small dims
on CPU against independent ground truth (circomlib KAT, argmax outcome),
exercising this round's changes: pkcache-loaded proving keys, the streaming
parallel-witness prover path, and the reference-parity commit_outcome
semantics. Run: python scripts/_verify_probe.py"""

import jax

jax.config.update("jax_platforms", "cpu")

import random
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from infimum_tpu.hash.poseidon_host import poseidon

assert poseidon([1]) == int(
    "18586133768512220936620570745912940619677854269274689475585506675881198879027")
print("poseidon circomlibjs KAT OK")

from infimum_tpu.client.user import Coordinator, Participant
from infimum_tpu.client.prover import ProverKeys
from infimum_tpu.pallet import InfimumPallet
from infimum_tpu.circuits.process import ProcessCircuit
from infimum_tpu.circuits.tally import TallyCircuit
from infimum_tpu.groth16.pkcache import setup_cached

pc = ProcessCircuit(state_tree_depth=4, msg_tree_depth=1, msg_batch_depth=1,
                    vote_option_tree_depth=1)
tc = TallyCircuit(state_tree_depth=4, int_state_tree_depth=1,
                  vote_option_tree_depth=1)
with tempfile.TemporaryDirectory() as d:
    setup_cached(pc.cs, random.Random(11), "p", cache_dir=d)
    setup_cached(tc.cs, random.Random(12), "t", cache_dir=d)
    # second call loads from disk; proofs below use the LOADED keys
    ppk = setup_cached(pc.cs, random.Random(11), "p", cache_dir=d)
    tpk = setup_cached(tc.cs, random.Random(12), "t", cache_dir=d)
print("pkcache miss+hit OK")

keys = ProverKeys(pc, tc, ppk, tpk)
pallet = InfimumPallet()
coordinator = Coordinator("alice", sk=0xA11CE, keys=keys)
bob = Participant("bob", 0xB0B)
carol = Participant("carol", 0xCA401)
coordinator.register(pallet)
coordinator.create_poll(pallet, 12, 12)
pallet.run_to_block(2)
bob.register(pallet, 0)
carol.register(pallet, 0)
pallet.run_to_block(14)
coordinator.merge_poll_state(pallet)
# two batches of messages -> exercises the forked streaming witness pool
for i, (who, idx, opt) in enumerate(
        [(bob, 1, 3), (carol, 2, 3), (bob, 1, 3)]):
    who.vote(pallet, 0, coordinator.public_key, state_index=idx,
             vote_option=opt, weight=1, nonce=1, salt=500 + i)
pallet.run_to_block(26)
coordinator.merge_poll_state(pallet)
outcome_index = coordinator.prove_poll_results(pallet, 0,
                                               rng=random.Random(3))
assert pallet.polls[0].outcome == 3, pallet.polls[0].outcome
print(f"e2e outcome OK (option {pallet.polls[0].outcome} wins; "
      f"proofs Groth16-verified by the pallet's independent pairing)")
