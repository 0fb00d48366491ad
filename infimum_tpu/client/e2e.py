"""Reference-dims end-to-end pipeline with per-phase timings.

Runs the reference CLI lifecycle (cli/__tests__/e2e.test.ts:49-132)
chain-free at the exact reference circuit instantiation
(ProcessMessages(10,2,1,2) / TallyVotes(10,1,2), main-process.circom:4 /
main-tally.circom:4): circuit build -> trusted setup -> poll lifecycle ->
witness -> Groth16 prove (device NTT/MSMs) -> pallet verify (native
pairing) -> outcome. Used by scripts/e2e_tpu.py and bench.py's
proof-latency metric.
"""

from __future__ import annotations

import random
import sys
import time

REFERENCE_CONFIG = dict(registration_depth=10, interaction_depth=2,
                        process_subtree_depth=1, tally_subtree_depth=1,
                        vote_option_tree_depth=2)
SIGNUP, VOTING = 12, 12


class _Clock:
    def __init__(self, timings, verbose):
        self.timings = timings
        self.verbose = verbose

    def __call__(self, name):
        return _Stage(self, name)


class _Stage:
    def __init__(self, clock, name):
        self.c = clock
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.c.timings[self.name] = round(time.perf_counter() - self.t0, 3)
        if self.c.verbose:
            print(f"[{self.name}] {self.c.timings[self.name]}s",
                  file=sys.stderr, flush=True)


def run_reference_e2e(config: dict | None = None, verbose: bool = False,
                      seed: int = 99) -> dict:
    """Full pipeline at (default) reference dims; returns phase timings plus
    `proof_latency_s` (witness+prove across all batches, excl. setup) and
    asserts outcome correctness (option 5 wins). Raises on any failure."""
    config = dict(REFERENCE_CONFIG if config is None else config)
    timings: dict = {}
    clock = _Clock(timings, verbose)

    from .user import Coordinator, Participant
    from .prover import PollProver, ProverKeys
    from ..pallet import InfimumPallet
    from ..circuits.process import ProcessCircuit
    from ..circuits.tally import TallyCircuit
    from ..groth16.groth16 import prove, verify
    from ..groth16.pkcache import setup_cached
    from ..io.arkworks import serialize_proof, fr_to_hash_bytes

    with clock("build_circuits"):
        pc = ProcessCircuit(
            state_tree_depth=config["registration_depth"],
            msg_tree_depth=config["interaction_depth"],
            msg_batch_depth=config["process_subtree_depth"],
            vote_option_tree_depth=config["vote_option_tree_depth"])
        tc = TallyCircuit(
            state_tree_depth=config["registration_depth"],
            int_state_tree_depth=config["tally_subtree_depth"],
            vote_option_tree_depth=config["vote_option_tree_depth"])
    timings["process_constraints"] = len(pc.cs.constraints)
    timings["tally_constraints"] = len(tc.cs.constraints)

    # persisted trusted setup: the reference loads a ceremony-produced .zkey
    # per circuit instead of regenerating keys per run (circuits/README.md:
    # 10-33); setup_cached mirrors that with an on-disk key keyed by circuit
    # fingerprint + trapdoor seed (~10 min at these dims, seconds on reruns)
    rng = random.Random(seed)
    with clock("setup_process"):
        process_pk = setup_cached(pc.cs, rng, label="process")
    with clock("setup_tally"):
        tally_pk = setup_cached(tc.cs, rng, label="tally")
    keys = ProverKeys(pc, tc, process_pk, tally_pk)

    # load every kernel executable up front with per-kernel path logging,
    # so batch 0 measures proving, not startup (client/prover.py prewarm)
    with clock("prewarm"):
        warm = keys.prewarm(verbose=verbose)
    timings["kernel_load_log"] = warm["kernel_load_log"]

    with clock("lifecycle"):
        pallet = InfimumPallet()
        coordinator = Coordinator("alice", sk=0xA11CE, keys=keys)
        participants = [Participant(n, sk) for n, sk in
                        (("bob", 0xB0B), ("charlie", 0xC0C), ("dave", 0xD0D),
                         ("erin", 0xE417), ("frank", 0xF7A4))]
        coordinator.register(pallet)
        coordinator.create_poll(pallet, SIGNUP, VOTING)
        pallet.run_to_block(2)
        for p in participants:
            p.register(pallet, 0)
        pallet.run_to_block(14)
        coordinator.merge_poll_state(pallet)
        # 11 interactions -> three process batches (5^1 msgs each), and five
        # registrations -> three tally batches: batch 0 of each circuit pays
        # the one-time per-process executable loads, so >= 2 further batches
        # give an honest steady-state median. Messages are processed in
        # reverse publish order (process-messages.circom:228), so only the
        # last-published vote is valid (nonce 1); the duplicates are
        # in-circuit no-ops and the outcome stays option 5.
        for i in range(11):
            participants[0].vote(pallet, 0, coordinator.public_key,
                                 state_index=1, vote_option=5, weight=1,
                                 nonce=1, salt=1000 + i)
        pallet.run_to_block(26)
        coordinator.merge_poll_state(pallet)

    poll = pallet.polls[0]
    prover = PollProver(keys, coordinator.keypair, poll.config,
                        poll_end_timestamp=poll.voting_period_end(),
                        rng=random.Random(7))
    prover.ingest_events(pallet.events, 0)

    with clock("witness_inputs"):
        process_batches, tally_batches, tb = prover.get_poll_results()

    from ..groth16 import groth16 as g16

    batches = []
    for i, (values, meta) in enumerate(process_batches):
        with clock(f"witness_process_{i}"):
            w = pc.assignment(values)
        with clock(f"prove_process_{i}"):
            proof = prove(process_pk, pc.cs, w, rng=prover.rng)
        with clock(f"selfverify_process_{i}"):
            assert verify(process_pk.vk, proof, pc.public_inputs(values)), \
                "process self-verify failed"
        batches.append((serialize_proof(proof),
                        fr_to_hash_bytes(meta["new_commitment"])))
    timings["trace_process"] = dict(g16.LAST_PROVE_TRACE)  # steady batch
    for i, (values, meta) in enumerate(tally_batches):
        with clock(f"witness_tally_{i}"):
            w = tc.assignment(values)
        with clock(f"prove_tally_{i}"):
            proof = prove(tally_pk, tc.cs, w, rng=prover.rng)
        with clock(f"selfverify_tally_{i}"):
            assert verify(tally_pk.vk, proof, tc.public_inputs(values)), \
                "tally self-verify failed"
        batches.append((serialize_proof(proof),
                        fr_to_hash_bytes(meta["new_commitment"])))
    timings["trace_tally"] = dict(g16.LAST_PROVE_TRACE)

    with clock("commit_outcome"):
        outcome = prover._outcome(tb)
        pallet.commit_outcome("alice", batches, outcome)
    assert pallet.polls[0].outcome == 5, \
        f"wrong outcome {pallet.polls[0].outcome}"

    timings["proof_latency_s"] = round(sum(
        v for k, v in timings.items()
        if isinstance(v, float) and k.startswith(
            ("witness_process", "witness_tally", "prove_", "witness_inputs"))
    ), 3)
    timings["num_proofs"] = len(batches)
    timings["total_s"] = round(sum(
        v for v in timings.values() if isinstance(v, float)), 3)
    timings["outcome"] = 5
    return timings
