"""Standalone full-pipeline e2e at REFERENCE circuit dimensions on the real
device (no pytest/conftest platform override): the reference CLI lifecycle
(cli/__tests__/e2e.test.ts:49-132) chain-free — setup -> lifecycle ->
witness -> prove -> pallet verify -> outcome — with per-phase timings.

Usage:  python scripts/e2e_tpu.py [--phases-only]

Prints one JSON line with phase timings; exit nonzero on any failure.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIG = dict(registration_depth=10, interaction_depth=2,
              process_subtree_depth=1, tally_subtree_depth=1,
              vote_option_tree_depth=2)
SIGNUP, VOTING = 12, 12


def main():
    timings = {}

    def clock(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)
                print(f"[{name}] {timings[name]}s", file=sys.stderr, flush=True)

        return _T()

    import jax

    platform = jax.devices()[0].platform
    from infimum_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from infimum_tpu.client import Coordinator, Participant, ProverKeys
    from infimum_tpu.client.prover import PollProver
    from infimum_tpu.pallet import InfimumPallet

    with clock("build_circuits"):
        keys = ProverKeys.dims_only(**CONFIG)
        from infimum_tpu.circuits.process import ProcessCircuit
        from infimum_tpu.circuits.tally import TallyCircuit

        pc = ProcessCircuit(
            state_tree_depth=CONFIG["registration_depth"],
            msg_tree_depth=CONFIG["interaction_depth"],
            msg_batch_depth=CONFIG["process_subtree_depth"],
            vote_option_tree_depth=CONFIG["vote_option_tree_depth"])
        tc = TallyCircuit(
            state_tree_depth=CONFIG["registration_depth"],
            int_state_tree_depth=CONFIG["tally_subtree_depth"],
            vote_option_tree_depth=CONFIG["vote_option_tree_depth"])
    timings["process_constraints"] = len(pc.cs.constraints)
    timings["process_vars"] = pc.cs.num_vars
    timings["tally_constraints"] = len(tc.cs.constraints)

    from infimum_tpu.groth16.groth16 import setup

    rng = random.Random(99)
    with clock("setup_process"):
        process_pk = setup(pc.cs, rng)
    with clock("setup_tally"):
        tally_pk = setup(tc.cs, rng)
    keys = ProverKeys(pc, tc, process_pk, tally_pk)

    with clock("lifecycle"):
        pallet = InfimumPallet()
        coordinator = Coordinator("alice", sk=0xA11CE, keys=keys)
        participants = [Participant(n, sk) for n, sk in
                        (("bob", 0xB0B), ("charlie", 0xC0C), ("dave", 0xD0D))]
        coordinator.register(pallet)
        coordinator.create_poll(pallet, SIGNUP, VOTING)
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

    with clock("witness_inputs"):
        process_batches, tally_batches, tb = prover.get_poll_results()

    from infimum_tpu.groth16.groth16 import prove, verify
    from infimum_tpu.io.arkworks import serialize_proof, fr_to_hash_bytes

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

    with clock("commit_outcome"):
        outcome = prover._outcome(tb)
        pallet.commit_outcome("alice", 0, batches, outcome)
    assert pallet.polls[0].outcome == 5, \
        f"wrong outcome {pallet.polls[0].outcome}"

    total = sum(v for k, v in timings.items()
                if isinstance(v, float))
    prove_latency = sum(v for k, v in timings.items()
                        if k.startswith(("witness_process", "witness_tally",
                                         "prove_", "witness_inputs")))
    print(json.dumps({
        "ok": True, "platform": platform, "outcome": 5,
        "proof_latency_s": round(prove_latency, 3),
        "total_s": round(total, 3), **timings,
    }))


if __name__ == "__main__":
    main()
