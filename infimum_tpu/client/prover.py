"""Prover orchestration: the native replacement for the reference CLI's
snarkjs pipeline (cli/src/utils.ts:47-163).

`get_poll_results` drains process/tally batches exactly like the reference
drains `poll.processMessages(...)` / `poll.tallyVotesNonQv()` from maci-core
(utils.ts:104-126); `prove` runs this stack's Groth16 prover per batch and
self-verifies (utils.ts:69-92); `prove_poll_results` assembles the proof
batches plus the `PollOutcome` object (tally results, per-option quinary
Merkle proofs, salts, commitments — utils.ts:128-163)."""

from __future__ import annotations

import random
from dataclasses import dataclass

from ..circuits.process import ProcessCircuit
from ..circuits.tally import TallyCircuit
from ..groth16.groth16 import prove, verify, ProvingKey, VerifyingKey
from ..io.arkworks import serialize_vkey, serialize_proof, fr_to_hash_bytes
from ..maci.keys import Keypair
from ..maci.replay import MaciReplay
from ..maci.state import PollOutcome
from ..tree.full import FullTree
from ..witness.process import ProcessWitnessBuilder
from ..witness.tally import TallyWitnessBuilder, Ballot


@dataclass
class ProverKeys:
    """Circuit build artifacts: the counterpart of the reference's zkey/wasm
    directory the Coordinator loads (cli/src/user/coordinator.ts:12-23,
    cli/src/serialize.ts:48 loadVerifyingKeys)."""

    process_circuit: ProcessCircuit
    tally_circuit: TallyCircuit
    process_pk: ProvingKey
    tally_pk: ProvingKey

    @classmethod
    def generate(cls, registration_depth: int, interaction_depth: int,
                 process_subtree_depth: int, tally_subtree_depth: int,
                 vote_option_tree_depth: int,
                 rng: random.Random | None = None) -> "ProverKeys":
        """Build both circuits for a poll configuration and run the (insecure,
        single-party) trusted setup — the reference gets these from a
        powersoftau ceremony + snarkjs zkey (circuits/README.md:10-33)."""
        rng = rng or random.Random(0xC0FFEE)
        pc = ProcessCircuit(
            state_tree_depth=registration_depth,
            msg_tree_depth=interaction_depth,
            msg_batch_depth=process_subtree_depth,
            vote_option_tree_depth=vote_option_tree_depth,
        )
        tc = TallyCircuit(
            state_tree_depth=registration_depth,
            int_state_tree_depth=tally_subtree_depth,
            vote_option_tree_depth=vote_option_tree_depth,
        )
        from ..groth16.pkcache import setup_cached

        return cls(pc, tc, setup_cached(pc.cs, rng, label="process"),
                   setup_cached(tc.cs, rng, label="tally"))

    @classmethod
    def dims_only(cls, registration_depth: int, interaction_depth: int,
                  process_subtree_depth: int, tally_subtree_depth: int,
                  vote_option_tree_depth: int) -> "ProverKeys":
        """Circuit dimensions without constraint systems or keys: enough for
        witness building / commitment chaining (integration tests, planning),
        not for proving."""
        pc = ProcessCircuit(
            state_tree_depth=registration_depth,
            msg_tree_depth=interaction_depth,
            msg_batch_depth=process_subtree_depth,
            vote_option_tree_depth=vote_option_tree_depth, build=False,
        )
        tc = TallyCircuit(
            state_tree_depth=registration_depth,
            int_state_tree_depth=tally_subtree_depth,
            vote_option_tree_depth=vote_option_tree_depth, build=False,
        )
        return cls(pc, tc, None, None)

    def vkeys(self) -> dict:
        """Pallet-shaped {process, tally} vkey byte dicts, the registration
        payload of register_as_coordinator (pallet/src/lib.rs:274-316)."""
        return {
            "process": serialize_vkey(self.process_pk.vk),
            "tally": serialize_vkey(self.tally_pk.vk),
        }

    def prewarm(self, verbose: bool = True) -> dict:
        """Load every device kernel shape both circuits need (H pipeline,
        row evaluation, all five MSM shapes) by running one throwaway proof
        per circuit over a zero witness, BEFORE real proving starts.

        A fresh process otherwise pays the per-kernel executable loads
        inside batch 0, where a silent slow path (export miss -> full
        re-trace) is indistinguishable from a hang (round-4 verdict item 2:
        batch-0 latencies of 55 s / 156 s / 1,334 s for identical work).
        Returns {kernel_load_log, prewarm_s}; TPU-only, no-op elsewhere."""
        import time

        from ..utils.backend import platform
        from ..utils import aot

        if platform() != "tpu":
            return {"prewarm_s": 0.0, "kernel_load_log": []}
        t0 = time.perf_counter()
        n_before = len(aot.LOAD_LOG)
        for circuit, pk in ((self.process_circuit, self.process_pk),
                            (self.tally_circuit, self.tally_pk)):
            if pk is None:
                continue
            circuit.cs._native_prog()   # one-time hint-program compile
            prove(pk, circuit.cs, [0] * circuit.cs.num_vars,
                  rng=random.Random(0))
        out = {"prewarm_s": round(time.perf_counter() - t0, 3),
               "kernel_load_log": list(aot.LOAD_LOG[n_before:])}
        if verbose:
            import sys

            print(f"[prewarm] {out['prewarm_s']}s, "
                  f"{len(out['kernel_load_log'])} kernel loads",
                  file=sys.stderr, flush=True)
        return out


class PollProver:
    """Per-poll proving session; replays chain events and emits proof
    batches + the outcome."""

    def __init__(self, keys: ProverKeys, coordinator: Keypair,
                 poll_config, poll_end_timestamp: int,
                 rng: random.Random | None = None):
        self.keys = keys
        self.rng = rng or random.Random(0x5EED)
        self.replay = MaciReplay(
            state_tree_depth=poll_config.registration_depth,
            msg_tree_depth=poll_config.interaction_depth,
            msg_batch_depth=poll_config.process_subtree_depth,
            vote_option_tree_depth=poll_config.vote_option_tree_depth,
            coordinator=coordinator,
            poll_end_timestamp=poll_end_timestamp,
        )
        self.config = poll_config

    # -- event ingestion (the event stream is the DA layer, README.md:51-54) --

    def ingest_events(self, events, poll_index: int):
        """Feed pallet events (ParticipantRegistered / PollInteraction) into
        the replay, mirroring the reference e2e's offchain maci-core replay
        (cli/__tests__/e2e.test.ts:75-110)."""
        for ev in events:
            if ev.name == "ParticipantRegistered" and ev.data["poll"] == poll_index:
                self.replay.sign_up(tuple(ev.data["public_key"]),
                                    timestamp=ev.data["block"])
            elif ev.name == "PollInteraction" and ev.data["poll"] == poll_index:
                self.replay.publish(list(ev.data["data"]),
                                    tuple(ev.data["public_key"]))

    # -- batch draining (utils.ts:104-126) ------------------------------------

    def get_poll_results(self):
        """Drain every process batch then every tally batch, returning
        (process_batches, tally_batches, tally_builder) where each batch is
        (circuit_values, meta)."""
        pb = ProcessWitnessBuilder(self.keys.process_circuit, self.replay)
        process_batches = list(pb.batches(self.rng))
        d = self.config.vote_option_tree_depth
        ballots = [Ballot(nonce=b.nonce, votes=list(b.votes))
                   for b in self.replay.ballots]
        tb = TallyWitnessBuilder(
            self.keys.tally_circuit,
            state_root=pb.state_tree.root,
            sb_salt=pb.sb_salt,
            ballots=ballots,
            num_signups=self.replay.num_signups,
        )
        tally_batches = [tb.batch_inputs(self.rng)
                         for _ in range(tb.num_batches)]
        return process_batches, tally_batches, tb

    # -- proving (utils.ts:57-102) --------------------------------------------

    def _prove_one(self, circuit, pk: ProvingKey, values) -> dict:
        witness = circuit.assignment(values)
        proof = prove(pk, circuit.cs, witness, rng=self.rng)
        publics = circuit.public_inputs(values)
        # self-verify before submission, like utils.ts:77,92
        assert verify(pk.vk, proof, publics), "self-verification failed"
        return serialize_proof(proof)

    def prove_poll_results(self):
        """The reference's provePollResults (utils.ts:47-55): returns
        (proof_batches, outcome) ready for commit_outcome.

        Witness generation is parallel across batches (SURVEY.md §2.5
        "witness generator: embarrassingly parallel across batches"):
        forked worker processes compute batch assignments concurrently and
        stream them in order (witness/parallel.py iter_assignments) while
        proving runs on the device, so the first proof starts as soon as
        batch 0's witness lands and finished witnesses are dropped after
        use — the reference instead proves batches in a strictly sequential
        for loop with an in-process WASM witness calculator
        (cli/src/utils.ts:67-94). Set INFIMUM_PARALLEL_WITNESS=0 to force
        the sequential thread-prefetch pipeline (one witness computed ahead
        of the in-flight proof)."""
        import itertools
        import os
        from concurrent.futures import ThreadPoolExecutor

        process_batches, tally_batches, tb = self.get_poll_results()
        jobs = [(self.keys.process_circuit, self.keys.process_pk, v, m)
                for v, m in process_batches]
        jobs += [(self.keys.tally_circuit, self.keys.tally_pk, v, m)
                 for v, m in tally_batches]

        use_mp = (os.environ.get("INFIMUM_PARALLEL_WITNESS", "1") != "0"
                  and (os.cpu_count() or 1) > 1 and len(jobs) > 1)
        if use_mp:
            from ..witness.parallel import iter_assignments

            witnesses = itertools.chain(
                iter_assignments(self.keys.process_circuit,
                                 [v for v, _ in process_batches]),
                iter_assignments(self.keys.tally_circuit,
                                 [v for v, _ in tally_batches]))
            batches = self._prove_stream(jobs, lambda: next(witnesses))
        else:
            with ThreadPoolExecutor(max_workers=1) as ex:
                futs = iter([ex.submit(c.assignment, v)
                             for c, _, v, _ in jobs])
                batches = self._prove_stream(jobs, lambda: next(futs).result())
        return batches, self._outcome(tb)

    def _prove_stream(self, jobs, next_witness):
        batches = []
        for circuit, pk, values, meta in jobs:
            witness = next_witness()
            proof = prove(pk, circuit.cs, witness, rng=self.rng)
            publics = circuit.public_inputs(values)
            assert verify(pk.vk, proof, publics), "self-verification failed"
            batches.append((serialize_proof(proof),
                            fr_to_hash_bytes(meta["new_commitment"])))
        return batches

    def _outcome(self, tb: TallyWitnessBuilder) -> PollOutcome:
        """PollOutcome construction (utils.ts:128-163): final results, one
        quinary inclusion proof per vote option, salts and commitments."""
        d = self.config.vote_option_tree_depth
        results_tree = FullTree(5, d, 0, tb.results)
        proofs = []
        for option in range(len(tb.results)):
            elements, _ = results_tree.path(option)
            proofs.append(elements)
        from ..hash.poseidon_host import poseidon

        return PollOutcome(
            tally_results=list(tb.results),
            tally_result_proofs=proofs,
            total_spent=tb.spent,
            total_spent_salt=tb._spent_salt,
            tally_result_salt=tb._results_salt,
            new_results_commitment=poseidon([results_tree.root,
                                             tb._results_salt]),
            spent_votes_hash=poseidon([tb.spent, tb._spent_salt]),
        )
