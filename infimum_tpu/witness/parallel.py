"""Process-parallel witness generation across proof batches.

The reference proves batches in a strictly sequential loop, with the circom
WASM witness calculator re-run per batch inside one Node.js process
(reference cli/src/utils.ts:67-94, hot loop #1 in SURVEY.md §3.2). Batches
are data-independent — each one's witness depends only on its own circuit
inputs — so the TPU-native prover farms them out to worker processes while
the chip runs the previous batch's NTT/MSMs (SURVEY.md §2.5 "witness
generator: embarrassingly parallel across batches").

Implementation notes:
- Workers are forked, not spawned: the circuit object carries hint closures
  (groth16/r1cs.py hints are lambdas) that cannot cross a pickle boundary,
  but fork's copy-on-write address space shares them for free. The circuit
  is published through a module global before the fork so `initargs` never
  pickles it.
- Batch *inputs* are {int: int} dicts and witness *outputs* are int lists —
  both plain-data and cheaply picklable through the result pipe.
- Fork start method is POSIX-only; on platforms without fork (or when
  `processes=1` / a single batch) this degrades to the sequential path.
"""

from __future__ import annotations

import multiprocessing as mp
import os

_FORK_CIRCUIT = None
_FORK_BATCHES = None


def _eval_batch(i: int) -> list[int]:
    return _FORK_CIRCUIT.assignment(_FORK_BATCHES[i])


def parallel_assignments(circuit, batch_values: list[dict],
                         processes: int | None = None) -> list[list[int]]:
    """Witness assignments for every batch, preserving order.

    `circuit` is a ProcessCircuit/TallyCircuit (anything with
    .assignment(values) -> list[int]); `batch_values` the per-batch circuit
    input dicts. Uses min(len(batches), cpu_count) forked workers.
    """
    global _FORK_CIRCUIT, _FORK_BATCHES
    n = len(batch_values)
    nproc = processes if processes is not None else min(n, os.cpu_count() or 1)
    if n <= 1 or nproc <= 1 or "fork" not in mp.get_all_start_methods():
        return [circuit.assignment(v) for v in batch_values]
    _FORK_CIRCUIT, _FORK_BATCHES = circuit, batch_values
    try:
        ctx = mp.get_context("fork")
        with ctx.Pool(min(n, nproc)) as pool:
            return pool.map(_eval_batch, range(n))
    finally:
        _FORK_CIRCUIT = _FORK_BATCHES = None
