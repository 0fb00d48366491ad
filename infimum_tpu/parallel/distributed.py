"""Multi-host distributed backend: process initialization and mesh layout.

The reference has no distributed runtime at all (single Substrate dev node +
one Node.js prover process, SURVEY.md §2.5); this is the TPU-native scale-out
layer BASELINE.md's north star asks for (multi-host MSM ≥70% efficiency):

  - `initialize()` wraps jax.distributed.initialize for multi-host pods
    (controller-less: every host calls it with the same coordinator address,
    discovers the global device set over DCN, then all collectives ride
    ICI within a slice and DCN across slices).
  - `proving_mesh()` builds the canonical mesh for the proving pipeline:
    one flat data axis ("dp") across all chips — MSM points, NTT rows and
    Merkle leaves are all sharded over it, and the per-window/per-stage
    reductions (all_gather / all_to_all / psum) are inserted by the
    shard_map programs in parallel/{msm,ntt,tree}.py.
  - `host_shard()` slices the host-local portion of a global batch so each
    host only materializes (and feeds) its own chunk —
    jax.make_array_from_process_local_data handles device placement.

Single-host (including the CPU test mesh and single-chip TPU) is the
degenerate case: initialize() is a no-op and the mesh spans local devices.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join (or skip joining) a multi-host JAX cluster.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are None (the standard launcher contract). Returns True when a
    multi-process runtime was initialized, False for single-process runs.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    if not addr or nproc <= 1:
        return False
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=nproc, process_id=pid)
    return True


def proving_mesh(axis: str = "dp", devices=None) -> Mesh:
    """Flat one-axis mesh over all (global) devices — the layout every
    sharded proving kernel in this package uses."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def host_shard(n: int) -> slice:
    """The [start, stop) slice of a length-n globally-sharded batch this
    process is responsible for materializing (equal split by process)."""
    pc, pid = jax.process_count(), jax.process_index()
    assert n % pc == 0, f"batch {n} not divisible by {pc} processes"
    per = n // pc
    return slice(pid * per, (pid + 1) * per)


def global_array(local_np, mesh: Mesh, axis: str = "dp"):
    """Assemble a global sharded array from this process's local shard
    (single-process: a plain device_put with the sharded layout)."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(local_np, sharding)
    global_shape = (local_np.shape[0] * jax.process_count(),
                    *local_np.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, local_np, global_shape)
