"""Multi-process jax.distributed test: two real OS processes, each with 2
virtual CPU devices, form a 4-device cluster and run a cross-process psum
through parallel/distributed.py (initialize + proving_mesh + host_shard +
global_array).

This is the CPU stand-in for the multi-host TPU pod path (SURVEY.md §2.5
"distributed backend"; BASELINE.md multi-host scaling target) — the same
jax.distributed.initialize / make_array_from_process_local_data calls run
on real pods with the coordinator on DCN."""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

WORKER = pathlib.Path(__file__).parent / "helpers" / "dist_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_cluster_psum():
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    for pid in range(2):
        env = dict(env_base,
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2",
                   JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DIST_OK pid={pid} procs=2 total=28" in out, out
