"""Worker for the 2-process jax.distributed test (tests/test_distributed.py).

Each process owns 2 virtual CPU devices; the pair forms a 4-device global
mesh. Exercises parallel/distributed.py's multi-process path end-to-end:
cluster join, global mesh, host-local shard materialization, and a psum
collective across process boundaries."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from infimum_tpu.parallel.distributed import (
    initialize, proving_mesh, host_shard, global_array,
)


def main():
    assert initialize() is True, "expected multi-process initialization"
    assert jax.process_count() == 2
    assert jax.device_count() == 4
    assert len(jax.local_devices()) == 2

    n = 8
    sl = host_shard(n)
    expect_start = jax.process_index() * (n // 2)
    assert sl == slice(expect_start, expect_start + n // 2), sl

    mesh = proving_mesh()
    local = np.arange(n, dtype=np.float32)[sl]
    arr = global_array(local, mesh)
    assert arr.shape == (n,)

    f = shard_map(lambda x: jax.lax.psum(x.sum(), "dp"),
                  mesh=mesh, in_specs=P("dp"), out_specs=P())
    total = float(np.asarray(jax.device_get(jax.jit(f)(arr))))
    assert total == float(sum(range(n))), total
    print(f"DIST_OK pid={jax.process_index()} procs={jax.process_count()} "
          f"total={int(total)}", flush=True)


if __name__ == "__main__":
    main()
