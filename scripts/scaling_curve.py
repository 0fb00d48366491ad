"""Virtual-mesh MSM scaling artifact: sharded Pippenger at mesh widths
1/2/4/8 on forced CPU devices, one JSON line out.

Two curves (round-4 verdict item 7 — a fixed-total-work curve on 2 shared
cores carries no scaling signal):

  - weak: N = SCALING_N_PER_DEV points PER DEVICE. With constant
    per-device work, flat time = perfect scaling; on this host the virtual
    devices share 2 physical cores, so the honest expectation is flat up
    to 2 devices and ~d/2 growth beyond — deviations from THAT model are
    the signal.
  - strong: fixed total N = SCALING_N split across devices (kept for
    cross-round comparability).

Plus the communication model: per-device bytes crossing the interconnect
for the window reduction under both reduction modes
(parallel/msm.reduction_comm_bytes) — the quantity that governs the
BASELINE >=70% multi-host efficiency target once the bucket accumulation
(embarrassingly parallel, O(N)) dominates. On a v5e ICI link (~4.5e10 B/s
per direction) the permute reduction's ~25 KB/device is ~1 us — the
reduction is latency-bound, not bandwidth-bound, at every realistic poll
size.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/scaling_curve.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from infimum_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import random

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from infimum_tpu.curve.bn254_host import G1_GEN, g1_mul
    from infimum_tpu.curve.proj import G1_DEV
    from infimum_tpu.ff.bn254 import FR_MOD
    from infimum_tpu.msm.pippenger import (
        combine_windows, encode_msm_inputs, msm_host,
    )
    from infimum_tpu.parallel.msm import (
        make_sharded_window_sums, reduction_comm_bytes,
    )

    # c=4 by default: the c=8 bucket kernel takes >25 min to compile on
    # XLA:CPU (2-core CI hosts) for a one-shot validation run; on TPU the
    # production per-shard kernel is the Pallas pipeline (c=8), whose
    # throughput the single-chip bench captures. SCALING_C=8 opts in.
    c = int(os.environ.get("SCALING_C", "4"))
    lanes = int(os.environ.get("SCALING_LANES", "8"))
    reps = int(os.environ.get("SCALING_REPS", "2"))
    widths = tuple(int(w) for w in os.environ.get(
        "SCALING_WIDTHS", "1,2,4,8").split(","))
    n_strong = int(os.environ.get("SCALING_N", str(1 << 11)))
    n_per_dev = int(os.environ.get("SCALING_N_PER_DEV", str(1 << 10)))
    reduce_mode = os.environ.get("SCALING_REDUCE", "auto")

    rng = random.Random(31)
    nbase = 64
    base = [g1_mul(G1_GEN, rng.randrange(1, FR_MOD)) for _ in range(nbase)]

    def run_width(d, n):
        """Correctness-gated timed sharded MSM of n points on d devices."""
        devs = jax.devices()[:d]
        if len(devs) < d:
            return None
        points = [base[i % nbase] for i in range(n)]
        scalars = [rng.randrange(FR_MOD) for _ in range(n)]
        agg = [0] * nbase
        for i, s in enumerate(scalars):
            agg[i % nbase] = (agg[i % nbase] + s) % FR_MOD
        want = msm_host(base, agg)
        mesh = Mesh(np.array(devs), ("dp",))
        pts, sc = encode_msm_inputs(points, scalars, G1_DEV, d * lanes)
        fn = jax.jit(make_sharded_window_sums(mesh, "dp", G1_DEV, c, lanes,
                                              reduce=reduce_mode))
        sh = NamedSharding(mesh, P("dp"))
        dp = jax.device_put(jax.numpy.asarray(pts), sh)
        ds = jax.device_put(jax.numpy.asarray(sc), sh)
        wins = jax.block_until_ready(fn(dp, ds))          # compile + warm
        assert combine_windows(G1_DEV, wins, c) == want, f"mismatch d={d}"
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(dp, ds))
            times.append(time.perf_counter() - t0)
        return round(min(times) * 1e3, 1)

    weak, strong, comm = {}, {}, {}
    for d in widths:
        ms = run_width(d, n_per_dev * d)
        if ms is None:
            break
        weak[str(d)] = ms
        comm[str(d)] = reduction_comm_bytes(d, G1_DEV, c, reduce_mode)
    if os.environ.get("SCALING_STRONG", "1") == "1":
        for d in widths:
            ms = run_width(d, n_strong)
            if ms is None:
                break
            strong[str(d)] = ms

    host_cores = os.cpu_count() or 1
    print(json.dumps({
        "weak_ms_per_const_work": weak,
        "weak_n_per_device": n_per_dev,
        "strong_ms": strong,
        "strong_n": n_strong,
        "reduction_comm": comm,
        "c": c, "lanes": lanes, "host_cores": host_cores,
        "correct": True,
        "note": (f"virtual CPU mesh sharing {host_cores} physical cores: "
                 "expect weak-scaling time flat to min(d, cores) then "
                 "~d/cores growth; the artifact validates the sharded "
                 "program + reduction comm model, not hardware slope"),
    }))


if __name__ == "__main__":
    main()
