"""Stage-level profiling of the Pallas MSM pipeline at production size.

Times, per window-iteration stage: (a) digit extract + sort + gather,
(b) run-emission accumulation kernel, (c) compaction, (d) weighted-sum
kernel — by building jitted sub-pipelines and timing with forced readback.
Run on the real TPU:  python scripts/msm_profile.py [logN]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def force(x):
    return [np.asarray(c) for c in x] if isinstance(x, (tuple, list)) \
        else np.asarray(x)


def main():
    from infimum_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import random

    import jax
    import jax.numpy as jnp

    from infimum_tpu.curve.bn254_host import G1_GEN, g1_mul
    from infimum_tpu.ff.bn254 import FR_MOD
    from infimum_tpu.ff.limbs import NLIMBS, batch_to_limbs
    from infimum_tpu.msm import pallas_msm as PM

    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << logn
    lanes = 1024
    W = lanes // 8
    T = n // lanes
    spec = PM.G1_SPEC
    AF, PR = spec.AF, spec.PR
    L = lanes
    Kpad = 128
    while Kpad < PM.N_BUCKETS + L:
        Kpad *= 2
    S2 = Kpad // 128

    rng = random.Random(1)
    nbase = 64
    base = [g1_mul(G1_GEN, rng.randrange(1, 100000)) for _ in range(nbase)]
    rows = np.tile(spec.encode_affine_rows(base), (n // nbase, 1))
    sc = batch_to_limbs([rng.randrange(FR_MOD) for _ in range(n)])
    dr, ds = jnp.asarray(rows), jnp.asarray(sc)

    C, NW, NB = (PM.G1_SPEC.c_bits, PM.G1_SPEC.n_windows,
                 PM.G1_SPEC.n_buckets)

    def _recode(sc):
        half, full_ = jnp.uint32(NB), jnp.uint32(2 * NB)

        def recode(carry, w):
            bitpos = C * w
            limb = bitpos // 16
            sh = bitpos % 16
            lo = jnp.take(sc, limb, axis=1)
            hi = jnp.where(limb + 1 < sc.shape[1],
                           jnp.take(sc, jnp.minimum(limb + 1,
                                                    sc.shape[1] - 1),
                                    axis=1), 0)
            comb = lo | (hi << 16)
            d = ((comb >> sh) & ((1 << C) - 1)) + carry
            neg = d > half
            return neg.astype(jnp.uint32), jnp.where(neg, full_ - d, d)

        _, mags = jax.lax.scan(recode, jnp.zeros((n,), jnp.uint32),
                               jnp.arange(NW, dtype=jnp.uint32))
        return mags

    # stage (a): NWx recode + sort + gather
    @jax.jit
    def stage_a(pts_rows, sc):
        mags = _recode(sc)

        def body(_, wi):
            digits = jnp.take(mags, wi, axis=0)
            sdig, order = jax.lax.sort_key_val(
                digits, jnp.arange(n, dtype=jnp.int32))
            srows = jnp.take(pts_rows, order, axis=0)
            return None, (srows.sum(dtype=jnp.uint32), sdig.sum())
        _, out = jax.lax.scan(body, None, jnp.arange(NW, dtype=jnp.uint32))
        return out

    # stage (a'): recode + sorts only
    @jax.jit
    def stage_sort(sc):
        mags = _recode(sc)

        def body(_, wi):
            sdig, order = jax.lax.sort_key_val(
                jnp.take(mags, wi, axis=0), jnp.arange(n, dtype=jnp.int32))
            return None, (sdig.sum(), order.sum())
        _, out = jax.lax.scan(body, None, jnp.arange(NW, dtype=jnp.uint32))
        return out

    # full pipeline for reference
    full = PM._msm_fn(T, W, None, False)

    def bench(name, fn, *args, reps=3):
        force(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force(fn(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)
        return min(ts)

    print(f"n=2^{logn} T={T} lanes={lanes} Kpad={Kpad}", flush=True)
    t_sort = bench("recode+sorts only (NWx)", stage_sort, ds)
    t_a = bench("recode+sort+gather (NWx)", stage_a, dr, ds)
    t_full = bench("full pipeline", full, dr, ds)
    print(f"accum+compact+weighted (derived): {(t_full-t_a)*1e3:.1f} ms",
          flush=True)
    print(f"points/sec full: {n/t_full:.0f}", flush=True)


if __name__ == "__main__":
    main()
