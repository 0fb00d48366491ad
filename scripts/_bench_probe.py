"""Instrumented version of bench.py's MSM path to find where time goes."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import random

t0 = time.time()
def el(m): print(f'[{time.time()-t0:7.1f}s] {m}', flush=True)

from infimum_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp
el(f'jax up, devices={jax.devices()}')

from infimum_tpu.curve.bn254_host import G1_GEN, g1_mul
from infimum_tpu.curve.proj import G1_DEV
from infimum_tpu.ff.bn254 import FR_MOD
from infimum_tpu.ff.limbs import NLIMBS, batch_to_limbs
from infimum_tpu.msm.pippenger import msm_host

n = int(os.environ.get("BENCH_N", str(1 << 20)))
lanes = 1024
rng = random.Random(20260817)
nbase = min(256, n)
base = [g1_mul(G1_GEN, rng.randrange(1, FR_MOD)) for _ in range(nbase)]
el('base points made')
base_rows = G1_DEV.encode_affine(base).reshape(nbase, 2 * NLIMBS)
scalars = [rng.randrange(0, FR_MOD) for _ in range(n)]
el('scalars made')

from infimum_tpu.msm.pallas_msm import _msm_fn, combine_window_points

t = -(-n // lanes)
npad = t * lanes
rows = np.zeros((npad, 2 * NLIMBS), dtype=np.uint32)
rows[:n] = np.tile(base_rows, (-(-n // nbase), 1))[:n]
sc = np.zeros((npad, NLIMBS), dtype=np.uint32)
sc[:n] = batch_to_limbs(scalars)
el('host encode done')
fn = _msm_fn(t, lanes // 8, None, False)
dr, ds = jnp.asarray(rows), jnp.asarray(sc)
jax.block_until_ready((dr, ds))
el(f'transfer done ({rows.nbytes/1e6:.0f}+{sc.nbytes/1e6:.0f} MB)')
wins = np.asarray(fn(dr, ds))
el('compile + first run done')
agg = [0] * nbase
for i, s in enumerate(scalars):
    agg[i % nbase] = (agg[i % nbase] + s) % FR_MOD
want = msm_host(base, agg)
got = combine_window_points(wins)
el(f'correct: {got == want}')
times = []
for _ in range(3):
    tt = time.perf_counter()
    np.asarray(fn(dr, ds))
    times.append(time.perf_counter() - tt)
el(f'best {min(times)*1e3:.1f} ms -> {n/min(times):,.0f} pts/s')
