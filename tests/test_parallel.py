"""Multi-device (8 virtual CPU chips, conftest.py) tests for the sharded
proving kernels: Pippenger MSM window sums and the four-step sharded NTT.

These are the scale-out paths SURVEY.md §2.5 specifies (bucket reduction via
collectives; butterfly stages with all_to_all shard transposes). Correctness
is bit-exact vs the host bignum references, per BASELINE.md."""

import random

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from infimum_tpu.ff.bn254 import FR_MOD
from infimum_tpu.ntt.ntt import ntt_host, intt_host
from infimum_tpu.parallel.ntt import ntt_sharded, intt_roundtrip_sharded
from infimum_tpu.parallel.msm import msm_sharded
from infimum_tpu.curve.bn254_host import G1_GEN, g1_mul
from infimum_tpu.msm.pippenger import msm_host


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    return Mesh(np.array(devs[:8]), ("dp",))


def test_ntt_sharded_matches_host(mesh):
    rng = random.Random(7)
    n = 1 << 6
    values = [rng.randrange(FR_MOD) for _ in range(n)]
    assert ntt_sharded(values, mesh) == ntt_host(values)


def test_ntt_sharded_roundtrip(mesh):
    rng = random.Random(8)
    n = 1 << 8
    values = [rng.randrange(FR_MOD) for _ in range(n)]
    assert intt_roundtrip_sharded(values, mesh) == values


def test_intt_host_consistency():
    # sanity anchor for the host reference itself
    rng = random.Random(9)
    values = [rng.randrange(FR_MOD) for _ in range(16)]
    assert intt_host(ntt_host(values)) == values


def test_distributed_backend_single_process(mesh):
    """parallel/distributed.py helpers in the single-process degenerate
    case: no-op initialize, flat proving mesh, global_array placement."""
    from infimum_tpu.parallel.distributed import (
        initialize, proving_mesh, host_shard, global_array,
    )

    assert initialize() is False            # no coordinator configured
    m = proving_mesh(devices=jax.devices()[:8])
    assert m.shape["dp"] == 8
    assert host_shard(64) == slice(0, 64)
    arr = global_array(np.arange(64, dtype=np.uint32).reshape(8, 8), m)
    assert arr.shape == (8, 8)
    assert len(arr.sharding.device_set) == 8


def test_sharded_tree_binary_8dev(mesh):
    """Distributed binary Merkle build over all 8 devices (3 sharded levels
    + 2 local), bit-exact vs the dense host tree (parallel/tree.py)."""
    from infimum_tpu.parallel.tree import sharded_tree_root, host_tree_root
    from infimum_tpu.tree.full import FullTree

    rng = random.Random(11)
    leaves = [rng.randrange(FR_MOD) for _ in range(23)]   # partial fill
    got = sharded_tree_root(mesh, "dp", arity=2, depth=5, leaves=leaves)
    assert got == host_tree_root(2, 5, leaves)
    assert got == FullTree(2, 5, 0, leaves).root


def test_sharded_tree_quinary_5dev():
    """Quinary build on a 5-device submesh (mesh axis = tree arity)."""
    from infimum_tpu.parallel.tree import sharded_tree_root, host_tree_root

    devs = jax.devices()[:5]
    mesh5 = Mesh(np.array(devs), ("dp",))
    rng = random.Random(12)
    leaves = [rng.randrange(FR_MOD) for _ in range(101)]  # partial fill
    got = sharded_tree_root(mesh5, "dp", arity=5, depth=3, leaves=leaves)
    assert got == host_tree_root(5, 3, leaves)


def test_msm_sharded_matches_host(mesh):
    # c=4, lanes=2, 16 points: the exact kernel shape the driver's
    # dryrun_multichip compiles, so the two share one XLA compile-cache entry
    rng = random.Random(10)
    n = 8 * 2
    points = [g1_mul(G1_GEN, rng.randrange(1, 10_000)) for _ in range(n)]
    scalars = [rng.randrange(FR_MOD) for _ in range(n)]
    got = msm_sharded(points, scalars, mesh, c=4, lanes=2)
    assert got == msm_host(points, scalars)


def test_permute_reduction_matches_gather(mesh):
    """The ppermute recursive-halving window reduction must produce the
    same result as the all_gather + local-tree form it replaces (its
    comm volume is log2(D) x one window payload vs (D-1) payloads;
    parallel/msm.py reduce= modes)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from infimum_tpu.curve.proj import G1_DEV
    from infimum_tpu.msm.pippenger import combine_windows, encode_msm_inputs
    from infimum_tpu.parallel.msm import (
        make_sharded_window_sums, reduction_comm_bytes,
    )

    rng = random.Random(11)
    n = 8 * 2
    points = [g1_mul(G1_GEN, rng.randrange(1, 10_000)) for _ in range(n)]
    scalars = [rng.randrange(FR_MOD) for _ in range(n)]
    pts, sc = encode_msm_inputs(points, scalars, G1_DEV, n)
    sh = NamedSharding(mesh, P("dp"))
    dp = jax.device_put(jnp.asarray(pts), sh)
    ds = jax.device_put(jnp.asarray(sc), sh)
    results = {}
    for mode in ("gather", "permute"):
        fn = jax.jit(make_sharded_window_sums(mesh, "dp", G1_DEV, c=4,
                                              lanes=2, reduce=mode))
        results[mode] = combine_windows(G1_DEV, fn(dp, ds), 4)
    assert results["gather"] == results["permute"] == msm_host(points,
                                                               scalars)
    comm = reduction_comm_bytes(8, G1_DEV, 4)
    assert comm["mode"] == "permute" and comm["rounds"] == 3
    assert comm["per_device_bytes"] < reduction_comm_bytes(
        8, G1_DEV, 4, reduce="gather")["per_device_bytes"]


def test_parallel_witness_matches_sequential():
    """witness/parallel.py: forked per-batch assignments == sequential ones
    (SURVEY.md §2.5 parallel witness generator; the hint closures cross the
    fork boundary via copy-on-write, never pickle)."""
    import random

    from infimum_tpu.circuits.tally import TallyCircuit
    from infimum_tpu.witness.parallel import parallel_assignments

    tc = TallyCircuit(state_tree_depth=2, int_state_tree_depth=1,
                      vote_option_tree_depth=1)
    from infimum_tpu.witness.tally import TallyWitnessBuilder, Ballot

    ballots = [Ballot(nonce=1, votes=[1, 0, 2, 0, 0]) for _ in range(4)]
    tb = TallyWitnessBuilder(tc, state_root=123, sb_salt=7,
                             ballots=ballots, num_signups=4)
    rng = random.Random(3)
    batch_values = [tb.batch_inputs(rng)[0] for _ in range(tb.num_batches)]
    assert len(batch_values) >= 2
    seq = [tc.assignment(v) for v in batch_values]
    par = parallel_assignments(tc, batch_values, processes=2)
    assert par == seq


@pytest.mark.slow
def test_msm_sharded_64chunk_shards(mesh):
    """2^10 points across the 8-device mesh at the dryrun's kernel shape
    (c=4, lanes=2) but with 64 accumulation chunks per device — 64x the
    toy scan depth, exercising the sorted-run emission across real chunk
    boundaries. Wider shapes are deliberately NOT tested on CPU: every new
    (lanes, c) pair costs 15+ minutes of XLA:CPU compile on a 2-core host
    (c=8 >25 min), while on TPU the per-shard production kernel is the
    Pallas pipeline whose c=8 path the single-chip bench correctness-gates.
    Bit-exact vs the host Pippenger."""
    rng = random.Random(13)
    n = 1 << 10
    nbase = 64
    base = [g1_mul(G1_GEN, rng.randrange(1, FR_MOD)) for _ in range(nbase)]
    points = [base[i % nbase] for i in range(n)]
    scalars = [rng.randrange(FR_MOD) for _ in range(n)]
    got = msm_sharded(points, scalars, mesh, c=4, lanes=2)
    agg = [0] * nbase
    for i, s in enumerate(scalars):
        agg[i % nbase] = (agg[i % nbase] + s) % FR_MOD
    assert got == msm_host(base, agg)
