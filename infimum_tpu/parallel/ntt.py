"""Multi-chip sharded NTT over BN254 Fr (four-step / transpose algorithm).

The reference's QAP reduction runs snarkjs's single-threaded WASM FFT
(`groth16.fullProve`, reference cli/src/utils.ts:69-92) at domains up to
2^19-2^20 (ptau 19, circuits/README.md:18). This module scales that hot
loop across a device mesh the TPU way (SURVEY.md §2.5 row 4): Cooley-Tukey
split N = N2 x N1 so each butterfly phase is a *local* NTT, with the single
cross-device data movement expressed as one `all_to_all` shard transpose
over ICI.

Layout contract (N = N2 * N1, D = mesh axis size):

  natural form   a2d[j2, j1] = a[j2 * N1 + j1], shape (N2, N1, NLIMBS),
                 sharded P(None, 'axis')  — each device owns N1/D columns
  k-form         out[k2, k1] = NTT(a)[k1 * N2 + k2], shape (N2, N1, NLIMBS),
                 sharded P('axis', None) — each device owns N2/D rows

`ntt_sharded` maps natural -> k-form with
    1. local NTT of length N2 along axis 0 (the unsharded axis),
    2. local twiddle multiply by w^(j1*k2) (twiddles passed in, same sharding),
    3. one all_to_all (split axis 0, concat axis 1): resharding = transpose,
    4. local NTT of length N1 along axis 1.
`intt_sharded` is the exact step-by-step inverse (k-form -> natural), so
round-trips and pointwise algebra in k-form need no extra reordering: the
Groth16 coset pipeline (iNTT -> coset NTT -> pointwise -> coset iNTT) runs
entirely in these two layouts.

All values are Montgomery-form (NLIMBS,) uint32 limb vectors (ff/fp.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ff.bn254 import FR_MOD, fr_inv
from ..ff.fp import FR_CTX
from ..ff.limbs import NLIMBS, batch_to_limbs
from ..ntt.ntt import _root_of_unity, _stage_consts


def _ntt_local(a, logn: int, invert: bool, axis: int):
    """NTT of length 2^logn along `axis` of (..., NLIMBS) Montgomery limbs.

    Same stage loop as ntt/ntt.py:_ntt_core, generalized to a batched axis:
    XLA sees log2(n) reshaped butterfly stages of batched field ops.
    """
    n = 1 << logn
    rev, tw_flat, n_inv = _stage_consts(logn, invert)
    nd = a.ndim - 1  # data dims (last dim is limbs)
    if axis < 0:
        axis += nd
    # move the transform axis to position -2: (batch..., n, NLIMBS)
    perm = [i for i in range(nd) if i != axis] + [axis, nd]
    a = jnp.transpose(a, perm)
    batch_shape = a.shape[:-2]
    a = a.reshape(-1, n, NLIMBS)
    a = a[:, rev]
    for s in range(1, logn + 1):
        length = 1 << s
        half = length // 2
        tw = jnp.asarray(tw_flat[half - 1:length - 1])  # (half, NLIMBS)
        blocks = a.reshape(-1, n // length, length, NLIMBS)
        even = blocks[:, :, :half]
        odd = blocks[:, :, half:]
        v = FR_CTX.mont_mul(odd, tw[None, None, :, :])
        a = jnp.concatenate(
            [FR_CTX.add(even, v), FR_CTX.sub(even, v)], axis=2
        ).reshape(-1, n, NLIMBS)
    if invert:
        a = FR_CTX.mont_mul(a, jnp.asarray(n_inv)[None, None, :])
    a = a.reshape(*batch_shape, n, NLIMBS)
    # move the axis back
    inv_perm = list(range(nd + 1))
    inv_perm.insert(axis, inv_perm.pop(nd - 1))
    return jnp.transpose(a, inv_perm)


@functools.lru_cache(maxsize=None)
def _twiddle_matrix(logn2: int, logn1: int, invert: bool) -> np.ndarray:
    """w^(j1*k2) (or inverse) as (N2, N1, NLIMBS) Montgomery limbs."""
    n2, n1 = 1 << logn2, 1 << logn1
    w = _root_of_unity(n2 * n1)
    if invert:
        w = fr_inv(w)
    # row k2 is the geometric sequence (w^k2)^j1
    rows = []
    for k2 in range(n2):
        base = pow(w, k2, FR_MOD)
        vals = [1] * n1
        for j1 in range(1, n1):
            vals[j1] = vals[j1 - 1] * base % FR_MOD
        rows.append([FR_CTX.to_mont_int(v) for v in vals])
    flat = batch_to_limbs([v for row in rows for v in row])
    return flat.reshape(n2, n1, NLIMBS)


def _split(logn: int, ndev: int) -> tuple[int, int]:
    """Pick logn2 (axis-0 length) and logn1 with 2^logn1 % ndev == 0."""
    logd = ndev.bit_length() - 1
    assert 1 << logd == ndev, "mesh axis size must be a power of two"
    logn1 = max(logn // 2, logd)
    logn2 = logn - logn1
    # initial sharding needs N1 % D == 0; the all_to_all needs N2 % D == 0
    assert logn2 >= logd, f"domain 2^{logn} too small for {ndev} devices"
    return logn2, logn1


def make_ntt_sharded(mesh: Mesh, axis: str, logn: int, invert: bool = False):
    """Returns (fn, logn2, logn1): fn maps natural form -> k-form (see module
    docstring); twiddles are closed over as a sharded constant operand."""
    ndev = mesh.shape[axis]
    logn2, logn1 = _split(logn, ndev)
    tw = _twiddle_matrix(logn2, logn1, invert)

    def local(a_l, tw_l):
        # a_l: (N2, N1/D, NLIMBS) — device's column slab of natural form
        b = _ntt_local(a_l, logn2, invert, axis=0)       # NTT over j2 -> k2
        c = FR_CTX.mont_mul(b, tw_l)                     # w^(j1*k2)
        # reshard: split k2 across devices, gather all j1 (shard transpose)
        x = jax.lax.all_to_all(c, axis, split_axis=0, concat_axis=1,
                               tiled=True)               # (N2/D, N1, NLIMBS)
        return _ntt_local(x, logn1, invert, axis=1)      # NTT over j1 -> k1

    sm = shard_map(local, mesh=mesh,
                   in_specs=(P(None, axis), P(None, axis)),
                   out_specs=P(axis, None))

    tw_dev = jax.device_put(jnp.asarray(tw), NamedSharding(mesh, P(None, axis)))

    def fn(a2d):
        return sm(a2d, tw_dev)

    return fn, logn2, logn1


def make_intt_sharded(mesh: Mesh, axis: str, logn: int):
    """Returns fn mapping k-form -> natural form: the step-by-step inverse of
    make_ntt_sharded(invert=False)."""
    ndev = mesh.shape[axis]
    logn2, logn1 = _split(logn, ndev)
    tw = _twiddle_matrix(logn2, logn1, invert=True)

    def local(d_l, tw_inv_l):
        # d_l: (N2/D, N1, NLIMBS) — device's row slab of k-form
        x = _ntt_local(d_l, logn1, True, axis=1)         # inverse over k1
        c = jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=0,
                               tiled=True)               # (N2, N1/D, NLIMBS)
        b = FR_CTX.mont_mul(c, tw_inv_l)                 # undo twiddle
        a = _ntt_local(b, logn2, True, axis=0)           # inverse over k2
        return a

    sm = shard_map(local, mesh=mesh,
                   in_specs=(P(axis, None), P(None, axis)),
                   out_specs=P(None, axis))

    tw_dev = jax.device_put(jnp.asarray(tw), NamedSharding(mesh, P(None, axis)))

    def fn(d2d):
        return sm(d2d, tw_dev)

    return fn


# -- host-level convenience wrappers (tests, dryrun) ---------------------------

def ntt_sharded(values: list[int], mesh: Mesh, axis: str = "dp") -> list[int]:
    """In-order NTT of python ints via the sharded kernel (test harness)."""
    n = len(values)
    logn = n.bit_length() - 1
    assert 1 << logn == n
    fn, logn2, logn1 = make_ntt_sharded(mesh, axis, logn)
    n2, n1 = 1 << logn2, 1 << logn1
    enc = np.asarray(FR_CTX.encode(values)).reshape(n2, n1, NLIMBS)
    a2d = jax.device_put(jnp.asarray(enc), NamedSharding(mesh, P(None, axis)))
    out = jax.jit(fn)(a2d)
    # k-form: out[k2, k1] = NTT[k1*N2 + k2]
    kform = np.asarray(out)
    flat = kform.transpose(1, 0, 2).reshape(n, NLIMBS)
    return FR_CTX.decode(flat)


def intt_roundtrip_sharded(values: list[int], mesh: Mesh,
                           axis: str = "dp") -> list[int]:
    """NTT then iNTT entirely on-device (one jit), back to in-order ints."""
    n = len(values)
    logn = n.bit_length() - 1
    fwd, logn2, logn1 = make_ntt_sharded(mesh, axis, logn)
    inv = make_intt_sharded(mesh, axis, logn)
    n2, n1 = 1 << logn2, 1 << logn1
    enc = np.asarray(FR_CTX.encode(values)).reshape(n2, n1, NLIMBS)
    a2d = jax.device_put(jnp.asarray(enc), NamedSharding(mesh, P(None, axis)))
    out = jax.jit(lambda x: inv(fwd(x)))(a2d)
    return FR_CTX.decode(np.asarray(out).reshape(n, NLIMBS))
