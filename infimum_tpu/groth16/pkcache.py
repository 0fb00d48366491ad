"""On-disk proving-key cache for the (insecure, single-party) trusted setup.

The reference gets its proving keys from a one-time powersoftau ceremony +
`snarkjs groth16 setup`, persisted as `.zkey` files that every proving run
just loads (reference circuits/README.md:10-33, cli/src/user/coordinator.ts:
12-23). This stack's `setup()` instead recomputes ~3*n_vars + m fixed-base
scalar muls on the device every run — ~10 minutes at the reference process
dims — so the key is persisted here after the first computation, keyed by a
circuit fingerprint + setup seed, and every later run loads in seconds.

Format: one `.npz` per (circuit, seed) holding raw little-endian limb arrays
(ff/limbs.py packing, NOT Montgomery form) for each query plus infinity
masks. Only plain numpy arrays — loadable without JAX.
"""

from __future__ import annotations

import hashlib
import os
import random

import numpy as np

from ..ff.limbs import NLIMBS, batch_to_limbs, batch_from_limbs
from .groth16 import ProvingKey, VerifyingKey, setup
from .r1cs import ConstraintSystem

_FORMAT_VERSION = 1
_G1_SINGLES = ("alpha_g1", "beta_g1", "delta_g1")
_G2_SINGLES = ("beta_g2", "delta_g2", "gamma_g2")
_G1_QUERIES = ("a_query", "b_g1_query", "l_query", "h_query", "ic")
_G2_QUERIES = ("b_g2_query",)


def default_cache_dir() -> str:
    return os.environ.get(
        "INFIMUM_PK_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".pk_cache"))


def circuit_fingerprint(cs: ConstraintSystem) -> str:
    """Deterministic structural hash of a constraint system.

    Covers every term: per-LC term counts feed the sha directly and every
    (row, wire, coeff) triple feeds a position-weighted checksum, so a
    coefficient or wire change anywhere in the system shifts the key (a
    sampled digest could silently reuse a stale proving key and only fail
    at proof self-verification, with no hint of the cause). ~2 s of int
    ops at the reference process circuit's ~4M terms, memoized per
    ConstraintSystem instance since setup_cached and callers re-fingerprint
    the same object.
    """
    cached = getattr(cs, "_fingerprint_cache", None)
    if cached is not None and cached[0] == (len(cs.constraints),
                                            cs.num_vars, cs.num_public):
        return cached[1]
    h = hashlib.sha256()
    h.update(f"v{_FORMAT_VERSION};{cs.num_vars};{cs.num_public};"
             f"{len(cs.constraints)};".encode())
    mask = (1 << 127) - 1
    checksum = 0
    for j, row in enumerate(cs.constraints):
        for k, lc in enumerate(row):
            h.update(len(lc.terms).to_bytes(3, "little"))
            w = 3 * j + k + 1
            for i, coeff in lc.terms.items():
                checksum = (checksum + w * (i + 1) * coeff) & mask
    h.update(checksum.to_bytes(16, "little"))
    out = h.hexdigest()[:24]
    cs._fingerprint_cache = ((len(cs.constraints), cs.num_vars,
                              cs.num_public), out)
    return out


def _g1_to_arrays(points):
    flat = []
    inf = np.zeros(len(points), dtype=bool)
    for i, p in enumerate(points):
        if p is None:
            inf[i] = True
            flat += [0, 0]
        else:
            flat += [p[0], p[1]]
    return batch_to_limbs(flat).reshape(len(points), 2, NLIMBS), inf


def _g1_from_arrays(limbs, inf):
    ints = batch_from_limbs(limbs.reshape(-1, NLIMBS))
    return [None if inf[i] else (ints[2 * i], ints[2 * i + 1])
            for i in range(limbs.shape[0])]


def _g2_to_arrays(points):
    flat = []
    inf = np.zeros(len(points), dtype=bool)
    for i, p in enumerate(points):
        if p is None:
            inf[i] = True
            flat += [0, 0, 0, 0]
        else:
            flat += [p[0][0], p[0][1], p[1][0], p[1][1]]
    return batch_to_limbs(flat).reshape(len(points), 4, NLIMBS), inf


def _g2_from_arrays(limbs, inf):
    ints = batch_from_limbs(limbs.reshape(-1, NLIMBS))
    out = []
    for i in range(limbs.shape[0]):
        if inf[i]:
            out.append(None)
        else:
            x0, x1, y0, y1 = ints[4 * i:4 * i + 4]
            out.append(((x0, x1), (y0, y1)))
    return out


def save_pk(pk: ProvingKey, path: str) -> None:
    arrays: dict = {"format_version": np.int64(_FORMAT_VERSION)}
    for name in _G1_SINGLES:
        arrays[name], _ = _g1_to_arrays([getattr(pk, name)])
    for name in _G2_SINGLES:
        src = pk.vk if name == "gamma_g2" else pk
        arrays[name], _ = _g2_to_arrays([getattr(src, name)])
    for name in _G1_QUERIES:
        pts = pk.vk.ic if name == "ic" else getattr(pk, name)
        arrays[name], arrays[name + "_inf"] = _g1_to_arrays(pts)
    for name in _G2_QUERIES:
        arrays[name], arrays[name + "_inf"] = _g2_to_arrays(
            getattr(pk, name))
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_pk(path: str) -> ProvingKey:
    with np.load(path) as z:
        if int(z["format_version"]) != _FORMAT_VERSION:
            raise ValueError(f"pk cache format mismatch: {path}")
        g1s = {n: _g1_from_arrays(z[n], [False])[0] for n in _G1_SINGLES}
        g2s = {n: _g2_from_arrays(z[n], [False])[0] for n in _G2_SINGLES}
        g1q = {n: _g1_from_arrays(z[n], z[n + "_inf"]) for n in _G1_QUERIES}
        g2q = {n: _g2_from_arrays(z[n], z[n + "_inf"]) for n in _G2_QUERIES}
    vk = VerifyingKey(alpha_g1=g1s["alpha_g1"], beta_g2=g2s["beta_g2"],
                      gamma_g2=g2s["gamma_g2"], delta_g2=g2s["delta_g2"],
                      ic=g1q["ic"])
    return ProvingKey(
        alpha_g1=g1s["alpha_g1"], beta_g1=g1s["beta_g1"],
        beta_g2=g2s["beta_g2"], delta_g1=g1s["delta_g1"],
        delta_g2=g2s["delta_g2"], a_query=g1q["a_query"],
        b_g1_query=g1q["b_g1_query"], b_g2_query=g2q["b_g2_query"],
        l_query=g1q["l_query"], h_query=g1q["h_query"], vk=vk)


class _Replay:
    """Replays a fixed list of randrange draws (then refuses further use)."""

    def __init__(self, draws):
        self._draws = iter(draws)

    def randrange(self, *a, **k):
        return next(self._draws)


def setup_cached(cs: ConstraintSystem, rng: random.Random,
                 label: str = "circuit",
                 cache_dir: str | None = None) -> ProvingKey:
    """`setup()` with an on-disk cache.

    The five trapdoor values are drawn from `rng` up front (consuming it
    identically on hit and miss, so callers sharing one rng across multiple
    setups stay aligned), hashed into the cache key, and replayed into
    `setup()` on a miss. Set INFIMUM_PK_CACHE=0 to disable.
    """
    cache_dir = cache_dir if cache_dir is not None else default_cache_dir()
    if cache_dir in ("0", ""):
        return setup(cs, rng)
    from ..ff.bn254 import FR_MOD

    draws = [rng.randrange(1, FR_MOD) for _ in range(5)]
    seed_tag = hashlib.sha256(repr(draws).encode()).hexdigest()[:16]
    path = os.path.join(
        cache_dir, f"pk_{label}_{circuit_fingerprint(cs)}_{seed_tag}.npz")
    if os.path.exists(path):
        return load_pk(path)
    pk = setup(cs, _Replay(draws))
    save_pk(pk, path)
    return pk
