"""Groth16 over BN254: setup, TPU-accelerated prover, pairing verifier.

Replaces the snarkjs engine the reference CLI drives per batch
(`snarkjs.groth16.fullProve`, reference cli/src/utils.ts:69-92) and the
arkworks verifier the pallet runs on-chain (pallet/src/lib.rs:815-827):

  - setup(): QAP via Lagrange evaluation at tau (libsnark/arkworks reduction,
    including the extra public-input rows that make the instance wires'
    u_i linearly independent — matching ark-groth16's r1cs_to_qap).
  - prove(): witness dot-products on host, H(x) on a multiplicative coset via
    the device NTT (Z is constant on the coset), then the four big MSMs on
    the device Pippenger kernel (msm/pippenger.py) — the three hot loops of
    SURVEY.md §3.2 moved onto the TPU.
  - verify(): e(A,B) = e(alpha,beta) e(IC(x),gamma) e(C,delta) via the host
    pairing (curve/pairing.py), semantics of ark-groth16
    `verify_with_processed_vk`.
"""

from __future__ import annotations

import functools
import math
import os
import random
from dataclasses import dataclass

from ..ff.bn254 import FR_MOD, fr_inv
from ..curve.bn254_host import (
    G1_GEN, G2_GEN,
    g1_add, g1_neg, g1_mul_fast,
    g2_add, g2_mul_fast,
)
from ..curve.proj import G1_DEV, G2_DEV
from ..msm.pippenger import msm_device
from ..ntt.ntt import _root_of_unity
from .r1cs import ConstraintSystem, LC

P = FR_MOD
COSET_GEN = 5  # Fr's standard multiplicative generator (matches arkworks)


@dataclass
class ProvingKey:
    alpha_g1: tuple
    beta_g1: tuple
    beta_g2: tuple
    delta_g1: tuple
    delta_g2: tuple
    a_query: list          # [u_i(tau)]_1, all vars
    b_g1_query: list       # [v_i(tau)]_1
    b_g2_query: list       # [v_i(tau)]_2
    l_query: list          # [(beta u_i + alpha v_i + w_i)/delta]_1, witness vars
    h_query: list          # [tau^i Z(tau)/delta]_1, i < m-1
    vk: "VerifyingKey"


@dataclass
class VerifyingKey:
    alpha_g1: tuple
    beta_g2: tuple
    gamma_g2: tuple
    delta_g2: tuple
    ic: list               # [(beta u_i + alpha v_i + w_i)/gamma]_1, public vars


@dataclass
class Proof:
    a: tuple   # G1
    b: tuple   # G2
    c: tuple   # G1


def _qap_rows(cs: ConstraintSystem):
    """Constraint rows plus the libsnark public-input rows (var_i, 0, 0)."""
    rows = list(cs.constraints)
    for i in range(cs.num_public + 1):
        rows.append((LC.var(i), LC(), LC()))
    return rows


def _domain_size(cs: ConstraintSystem) -> int:
    n = len(cs.constraints) + cs.num_public + 1
    return 1 << (n - 1).bit_length()


def batch_inv(vals: list[int]) -> list[int]:
    """Montgomery-trick batch inversion mod P (one fr_inv for the batch)."""
    m = len(vals)
    pref = [1] * (m + 1)
    for i, d in enumerate(vals):
        pref[i + 1] = pref[i] * d % P
    inv_all = fr_inv(pref[m])
    invs = [0] * m
    for i in range(m - 1, -1, -1):
        invs[i] = pref[i] * inv_all % P
        inv_all = inv_all * vals[i] % P
    return invs


def lagrange_at(y: int, m: int) -> list[int]:
    """All m Lagrange-basis polynomials over the radix-2 domain, evaluated
    at y: L_j(y) = (Z(y)/m) * w^j / (y - w^j)."""
    w = _root_of_unity(m)
    z_y = (pow(y, m, P) - 1) % P
    assert z_y != 0, "evaluation point hit the domain"
    zm = z_y * fr_inv(m) % P
    denoms = []
    wj = 1
    for _ in range(m):
        denoms.append((y - wj) % P)
        wj = wj * w % P
    invs = batch_inv(denoms)
    lag = []
    wj = 1
    for j in range(m):
        lag.append(zm * wj % P * invs[j] % P)
        wj = wj * w % P
    return lag


def qap_polys_at_tau(cs: ConstraintSystem, tau: int):
    """(u, v, w) per-variable QAP polynomial evaluations at tau, plus Z(tau)
    and the domain size (libsnark/arkworks reduction incl. public rows)."""
    rows = _qap_rows(cs)
    m = _domain_size(cs)
    lag = lagrange_at(tau, m)
    z_tau = (pow(tau, m, P) - 1) % P
    nv = cs.num_vars
    u = [0] * nv
    v = [0] * nv
    wpoly = [0] * nv
    for j, (a, b, c) in enumerate(rows):
        lj = lag[j]
        for i, coeff in a.terms.items():
            u[i] = (u[i] + coeff * lj) % P
        for i, coeff in b.terms.items():
            v[i] = (v[i] + coeff * lj) % P
        for i, coeff in c.terms.items():
            wpoly[i] = (wpoly[i] + coeff * lj) % P
    return u, v, wpoly, z_tau, m


def setup(cs: ConstraintSystem, rng: random.Random | None = None) -> ProvingKey:
    import os
    from ..utils.profiling import Stopwatch

    sw = Stopwatch()
    rng = rng or random.SystemRandom()
    tau = rng.randrange(1, P)
    alpha = rng.randrange(1, P)
    beta = rng.randrange(1, P)
    gamma = rng.randrange(1, P)
    delta = rng.randrange(1, P)

    with sw.stage("qap_polys"):
        u, v, wpoly, z_tau, m = qap_polys_at_tau(cs, tau)
    nv = cs.num_vars
    gamma_inv = fr_inv(gamma)
    delta_inv = fr_inv(delta)
    npub = cs.num_public + 1

    # every key element is a known scalar times a generator: batch them all
    # through the device fixed-base kernel (msm/fixed_base.py)
    from ..msm.fixed_base import fixed_base_mul_batch

    zd = z_tau * delta_inv % P
    ic_s = [(beta * u[i] + alpha * v[i] + wpoly[i]) % P * gamma_inv % P
            for i in range(npub)]
    l_s = [(beta * u[i] + alpha * v[i] + wpoly[i]) % P * delta_inv % P
           for i in range(npub, nv)]
    h_s = [0] * (m - 1)          # tau^i * Z(tau)/delta, iterated (a modexp
    acc = zd                     # per element costs minutes at m = 2^18)
    for i in range(m - 1):
        h_s[i] = acc
        acc = acc * tau % P
    g1_scalars = ic_s + l_s + u + v + h_s
    with sw.stage("fixed_base_g1"):
        g1_points = fixed_base_mul_batch(g1_scalars, curve=G1_DEV)
    ic = g1_points[:npub]
    l_query = g1_points[npub:npub + len(l_s)]
    off = npub + len(l_s)
    a_query = g1_points[off:off + nv]
    b_g1_query = g1_points[off + nv:off + 2 * nv]
    h_query = g1_points[off + 2 * nv:]
    with sw.stage("fixed_base_g2"):
        b_g2_query = fixed_base_mul_batch(v, curve=G2_DEV)
    if os.environ.get("INFIMUM_TRACE"):
        import sys

        print(sw.report(), file=sys.stderr, flush=True)

    vk = VerifyingKey(
        alpha_g1=g1_mul_fast(G1_GEN, alpha),
        beta_g2=g2_mul_fast(G2_GEN, beta),
        gamma_g2=g2_mul_fast(G2_GEN, gamma),
        delta_g2=g2_mul_fast(G2_GEN, delta),
        ic=ic,
    )
    return ProvingKey(
        alpha_g1=g1_mul_fast(G1_GEN, alpha),
        beta_g1=g1_mul_fast(G1_GEN, beta),
        beta_g2=vk.beta_g2,
        delta_g1=g1_mul_fast(G1_GEN, delta),
        delta_g2=vk.delta_g2,
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        l_query=l_query,
        h_query=h_query,
        vk=vk,
    )


def _msm(points, scalars, curve=G1_DEV, lanes: int | None = None,
         host_threshold: int | None = None):
    """MSM skipping infinity points / zero scalars; pads to reuse compiled
    kernel shapes (multiples of 64). Inputs below the platform's device
    threshold run the host Pippenger — compiling a device kernel costs far
    more than the work at small sizes (utils/backend.py)."""
    from ..utils.backend import device_threshold, msm_lanes
    from ..curve.bn254_host import msm_host_fast

    if lanes is None:
        lanes = msm_lanes()
    pairs = [(p, s % P) for p, s in zip(points, scalars) if p is not None and s % P]
    if not pairs:
        return None
    pts, sc = zip(*pairs)
    pts, sc = list(pts), list(sc)
    if len(pts) < (host_threshold if host_threshold is not None
                   else device_threshold()):
        return msm_host_fast(pts, sc, curve.name)

    from ..utils.backend import platform

    if platform() == "tpu":
        # hand-written Mosaic pipeline (msm/pallas_msm.py), ~30x the XLA
        # kernel on a v5e; pad the chunk count to a power of two so the
        # prover's five big MSMs share compile-cache entries
        import numpy as np
        from ..ff.limbs import NLIMBS, batch_to_limbs
        from ..msm import pallas_msm as PM

        planes = 1024 if curve.name == "g1" else 256
        t = 1 << (max(1, math.ceil(len(pts) / planes)) - 1).bit_length()
        t = max(t, int(os.environ.get(          # shape sharing, see _msm_cached
            "INFIMUM_MSM_MIN_T", "256" if curve.name == "g1" else "1024")))
        spec = PM._SPECS[curve.name]
        rows = np.zeros((t * planes, spec.AF), np.uint32)
        rows[:len(pts)] = spec.encode_affine_rows(pts)
        scl = np.zeros((t * planes, NLIMBS), np.uint32)
        scl[:len(sc)] = batch_to_limbs(sc)   # zero-row tail: scalar 0 =>
        return PM.msm_pallas_rows(            # digit 0, never accumulated
            rows, scl, planes, curve.name)

    pad = 64 * math.ceil(len(pts) / 64) - len(pts)
    pts += [pts[0]] * pad
    sc += [0] * pad
    return msm_device(pts, sc, curve=curve, lanes=lanes)


def _msm_cached(pk: "ProvingKey", name: str, points, scalars, curve=G1_DEV):
    """MSM over a proving-key query with the point encoding cached on the key.

    The reference re-reads zkey sections per proof (snarkjs fullProve,
    cli/src/utils.ts:69-92); here each query is encoded to device limb rows
    once and every subsequent proof only ships scalars. Infinity entries are
    masked by zeroing their scalars (digit-0 is dead in the kernel)."""
    from ..utils.backend import platform, device_threshold

    if platform() != "tpu" or len(points) < device_threshold():
        return _msm(points, scalars, curve=curve)

    import numpy as np
    from ..ff.limbs import NLIMBS, batch_to_limbs
    from ..msm import pallas_msm as PM

    lanes = 1024 if curve.name == "g1" else 256
    cache = pk.__dict__.setdefault("_enc_cache", {})
    ent = cache.get(name)
    if ent is None:
        spec = PM._SPECS[curve.name]
        none_idx = frozenset(i for i, p in enumerate(points) if p is None)
        safe = (points if not none_idx else
                [p if p is not None else (G1_GEN if curve.name == "g1"
                                          else G2_GEN) for p in points])
        n = len(points)
        t = max(1, math.ceil(n / lanes))
        t = 1 << (t - 1).bit_length()     # pow2: shared compile-cache entries
        # pad small queries up to the reference process circuit's chunk
        # count so every circuit shares ONE kernel shape per curve: the
        # extra zero-scalar chunks are sub-second dead work, while each
        # distinct shape costs minutes of one-time per-process trace+load
        # through the tunneled runtime
        t = max(t, int(os.environ.get(
            "INFIMUM_MSM_MIN_T", "256" if curve.name == "g1" else "1024")))
        rows = np.zeros((t * lanes, spec.AF), np.uint32)
        rows[:n] = spec.encode_affine_rows(safe)
        import jax.numpy as jnp

        # device-resident: the rows (tens of MB) cross the host<->device
        # boundary once per key, not once per proof
        ent = (jnp.asarray(rows), none_idx)
        cache[name] = ent
    rows, none_idx = ent
    import time

    t0 = time.perf_counter()
    sc = [0 if i in none_idx else s % P for i, s in enumerate(scalars)]
    scl = np.zeros((rows.shape[0], NLIMBS), np.uint32)
    scl[:len(sc)] = batch_to_limbs(sc)
    t1 = time.perf_counter()
    out = PM.msm_pallas_rows(rows, scl, lanes, curve.name)
    if os.environ.get("INFIMUM_TRACE"):
        import sys

        print(f"  msm[{name}] n={len(scalars)} prep={t1-t0:.2f}s "
              f"dev+combine={time.perf_counter()-t1:.2f}s",
              file=sys.stderr, flush=True)
    return out


def _sparse_rows(cs: ConstraintSystem):
    """Cached flattened A/B/C triples (incl. public rows) for device eval."""
    from .rowval import SparseRows

    cached = getattr(cs, "_sparse_rows_cache", None)
    if cached is None:
        rows = _qap_rows(cs)
        cached = SparseRows(rows, len(rows))
        cs._sparse_rows_cache = cached
    return cached


@functools.lru_cache(maxsize=None)
def _h_graph(logm: int):
    """One jitted graph for the whole H pipeline (3 iNTTs + 3 coset NTTs +
    pointwise + final coset iNTT). Eager composition would dispatch every
    field op separately — ruinous through the remote-device runtime. All
    twiddle/coset tables enter as runtime arguments (device-resident, bound
    here) so the HLO carries no multi-MB literals."""
    import jax
    import jax.numpy as jnp
    from ..ff.fp import FR_CTX
    from ..ff.limbs import batch_to_limbs
    from ..ntt.ntt import _ntt_core, _coset_consts_dev, _stage_consts_dev

    m = 1 << logm
    z_inv = fr_inv((pow(COSET_GEN, m, P) - 1) % P)
    zi = jnp.asarray(batch_to_limbs([FR_CTX.to_mont_int(z_inv)]))[0]
    consts = (_coset_consts_dev(logm, COSET_GEN, False),
              _coset_consts_dev(logm, COSET_GEN, True),
              *_stage_consts_dev(logm, False),
              *_stage_consts_dev(logm, True))

    def h_graph(a_e, b_e, c_e, cfwd, cinv, revf, twf, nif, revi, twi, nii):
        def intt(x):
            return _ntt_core(x, logm, True, revi, twi, nii)

        def coset_fwd(x):
            return _ntt_core(FR_CTX.mont_mul(x, cfwd), logm, False,
                             revf, twf, nif)

        prod = FR_CTX.sub(
            FR_CTX.mont_mul(coset_fwd(intt(a_e)), coset_fwd(intt(b_e))),
            coset_fwd(intt(c_e)))
        h_evals = FR_CTX.mont_mul(prod, zi[None, :])
        return FR_CTX.mont_mul(intt(h_evals), cinv)

    # AOT export cache: re-tracing the unrolled NTT pipeline costs ~1 min
    # per process (utils/aot.py); the exported module deserializes in ~0 s
    from ..utils.aot import aot_jit

    wrapped = aot_jit(f"h_graph_{logm}", h_graph)
    return lambda a_e, b_e, c_e: wrapped(a_e, b_e, c_e, *consts)


def compute_h_host(cs: ConstraintSystem, witness: list[int]) -> list[int]:
    """Host-bignum twin of compute_h: same coset-evaluation reduction in
    plain Python ints. Used on non-TPU platforms at large domain sizes,
    where XLA:CPU compiling the unrolled limb NTT pipeline costs tens of
    minutes and tens of GB of RSS for a graph that runs once — ~10 s of
    Python modmuls replaces it. Bit-exact vs the device path (tested)."""
    from ..ntt.ntt import ntt_host, intt_host

    rows = _qap_rows(cs)
    m = _domain_size(cs)
    a_e, b_e, c_e = [0] * m, [0] * m, [0] * m
    for j, (a, b, c) in enumerate(rows):
        a_e[j] = a.eval(witness)
        b_e[j] = b.eval(witness)
        c_e[j] = c.eval(witness)

    g = COSET_GEN
    g_pows = [1] * m
    for i in range(1, m):
        g_pows[i] = g_pows[i - 1] * g % P

    def coset_fwd(evals):
        coeffs = intt_host(evals)
        return ntt_host([coeffs[i] * g_pows[i] % P for i in range(m)])

    za, zb, zc = coset_fwd(a_e), coset_fwd(b_e), coset_fwd(c_e)
    z_inv = fr_inv((pow(g, m, P) - 1) % P)
    h_evals = [(za[i] * zb[i] - zc[i]) % P * z_inv % P for i in range(m)]
    hc = intt_host(h_evals)
    g_inv = fr_inv(g)
    gi = 1
    h = [0] * m
    for i in range(m):
        h[i] = hc[i] * gi % P
        gi = gi * g_inv % P
    assert h[m - 1] == 0, "h has unexpected degree"
    return h[: m - 1]


def compute_h(cs: ConstraintSystem, witness: list[int]) -> list[int]:
    """Coefficients of h(x) = (a(x) b(x) - c(x)) / Z(x) via device coset NTT.

    Row evaluation (a|_H, b|_H, c|_H) runs on the device as batched sparse
    matvecs (groth16/rowval.py) instead of per-term Python bigints; the NTT
    pipeline is a single jit call (_h_graph). On non-TPU platforms, domains
    >= INFIMUM_HOST_H_THRESHOLD (default 2^13) take the host-bignum path
    instead — see compute_h_host."""
    import os
    import numpy as np
    from ..ff.fp import FR_CTX
    from ..utils.backend import platform
    from ..utils.profiling import Stopwatch
    from .rowval import eval_rows_device

    sw = Stopwatch()
    m = _domain_size(cs)
    logm = m.bit_length() - 1
    if platform() != "tpu" and m >= int(
            os.environ.get("INFIMUM_HOST_H_THRESHOLD", str(1 << 13))):
        return compute_h_host(cs, witness)
    # ON TPU, small domains also go to the host: ~1s of Python modmuls at
    # m = 2^14 (the tally circuit) vs minutes of one-time per-process
    # trace+load of the device NTT graph through the tunneled runtime —
    # the device pipeline only pays off on the big process domain
    if platform() == "tpu" and m <= int(
            os.environ.get("INFIMUM_TPU_HOST_H_MAX", str(1 << 14))):
        return compute_h_host(cs, witness)

    with sw.stage("sparse_rows"):
        sp = _sparse_rows(cs)
    with sw.stage("eval_rows"):
        a_e, b_e, c_e = eval_rows_device(sp, witness, m)
    with sw.stage("ntts"):
        h = _h_graph(logm)(a_e, b_e, c_e)
    with sw.stage("h_decode"):
        h_ints = FR_CTX.decode(np.asarray(h))
    if os.environ.get("INFIMUM_TRACE"):
        import sys

        print(sw.report(), file=sys.stderr, flush=True)
    assert h_ints[m - 1] == 0, "h has unexpected degree"
    return h_ints[: m - 1]


def prove(pk: ProvingKey, cs: ConstraintSystem, witness: list[int],
          rng: random.Random | None = None) -> Proof:
    import os
    from ..utils.profiling import Stopwatch

    sw = Stopwatch()
    rng = rng or random.SystemRandom()
    r = rng.randrange(P)
    s = rng.randrange(P)

    with sw.stage("compute_h"):
        h = compute_h(cs, witness)

    with sw.stage("msm_a"):
        a_acc = _msm_cached(pk, "a", pk.a_query, witness)
    with sw.stage("msm_b2"):
        b2_acc = _msm_cached(pk, "b2", pk.b_g2_query, witness, curve=G2_DEV)
    with sw.stage("msm_b1"):
        b1_acc = _msm_cached(pk, "b1", pk.b_g1_query, witness)
    npub = cs.num_public + 1
    with sw.stage("msm_l"):
        c_acc = _msm_cached(pk, "l", pk.l_query, witness[npub:])
    with sw.stage("msm_h"):
        h_acc = _msm_cached(pk, "h", pk.h_query, h)
    if os.environ.get("INFIMUM_TRACE"):
        import sys

        print(sw.report(), file=sys.stderr, flush=True)

    # A = alpha + sum + r*delta
    pi_a = g1_add(g1_add(pk.alpha_g1, a_acc), g1_mul_fast(pk.delta_g1, r))
    # B = beta + sum + s*delta
    pi_b = g2_add(g2_add(pk.beta_g2, b2_acc), g2_mul_fast(pk.delta_g2, s))
    b_g1 = g1_add(g1_add(pk.beta_g1, b1_acc), g1_mul_fast(pk.delta_g1, s))
    # C = L + H + s*A + r*B1 - r*s*delta
    pi_c = g1_add(c_acc, h_acc)
    pi_c = g1_add(pi_c, g1_mul_fast(pi_a, s))
    pi_c = g1_add(pi_c, g1_mul_fast(b_g1, r))
    pi_c = g1_add(pi_c, g1_neg(g1_mul_fast(pk.delta_g1, r * s % P)))
    return Proof(a=pi_a, b=pi_b, c=pi_c)


def prepare_inputs(vk: VerifyingKey, public_inputs: list[int]):
    """IC-combined public input point (ark-groth16 prepare_inputs)."""
    acc = vk.ic[0]
    for point, x in zip(vk.ic[1:], public_inputs):
        acc = g1_add(acc, g1_mul_fast(point, x))
    return acc


def verify(vk: VerifyingKey, proof: Proof, public_inputs: list[int]) -> bool:
    """Pairing check, preferring the native C++ Miller loop (native/src/
    pairing.cc) — the Python tower-field pairing costs tens of seconds per
    proof and is kept as the portable fallback / cross-check."""
    from .. import native

    if native.available():
        from ..io.arkworks import serialize_vkey, serialize_proof

        return native.groth16_verify(
            serialize_vkey(vk), serialize_proof(proof),
            [x % P for x in public_inputs])
    return verify_py(vk, proof, public_inputs)


def verify_py(vk: VerifyingKey, proof: Proof, public_inputs: list[int]) -> bool:
    from ..curve.pairing import multi_pairing_is_one

    ic = prepare_inputs(vk, public_inputs)
    # e(A, B) e(-alpha, beta) e(-IC, gamma) e(-C, delta) == 1
    return multi_pairing_is_one([
        (proof.a, proof.b),
        (g1_neg(vk.alpha_g1), vk.beta_g2),
        (g1_neg(ic), vk.gamma_g2),
        (g1_neg(proof.c), vk.delta_g2),
    ])
