"""Groth16 over snarkjs .zkey artifacts: generate, prove, verify.

This is prover-side ceremony interop (SURVEY.md §7 step 6): the reference's
deployed verifying keys come from snarkjs zkeys (`snarkjs groth16 setup`,
reference circuits/README.md:10-33), so a production prover must be able to
ingest a .zkey and emit proofs that the *deployed* keys accept — not only
proofs against its own setup. Conversely `generate_zkey` exports a native
setup in the snarkjs layout so artifacts round-trip through the format.

Pipeline in prove_zkey (the snarkjs prover contract, groth16.fullProve in
reference cli/src/utils.ts:69-92, re-done on-device):

  1. A|_H, B|_H from the zkey coefficient section x witness — device sparse
     matvecs (groth16/rowval.py); C|_H = A|_H . B|_H pointwise (a satisfied
     R1CS makes the product exact on the domain).
  2. P = A.B - C evaluated on the odd coset {eta w^i}, eta = w_{2n}: iNTT
     then coset-NTT with generator eta (ntt/ntt.py), all on-device.
  3. C_h = MSM(h_query, P_odd): the zkey's H points are the odd-coset
     Lagrange basis folded with Z(tau)/(-2 delta) (io/snarkjs.py docstring),
     so the MSM directly yields [H(tau)Z(tau)/delta]_1.
  4. The A/B1/B2/C query MSMs and the r,s blinding exactly as groth16.prove.
"""

from __future__ import annotations

import random

import numpy as np

from ..ff.bn254 import FR_MOD, fr_inv
from ..curve.bn254_host import (
    G1_GEN, G2_GEN, g1_add, g1_neg, g1_mul_fast, g2_add, g2_mul_fast,
)
from ..curve.proj import G1_DEV, G2_DEV
from ..io.snarkjs import ZkeyData
from ..ntt.ntt import _root_of_unity, intt_device, coset_ntt_device
from .groth16 import (
    Proof, VerifyingKey, _domain_size, _msm, lagrange_at, qap_polys_at_tau,
)
from .r1cs import ConstraintSystem

P = FR_MOD


def generate_zkey(cs: ConstraintSystem,
                  rng: random.Random | None = None) -> ZkeyData:
    """Run a (single-party, test-grade) setup and lay it out as a zkey."""
    rng = rng or random.SystemRandom()
    tau = rng.randrange(1, P)
    alpha = rng.randrange(1, P)
    beta = rng.randrange(1, P)
    gamma = rng.randrange(1, P)
    delta = rng.randrange(1, P)

    u, v, wpoly, z_tau, m = qap_polys_at_tau(cs, tau)
    nv = cs.num_vars
    npub = cs.num_public + 1
    gamma_inv = fr_inv(gamma)
    delta_inv = fr_inv(delta)

    # H basis: L_i(tau/eta) * Z(tau) / (-2 delta), eta = w_{2m} (module doc)
    eta = _root_of_unity(2 * m)
    lag_shift = lagrange_at(tau * fr_inv(eta) % P, m)
    hz = z_tau * fr_inv((P - 2) * delta % P) % P
    h_s = [lj * hz % P for lj in lag_shift]

    ic_s = [(beta * u[i] + alpha * v[i] + wpoly[i]) % P * gamma_inv % P
            for i in range(npub)]
    c_s = [(beta * u[i] + alpha * v[i] + wpoly[i]) % P * delta_inv % P
           for i in range(npub, nv)]

    from ..msm.fixed_base import fixed_base_mul_batch

    g1_scalars = ic_s + c_s + u + v + h_s
    g1_pts = fixed_base_mul_batch(g1_scalars, curve=G1_DEV)
    ic = g1_pts[:npub]
    c_query = g1_pts[npub:npub + len(c_s)]
    off = npub + len(c_s)
    a_query = g1_pts[off:off + nv]
    b1_query = g1_pts[off + nv:off + 2 * nv]
    h_query = g1_pts[off + 2 * nv:]
    b2_query = fixed_base_mul_batch(v, curve=G2_DEV)

    # coefficient section: A and B matrices only (C is A.B on the domain),
    # plus the public-input rows snarkjs appends on A (row nCons + i)
    coeffs = []
    ncons = len(cs.constraints)
    for j, (a, b, _c) in enumerate(cs.constraints):
        for sig, val in sorted(a.terms.items()):
            coeffs.append((0, j, sig, val))
        for sig, val in sorted(b.terms.items()):
            coeffs.append((1, j, sig, val))
    for i in range(npub):
        coeffs.append((0, ncons + i, i, 1))

    return ZkeyData(
        n_vars=nv, n_public=cs.num_public, domain_size=m,
        alpha_g1=g1_mul_fast(G1_GEN, alpha),
        beta_g1=g1_mul_fast(G1_GEN, beta),
        beta_g2=g2_mul_fast(G2_GEN, beta),
        gamma_g2=g2_mul_fast(G2_GEN, gamma),
        delta_g1=g1_mul_fast(G1_GEN, delta),
        delta_g2=g2_mul_fast(G2_GEN, delta),
        ic=ic, coeffs=coeffs,
        a_query=a_query, b1_query=b1_query, b2_query=b2_query,
        c_query=c_query, h_query=h_query,
    )


def vk_from_zkey(zk: ZkeyData) -> VerifyingKey:
    return VerifyingKey(alpha_g1=zk.alpha_g1, beta_g2=zk.beta_g2,
                        gamma_g2=zk.gamma_g2, delta_g2=zk.delta_g2,
                        ic=list(zk.ic))


def _ab_rows_device(zk: ZkeyData, witness: list[int]):
    """A|_H, B|_H as (m, NLIMBS) Montgomery device arrays from the zkey
    coefficient section (device sparse matvec, groth16/rowval.py)."""
    import jax.numpy as jnp

    from ..ff.fp import FR_CTX
    from ..ff.limbs import NLIMBS, batch_to_limbs
    from .rowval import _encode_witness, _eval_mat

    m = zk.domain_size
    mats = []
    for want in (0, 1):
        triples = [(c, s, r) for (mm, r, s, c) in zk.coeffs if mm == want]
        triples.sort(key=lambda t: t[2])  # segment_sum wants sorted rows
        coeffs = [FR_CTX.to_mont_int(c % P) for c, _s, _r in triples]
        cols = np.asarray([s for _c, s, _r in triples], np.int32)
        rids = np.asarray([r for _c, _s, r in triples], np.int32)
        mats.append((jnp.asarray(batch_to_limbs(coeffs)) if coeffs else
                     jnp.zeros((0, NLIMBS), jnp.uint32),
                     jnp.asarray(cols), jnp.asarray(rids)))

    w_plain = jnp.asarray(batch_to_limbs([x % P for x in witness]))
    w_mont = _encode_witness(w_plain)
    a_e = _eval_mat(*mats[0], w_mont, m)
    b_e = _eval_mat(*mats[1], w_mont, m)
    return a_e, b_e


def prove_zkey(zk: ZkeyData, witness: list[int],
               rng: random.Random | None = None) -> Proof:
    import jax.numpy as jnp

    from ..ff.fp import FR_CTX

    rng = rng or random.SystemRandom()
    r = rng.randrange(P)
    s = rng.randrange(P)

    m = zk.domain_size
    logm = m.bit_length() - 1
    assert 1 << logm == m, "zkey domain size must be a power of two"
    eta = _root_of_unity(2 * m)

    a_e, b_e = _ab_rows_device(zk, witness)
    c_e = FR_CTX.mont_mul(a_e, b_e)
    az = intt_device(a_e, logm)
    bz = intt_device(b_e, logm)
    cz = intt_device(c_e, logm)
    ac = coset_ntt_device(az, logm, eta)
    bc = coset_ntt_device(bz, logm, eta)
    cc = coset_ntt_device(cz, logm, eta)
    p_odd = FR_CTX.sub(FR_CTX.mont_mul(ac, bc), cc)
    p_ints = FR_CTX.decode(np.asarray(p_odd))

    a_acc = _msm(zk.a_query, witness)
    b2_acc = _msm(zk.b2_query, witness, curve=G2_DEV)
    b1_acc = _msm(zk.b1_query, witness)
    npub = zk.n_public + 1
    c_acc = _msm(zk.c_query, witness[npub:])
    h_acc = _msm(zk.h_query, p_ints)

    pi_a = g1_add(g1_add(zk.alpha_g1, a_acc), g1_mul_fast(zk.delta_g1, r))
    pi_b = g2_add(g2_add(zk.beta_g2, b2_acc), g2_mul_fast(zk.delta_g2, s))
    b_g1 = g1_add(g1_add(zk.beta_g1, b1_acc), g1_mul_fast(zk.delta_g1, s))
    pi_c = g1_add(c_acc, h_acc)
    pi_c = g1_add(pi_c, g1_mul_fast(pi_a, s))
    pi_c = g1_add(pi_c, g1_mul_fast(b_g1, r))
    pi_c = g1_add(pi_c, g1_neg(g1_mul_fast(zk.delta_g1, r * s % P)))
    return Proof(a=pi_a, b=pi_b, c=pi_c)
