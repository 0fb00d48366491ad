"""Branchless complete projective point arithmetic for BN254 G1/G2 on TPU.

Renes–Costello–Batina (2016) complete addition formulas for a = 0 short
Weierstrass curves, specialized to homogeneous projective coordinates:
one straight-line formula covers P+Q, P+P, P+(-P), and infinity with zero
data-dependent control flow, which is exactly what batched SIMD scans need
(the select-cascade alternative roughly doubles both the op count and the
XLA graph size). Infinity is (0, 1, 0).

Points are pytrees (X, Y, Z) of field elements: (..., NLIMBS) Montgomery
Fq limbs for G1 and (..., 2, NLIMBS) for G2 (ff/fq2.py). This layer is the
EC backbone of the Pippenger MSM replacing snarkjs's prover hot loop #3
(reference: cli/src/utils.ts:69-92; SURVEY.md §2.5).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ff.fp import FQ_CTX
from ..ff.fq2 import FQ2_CTX
from ..ff.bn254 import FQ_MOD
from ..ff.limbs import NLIMBS, to_limbs, batch_from_limbs
from .bn254_host import B2, g1_add, g1_double, g1_mul, g2_add, g2_double, g2_mul


class CurveDev:
    """Device ops for one curve; `fdims` = number of trailing field-elem dims."""

    def __init__(self, F, fdims, b3_np, one_mont_np, host_ops, name):
        self.F = F
        self.fdims = fdims
        self._b3_np = b3_np         # np array, trailing field shape: 3b Montgomery
        self._one_np = one_mont_np  # np array, trailing field shape
        self.host_add, self.host_double, self.host_mul = host_ops
        self.name = name

    def _b3c(self, like):
        """b3 = 3b as a constant field element broadcast to `like`'s shape."""
        return jnp.broadcast_to(jnp.asarray(self._b3_np), like.shape)

    # -- point constructors ---------------------------------------------------

    def fshape(self, batch_shape=()):
        return (*batch_shape, *self._one_np.shape)

    def one(self, batch_shape=()):
        return jnp.broadcast_to(jnp.asarray(self._one_np), self.fshape(batch_shape))

    def infinity(self, batch_shape=()):
        zero = jnp.zeros(self.fshape(batch_shape), dtype=jnp.uint32)
        return (zero, self.one(batch_shape), zero)

    def select(self, cond, p, q):
        """cond ? p : q lane-wise; cond has batch shape only."""
        F = self.F
        return tuple(F.select(cond, a, b) for a, b in zip(p, q))

    # -- RCB complete addition (a = 0), Alg. 7 --------------------------------
    #
    # Every mul/add/sub below is a *batched group* over a stacked leading
    # axis: the 12+ Montgomery muls collapse into 3 mont_mul instances and
    # the ~15 field adds/subs into ~6 instances. XLA compile time — the
    # binding constraint for these bignum kernels, ~1.3s per field-op
    # *instance* on XLA:CPU regardless of batch width — drops ~6x, and on
    # TPU the wider limb matmuls utilize the MXU better. The b3 (=3b)
    # scalings are folded into mul groups: b3*Z1Z2 is computed inside group
    # 1, and the two products involving b3*Y3 are computed with unscaled Y3
    # and rescaled afterwards in one 2-wide constant-mul group (field
    # scalars commute through the products).

    def _gmul(self, lhs, rhs):
        out = self.F.mont_mul(jnp.stack(lhs), jnp.stack(rhs))
        return tuple(out[i] for i in range(len(lhs)))

    def _gadd(self, lhs, rhs):
        out = self.F.add(jnp.stack(lhs), jnp.stack(rhs))
        return tuple(out[i] for i in range(len(lhs)))

    def _gsub(self, lhs, rhs):
        out = self.F.sub(jnp.stack(lhs), jnp.stack(rhs))
        return tuple(out[i] for i in range(len(lhs)))

    def add(self, p, q):
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        b3 = self._b3c(X1)
        a1, a2, a3, b1, b2, b31 = self._gadd(
            (X1, Y1, X1, X2, Y2, X2), (Y1, Z1, Z1, Y2, Z2, Z2))
        # group 1: the 6 RCB products + b3*Z1Z2 as (b3*Z1)*Z2 is not
        # possible pre-mul, so fold it as a 7th product (b3, Z1Z2) later;
        # instead compute Z1*Z2 and scale in the const group below.
        t0, t1, t2, s3, s4, s5 = self._gmul(
            (X1, Y1, Z1, a1, a2, a3), (X2, Y2, Z2, b1, b2, b31))
        # const-mul group: t2b = b3*Z1Z2 (needed before group 2)
        (t2b,) = self._gmul((t2,), (b3,))
        u1, u2, u3, X3, Z3 = self._gadd(
            (t0, t1, t0, t0, t1), (t1, t2, t2, t0, t2b))
        t3, t4, Y3u, t1n = self._gsub((s3, s4, s5, t1), (u1, u2, u3, t2b))
        t0n = F.add(X3, t0)
        # group 2 with UNSCALED Y3u; p0 = t4*Y3u and p2 = Y3u*t0n are
        # rescaled by b3 afterwards (b3 commutes through the product)
        p0, p1, p2, p3, p4, p5 = self._gmul(
            (t4, t3, Y3u, t1n, t0n, Z3), (Y3u, t1n, t0n, Z3, t3, t4))
        q0, q2 = self._gmul((p0, p2), (b3, b3))
        X3o = F.sub(p1, q0)
        Y3o = F.add(p3, q2)
        Z3o = F.add(p5, p4)
        return (X3o, Y3o, Z3o)

    # -- RCB mixed addition (Q affine, never infinity), Alg. 8 ----------------

    def add_mixed(self, p, q_aff):
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2 = q_aff
        b3 = self._b3c(X1)
        a1, b1 = self._gadd((X1, X2), (Y1, Y2))
        # group 1: 5 RCB products + t2 = b3*Z1 folded as a 6th product
        t0, t1, s2, s3, s4, t2 = self._gmul(
            (X1, Y1, a1, Z1, Z1, Z1), (X2, Y2, b1, Y2, X2, b3))
        u1, t4, Y3u0, X3, Z3 = self._gadd(
            (t0, s3, s4, t0, t1), (t1, Y1, X1, t0, t2))
        t3, t1n = self._gsub((s2, t1), (u1, t2))
        t0n = F.add(X3, t0)
        p0, p1, p2, p3, p4, p5 = self._gmul(
            (t4, t3, Y3u0, t1n, t0n, Z3), (Y3u0, t1n, t0n, Z3, t3, t4))
        q0, q2 = self._gmul((p0, p2), (b3, b3))
        X3o = F.sub(p1, q0)
        Y3o = F.add(p3, q2)
        Z3o = F.add(p5, p4)
        return (X3o, Y3o, Z3o)

    def neg(self, p):
        x, y, z = p
        return (x, self.F.neg(y), z)

    # -- host conversions -----------------------------------------------------

    def _felt_to_limbs(self, v) -> np.ndarray:
        """host field element (int or tuple of ints) -> Montgomery limbs."""
        if self.fdims == 1:
            return to_limbs(FQ_CTX.to_mont_int(v % FQ_MOD))
        return np.stack([to_limbs(FQ_CTX.to_mont_int(c % FQ_MOD)) for c in v])

    def _limbs_to_felt(self, a):
        """(..., field shape) device limbs (Mont) -> flat list of host elements."""
        vals = [FQ_CTX.from_mont_int(x) for x in batch_from_limbs(a)]
        if self.fdims == 1:
            return vals
        return [tuple(vals[i : i + 2]) for i in range(0, len(vals), 2)]

    def encode_affine(self, points) -> np.ndarray:
        """host affine points [(x, y), ...] (no infinities) -> (N, 2, fshape).

        Bulk path: one Montgomery mulmod per coordinate plus a single byte-
        packing pass (batch_to_limbs) instead of per-point limb loops."""
        from ..ff.limbs import batch_to_limbs

        n = len(points)
        to_m = FQ_CTX.to_mont_int
        flat: list[int] = []
        if self.fdims == 1:
            for pt in points:
                if pt is None:
                    raise ValueError("affine encoding cannot represent infinity")
                flat.append(to_m(pt[0] % FQ_MOD))
                flat.append(to_m(pt[1] % FQ_MOD))
            return batch_to_limbs(flat).reshape(n, 2, NLIMBS)
        for pt in points:
            if pt is None:
                raise ValueError("affine encoding cannot represent infinity")
            flat.extend((to_m(pt[0][0] % FQ_MOD), to_m(pt[0][1] % FQ_MOD),
                         to_m(pt[1][0] % FQ_MOD), to_m(pt[1][1] % FQ_MOD)))
        return batch_to_limbs(flat).reshape(n, 2, 2, NLIMBS)

    def decode(self, p):
        """batched device projective points -> list of host affine / None.

        Z inversions are batched (Montgomery trick): one modexp for the whole
        batch — per-point pow() dominated decode time at setup sizes."""
        from ..ff.bn254 import batch_inv_mod

        xs = self._limbs_to_felt(np.asarray(p[0]))
        ys = self._limbs_to_felt(np.asarray(p[1]))
        zs = self._limbs_to_felt(np.asarray(p[2]))
        if self.fdims == 1:
            mul = lambda a, b: a * b % FQ_MOD
            is0 = lambda v: v == 0
            live = [z for z in zs if not is0(z)]
            invs = iter(batch_inv_mod(live, FQ_MOD))
            inv = lambda z: next(invs)
        else:
            from .bn254_host import _fq2_mul as mul

            is0 = lambda v: v[0] == 0 and v[1] == 0
            # Fq2 inverse via one batched Fq inversion of the norms:
            # (a+bu)^-1 = (a-bu)/(a^2+b^2)
            norms = [(z[0] * z[0] + z[1] * z[1]) % FQ_MOD
                     for z in zs if not is0(z)]
            ninvs = iter(batch_inv_mod(norms, FQ_MOD))
            inv = lambda z: (lambda ni: (z[0] * ni % FQ_MOD,
                                         (FQ_MOD - z[1]) * ni % FQ_MOD))(
                next(ninvs))
        out = []
        for x, y, z in zip(xs, ys, zs):
            if is0(z):
                out.append(None)
            else:
                zi = inv(z)
                out.append((mul(x, zi), mul(y, zi)))
        return out

    def decode_one(self, p):
        return self.decode(tuple(np.asarray(c)[None] for c in p))[0]


_B3_FQ = to_limbs(FQ_CTX.to_mont_int(9))      # G1: b = 3, so b3 = 9
_B3_FQ2 = np.stack([to_limbs(FQ_CTX.to_mont_int(3 * c % FQ_MOD)) for c in B2])

_ONE_FQ = to_limbs(FQ_CTX.one_mont_int)
_ONE_FQ2 = np.stack([_ONE_FQ, np.zeros_like(_ONE_FQ)])

G1_DEV = CurveDev(FQ_CTX, 1, _B3_FQ, _ONE_FQ, (g1_add, g1_double, g1_mul), "g1")
G2_DEV = CurveDev(FQ2_CTX, 2, _B3_FQ2, _ONE_FQ2, (g2_add, g2_double, g2_mul), "g2")
