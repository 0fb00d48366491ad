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


def _mul_by_9(F, x):
    """9x via adds (G1 has b=3, so b3=9)."""
    x2 = F.add(x, x)
    x4 = F.add(x2, x2)
    x8 = F.add(x4, x4)
    return F.add(x8, x)


class CurveDev:
    """Device ops for one curve; `fdims` = number of trailing field-elem dims."""

    def __init__(self, F, fdims, b3_mul, one_mont_np, host_ops, name):
        self.F = F
        self.fdims = fdims
        self._b3 = b3_mul
        self._one_np = one_mont_np  # np array, trailing field shape
        self.host_add, self.host_double, self.host_mul = host_ops
        self.name = name

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

    def add(self, p, q):
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        t0 = F.mont_mul(X1, X2)
        t1 = F.mont_mul(Y1, Y2)
        t2 = F.mont_mul(Z1, Z2)
        t3 = F.add(X1, Y1)
        t4 = F.add(X2, Y2)
        t3 = F.mont_mul(t3, t4)
        t4 = F.add(t0, t1)
        t3 = F.sub(t3, t4)
        t4 = F.add(Y1, Z1)
        X3 = F.add(Y2, Z2)
        t4 = F.mont_mul(t4, X3)
        X3 = F.add(t1, t2)
        t4 = F.sub(t4, X3)
        X3 = F.add(X1, Z1)
        Y3 = F.add(X2, Z2)
        X3 = F.mont_mul(X3, Y3)
        Y3 = F.add(t0, t2)
        Y3 = F.sub(X3, Y3)
        X3 = F.add(t0, t0)
        t0 = F.add(X3, t0)
        t2 = self._b3(F, t2)
        Z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        Y3 = self._b3(F, Y3)
        X3 = F.mont_mul(t4, Y3)
        t2 = F.mont_mul(t3, t1)
        X3 = F.sub(t2, X3)
        Y3 = F.mont_mul(Y3, t0)
        t1 = F.mont_mul(t1, Z3)
        Y3 = F.add(t1, Y3)
        t0 = F.mont_mul(t0, t3)
        Z3 = F.mont_mul(Z3, t4)
        Z3 = F.add(Z3, t0)
        return (X3, Y3, Z3)

    # -- RCB mixed addition (Q affine, never infinity), Alg. 8 ----------------

    def add_mixed(self, p, q_aff):
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2 = q_aff
        t0 = F.mont_mul(X1, X2)
        t1 = F.mont_mul(Y1, Y2)
        t3 = F.add(X2, Y2)
        t4 = F.add(X1, Y1)
        t3 = F.mont_mul(t3, t4)
        t4 = F.add(t0, t1)
        t3 = F.sub(t3, t4)
        t4 = F.mont_mul(Y2, Z1)
        t4 = F.add(t4, Y1)
        Y3 = F.mont_mul(X2, Z1)
        Y3 = F.add(Y3, X1)
        X3 = F.add(t0, t0)
        t0 = F.add(X3, t0)
        t2 = self._b3(F, Z1)
        Z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        Y3 = self._b3(F, Y3)
        X3 = F.mont_mul(t4, Y3)
        t2 = F.mont_mul(t3, t1)
        X3 = F.sub(t2, X3)
        Y3 = F.mont_mul(Y3, t0)
        t1 = F.mont_mul(t1, Z3)
        Y3 = F.add(t1, Y3)
        t0 = F.mont_mul(t0, t3)
        Z3 = F.mont_mul(Z3, t4)
        Z3 = F.add(Z3, t0)
        return (X3, Y3, Z3)

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


def _b3_g2():
    b3 = (3 * B2[0] % FQ_MOD, 3 * B2[1] % FQ_MOD)
    limbs = np.stack([to_limbs(FQ_CTX.to_mont_int(c)) for c in b3])
    arr = jnp.asarray(limbs)

    def mul(F, x):
        return F.mont_mul(x, jnp.broadcast_to(arr, x.shape))

    return mul


_ONE_FQ = to_limbs(FQ_CTX.one_mont_int)
_ONE_FQ2 = np.stack([_ONE_FQ, np.zeros_like(_ONE_FQ)])

G1_DEV = CurveDev(FQ_CTX, 1, _mul_by_9, _ONE_FQ, (g1_add, g1_double, g1_mul), "g1")
G2_DEV = CurveDev(FQ2_CTX, 2, _b3_g2(), _ONE_FQ2, (g2_add, g2_double, g2_mul), "g2")
