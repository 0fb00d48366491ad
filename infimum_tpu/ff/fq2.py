"""Batched device arithmetic over Fq2 = Fq[u]/(u^2 + 1) for BN254.

Elements are arrays of shape (..., 2, NLIMBS): component 0 is the real part,
component 1 the u-coefficient, each a Montgomery-form Fq limb vector (ff/fp.py).
Multiplication is Karatsuba (3 Fq mults); the quadratic non-residue is -1,
matching ark-bn254's Fq2 (the tower the reference verifier is built on,
pallet/src/lib.rs:815-827).
"""

from __future__ import annotations

import jax.numpy as jnp

from .fp import FQ_CTX
from .bn254 import FQ_MOD

F = FQ_CTX


class Fq2Ctx:
    """Mirror of FpCtx's device-op surface for Fq2 elements (..., 2, NLIMBS)."""

    def __init__(self):
        self.modulus = FQ_MOD

    # component-wise ops broadcast straight through the (2, NLIMBS) trailing dims
    def add(self, a, b):
        return F.add(a, b)

    def sub(self, a, b):
        return F.sub(a, b)

    def neg(self, a):
        return F.neg(a)

    def mont_mul(self, a, b):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        t0 = F.mont_mul(a0, b0)
        t1 = F.mont_mul(a1, b1)
        c0 = F.sub(t0, t1)  # u^2 = -1
        cross = F.mont_mul(F.add(a0, a1), F.add(b0, b1))
        c1 = F.sub(F.sub(cross, t0), t1)
        return jnp.stack([c0, c1], axis=-2)

    def mont_sqr(self, a):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        # (a0 + a1)(a0 - a1), 2 a0 a1
        c0 = F.mont_mul(F.add(a0, a1), F.sub(a0, a1))
        t = F.mont_mul(a0, a1)
        c1 = F.add(t, t)
        return jnp.stack([c0, c1], axis=-2)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def select(self, cond, a, b):
        """cond ? a : b with cond of batch shape (no trailing field dims)."""
        return jnp.where(cond[..., None, None], a, b)


FQ2_CTX = Fq2Ctx()
