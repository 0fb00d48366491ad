"""Limb-tuple BN254 field + curve arithmetic for Pallas TPU kernels.

A field element is a tuple of NLIMBS=16 arrays (any common shape), each
holding one 16-bit little-endian limb in uint32 lanes. Unlike ff/fp.py
(batch-major (..., 16) arrays, limbs on the minor axis), the tuple form is
what a hand-written Mosaic kernel wants: every limb op is a full-width
(sublane, lane) vector op, all intermediates live in vregs/VMEM, and no
constants are closed over (Pallas kernels may not capture array constants,
so the modulus/n'/R limbs appear as Python int literals baked into the
traced ops).

Measured on a real TPU v5e: the fully-unrolled Montgomery multiply here
sustains ~700M muls/s in-kernel vs ~5M muls/s for the XLA f32-matmul path
(ff/fp.py) — the 140x that makes the Pippenger MSM (reference hot loop #3,
cli/src/utils.ts:69-92) compute-bound instead of lowering-bound.

The RCB complete-addition formulas mirror curve/proj.py (Renes-Costello-
Batina 2016, a=0), golden-tested there against the host bignum curve.
"""

from __future__ import annotations

import jax.numpy as jnp

NLIMBS = 16
LIMB_BITS = 16
MASK = 0xFFFF


def _int_limbs(x: int) -> list[int]:
    return [(x >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)]


class FieldConsts:
    """Compile-time constants for one prime field (all Python ints)."""

    def __init__(self, modulus: int):
        self.modulus = modulus
        self.R = 1 << (NLIMBS * LIMB_BITS)
        self.nprime = (-pow(modulus, -1, self.R)) % self.R
        self.N = _int_limbs(modulus)
        self.NP = _int_limbs(self.nprime)
        self.ONE = _int_limbs(self.R % modulus)  # 1 in Montgomery form


def mul_cols(a, b):
    """Schoolbook columns of a*b: 32 uint32 columns, each < 2^21."""
    cols = [None] * (2 * NLIMBS)
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            p = a[i] * b[j]
            lo = p & MASK
            hi = p >> LIMB_BITS
            k = i + j
            cols[k] = lo if cols[k] is None else cols[k] + lo
            cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    return cols


def mul_cols_const(a, c_limbs, ncols):
    """a times a compile-time-constant limb vector (zero limbs skipped)."""
    cols = [None] * ncols
    for j, cj in enumerate(c_limbs):
        if cj == 0:
            continue
        for i in range(NLIMBS):
            k = i + j
            if k >= ncols:
                break
            p = a[i] * cj
            lo = p & MASK
            cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < ncols:
                hi = p >> LIMB_BITS
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    zero = a[0] * 0
    return [zero if c is None else c for c in cols]


def ripple(cols):
    """Sequential ripple carry; returns (16-bit limbs, carry-out array)."""
    out = []
    c = None
    for k in range(len(cols)):
        v = cols[k] if c is None else cols[k] + c
        out.append(v & MASK)
        c = v >> LIMB_BITS
    return out, c


class Fq:
    """Montgomery arithmetic over limb tuples; one instance per modulus."""

    def __init__(self, consts: FieldConsts):
        self.c = consts

    # -- helpers ---------------------------------------------------------------

    def zero(self, like):
        z = like[0] * 0
        return tuple(z for _ in range(NLIMBS))

    def one(self, like):
        z = like[0] * 0
        return tuple(z + o for o in self.c.ONE)

    def select(self, cond, a, b):
        return tuple(jnp.where(cond, x, y) for x, y in zip(a, b))

    # -- modular ops -----------------------------------------------------------

    def _sub_n(self, r):
        """r - modulus; returns (diff limbs, borrow in {0,1})."""
        out = []
        c = 1
        for k in range(NLIMBS):
            v = r[k] + ((MASK ^ self.c.N[k]) + c) if isinstance(c, int) \
                else r[k] + (MASK ^ self.c.N[k]) + c
            out.append(v & MASK)
            c = v >> LIMB_BITS
        return out, 1 - c

    def _cond_sub_n(self, r, carry):
        d, borrow = self._sub_n(r)
        take = jnp.logical_or(carry > 0, borrow == 0)
        return tuple(jnp.where(take, d[k], r[k]) for k in range(NLIMBS))

    def add(self, a, b):
        s, c = ripple([a[k] + b[k] for k in range(NLIMBS)])
        return self._cond_sub_n(s, c)

    def sub(self, a, b):
        d = []
        c = 1
        for k in range(NLIMBS):
            v = a[k] + ((b[k] ^ MASK) + c) if isinstance(c, int) \
                else a[k] + (b[k] ^ MASK) + c
            d.append(v & MASK)
            c = v >> LIMB_BITS
        borrow = 1 - c
        plus_n, _ = ripple([d[k] + self.c.N[k] for k in range(NLIMBS)])
        return tuple(
            jnp.where(borrow > 0, plus_n[k], d[k]) for k in range(NLIMBS)
        )

    def mul(self, a, b):
        """Montgomery multiply (separated REDC, R = 2^256)."""
        t = mul_cols(a, b)
        t_low, _ = ripple(t[:NLIMBS])
        m_cols = mul_cols_const(t_low, self.c.NP, NLIMBS)
        m, _ = ripple(m_cols)
        mn = mul_cols_const(m, self.c.N, 2 * NLIMBS)
        s, carry = ripple([t[k] + mn[k] for k in range(2 * NLIMBS)])
        return self._cond_sub_n(s[NLIMBS:], carry)

    def mul9(self, x):
        """9x mod p — b3 for G1 (b = 3), via 3 doublings + 1 add."""
        x2 = self.add(x, x)
        x4 = self.add(x2, x2)
        x8 = self.add(x4, x4)
        return self.add(x8, x)

    def mul_const(self, a, k_mont: list[int]):
        """a times a fixed Montgomery-form constant (compile-time limbs)."""
        t = mul_cols_const(a, k_mont, 2 * NLIMBS)
        t_low, _ = ripple(t[:NLIMBS])
        m_cols = mul_cols_const(t_low, self.c.NP, NLIMBS)
        m, _ = ripple(m_cols)
        mn = mul_cols_const(m, self.c.N, 2 * NLIMBS)
        s, carry = ripple([t[k] + mn[k] for k in range(2 * NLIMBS)])
        return self._cond_sub_n(s[NLIMBS:], carry)

    # b3 hook so rcb_add(F, F.b3, ...) works uniformly across curves
    b3 = mul9


class Fq2:
    """Fq[u]/(u^2 + 1); element = pair of Fq limb tuples (c0, c1).

    The same interface as Fq, so the RCB formulas below are field-generic.
    `b3_mont` is the curve constant 3*b as a pair of Montgomery limb lists
    (for BN254 G2, b = 3/(9+u) — see curve/bn254_host.py B2)."""

    def __init__(self, fq: Fq, b3_mont: tuple[list[int], list[int]]):
        self.fq = fq
        self.b3_mont = b3_mont

    def zero(self, like):
        z = self.fq.zero(like[0])
        return (z, z)

    def one(self, like):
        return (self.fq.one(like[0]), self.fq.zero(like[0]))

    def select(self, cond, a, b):
        return (self.fq.select(cond, a[0], b[0]),
                self.fq.select(cond, a[1], b[1]))

    def add(self, a, b):
        return (self.fq.add(a[0], b[0]), self.fq.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.fq.sub(a[0], b[0]), self.fq.sub(a[1], b[1]))

    def mul(self, a, b):
        """Karatsuba: 3 Fq muls (u^2 = -1)."""
        F = self.fq
        v0 = F.mul(a[0], b[0])
        v1 = F.mul(a[1], b[1])
        s = F.mul(F.add(a[0], a[1]), F.add(b[0], b[1]))
        return (F.sub(v0, v1), F.sub(F.sub(s, v0), v1))

    def b3(self, x):
        """x * (3*b) with 3*b a compile-time Fq2 constant: 4 const muls."""
        F = self.fq
        k0, k1 = self.b3_mont
        c0 = F.sub(F.mul_const(x[0], k0), F.mul_const(x[1], k1))
        c1 = F.add(F.mul_const(x[0], k1), F.mul_const(x[1], k0))
        return (c0, c1)


# -- RCB complete addition (a = 0 short Weierstrass), mirroring curve/proj.py --

def rcb_add(F: Fq, b3, p, q):
    """Complete projective P + Q (Alg. 7); b3(x) multiplies by 3*curve_b."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t2 = F.mul(Z1, Z2)
    t3 = F.add(X1, Y1)
    t4 = F.add(X2, Y2)
    t3 = F.mul(t3, t4)
    t4 = F.add(t0, t1)
    t3 = F.sub(t3, t4)
    t4 = F.add(Y1, Z1)
    X3 = F.add(Y2, Z2)
    t4 = F.mul(t4, X3)
    X3 = F.add(t1, t2)
    t4 = F.sub(t4, X3)
    X3 = F.add(X1, Z1)
    Y3 = F.add(X2, Z2)
    X3 = F.mul(X3, Y3)
    Y3 = F.add(t0, t2)
    Y3 = F.sub(X3, Y3)
    X3 = F.add(t0, t0)
    t0 = F.add(X3, t0)
    t2 = b3(t2)
    Z3 = F.add(t1, t2)
    t1 = F.sub(t1, t2)
    Y3 = b3(Y3)
    X3 = F.mul(t4, Y3)
    t2 = F.mul(t3, t1)
    X3 = F.sub(t2, X3)
    Y3 = F.mul(Y3, t0)
    t1 = F.mul(t1, Z3)
    Y3 = F.add(t1, Y3)
    t0 = F.mul(t0, t3)
    Z3 = F.mul(Z3, t4)
    Z3 = F.add(Z3, t0)
    return (X3, Y3, Z3)


def rcb_add_mixed(F: Fq, b3, p, q_aff):
    """Complete mixed P + (x2, y2) (Alg. 8; Q affine, not infinity)."""
    X1, Y1, Z1 = p
    X2, Y2 = q_aff
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t3 = F.add(X2, Y2)
    t4 = F.add(X1, Y1)
    t3 = F.mul(t3, t4)
    t4 = F.add(t0, t1)
    t3 = F.sub(t3, t4)
    t4 = F.mul(Y2, Z1)
    t4 = F.add(t4, Y1)
    Y3 = F.mul(X2, Z1)
    Y3 = F.add(Y3, X1)
    X3 = F.add(t0, t0)
    t0 = F.add(X3, t0)
    t2 = b3(Z1)
    Z3 = F.add(t1, t2)
    t1 = F.sub(t1, t2)
    Y3 = b3(Y3)
    X3 = F.mul(t4, Y3)
    t2 = F.mul(t3, t1)
    X3 = F.sub(t2, X3)
    Y3 = F.mul(Y3, t0)
    t1 = F.mul(t1, Z3)
    Y3 = F.add(t1, Y3)
    t0 = F.mul(t0, t3)
    Z3 = F.mul(Z3, t4)
    Z3 = F.add(Z3, t0)
    return (X3, Y3, Z3)
