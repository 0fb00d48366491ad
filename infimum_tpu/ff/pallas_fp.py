"""Limb-major BN254 field arithmetic for Pallas TPU kernels.

The XLA path (ff/fp.py) stores elements as (..., NLIMBS) with the 16-wide
limb axis minor — fine when XLA picks layouts, but inside a hand-written
kernel the minor axis is the 128-lane axis, so a 16-wide minor dim wastes
7/8 of the VPU. Here elements are (NLIMBS, B): the batch rides the lanes and
every limb op is a full-width vector op. The schoolbook-column scatter is a
single f32 matmul (ncols, 2*L^2) @ (2*L^2, B) that lands on the MXU, exactly
mirroring ff/fp.py's exactness argument (all half-products < 2^16, column
sums < 2^21 < 2^24, so f32 accumulation is exact).

Pallas kernels may not close over array constants, so the context's
constants (modulus limbs, n', scatter matrices) are explicit: `consts()`
returns them for passing as kernel operands and `bind(*refs)` rebinds a
context to the in-kernel values. Outside kernels the unbound context works
directly (constants become ordinary jit consts).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .limbs import NLIMBS, LIMB_BITS, LIMB_MASK, to_limbs
from .fp import _column_matrix

_U32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def _column_matrix_T(ncols: int) -> np.ndarray:
    """(ncols, 2*L^2) transpose of ff/fp.py's scatter matrix."""
    return np.ascontiguousarray(_column_matrix(ncols).T)


def _last_row(x):
    """x[-1] without integer indexing: Mosaic lowers value integer indexing
    to dynamic_slice, which has no TPU kernel rule; static slice+squeeze do."""
    return jax.lax.squeeze(
        jax.lax.slice_in_dim(x, x.shape[0] - 1, x.shape[0], axis=0), (0,))


def _carry_T(cols, nout):
    """Carry propagation along axis 0; returns ((nout, B) limbs, (B,) carry).

    Same parallel carry-lookahead as ff/fp.py's _carry, transposed: one local
    split leaves limbs < 2^17, pending carries become bits, and the remaining
    ripple resolves with a log-depth generate/propagate doubling scan
    (unrolled, Pallas-friendly)."""
    assert cols.shape[0] == nout
    zero_row = jnp.zeros_like(cols[:1])

    def shift_up(x):
        return jnp.concatenate([zero_row, x[:-1]], axis=0)

    s = cols & LIMB_MASK
    c = cols >> LIMB_BITS
    v = s + shift_up(c)                       # < 2^17
    a = v & LIMB_MASK
    b = shift_up(v >> LIMB_BITS)              # bits in {0,1}

    g = ((a + b) >> LIMB_BITS).astype(_U32)               # generate
    p = ((a + b) == LIMB_MASK).astype(_U32)               # propagate

    # inclusive scan of (g, p) under (g2|p2&g1, p1&p2) by doubling
    shift = 1
    while shift < nout:
        zpad = jnp.zeros_like(g[:shift])
        opad = jnp.ones_like(g[:shift])
        g_prev = jnp.concatenate([zpad, g[:-shift]], axis=0)
        p_prev = jnp.concatenate([opad, p[:-shift]], axis=0)
        g = g | (p & g_prev)
        p = p & p_prev
        shift *= 2
    carry_in = shift_up(g)
    out = (a + b + carry_in) & LIMB_MASK
    carry_out = (_last_row(c) + (_last_row(v) >> LIMB_BITS)
                 + _last_row(g)).astype(_U32)
    return out, carry_out


def _sub_borrow_T(a, b):
    """a - b limbwise along axis 0: (limbs, borrow in {0,1})."""
    comp = b ^ jnp.uint32(LIMB_MASK)
    cols = a + comp
    one = jnp.concatenate(
        [jnp.ones_like(cols[:1]), jnp.zeros_like(cols[1:])], axis=0)
    out, carry = _carry_T(cols + one, a.shape[0])
    return out, jnp.uint32(1) - carry


class FpCtxT:
    """Montgomery context over limb-major (NLIMBS, B) blocks.

    Constants (all arrays): n, nprime — (NLIMBS, 1) uint32; m16, m32 —
    (16|32, 2*L^2) f32 scatter matrices."""

    def __init__(self, modulus: int, consts=None):
        self.modulus = modulus
        self.R = 1 << (NLIMBS * LIMB_BITS)
        if consts is None:
            nprime = (-pow(modulus, -1, self.R)) % self.R
            consts = (
                to_limbs(modulus).reshape(NLIMBS, 1),
                to_limbs(nprime).reshape(NLIMBS, 1),
                _column_matrix_T(NLIMBS).astype(np.float32),
                _column_matrix_T(2 * NLIMBS).astype(np.float32),
            )
        self.n, self.nprime, self.m16, self.m32 = consts

    def consts(self):
        """Operands for a pallas_call running bound ops: (n, nprime, m16, m32)."""
        return (np.asarray(self.n), np.asarray(self.nprime),
                np.asarray(self.m16), np.asarray(self.m32))

    def bind(self, n, nprime, m16, m32) -> "FpCtxT":
        """Context over in-kernel values (read from refs)."""
        return FpCtxT(self.modulus, consts=(n, nprime, m16, m32))

    def _mul_columns(self, a, b, ncols):
        """Schoolbook product columns: (L, B) x (L, B) -> (ncols, B)."""
        L, B = a.shape
        p = a[:, None, :] * b[None, :, :]               # (L, L, B) exact u32
        # u32 -> i32 -> f32: Mosaic has no direct u32<->f32 cast, and all
        # values here are < 2^21, so the i32 hop is value-preserving.
        lo = (p & LIMB_MASK).astype(jnp.int32) \
            .astype(jnp.float32).reshape(L * L, B)
        hi = (p >> LIMB_BITS).astype(jnp.int32) \
            .astype(jnp.float32).reshape(L * L, B)
        flat = jnp.concatenate([lo, hi], axis=0)        # (2L^2, B)
        m = self.m16 if ncols == NLIMBS else self.m32
        cols = jax.lax.dot_general(
            jnp.asarray(m), flat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # HIGHEST is load-bearing: default TPU f32 matmul is bf16 passes,
            # which breaks the <2^21 integer-exactness contract (ff/fp.py).
            precision=jax.lax.Precision.HIGHEST,
        )
        return cols.astype(jnp.int32).astype(_U32)

    def _cond_sub_n(self, r, carry):
        d, borrow = _sub_borrow_T(r, jnp.asarray(self.n))
        take = jnp.logical_or(carry.astype(bool), borrow == 0)
        return jnp.where(take[None, :], d, r)

    def add(self, a, b):
        s, c = _carry_T(a + b, NLIMBS)
        return self._cond_sub_n(s, c)

    def sub(self, a, b):
        d, borrow = _sub_borrow_T(a, b)
        n_added, _ = _carry_T(d + jnp.asarray(self.n), NLIMBS)
        return jnp.where(borrow.astype(bool)[None, :], n_added, d)

    def redc_cols(self, t_cols, extra_subs: int = 0):
        """Montgomery REDC of (2*NLIMBS, B) product columns.

        Standard REDC assumes T < R*N (one conditional subtract); lazily
        accumulated column sums (e.g. a whole Poseidon MDS row before one
        reduction) can reach T < (1+x)*R*N, which leaves the result below
        (2+x)*N — pass `extra_subs` = ceil(x) additional conditional
        subtracts to restore the < N contract."""
        t_low, _ = _carry_T(t_cols[:NLIMBS], NLIMBS)
        m_cols = self._mul_columns(
            t_low, jnp.broadcast_to(jnp.asarray(self.nprime), t_low.shape),
            NLIMBS)
        m, _ = _carry_T(m_cols, NLIMBS)
        mn_cols = self._mul_columns(
            m, jnp.broadcast_to(jnp.asarray(self.n), m.shape), 2 * NLIMBS)
        total, carry = _carry_T(t_cols + mn_cols, 2 * NLIMBS)
        out = self._cond_sub_n(total[NLIMBS:], carry)
        zero_carry = jnp.zeros_like(carry)
        for _ in range(extra_subs):
            out = self._cond_sub_n(out, zero_carry)
        return out

    def mont_mul(self, a, b):
        return self.redc_cols(self._mul_columns(a, b, 2 * NLIMBS))

    def mont_sqr(self, a):
        return self.mont_mul(a, a)


FR_CTX_T = FpCtxT(
    21888242871839275222246405745257275088548364400416034343698204186575808495617
)
