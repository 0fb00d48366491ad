"""Batched prime-field arithmetic over limb vectors, for JAX/XLA on TPU.

Everything operates on arrays of shape (..., NLIMBS) with dtype uint32, each limb
holding 16 bits (see limbs.py for the exactness argument). Multiplication uses
separated-operand Montgomery reduction with R = 2^256:

    T        = a * b                      (schoolbook columns, 32 limbs)
    m        = (T mod R) * n' mod R       (low half product)
    result   = (T + m*N) / R              (conditionally minus N)

All loops are unrolled at trace time; per-element work is pure vector (VPU) math, so
a batch of B field muls lowers to ~3*256 fused uint32 multiply/accumulate lanes over
the batch dimension. This replaces the reference prover's JS bignum arithmetic inside
snarkjs (reference: cli/src/utils.ts:69-92) with TPU-vectorizable kernels.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .bn254 import FQ_MOD, FR_MOD
from .limbs import NLIMBS, LIMB_BITS, LIMB_MASK, to_limbs, from_limbs

_U32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def _column_matrix(ncols: int, dtype=np.float32) -> np.ndarray:
    """(2*L^2, ncols) 0/1 matrix scattering lo/hi half-products to columns.

    Row i*L+j routes lo(a_i*b_j) to column i+j; row L^2+i*L+j routes
    hi(a_i*b_j) to column i+j+1. Entries beyond ncols are dropped (only used
    for the mod-R low product where the high columns are discarded anyway).
    """
    m = np.zeros((2 * NLIMBS * NLIMBS, ncols), dtype=dtype)
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            if i + j < ncols:
                m[i * NLIMBS + j, i + j] = 1
            if i + j + 1 < ncols:
                m[NLIMBS * NLIMBS + i * NLIMBS + j, i + j + 1] = 1
    return m


def _mul_columns(a, b, ncols):
    """Schoolbook product columns of two limb vectors.

    Returns (..., ncols) uint32 where col[k] = sum_{i+j=k} lo(a_i*b_j)
    + sum_{i+j=k-1} hi(a_i*b_j); every column < 2^21 so uint32 is exact.

    TPU: the scatter-and-sum over half-products is a single f32 matmul — all
    inputs are < 2^16 and every column accumulates <= 32 of them
    (< 2^21 < 2^24), so f32 accumulation is exact, and it lands on the MXU.
    Precision=HIGHEST is load-bearing: the default MXU lowering uses bf16
    passes (~8 mantissa bits), which silently destroys the integers.
    HIGHEST forces the multi-pass f32-exact lowering (verified bit-exact
    against python ints on a real v5e chip).

    CPU: one int32 dot against the same 0/1 scatter matrix. A single dot op
    compiles ~8x faster than the earlier 32-step pad+add chain (XLA:CPU's
    fusion passes choke on long elementwise chains: one curve add built on
    the pad form took 250+s to compile; on the dot form it is seconds) and
    int32 accumulation is exact for the < 2^21 columns.
    """
    from ..utils.backend import platform

    p = a[..., :, None] * b[..., None, :]          # (..., L, L) exact in uint32
    lo = p & LIMB_MASK
    hi = p >> LIMB_BITS
    if platform() != "tpu":
        flat = jnp.concatenate(
            [lo.astype(jnp.int32).reshape(*p.shape[:-2], NLIMBS * NLIMBS),
             hi.astype(jnp.int32).reshape(*p.shape[:-2], NLIMBS * NLIMBS)],
            axis=-1,
        )
        cols = jnp.dot(flat, jnp.asarray(_column_matrix(ncols, np.int32)))
        return cols.astype(_U32)
    flat = jnp.concatenate(
        [lo.astype(jnp.float32).reshape(*p.shape[:-2], NLIMBS * NLIMBS),
         hi.astype(jnp.float32).reshape(*p.shape[:-2], NLIMBS * NLIMBS)],
        axis=-1,
    )
    cols = jnp.dot(
        flat, _column_matrix(ncols), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return cols.astype(_U32)


def _carry(cols, nout):
    """Propagate carries over columns; returns ((..., nout) limbs, carry-out).

    Parallel carry-lookahead instead of a sequential ripple: one local split
    pass leaves per-limb values < 2^17, a second split reduces the pending
    carries to bits, and the remaining ripple (which only travels through
    limbs equal to 0xFFFF) is resolved with a log-depth generate/propagate
    associative scan. Total O(log L) tensor ops instead of O(L).
    """
    assert cols.shape[-1] == nout
    zero_col = jnp.zeros_like(cols[..., :1])

    def shift_up(x):
        return jnp.concatenate([zero_col, x[..., :-1]], axis=-1)

    s = cols & LIMB_MASK
    c = cols >> LIMB_BITS
    v = s + shift_up(c)                      # < 2^17
    a = v & LIMB_MASK
    b = shift_up(v >> LIMB_BITS)             # bits in {0,1}

    g = ((a + b) >> LIMB_BITS).astype(_U32)              # generate: a+b >= 2^16
    p = ((a + b) == LIMB_MASK).astype(_U32)              # propagate: a+b == 0xFFFF

    # inclusive generate/propagate prefix via hand-rolled Kogge-Stone: the
    # same log-depth combine as lax.associative_scan but ~10x fewer HLO ops
    # (associative_scan's odd/even recursion of slices+concats made this the
    # dominant *compile-time* cost of every field op on XLA:CPU)
    nlimb = cols.shape[-1]
    d = 1
    while d < nlimb:
        gs = jnp.concatenate([jnp.zeros_like(g[..., :d]), g[..., :-d]], axis=-1)
        ps = jnp.concatenate([jnp.ones_like(p[..., :d]), p[..., :-d]], axis=-1)
        g = g | (p & gs)
        p = p & ps
        d <<= 1
    G = g
    carry_in = shift_up(G)
    out = (a + b + carry_in) & LIMB_MASK
    carry_out = (c[..., -1] + (v[..., -1] >> LIMB_BITS) + G[..., -1]).astype(_U32)
    return out, carry_out


def _sub_borrow(a, b):
    """Limbwise a - b; returns (diff mod 2^256 limbs, borrow in {0,1}).

    Two's-complement addition: a + ~b + 1 via the parallel carry propagator;
    the borrow is the inverted carry-out."""
    comp = b ^ jnp.uint32(LIMB_MASK)
    cols = a + comp
    one = jnp.concatenate(
        [jnp.ones_like(cols[..., :1]), jnp.zeros_like(cols[..., 1:])], axis=-1
    )
    out, carry = _carry(cols + one, a.shape[-1])
    return out, jnp.uint32(1) - carry


class FpCtx:
    """Montgomery arithmetic context for a fixed 254/256-bit prime modulus."""

    def __init__(self, modulus: int):
        self.modulus = modulus
        self.R = 1 << (NLIMBS * LIMB_BITS)
        self.R2 = (self.R * self.R) % modulus
        # n' = -modulus^{-1} mod R  (full-width for separated REDC)
        self.nprime = (-pow(modulus, -1, self.R)) % self.R
        self.n_limbs = jnp.asarray(to_limbs(modulus))
        self.nprime_limbs = jnp.asarray(to_limbs(self.nprime))
        self.r2_limbs = jnp.asarray(to_limbs(self.R2))
        self.one_mont_int = self.R % modulus
        self.r_inv = pow(self.R, -1, modulus)
        self.zero_limbs = jnp.asarray(to_limbs(0))
        self.one_mont = jnp.asarray(to_limbs(self.one_mont_int))

    # -- host-side conversions ------------------------------------------------

    def to_mont_int(self, x: int) -> int:
        return (x * self.R) % self.modulus

    def from_mont_int(self, x: int) -> int:
        return (x * self.r_inv) % self.modulus

    # -- device ops (jnp, batched over leading dims) --------------------------

    def _cond_sub_n(self, r, carry):
        """r (+ carry*2^256) - N if that is >= 0, else r."""
        d, borrow = _sub_borrow(r, self.n_limbs)
        take = jnp.logical_or(carry.astype(bool), borrow == 0)
        return jnp.where(take[..., None], d, r)

    def add(self, a, b):
        s, c = _carry(a + b, NLIMBS)
        return self._cond_sub_n(s, c)

    def sub(self, a, b):
        d, borrow = _sub_borrow(a, b)
        n_added, _ = _carry(d + self.n_limbs, NLIMBS)
        return jnp.where(borrow.astype(bool)[..., None], n_added, d)

    def neg(self, a):
        """-a mod N (a must be reduced; maps 0 -> 0)."""
        d, _ = _sub_borrow(self.n_limbs, a)
        is_zero = jnp.all(a == 0, axis=-1)
        return jnp.where(is_zero[..., None], a, d)

    def mont_mul(self, a, b):
        t_cols = _mul_columns(a, b, 2 * NLIMBS)
        # m only needs T mod R normalized; carry the low half alone
        t_low, _ = _carry(t_cols[..., :NLIMBS], NLIMBS)
        m_cols = _mul_columns(t_low, self.nprime_limbs, NLIMBS)
        m, _ = _carry(m_cols, NLIMBS)
        mn_cols = _mul_columns(m, self.n_limbs, 2 * NLIMBS)
        # columns < 2^21 each, so the sum stays well below 2^32
        total, carry = _carry(t_cols + mn_cols, 2 * NLIMBS)
        return self._cond_sub_n(total[..., NLIMBS:], carry)

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    def to_mont(self, a):
        return self.mont_mul(a, jnp.broadcast_to(self.r2_limbs, a.shape))

    def from_mont(self, a):
        """Montgomery -> standard form: REDC(a * 1)."""
        t = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, NLIMBS)])
        m_cols = _mul_columns(t[..., :NLIMBS], self.nprime_limbs, NLIMBS)
        m, _ = _carry(m_cols, NLIMBS)
        mn_cols = _mul_columns(m, self.n_limbs, 2 * NLIMBS)
        total, carry = _carry(t + mn_cols, 2 * NLIMBS)
        return self._cond_sub_n(total[..., NLIMBS:], carry)

    def mont_pow(self, a, e: int):
        """a^e with a in Montgomery form and python-int exponent (static)."""
        result = jnp.broadcast_to(self.one_mont, a.shape)
        base = a
        while e > 0:
            if e & 1:
                result = self.mont_mul(result, base)
            base = self.mont_sqr(base)
            e >>= 1
        return result

    def mont_inv(self, a):
        """Batched inversion via Fermat (a must be nonzero)."""
        return self.mont_pow(a, self.modulus - 2)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, cond, a, b):
        """cond ? a : b, broadcasting cond over the limb axis."""
        return jnp.where(cond[..., None], a, b)

    # -- host helpers for tests -----------------------------------------------

    def encode(self, xs) -> np.ndarray:
        """list of python ints -> (N, NLIMBS) Montgomery-form limbs."""
        from .limbs import batch_to_limbs

        return batch_to_limbs([self.to_mont_int(x % self.modulus) for x in xs])

    def decode(self, a) -> list[int]:
        """(..., NLIMBS) Montgomery-form limbs -> python ints."""
        from .limbs import batch_from_limbs

        rinv = pow(self.R, -1, self.modulus)
        return [(x * rinv) % self.modulus for x in batch_from_limbs(a)]


FR_CTX = FpCtx(FR_MOD)
FQ_CTX = FpCtx(FQ_MOD)
