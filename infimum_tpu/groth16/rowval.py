"""Device-vectorized sparse R1CS row evaluation over BN254 Fr.

The per-proof QAP reduction needs a(x)|_H, b(x)|_H, c(x)|_H — one sparse
matrix-vector product per matrix (reference: snarkjs evaluates these inside
`groth16.fullProve`'s witness->QAP step, cli/src/utils.ts:69-92). Round 1
did this with per-term Python bigint dict arithmetic (minutes at the
reference circuit's 3.9M nonzeros); here it is three device ops:

  1. encode the witness once: (nv, 16) limbs -> Montgomery via mont_mul(w, R2)
  2. per term: mont_mul(coeff_mont[k], w_mont[col[k]])  (batched, 16-bit limbs)
  3. segment_sum by row: Montgomery values are linear, so limb-column sums
     (< 2^16 per limb per term, row length < 2^16 asserted) accumulate in
     uint32, then one carry pass + carry-fold + conditional subtractions
     produce reduced Montgomery rows — exactly the NTT input encoding.

Preprocessing flattens the LC dicts once per ConstraintSystem (cached).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ff.bn254 import FR_MOD
from ..ff.fp import FR_CTX, _carry, _sub_borrow
from ..ff.limbs import NLIMBS, batch_to_limbs

P = FR_MOD
_U32 = jnp.uint32


class SparseRows:
    """Flattened (coeff, col, row) triples for the A/B/C matrices of a
    constraint system (including the libsnark public-input rows)."""

    def __init__(self, rows, num_rows: int):
        self.num_rows = num_rows
        self.mats = {}
        for name, idx in (("A", 0), ("B", 1), ("C", 2)):
            coeffs, cols, rids = [], [], []
            for j, triple in enumerate(rows):
                terms = triple[idx].terms
                if len(terms) >= (1 << 16):
                    raise ValueError("row too long for u32 limb accumulation")
                for i, c in terms.items():
                    coeffs.append(FR_CTX.to_mont_int(c % P))
                    cols.append(i)
                    rids.append(j)
            self.mats[name] = (
                jnp.asarray(batch_to_limbs(coeffs)) if coeffs else
                jnp.zeros((0, NLIMBS), _U32),
                jnp.asarray(np.asarray(cols, np.int32)),
                jnp.asarray(np.asarray(rids, np.int32)),
            )


# 2^256 mod P, in Montgomery form (so mont_mul(carry, this) = carry * 2^256)
_SHIFT_MONT = jnp.asarray(
    batch_to_limbs([FR_CTX.to_mont_int((1 << 256) % P)])[0])


def _reduce_rows(sums, m):
    """(m, 16) u32 limb-column sums (< 2^32) -> reduced values mod P."""
    out, carry = _carry(sums, NLIMBS)            # value = out + carry*2^256
    carry_limbs = jnp.concatenate(
        [carry[:, None], jnp.zeros((m, NLIMBS - 1), _U32)], axis=1)
    fold = FR_CTX.mont_mul(carry_limbs, jnp.broadcast_to(
        _SHIFT_MONT, (m, NLIMBS)))               # carry * 2^256 mod P, < P
    # out < 2^256 < 6P: up to 5 conditional subtractions bring it under P
    for _ in range(5):
        d, borrow = _sub_borrow(out, FR_CTX.n_limbs)
        out = jnp.where((borrow == 0)[:, None], d, out)
    return FR_CTX.add(out, fold)


def _eval_mat(coeffs, cols, rids, w_mont, m):
    if coeffs.shape[0] == 0:
        return jnp.zeros((m, NLIMBS), _U32)
    cw = FR_CTX.mont_mul(coeffs, jnp.take(w_mont, cols, axis=0))
    sums = jax.ops.segment_sum(cw, rids, num_segments=m,
                               indices_are_sorted=True)
    return _reduce_rows(sums, m)


@jax.jit
def _encode_witness(w_plain):
    return FR_CTX.mont_mul(
        w_plain, jnp.broadcast_to(FR_CTX.r2_limbs, w_plain.shape))


def _rows_fn(sp: SparseRows, m: int):
    """Jitted A/B/C evaluation graph, built once per SparseRows instance —
    a fresh closure per call would make jax.jit retrace the 4M-term
    segment-sum graph on every proof."""
    fn = sp.__dict__.get("_rows_fn")
    if fn is None:
        def run(w_mont, *mats):
            out = []
            for k in range(3):
                coeffs, cols, rids = mats[3 * k: 3 * k + 3]
                out.append(_eval_mat(coeffs, cols, rids, w_mont, m))
            return tuple(out)

        # AOT export cache (utils/aot.py): skips per-process re-tracing on
        # TPU; the shape signature (matrix nnz + m) keys the artifact
        from ..utils.aot import aot_jit

        fn = aot_jit(f"rowval_{m}", run)
        sp._rows_fn = fn
    return fn


def eval_rows_device(sp: SparseRows, witness: list[int], m: int):
    """Returns (a, b, c) as (m, 16) reduced-Montgomery device arrays."""
    w_plain = jnp.asarray(batch_to_limbs([x % P for x in witness]))
    w_mont = _encode_witness(w_plain)
    flat = sp.mats["A"] + sp.mats["B"] + sp.mats["C"]
    return _rows_fn(sp, m)(w_mont, *flat)
