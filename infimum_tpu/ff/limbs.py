"""Limb-decomposed representation of 256-bit field elements for TPU kernels.

A field element is a vector of NLIMBS=16 little-endian limbs of LIMB_BITS=16 bits,
stored in uint32 lanes. All device arithmetic keeps every intermediate strictly below
2^32 so that plain uint32 vector ops are exact on the TPU VPU:

  - products of two 16-bit limbs are < 2^32 (exact in uint32),
  - their lo/hi 16-bit halves are < 2^16,
  - column sums of <= 32 halves are < 2^21.

This is the design the whole stack layers on (SURVEY.md section 7 "Hard parts").
"""

from __future__ import annotations

import numpy as np

NLIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def to_limbs(x: int, nlimbs: int = NLIMBS) -> np.ndarray:
    """python int -> (nlimbs,) uint32 little-endian limb vector."""
    out = np.zeros((nlimbs,), dtype=np.uint32)
    for i in range(nlimbs):
        out[i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def from_limbs(a) -> int:
    """(nlimbs,) limb vector -> python int."""
    a = np.asarray(a)
    x = 0
    for i in reversed(range(a.shape[-1])):
        x = (x << LIMB_BITS) | int(a[i])
    return x


def batch_to_limbs(xs, nlimbs: int = NLIMBS) -> np.ndarray:
    """iterable of ints -> (N, nlimbs) uint32."""
    xs = list(xs)
    out = np.zeros((len(xs), nlimbs), dtype=np.uint32)
    for n, x in enumerate(xs):
        for i in range(nlimbs):
            out[n, i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def batch_from_limbs(a) -> list[int]:
    """(..., nlimbs) -> list of python ints (flattened over leading dims)."""
    a = np.asarray(a)
    flat = a.reshape(-1, a.shape[-1])
    out = []
    for row in flat:
        x = 0
        for i in reversed(range(a.shape[-1])):
            x = (x << LIMB_BITS) | int(row[i])
        out.append(x)
    return out
