"""BabyJubJub twisted Edwards curve over BN254 Fr (host ops).

The in-circuit key/signature arithmetic of the reference circuits
(reference: circuits/utils/babyjub.circom, priv-to-pub-key.circom:14-20):
a*x^2 + y^2 = 1 + d*x^2*y^2 with a=168700, d=168696; generator point Base8 of
the prime-order subgroup (order l below, cofactor 8).
"""

from __future__ import annotations

from ..ff.bn254 import FR_MOD as P

A = 168700
D = 168696

BASE8 = (
    5299619240641551281634865583518297030282874472190772894086521144482721001553,
    16950150798460657717958625567821834550301663161624707787222815936182638968203,
)

# Prime order of the large subgroup (cofactor 8).
SUB_ORDER = 2736030358979909402780800718157159386076813972158567259200215660948447373041


def add(p, q):
    """Twisted Edwards addition (complete)."""
    x1, y1 = p
    x2, y2 = q
    beta = x1 * y2 % P
    gamma = y1 * x2 % P
    delta = (y1 - A * x1) * (x2 + y2) % P
    tau = beta * gamma % P
    dtau = D * tau % P
    x3 = (beta + gamma) * pow(1 + dtau, -1, P) % P
    y3 = (delta + A * beta - gamma) * pow(1 - dtau, -1, P) % P
    return (x3, y3)


def double(p):
    return add(p, p)


def neg(p):
    return ((-p[0]) % P, p[1])


IDENTITY = (0, 1)


def mul(p, n: int):
    result = IDENTITY
    addend = p
    n = int(n)
    while n > 0:
        if n & 1:
            result = add(result, addend)
        addend = add(addend, addend)
        n >>= 1
    return result


def is_on_curve(p) -> bool:
    x, y = p
    x2 = x * x % P
    y2 = y * y % P
    return (A * x2 + y2) % P == (1 + D * x2 % P * y2) % P


def in_subgroup(p) -> bool:
    return is_on_curve(p) and mul(p, SUB_ORDER) == IDENTITY
