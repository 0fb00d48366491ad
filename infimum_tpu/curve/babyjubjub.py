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
    nat = _native()
    if nat:
        return nat.bjj_add(p, q)
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


def _ext_add(p, q):
    """Unified extended-coordinate addition (X, Y, T, Z), Hisil et al.
    "add-2008-hwcd": no inversions — the affine `add` costs two modular
    inverses per step, which dominated host EdDSA/ECDH (hot path of message
    publication and replay). Complete here because d is a non-square and a
    a square mod P (checked in tests against the affine ladder)."""
    x1, y1, t1, z1 = p
    x2, y2, t2, z2 = q
    a = x1 * x2 % P
    b = y1 * y2 % P
    c = D * t1 % P * t2 % P
    dd = z1 * z2 % P
    e = ((x1 + y1) * (x2 + y2) - a - b) % P
    f = (dd - c) % P
    g = (dd + c) % P
    h = (b - A * a) % P
    return (e * f % P, g * h % P, e * h % P, f * g % P)


def _native():
    """Native C++ twin (native/src/bjj.cc): ~2.3 ms -> ~60 us per
    full-width scalar mult; the host hot loop of EdDSA signing/ECDH in
    message publication and replay. INFIMUM_NATIVE_BJJ=0 forces Python."""
    global _NATIVE
    if _NATIVE is None:
        import os

        if os.environ.get("INFIMUM_NATIVE_BJJ", "1") != "1":
            _NATIVE = False
        else:
            from .. import native

            _NATIVE = native if native.available() else False
    return _NATIVE


_NATIVE = None


def mul(p, n: int):
    """Scalar multiplication via extended coordinates: one inversion total
    (the final normalization) instead of two per point addition."""
    n = int(n)
    if n <= 0:
        return IDENTITY if n == 0 else mul(neg(p), -n)
    nat = _native()
    if nat and n < (1 << 256):
        return nat.bjj_mul(p, n)
    x, y = p
    acc = (0, 1, 0, 1)                       # identity
    base = (x, y, x * y % P, 1)
    while n > 0:
        if n & 1:
            acc = _ext_add(acc, base)
        base = _ext_add(base, base)
        n >>= 1
    xr, yr, _, zr = acc
    if zr == 0:
        return IDENTITY
    zi = pow(zr, -1, P)
    return (xr * zi % P, yr * zi % P)


def is_on_curve(p) -> bool:
    x, y = p
    x2 = x * x % P
    y2 = y * y % P
    return (A * x2 + y2) % P == (1 + D * x2 % P * y2) % P


def in_subgroup(p) -> bool:
    return is_on_curve(p) and mul(p, SUB_ORDER) == IDENTITY
