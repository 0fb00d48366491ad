"""Field arithmetic: device (limb/Montgomery) ops vs python-int ground truth."""

import numpy as np
import jax

from infimum_tpu.ff import (
    FR_MOD,
    FQ_MOD,
    FR_CTX,
    FQ_CTX,
    to_limbs,
    from_limbs,
)


def test_limb_roundtrip(rng):
    for _ in range(20):
        x = rng.randrange(0, 1 << 256)
        assert from_limbs(to_limbs(x)) == x


def _check_ctx(ctx, mod, rng, n=64):
    xs = [rng.randrange(0, mod) for _ in range(n)]
    ys = [rng.randrange(0, mod) for _ in range(n)]
    a = ctx.encode(xs)
    b = ctx.encode(ys)

    got = ctx.decode(jax.jit(ctx.mont_mul)(a, b))
    assert got == [(x * y) % mod for x, y in zip(xs, ys)]

    got = ctx.decode(jax.jit(ctx.add)(a, b))
    assert got == [(x + y) % mod for x, y in zip(xs, ys)]

    got = ctx.decode(jax.jit(ctx.sub)(a, b))
    assert got == [(x - y) % mod for x, y in zip(xs, ys)]

    got = ctx.decode(jax.jit(ctx.neg)(a))
    assert got == [(-x) % mod for x in xs]

    got = ctx.decode(jax.jit(ctx.mont_sqr)(a))
    assert got == [(x * x) % mod for x in xs]


def test_fr_ops(rng):
    _check_ctx(FR_CTX, FR_MOD, rng)


def test_fq_ops(rng):
    _check_ctx(FQ_CTX, FQ_MOD, rng)


def test_edge_values():
    for ctx, mod in [(FR_CTX, FR_MOD), (FQ_CTX, FQ_MOD)]:
        xs = [0, 1, 2, mod - 1, mod - 2, mod // 2]
        a = ctx.encode(xs)
        got = ctx.decode(ctx.mont_mul(a, a))
        assert got == [(x * x) % mod for x in xs]
        got = ctx.decode(ctx.add(a, a))
        assert got == [(2 * x) % mod for x in xs]
        got = ctx.decode(ctx.neg(a))
        assert got == [(-x) % mod for x in xs]


def test_mont_conversions(rng):
    ctx = FR_CTX
    xs = [rng.randrange(0, FR_MOD) for _ in range(8)]
    plain = np.stack([to_limbs(x) for x in xs])
    m = ctx.to_mont(plain)
    assert ctx.decode(m) == xs
    back = ctx.from_mont(m)
    assert [from_limbs(r) for r in np.asarray(back)] == xs


def test_mont_inv(rng):
    ctx = FR_CTX
    xs = [rng.randrange(1, FR_MOD) for _ in range(4)]
    a = ctx.encode(xs)
    inv = ctx.mont_inv(a)
    got = ctx.decode(ctx.mont_mul(a, inv))
    assert got == [1] * len(xs)
