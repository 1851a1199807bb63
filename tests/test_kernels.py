"""Direct Pallas TPU kernel tests (interpret mode on CPU).

The kernels in vmn_tpu/ops/mont_kernels.py are the entire performance
story; these tests check them limb-for-limb against Python bignum
arithmetic without TPU hardware, including edge values (0, 1, m-1, zero
and maximal exponents).  A kernel regression previously would only have
surfaced as a wrong election result on hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vmn_tpu.arith.limbs import int_to_limbs, limbs_to_int
from vmn_tpu.arith.mont import MontCtx
from vmn_tpu.ops.mont_kernels import (
    mont_exp_pallas,
    mont_fb8_exp_pallas,
    mont_fb_exp_pallas,
    mont_mul_pallas,
)

P256 = int(
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff72ef",
    16,
)


@pytest.fixture(scope="module")
def ctx():
    return MontCtx(P256)


def _to_mont_np(ctx, xs):
    return np.asarray(
        ctx.to_mont(jnp.asarray(
            np.stack([int_to_limbs(x % ctx.m, ctx.L) for x in xs])
        ))
    )


def _from_mont_ints(ctx, arr):
    out = np.asarray(ctx.from_mont(jnp.asarray(arr)))
    return [limbs_to_int(row) for row in out]


def _edge_values(m):
    return [0, 1, 2, m - 1, m - 2, m // 2, 3, m // 3, 12345, m - 12345]


def test_mont_mul_pallas_interpret(ctx):
    m = ctx.m
    vals = _edge_values(m)
    a_ints = vals + vals[::-1]
    b_ints = vals[::-1] + vals
    a = jnp.asarray(_to_mont_np(ctx, a_ints))
    b = jnp.asarray(_to_mont_np(ctx, b_ints))
    with pltpu.force_tpu_interpret_mode():
        out = mont_mul_pallas(a, b, ctx.m_limbs, ctx.mprime)
    got = _from_mont_ints(ctx, np.asarray(out))
    # mont_mul of Montgomery forms yields Montgomery form of product
    want = [(x % m) * (y % m) % m for x, y in zip(a_ints, b_ints)]
    assert got == want


def test_mont_exp_pallas_interpret(ctx):
    m = ctx.m
    bases = [2, 1, m - 1, 3, 12345, m - 2, 7, 1 << 60]
    exps = [0, 1, 2, m - 2, (1 << 255) - 1, 65537, 50, 3]
    a = jnp.asarray(_to_mont_np(ctx, bases))
    e = jnp.asarray(
        np.stack([int_to_limbs(x, ctx.L) for x in exps])
    )
    with pltpu.force_tpu_interpret_mode():
        out = mont_exp_pallas(
            a, e, ctx.m_limbs, ctx.mprime, ctx.one_mont, 256
        )
    got = _from_mont_ints(ctx, np.asarray(out))
    want = [pow(b % m, x, m) for b, x in zip(bases, exps)]
    assert got == want


def test_mont_fb_exp_pallas_interpret(ctx):
    m = ctx.m
    g = 4
    exps = [0, 1, 2, m - 2, (1 << 255) - 1, 65537, 50, 3]
    tbl = ctx.fb_table_pallas(g, 256)
    e = jnp.asarray(np.stack([int_to_limbs(x, ctx.L) for x in exps]))
    with pltpu.force_tpu_interpret_mode():
        out = mont_fb_exp_pallas(
            tbl, e, ctx.m_limbs, ctx.mprime, ctx.one_mont
        )
    got = _from_mont_ints(ctx, np.asarray(out))
    want = [pow(g, x, m) for x in exps]
    assert got == want


def test_mont_fb8_exp_pallas_interpret(ctx):
    m = ctx.m
    g = 4
    exps = [0, 1, 2, m - 2, (1 << 255) - 1, 65537, 50, 3]
    tbl = ctx.fixed_base_table(g, 256, 8)
    e = jnp.asarray(np.stack([int_to_limbs(x, ctx.L) for x in exps]))
    with pltpu.force_tpu_interpret_mode():
        out = mont_fb8_exp_pallas(
            tbl, e, ctx.m_limbs, ctx.mprime, ctx.one_mont
        )
    got = _from_mont_ints(ctx, np.asarray(out))
    want = [pow(g, x, m) for x in exps]
    assert got == want


def test_kernels_match_xla_path(ctx):
    """Pallas kernels and the portable XLA fallback agree on random
    batches (the dispatch layer switches between them by backend)."""
    from vmn_tpu.arith import mont as mont_mod

    rng = np.random.default_rng(7)
    N = 160
    a_ints = [int.from_bytes(rng.bytes(31), "big") % ctx.m
              for _ in range(N)]
    e_ints = [int.from_bytes(rng.bytes(31), "big") for _ in range(N)]
    a = jnp.asarray(_to_mont_np(ctx, a_ints))
    e = jnp.asarray(np.stack([int_to_limbs(x, ctx.L) for x in e_ints]))

    xla = mont_mod.mont_exp(
        a, e, ctx.m_limbs, ctx.mprime, ctx.one_mont, 256
    )
    with pltpu.force_tpu_interpret_mode():
        pal = mont_exp_pallas(
            a, e, ctx.m_limbs, ctx.mprime, ctx.one_mont, 256
        )
    assert np.array_equal(np.asarray(xla), np.asarray(pal))
