"""Pallas Montgomery kernel vs XLA reference parity (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import random

import jax
import numpy as np
import pytest

from vmn_tpu.arith.mont import MontCtx
from vmn_tpu.arith.limbs import ints_to_limbs, limbs_to_ints

P256 = int(
    "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff72ef", 16
)
P2048_TEST = None  # filled lazily from named group


def _mont_mul_interpret(a, b, m, mprime):
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp
    from vmn_tpu.ops import mont_kernels as mk

    mk = mk  # local alias
    N, L = a.shape
    mk.TILE_N = 8  # small tile: interpret mode is slow
    m2 = m.reshape(1, L)
    mp2 = jnp.asarray(mprime, jnp.uint32).reshape(1, 1)
    return pl.pallas_call(
        mk._mont_mul_kernel,
        grid=(pl.cdiv(N, mk.TILE_N),),
        in_specs=[
            pl.BlockSpec((mk.TILE_N, L), lambda i: (i, 0)),
            pl.BlockSpec((mk.TILE_N, L), lambda i: (i, 0)),
            pl.BlockSpec((1, L), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((mk.TILE_N, L), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, L), jnp.uint32),
        interpret=True,
    )(a, b, m2, mp2)


@pytest.mark.parametrize("mbits", [256])
def test_mont_mul_kernel_parity(mbits):
    rng = random.Random(999)
    m = P256
    ctx = MontCtx(m)
    n = 16
    xs = [rng.randrange(m) for _ in range(n)]
    ys = [rng.randrange(m) for _ in range(n)] + []
    # include edge cases
    xs[:3] = [0, 1, m - 1]
    ys[:3] = [0, m - 1, m - 1]
    a = ctx.encode(xs)
    b = ctx.encode(ys)
    out = _mont_mul_interpret(a, b, ctx.m_limbs, ctx.mprime_int)
    got = ctx.decode(out)
    assert got == [(x * y) % m for x, y in zip(xs, ys)]
