"""Pallas TPU kernel for batched Montgomery multiplication.

The single hottest primitive of the whole framework: every group
operation reduces to streams of (N, L)-batched Montgomery products
(reference equivalent: gmpmee's mpz_powm loops, SURVEY.md §2.3).

Layout inside the kernel is **limb-major**: a tile is a (L, TN) uint32
matrix — limbs on sublanes, batch elements on lanes.  This makes the
CIOS limb recurrence a *sublane* shift (cheap) and keeps every lane
fully independent; the per-iteration dynamic index (current limb of
`a`) is a dynamic sublane slice, which Mosaic supports (dynamic *lane*
slices must be 128-aligned and are not).

The final carry resolution + conditional subtraction is a sequential
O(L) sublane scan per tile, fused into the same kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vmn_tpu.arith.limbs import LIMB_BITS, LIMB_MASK

TILE_N = 512  # batch lanes per grid step (multiple of 128)


def _mont_mul_kernel(a_ref, b_ref, m_ref, mp_ref, out_ref, t_ref):
    """One batch tile: out = a*b*R^{-1} mod m, all (L, TN) limb-major.

    t_ref: (L + 1, TN) uint32 scratch — lazy accumulator (< 2^26).
    """
    L = a_ref.shape[0]
    b = b_ref[:]  # (L, TN)
    mp = mp_ref[0, 0]
    mask = jnp.uint32(LIMB_MASK)
    TN = b.shape[1]

    zero_row = jnp.zeros((1, TN), jnp.uint32)
    t_ref[:] = jnp.zeros_like(t_ref)

    def shift_up(x):
        """(L, TN) -> (L+1, TN): value shifted one limb up."""
        return jnp.concatenate([zero_row, x], axis=0)

    def pad0(x):
        """(L, TN) -> (L+1, TN): zero row appended."""
        return jnp.concatenate([x, zero_row], axis=0)

    def body(i, _):
        ai = a_ref[pl.ds(i, 1), :]  # (1, TN)
        t = t_ref[:]  # (L+1, TN)
        p = ai * b  # (L, TN) 32-bit products of 16-bit limbs
        t = t + pad0(p & mask) + shift_up(p >> LIMB_BITS)

        q = (t[:1, :] * mp) & mask  # (1, TN)
        p2 = q * m_ref[:]  # (L, TN)
        t = t + pad0(p2 & mask) + shift_up(p2 >> LIMB_BITS)

        # Right-shift one limb; col0's carry folds into the new row 0.
        carry0 = t[:1, :] >> LIMB_BITS
        t = jnp.concatenate([t[1:, :] , zero_row], axis=0)
        t = t + pad0(jnp.concatenate(
            [carry0, jnp.zeros((L - 1, TN), jnp.uint32)], axis=0))
        t_ref[:] = t
        return 0

    jax.lax.fori_loop(0, L, body, 0, unroll=False)

    # Carry resolution + conditional subtraction (value in [0, 2m)).
    def fixup(i, carry):
        c, br = carry
        tk = t_ref[pl.ds(i, 1), :].astype(jnp.int32)
        mk = m_ref[pl.ds(i, 1), :].astype(jnp.int32)
        s = tk + c
        lo = s & LIMB_MASK
        c = s >> LIMB_BITS
        d = lo - mk - br
        dlo = d & LIMB_MASK
        br = (d >> 31) & 1
        t_ref[pl.ds(i, 1), :] = lo.astype(jnp.uint32)  # stash lo
        out_ref[pl.ds(i, 1), :] = dlo.astype(jnp.uint32)  # stash d
        return c, br

    zc = jnp.zeros((1, TN), jnp.int32)
    c, br = jax.lax.fori_loop(0, L, fixup, (zc, zc), unroll=False)
    # top lazy row L contributes to the final carry
    c = c + t_ref[pl.ds(L, 1), :].astype(jnp.int32)

    # If no carry out and a borrow occurred, t < m: keep lo.
    keep_lo = jnp.logical_and(br > 0, c == 0)
    out_ref[:] = jnp.where(keep_lo, t_ref[: L, :], out_ref[:])


@jax.jit
def mont_mul_pallas(a, b, m, mprime):
    """Batched Montgomery product via the Pallas kernel.

    a, b: (N, L) canonical uint32 limbs (caller broadcasts).
    m: (L,), mprime: uint32 scalar.  Returns (N, L).
    """
    N, L = a.shape
    at = a.T  # (L, N) limb-major
    bt = b.T
    tn = min(TILE_N, _round_up(N, 128))
    mp2 = jnp.asarray(mprime, jnp.uint32).reshape(1, 1)
    m_col = jnp.broadcast_to(m.reshape(L, 1), (L, tn))
    out_t = pl.pallas_call(
        _mont_mul_kernel,
        grid=(pl.cdiv(N, tn),),
        in_specs=[
            pl.BlockSpec((L, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((L, tn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((L + 1, tn), jnp.uint32),
        ],
    )(at, bt, m_col, mp2)
    return out_t.T


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m
