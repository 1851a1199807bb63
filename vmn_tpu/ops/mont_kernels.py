"""Pallas TPU kernel for batched Montgomery multiplication.

The single hottest primitive of the whole framework: every group
operation reduces to streams of (N, L)-batched Montgomery products
(reference equivalent: gmpmee's mpz_powm loops, SURVEY.md §2.3).

Layout: a batch tile of TN ciphertext rows lives in VMEM as a
(TN, L) uint32 matrix of 16-bit limbs — for 2048-bit moduli L = 128,
exactly one VPU lane row per element.  The CIOS loop runs over limbs
with the accumulator held in VMEM scratch; each iteration is two
(TN, L) 32-bit multiply-accumulates on the VPU plus a lane roll.

The final carry-resolution + conditional subtraction is a sequential
scan across limbs; it is O(L) per tile (not O(L^2)) and stays in the
kernel to avoid a second pass over HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vmn_tpu.arith.limbs import LIMB_BITS, LIMB_MASK

TILE_N = 256  # batch rows per grid step


def _mont_mul_kernel(a_ref, b_ref, m_ref, mp_ref, out_ref):
    """One batch tile: out = a*b*R^{-1} mod m (canonical in/out).

    The accumulator t is (TN, L) lazy limbs (< 2^26); the (L+1)'th
    column is carried separately in `hi` and folded in by the
    per-iteration right-shift.
    """
    L = a_ref.shape[1]
    a = a_ref[:]
    b = b_ref[:]
    m = m_ref[0, :]  # (L,)
    mp = mp_ref[0, 0]

    mask = jnp.uint32(LIMB_MASK)

    def body(i, carry):
        t, hi = carry  # t: (TN, L) lazy limbs; hi: (TN, 1) overflow column
        ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=1)  # (TN, 1)
        p = ai * b
        t = t + (p & mask)
        hi_new = hi + (p[:, L - 1 :] >> LIMB_BITS)
        t = t.at[:, 1:].add(p[:, : L - 1] >> LIMB_BITS)

        q = (t[:, :1] * mp) & mask
        p2 = q * m[None, :]
        t = t + (p2 & mask)
        hi_new = hi_new + (p2[:, L - 1 :] >> LIMB_BITS)
        t = t.at[:, 1:].add(p2[:, : L - 1] >> LIMB_BITS)

        # shift right one limb: t[:,0] folds its carry into t[:,1]
        carry0 = t[:, :1] >> LIMB_BITS
        t = jnp.concatenate([t[:, 1:], hi_new], axis=1)
        t = t.at[:, :1].add(carry0)
        return t, jnp.zeros_like(hi_new)

    t0 = jnp.zeros(a.shape, jnp.uint32)
    hi0 = jnp.zeros((a.shape[0], 1), jnp.uint32)
    t, _ = jax.lax.fori_loop(0, L, body, (t0, hi0))

    # Carry resolution + conditional subtract (value in [0, 2m)).
    def fixup(i, carry):
        c, br, lo_acc, d_acc = carry
        tk = jax.lax.dynamic_slice_in_dim(t, i, 1, axis=1).astype(jnp.int32)
        mk = jax.lax.dynamic_slice_in_dim(m, i, 1).astype(jnp.int32)
        s = tk + c
        lo = s & LIMB_MASK
        c = s >> LIMB_BITS
        d = lo - mk - br
        dlo = d & LIMB_MASK
        br = (d >> 31) & 1
        lo_acc = jax.lax.dynamic_update_slice_in_dim(lo_acc, lo, i, axis=1)
        d_acc = jax.lax.dynamic_update_slice_in_dim(d_acc, dlo, i, axis=1)
        return c, br, lo_acc, d_acc

    TN = a.shape[0]
    zc = jnp.zeros((TN, 1), jnp.int32)
    lo_acc = jnp.zeros((TN, L), jnp.int32)
    d_acc = jnp.zeros((TN, L), jnp.int32)
    c, br, lo_acc, d_acc = jax.lax.fori_loop(
        0, L, fixup, (zc, zc, lo_acc, d_acc)
    )
    # If the final borrow is set (and no carry out), t < m: keep lo.
    keep_lo = jnp.logical_and(br > 0, c == 0)
    out_ref[:] = jnp.where(keep_lo, lo_acc, d_acc).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=())
def mont_mul_pallas(a, b, m, mprime):
    """Batched Montgomery product via the Pallas kernel.

    a, b: (N, L) canonical uint32 limbs (broadcast NOT supported here —
    caller broadcasts).  m: (L,), mprime: scalar.
    """
    N, L = a.shape
    grid = (pl.cdiv(N, TILE_N),)
    m2 = m.reshape(1, L)
    mp2 = jnp.asarray(mprime, jnp.uint32).reshape(1, 1)
    return pl.pallas_call(
        _mont_mul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L), jnp.uint32),
        scratch_shapes=[],
    )(a, b, m2, mp2)
