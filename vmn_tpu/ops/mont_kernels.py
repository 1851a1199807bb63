"""Pallas TPU kernels for batched Montgomery arithmetic.

The single hottest primitive of the whole framework: every group
operation reduces to streams of (N, L)-batched Montgomery products
(reference equivalent: gmpmee's mpz_powm / spowm loops, SURVEY.md §2.3).

Layout inside the kernels is **limb-major**: a tile is a (L, TN) uint32
matrix — limbs on sublanes, batch elements on lanes.  This makes the
CIOS limb recurrence a *sublane* shift (cheap) and keeps every lane
fully independent; the per-iteration dynamic index (current limb of
`a`) is a dynamic sublane slice, which Mosaic supports (dynamic *lane*
slices must be 128-aligned and are not).

Two layers:
  * `mont_mul_pallas` — one batched product (canonical in/out).
  * `mont_exp_pallas` — the entire fixed-window exponentiation fused in
    one kernel: the 16-entry power table, the accumulator and all
    ~5·nbits/4 Montgomery products stay resident in VMEM; nothing
    round-trips through HBM between products.  Digit selection is a
    constant-time masked sum over the table (per-lane gathers are not a
    TPU-friendly primitive; 16 fused multiply-selects are ~1% of the
    product cost).  Carry resolution and the conditional final
    subtraction use log-depth Kogge-Stone generate/propagate scans over
    the sublane (limb) axis instead of a sequential O(L) loop.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vmn_tpu.arith.limbs import LIMB_BITS, LIMB_MASK

TILE_N = 256  # batch lanes per grid step (multiple of 128)
_WINDOW = 4  # fixed window size; 16-entry table

# Run the kernels through the basic Pallas interpreter (plain JAX ops)
# instead of Mosaic.  Used by CPU tests of the SHARDED kernel path:
# unlike `pltpu.force_tpu_interpret_mode()`, the basic interpreter has
# no per-device shared-state callbacks and composes with `shard_map`
# over a multi-device mesh.  Read at TRACE time — set it (env
# VMN_PALLAS_INTERPRET=1 or monkeypatch) before the first kernel call.
INTERPRET = bool(os.environ.get("VMN_PALLAS_INTERPRET", ""))


def _pallas_call(kernel, **kw):
    return pl.pallas_call(kernel, interpret=INTERPRET, **kw)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------- helpers
# All helpers operate on limb-major (R, TN) uint32 values.


def _shift_rows_up(x, d: int):
    """Shift rows toward higher indices by d, zero-fill at the bottom."""
    if d == 0:
        return x
    pad = jnp.zeros((d,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0)


def _ks_carry(s):
    """Binary Kogge-Stone carry propagation over the sublane axis.

    s: (R, TN) uint32 limbs with s < 2^16 + small (carry out of each
    position is 0 or 1).  Returns (R, TN) fully-normalized 16-bit limbs
    of the same value (any carry out of the top row is dropped — the
    caller sizes R so the value fits).
    """
    mask = jnp.uint32(LIMB_MASK)
    g = (s >> LIMB_BITS).astype(jnp.uint32)  # generate: carry out of k
    p = ((s & mask) == mask).astype(jnp.uint32)  # propagate
    R = s.shape[0]
    d = 1
    while d < R:
        gs = _shift_rows_up(g, d)
        ps = _shift_rows_up(p, d)
        g = g | (p & gs)
        p = p & ps
        d *= 2
    cin = _shift_rows_up(g, 1)
    return (s + cin) & mask


def _ks_sub(f, m_ext):
    """f - m if f >= m else f, via Kogge-Stone borrow propagation.

    f: (R, TN) normalized 16-bit limbs, value in [0, 2m).
    m_ext: (R, TN) modulus limbs (zero-extended).
    """
    mask = jnp.uint32(LIMB_MASK)
    R = f.shape[0]
    g = (f < m_ext).astype(jnp.uint32)  # generate a borrow
    p = (f == m_ext).astype(jnp.uint32)  # propagate a borrow
    d = 1
    while d < R:
        gs = _shift_rows_up(g, d)
        ps = _shift_rows_up(p, d)
        g = g | (p & gs)
        p = p & ps
        d *= 2
    bin_ = _shift_rows_up(g, 1)  # borrow into position k
    diff = (f - m_ext - bin_) & mask
    # total borrow out of the top row = f < m (select original then)
    f_lt_m = g[-1:]  # (1, TN)
    return jnp.where(f_lt_m.astype(bool), f, diff)


def _normalize_sub(t, m_ext):
    """Lazy accumulator -> canonical limbs.

    t: (L+1, TN) uint32 lazy limbs (each < 2^26) holding a value in
    [0, 2m).  m_ext: (L+2, TN).  Returns canonical (L+2, TN) (top two
    rows zero).
    """
    mask = jnp.uint32(LIMB_MASK)
    lo = t & mask
    hi = t >> LIMB_BITS  # < 2^10
    zero_row = jnp.zeros((1,) + t.shape[1:], t.dtype)
    s = jnp.concatenate([lo, zero_row], axis=0) + _shift_rows_up(
        jnp.concatenate([hi, zero_row], axis=0), 1
    )  # (L+2, TN), limbs < 2^16 + 2^10
    f = _ks_carry(s)
    return _ks_sub(f, m_ext)


def _mmul_rows(x_ref, x_off, L, y, m, mp, m_ext):
    """Montgomery product: rows [x_off*L, (x_off+1)*L) of x_ref times y.

    y, m: (L, TN) canonical values; m_ext: (L+2, TN).  Returns a
    canonical (L, TN) value.  Reads of x happen one sublane row at a
    time (dynamic slice), so callers may alias the destination with x
    as long as they write only after this returns.

    Lazy-carry CIOS: the accumulator rows stay UNNORMALIZED across the
    whole pass.  Each iteration adds lo=(p1&mask)+(p2&mask) < 2^17 and
    hi=(p1>>16)+(p2>>16) < 2^17 and folds only the row-0 carry, so a
    row accumulates < L*2^18 < 2^25 — far under the uint32 ceiling —
    and one final log-depth normalization replaces per-iteration carry
    splitting (was ~18 tile ops/iteration, now ~12).
    """
    mask = jnp.uint32(LIMB_MASK)
    TN = y.shape[1]
    zero_row = jnp.zeros((1, TN), jnp.uint32)
    zero_rest = jnp.zeros((L, TN), jnp.uint32)

    def body(i, t):
        # t: (L+1, TN), rows < 2^25 (unnormalized)
        xi = x_ref[pl.ds(x_off * L + i, 1), :]  # (1, TN)
        p1 = xi * y
        # q from the exact low 16 bits of t0 + p1_0 (mod-2^32 adds keep
        # low bits exact); then p2 = q*m cancels row 0 mod 2^16.
        q = (((t[:1, :] + p1[:1, :]) & mask) * mp) & mask
        p2 = q * m
        lo = (p1 & mask) + (p2 & mask)
        hi = (p1 >> LIMB_BITS) + (p2 >> LIMB_BITS)
        t = t + jnp.concatenate([lo, zero_row], axis=0)
        carry0 = t[:1, :] >> LIMB_BITS  # < 2^10
        # drop row 0 (low 16 bits are 0), add the hi parts one row up
        t = jnp.concatenate([t[1:, :] + hi, zero_row], axis=0)
        t = t + jnp.concatenate([carry0, zero_rest], axis=0)
        return t

    t = jax.lax.fori_loop(
        0, L, body, jnp.zeros((L + 1, TN), jnp.uint32), unroll=False
    )
    return _normalize_sub(t, m_ext)[:L]


# ------------------------------------------------------------ mul kernel


def _mont_mul_kernel(a_ref, b_ref, m_ref, mp_ref, out_ref):
    L = a_ref.shape[0]
    TN = a_ref.shape[1]
    m = m_ref[:]
    zero2 = jnp.zeros((2, TN), jnp.uint32)
    m_ext = jnp.concatenate([m, zero2], axis=0)
    out_ref[:] = _mmul_rows(a_ref, 0, L, b_ref[:], m, mp_ref[0, 0], m_ext)


@jax.jit
def mont_mul_pallas(a, b, m, mprime):
    """Batched Montgomery product via the Pallas kernel.

    a, b: (N, L) canonical uint32 limbs (caller broadcasts).
    m: (L,), mprime: uint32 scalar.  Returns (N, L).
    """
    N, L = a.shape
    tn = min(TILE_N, _round_up(N, 128))
    mp2 = jnp.asarray(mprime, jnp.uint32).reshape(1, 1)
    m_col = jnp.broadcast_to(m.reshape(L, 1), (L, tn))
    out_t = _pallas_call(
        _mont_mul_kernel,
        grid=(pl.cdiv(N, tn),),
        in_specs=[
            pl.BlockSpec((L, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, tn), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, a.T.shape[1]), jnp.uint32),
    )(a.T, b.T, m_col, mp2)
    return out_t.T


# ------------------------------------------------------------ exp kernel


def _mont_exp_kernel(
    ndig: int,
    a_ref,
    e_ref,
    m_ref,
    one_ref,
    mp_ref,
    out_ref,
    tbl_ref,
    acc_ref,
):
    """Full fixed-window exponentiation for one (L, TN) tile.

    tbl_ref: (16*L, TN) scratch — power table base^d, d in [0, 16).
    acc_ref: (L, TN) scratch — running accumulator.
    """
    L = a_ref.shape[0]
    TN = a_ref.shape[1]
    m = m_ref[:]
    mp = mp_ref[0, 0]
    zero2 = jnp.zeros((2, TN), jnp.uint32)
    m_ext = jnp.concatenate([m, zero2], axis=0)
    base = a_ref[:]

    # Build the power table: tbl[0] = 1 (Montgomery one), tbl[1] = base,
    # tbl[d] = tbl[d-1] * base.  fori_loop (not an unrolled Python loop)
    # keeps the Mosaic MLIR small — compile time matters at L=128.
    tbl_ref[pl.ds(0, L), :] = one_ref[:]
    tbl_ref[pl.ds(L, L), :] = base

    def tbl_body(d, _):
        val = _mmul_rows(tbl_ref, d - 1, L, base, m, mp, m_ext)
        tbl_ref[pl.ds(d * L, L), :] = val
        return 0

    jax.lax.fori_loop(2, 1 << _WINDOW, tbl_body, 0, unroll=False)

    acc_ref[:] = one_ref[:]
    digits_per_limb = LIMB_BITS // _WINDOW
    dig_mask = jnp.uint32((1 << _WINDOW) - 1)

    def digit_body(k, _):
        j = ndig - 1 - k

        # 4 squarings (skipped work for the leading digit is not worth a
        # branch: schedule is identical for every lane / constant-time)
        def sq_body(_i, _c):
            acc_ref[:] = _mmul_rows(acc_ref, 0, L, acc_ref[:], m, mp, m_ext)
            return 0

        jax.lax.fori_loop(0, _WINDOW, sq_body, 0, unroll=False)
        limb = j // digits_per_limb
        shift = (j % digits_per_limb) * _WINDOW
        row = e_ref[pl.ds(limb, 1), :]  # (1, TN)
        dig = (row >> shift.astype(jnp.uint32)) & dig_mask
        # constant-time masked table select
        fac = jnp.zeros((L, TN), jnp.uint32)
        for d in range(1 << _WINDOW):
            sel = (dig == jnp.uint32(d)).astype(jnp.uint32)  # (1, TN)
            fac = fac + sel * tbl_ref[pl.ds(d * L, L), :]
        acc_ref[:] = _mmul_rows(acc_ref, 0, L, fac, m, mp, m_ext)
        return 0

    jax.lax.fori_loop(0, ndig, digit_body, 0, unroll=False)
    out_ref[:] = acc_ref[:]


# ------------------------------------------------------ fixed-base kernel


def _mont_fb_kernel(
    ndig: int,
    tbl_ref,  # (ndig*16, L) uint32 VMEM, Montgomery form
    e_ref,
    m_ref,
    one_ref,
    mp_ref,
    out_ref,
    acc_ref,
):
    """Fixed-base exponentiation: out = prod_j tbl[j][digit_j(e)].

    No squarings — the table absorbs them (gmpmee fixed-base equivalent,
    SURVEY.md §2.3).  The whole table stays VMEM-resident (4 MB at 2048
    bits); each digit's 16 entries are fetched as 16 *single-row*
    dynamic slices (multi-row dynamic sublane slices measured ~20x
    slower in Mosaic).  The per-lane digit gather is an exact one-hot
    f32 matmul on the MXU: entries are 16-bit limbs (< 2^24, exact in
    f32) and each output column sums exactly one nonzero term.
    """
    L = m_ref.shape[0]
    TN = e_ref.shape[1]
    m = m_ref[:]
    mp = mp_ref[0, 0]
    zero2 = jnp.zeros((2, TN), jnp.uint32)
    m_ext = jnp.concatenate([m, zero2], axis=0)

    digits_per_limb = LIMB_BITS // _WINDOW
    dig_mask = jnp.uint32((1 << _WINDOW) - 1)
    W = 1 << _WINDOW
    acc_ref[:] = one_ref[:]

    def digit_body(j, _):
        limb = j // digits_per_limb
        shift = (j % digits_per_limb) * _WINDOW
        row = e_ref[pl.ds(limb, 1), :]  # (1, TN)
        dig = ((row >> shift.astype(jnp.uint32)) & dig_mask).astype(jnp.int32)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (W, TN), 0) == dig
        ).astype(jnp.float32)
        rows = [tbl_ref[pl.ds(j * W + d, 1), :] for d in range(W)]
        # Mosaic has no uint32<->f32 casts; limbs are < 2^16 so a detour
        # through int32 is exact.
        trow = (
            jnp.concatenate(rows, axis=0).astype(jnp.int32).astype(jnp.float32)
        )  # (16, L)
        fac = (
            jax.lax.dot_general(
                trow,
                onehot,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            .astype(jnp.int32)
            .astype(jnp.uint32)
        )  # (L, TN)
        acc_ref[:] = _mmul_rows(acc_ref, 0, L, fac, m, mp, m_ext)
        return 0

    jax.lax.fori_loop(0, ndig, digit_body, 0, unroll=False)
    out_ref[:] = acc_ref[:]


# ------------------------------------------------ window-8 fixed base

_FB8_W = 8


def _mont_fb8_kernel(
    ndig: int,
    tbl_ref,  # (ndig*256, L) uint32 HBM, Montgomery form
    e_ref,  # (Le, TN) VMEM
    m_ref,
    one_ref,
    mp_ref,
    out_ref,
    acc_ref,  # (L, TN) VMEM scratch
    buf_ref,  # (2*256, L) VMEM scratch: double-buffered digit rows
    sem,  # (2,) DMA semaphores
):
    """Window-8 fixed-base exponentiation: half the Montgomery products
    of the window-4 kernel (256 vs 512 for 2048-bit exponents).

    The 33 MB radix-256 table lives in HBM; each digit's 256-row block
    is DMA'd into one of two VMEM buffers, double-buffered so the copy
    of digit j+1 overlaps the product of digit j.  The per-lane digit
    gather stays an exact one-hot f32 matmul on the MXU (256x L x TN).
    """
    L = m_ref.shape[0]
    TN = e_ref.shape[1]
    m = m_ref[:]
    mp = mp_ref[0, 0]
    zero2 = jnp.zeros((2, TN), jnp.uint32)
    m_ext = jnp.concatenate([m, zero2], axis=0)
    W = 1 << _FB8_W
    digits_per_limb = LIMB_BITS // _FB8_W  # = 2
    dig_mask = jnp.uint32(W - 1)

    def start_dma(slot, j):
        return pltpu.make_async_copy(
            tbl_ref.at[pl.ds(j * W, W), :],
            buf_ref.at[pl.ds(slot * W, W), :],
            sem.at[slot],
        )

    start_dma(0, 0).start()
    acc_ref[:] = one_ref[:]

    def digit_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < ndig)
        def _():
            start_dma(jax.lax.rem(j + 1, 2), j + 1).start()

        start_dma(slot, j).wait()

        limb = j // digits_per_limb
        shift = (j % digits_per_limb) * _FB8_W
        row = e_ref[pl.ds(limb, 1), :]  # (1, TN)
        dig = ((row >> shift.astype(jnp.uint32)) & dig_mask).astype(
            jnp.int32
        )
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (W, TN), 0) == dig
        ).astype(jnp.float32)
        trow = (
            buf_ref[pl.ds(slot * W, W), :]
            .astype(jnp.int32)
            .astype(jnp.float32)
        )  # (256, L)
        fac = (
            jax.lax.dot_general(
                trow,
                onehot,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            .astype(jnp.int32)
            .astype(jnp.uint32)
        )  # (L, TN)
        acc_ref[:] = _mmul_rows(acc_ref, 0, L, fac, m, mp, m_ext)
        return 0

    jax.lax.fori_loop(0, ndig, digit_body, 0, unroll=False)
    out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_n",))
def mont_fb8_exp_pallas(table, e, m, mprime, one_mont, tile_n=None):
    """prod_j table[j][digit8_j(e)] via the window-8 fixed-base kernel.

    table: (ndig, 256, L) Montgomery-form uint32 (HBM-resident).
    e: (N, Le) standard limbs.  Returns (N, L).
    """
    ndig, W, L = table.shape
    assert W == 1 << _FB8_W
    N, Le = e.shape
    need_limbs = (ndig * _FB8_W + LIMB_BITS - 1) // LIMB_BITS
    if Le < need_limbs:
        e = jnp.concatenate(
            [e, jnp.zeros((N, need_limbs - Le), jnp.uint32)], axis=1
        )
        Le = need_limbs
    tn = tile_n or min(TILE_N, _round_up(N, 128))
    mp2 = jnp.asarray(mprime, jnp.uint32).reshape(1, 1)
    m_col = jnp.broadcast_to(m.reshape(L, 1), (L, tn))
    one_col = jnp.broadcast_to(one_mont.reshape(L, 1), (L, tn))
    kernel = functools.partial(_mont_fb8_kernel, ndig)
    out_t = _pallas_call(
        kernel,
        grid=(pl.cdiv(N, tn),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((Le, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, tn), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, e.T.shape[1]), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((L, tn), jnp.uint32),
            pltpu.VMEM((2 * (1 << _FB8_W), L), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(table.reshape(ndig * (1 << _FB8_W), L), e.T, m_col, one_col, mp2)
    return out_t.T


@functools.partial(jax.jit, static_argnames=("tile_n",))
def mont_fb_exp_pallas(table, e, m, mprime, one_mont, tile_n=None):
    """prod_j table[j][digit_j(e)] via the fixed-base Pallas kernel.

    table: (ndig, 16, L) Montgomery-form uint32 (VMEM-resident).
    e: (N, Le) standard limbs covering at least ndig 4-bit digits.
    Returns (N, L).
    """
    ndig, _, L = table.shape
    N, Le = e.shape
    need_limbs = (ndig * _WINDOW + LIMB_BITS - 1) // LIMB_BITS
    if Le < need_limbs:
        e = jnp.concatenate(
            [e, jnp.zeros((N, need_limbs - Le), jnp.uint32)], axis=1
        )
        Le = need_limbs
    tn = tile_n or min(TILE_N, _round_up(N, 128))
    mp2 = jnp.asarray(mprime, jnp.uint32).reshape(1, 1)
    m_col = jnp.broadcast_to(m.reshape(L, 1), (L, tn))
    one_col = jnp.broadcast_to(one_mont.reshape(L, 1), (L, tn))
    kernel = functools.partial(_mont_fb_kernel, ndig)
    W = 1 << _WINDOW
    R = ndig * W
    out_t = _pallas_call(
        kernel,
        grid=(pl.cdiv(N, tn),),
        in_specs=[
            pl.BlockSpec((R, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Le, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, tn), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, e.T.shape[1]), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((L, tn), jnp.uint32),
        ],
    )(table.reshape(R, L), e.T, m_col, one_col, mp2)
    return out_t.T


# ------------------------------------------- fused multi-exponentiation
#
# prod_i bases_i^{e_i} restructured for the VPU (the gmpmee `spowm`
# replacement at full lane utilization).  Write e_i = sum_j 2^{W j} d_ij;
# then  prod_i b_i^{e_i} = prod_j P_j^{2^{W j}}  with  P_j = prod_i
# T_i[d_ij]  (Yao's algorithm).  The inner products P_j vectorize
# perfectly: per digit position j, ONE (L, TN)-batched Montgomery
# product folds a whole 256-lane chunk into per-lane running partials —
# no per-element squarings (the naive exp kernel spends 80% of its
# products on them) and no lane-wasting reductions in the hot loop.
# Squarings survive only in the final combine over ndig positions —
# O(nbits) scalar-width products, amortized over the entire batch.
#
# Cost per element at 2048 bits: 14 (table) + 512 (digit folds) = 526
# lane-products, vs 2574 for the fused per-element exp kernel and the
# same 526 for the old host-tree Straus — but every product now runs
# inside one kernel at VMEM residency instead of round-tripping HBM.

_EP_JB = 16  # digit positions folded per accumulate-kernel grid block
_EP_SUPER = 256  # chunks per super-chunk: caps the HBM table at 512 MB


def _expprod_tbl_kernel(a_ref, m_ref, one_ref, mp_ref, out_ref):
    """Power table for one (L, TN) tile: out[d*L:(d+1)*L] = a^d."""
    L = a_ref.shape[0]
    TN = a_ref.shape[1]
    m = m_ref[:]
    mp = mp_ref[0, 0]
    zero2 = jnp.zeros((2, TN), jnp.uint32)
    m_ext = jnp.concatenate([m, zero2], axis=0)
    base = a_ref[:]
    out_ref[pl.ds(0, L), :] = one_ref[:]
    out_ref[pl.ds(L, L), :] = base

    def body(d, _):
        out_ref[pl.ds(d * L, L), :] = _mmul_rows(
            out_ref, d - 1, L, base, m, mp, m_ext
        )
        return 0

    jax.lax.fori_loop(2, 1 << _WINDOW, body, 0, unroll=False)


def _expprod_acc_kernel(tbl_ref, e_ref, m_ref, one_ref, mp_ref, out_ref):
    """Fold one chunk's table entries into per-position lane partials.

    Grid (n_pos_blocks, n_chunks), chunks fastest: the output block for
    pos-block pb stays VMEM-resident while every chunk streams through
    (the standard consecutive-revisit reduction pattern).  Row block jj
    of out accumulates, per lane t, prod_over_chunks tbl_t[d_{t,j}] for
    digit position j = pb*_EP_JB + jj.
    """
    L = m_ref.shape[0]
    TN = e_ref.shape[1]
    pb = pl.program_id(0)
    c = pl.program_id(1)
    m = m_ref[:]
    mp = mp_ref[0, 0]
    zero2 = jnp.zeros((2, TN), jnp.uint32)
    m_ext = jnp.concatenate([m, zero2], axis=0)
    digits_per_limb = LIMB_BITS // _WINDOW
    dig_mask = jnp.uint32((1 << _WINDOW) - 1)

    @pl.when(c == 0)
    def _():
        for jj in range(_EP_JB):
            out_ref[pl.ds(jj * L, L), :] = one_ref[:]

    for jj in range(_EP_JB):
        j = pb * _EP_JB + jj
        limb = j // digits_per_limb
        shift = ((j % digits_per_limb) * _WINDOW).astype(jnp.uint32)
        row = e_ref[pl.ds(limb, 1), :]  # (1, TN)
        dig = (row >> shift) & dig_mask
        # constant-time masked table select (per-lane tables rule out
        # the one-hot-matmul gather of the fixed-base kernels)
        fac = jnp.zeros((L, TN), jnp.uint32)
        for d in range(1 << _WINDOW):
            sel = (dig == jnp.uint32(d)).astype(jnp.uint32)
            fac = fac + sel * tbl_ref[pl.ds(d * L, L), :]
        out_ref[pl.ds(jj * L, L), :] = _mmul_rows(
            out_ref, jj, L, fac, m, mp, m_ext
        )


@functools.partial(jax.jit, static_argnames=("nbits",))
def mont_expprod_positions(bases, e, m, mprime, one_mont, nbits: int):
    """Per-digit-position products P_j = prod_i bases_i^{d_ij} where
    e_i = sum_j 2^{W j} d_ij.  Returns (ndig_pad, L) Montgomery form
    (padded positions hold the identity).

    Besides powering `mont_expprod_pallas`, the positions are directly
    a batched quadratic-residuosity test: with uniform digits, each
    P_j's Legendre symbol is an independent coin that lands -1 with
    probability 1/2 when ANY base is a non-residue.
    """
    from vmn_tpu.arith import mont as _mont

    N, L = bases.shape
    ndig = max(1, (nbits + _WINDOW - 1) // _WINDOW)
    n_pb = -(-ndig // _EP_JB)
    ndig_pad = n_pb * _EP_JB
    need_limbs = (ndig_pad * _WINDOW + LIMB_BITS - 1) // LIMB_BITS
    if e.shape[1] < need_limbs:
        e = jnp.concatenate(
            [e, jnp.zeros((N, need_limbs - e.shape[1]), jnp.uint32)], axis=1
        )
    Le = e.shape[1]
    tn = TILE_N
    Npad = _round_up(N, tn)
    if Npad != N:
        bases = jnp.concatenate(
            [bases, jnp.broadcast_to(one_mont, (Npad - N, L))], axis=0
        )
        e = jnp.concatenate(
            [e, jnp.zeros((Npad - N, Le), jnp.uint32)], axis=0
        )
    n_chunks = Npad // tn
    W = 1 << _WINDOW
    mp2 = jnp.asarray(mprime, jnp.uint32).reshape(1, 1)
    m_col = jnp.broadcast_to(m.reshape(L, 1), (L, tn))
    one_col = jnp.broadcast_to(one_mont.reshape(L, 1), (L, tn))
    bT = bases.T  # (L, Npad) limb-major
    eT = e.T  # (Le, Npad)

    partials = []
    for s0 in range(0, n_chunks, _EP_SUPER):
        sc = min(_EP_SUPER, n_chunks - s0)
        bs = jax.lax.slice_in_dim(bT, s0 * tn, (s0 + sc) * tn, axis=1)
        es = jax.lax.slice_in_dim(eT, s0 * tn, (s0 + sc) * tn, axis=1)
        tbl = _pallas_call(
            _expprod_tbl_kernel,
            grid=(sc,),
            in_specs=[
                pl.BlockSpec(
                    (L, tn), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (L, tn), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (L, tn), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (W * L, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((W * L, sc * tn), jnp.uint32),
        )(bs, m_col, one_col, mp2)
        part = _pallas_call(
            _expprod_acc_kernel,
            grid=(n_pb, sc),
            in_specs=[
                pl.BlockSpec(
                    (W * L, tn), lambda pb, c: (0, c),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (Le, tn), lambda pb, c: (0, c), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (L, tn), lambda pb, c: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (L, tn), lambda pb, c: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1), lambda pb, c: (0, 0), memory_space=pltpu.SMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (_EP_JB * L, tn), lambda pb, c: (pb, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((n_pb * _EP_JB * L, tn),
                                           jnp.uint32),
        )(tbl, es, m_col, one_col, mp2)
        partials.append(part)

    allp = (
        jnp.concatenate(partials, axis=1) if len(partials) > 1
        else partials[0]
    )
    lanes = allp.shape[1]
    # (ndig_pad*L, lanes) limb-major -> (ndig_pad, lanes, L) element-major
    P = jnp.transpose(allp.reshape(ndig_pad, L, lanes), (0, 2, 1))
    # cross-lane product tree (a few wide XLA Montgomery products)
    while P.shape[1] > 1:
        h = P.shape[1] // 2
        lo = _mont._mont_mul(P[:, :h], P[:, h : 2 * h], m, mprime)
        P = (
            jnp.concatenate([lo, P[:, 2 * h :]], axis=1)
            if P.shape[1] % 2 else lo
        )
    return P[:, 0]  # (ndig_pad, L)


@functools.partial(jax.jit, static_argnames=("nbits",))
def mont_expprod_pallas(bases, e, m, mprime, one_mont, nbits: int):
    """prod_i bases_i^{e_i} via the digit-position-parallel kernels.

    bases: (N, L) canonical Montgomery form; e: (N, Le) standard limbs
    with values < 2^nbits.  Returns (L,) Montgomery form.
    """
    from vmn_tpu.arith import mont as _mont

    P = mont_expprod_positions(bases, e, m, mprime, one_mont, nbits)
    ndig_pad = P.shape[0]

    # final combine: prod_j P_j^{2^{W j}} — the only sequential tail
    def body(k, acc):
        j = ndig_pad - 1 - k
        for _ in range(_WINDOW):
            acc = _mont._mont_mul(acc, acc, m, mprime)
        pj = jax.lax.dynamic_index_in_dim(P, j, axis=0, keepdims=False)
        return _mont._mont_mul(acc, pj, m, mprime)

    return jax.lax.fori_loop(0, ndig_pad, body, one_mont)


@functools.partial(jax.jit, static_argnames=("nbits", "tile_n"))
def mont_exp_pallas(base, e, m, mprime, one_mont, nbits: int, tile_n=None):
    """base^e via the fused Pallas kernel.

    base: (N, L) canonical Montgomery form; e: (N, Le) standard limbs;
    nbits: static exponent bit bound.  Returns (N, L).
    """
    N, L = base.shape
    Le = e.shape[1]
    ndig = max(1, (nbits + _WINDOW - 1) // _WINDOW)
    # digits are read from whole limbs: make sure the limb index in the
    # kernel stays in range
    need_limbs = (ndig * _WINDOW + LIMB_BITS - 1) // LIMB_BITS
    if Le < need_limbs:
        e = jnp.concatenate(
            [e, jnp.zeros((N, need_limbs - Le), jnp.uint32)], axis=1
        )
        Le = need_limbs
    tn = tile_n or min(TILE_N, _round_up(N, 128))
    mp2 = jnp.asarray(mprime, jnp.uint32).reshape(1, 1)
    m_col = jnp.broadcast_to(m.reshape(L, 1), (L, tn))
    one_col = jnp.broadcast_to(one_mont.reshape(L, 1), (L, tn))
    kernel = functools.partial(_mont_exp_kernel, ndig)
    out_t = _pallas_call(
        kernel,
        grid=(pl.cdiv(N, tn),),
        in_specs=[
            pl.BlockSpec((L, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Le, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, tn), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, base.T.shape[1]), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM(((1 << _WINDOW) * L, tn), jnp.uint32),
            pltpu.VMEM((L, tn), jnp.uint32),
        ],
    )(base.T, e.T, m_col, one_col, mp2)
    return out_t.T
