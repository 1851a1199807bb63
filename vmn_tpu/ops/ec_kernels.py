"""Pallas TPU kernels for batched elliptic-curve point arithmetic.

The reference's EC speed comes from the native `vec` C library under
VCR's ECqPGroup (reference: SURVEY.md §2.3; the default benchmark group
is P-256, demo/mixnet/benchmarks/bench_config:33-45).  Here the whole
fixed-window Jacobian scalar multiplication is ONE fused kernel: the
16-entry multiples table, the accumulator and every field product stay
resident in VMEM — nothing round-trips through HBM between the ~3000
field operations of a 256-bit scalar mul.

Layout matches ops/mont_kernels.py: limb-major (L, TN) uint32 tiles —
limbs on sublanes, batch points on lanes; every lane is an independent
point.  Field ops reuse the Kogge-Stone carry/borrow machinery of the
Montgomery kernels; curve formulas are the same branchless a = -3
Jacobian add/double as arith/ec.py (`_Curve.point_add/point_double`),
with the exceptional cases (infinity, P == Q, P == -Q) resolved by
per-lane masks.

Digit selection is the constant-time masked sum over the table used by
`_mont_exp_kernel` — identical schedule for every lane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vmn_tpu.arith.limbs import LIMB_BITS, LIMB_MASK
from vmn_tpu.ops.mont_kernels import (
    TILE_N,
    _ks_carry,
    _ks_sub,
    _mmul_rows,
    _pallas_call,
    _round_up,
)

_WINDOW = 4


# ------------------------------------------------------------- field ops
# All values are (L, TN) canonical Montgomery-form limbs; m_ext is the
# (L+2, TN) zero-extended modulus used by the Kogge-Stone helpers.


def _ext(v, rows: int):
    pad = jnp.zeros((rows - v.shape[0],) + v.shape[1:], v.dtype)
    return jnp.concatenate([v, pad], axis=0)


def _fadd(a, b, m_ext):
    """(a + b) mod m for canonical a, b < m."""
    L = a.shape[0]
    R = m_ext.shape[0]
    s = _ext(a, R) + _ext(b, R)  # limbs < 2^17
    mask = jnp.uint32(LIMB_MASK)
    lo = s & mask
    hi = s >> LIMB_BITS
    pad = jnp.zeros((1,) + hi.shape[1:], hi.dtype)
    s2 = lo + jnp.concatenate([pad, hi[:-1]], axis=0)
    f = _ks_carry(s2)
    return _ks_sub(f, m_ext)[:L]


def _fsub(a, b, m_ext):
    """(a - b) mod m for canonical a, b < m, via a + m + ~b + 1."""
    L = a.shape[0]
    R = m_ext.shape[0]
    mask = jnp.uint32(LIMB_MASK)
    not_b = mask - _ext(b, R)  # full-width complement
    plus1 = jnp.zeros((R,) + a.shape[1:], jnp.uint32)
    plus1 = jnp.concatenate(
        [jnp.ones((1,) + a.shape[1:], jnp.uint32), plus1[1:]], axis=0
    )
    s = _ext(a, R) + m_ext + not_b + plus1  # = a + m - b + 2^(16R)
    lo = s & mask
    hi = s >> LIMB_BITS
    pad = jnp.zeros((1,) + hi.shape[1:], hi.dtype)
    s2 = lo + jnp.concatenate([pad, hi[:-1]], axis=0)
    # one more fold: limbs of s can reach 3*(2^16-1)+1 -> hi <= 2
    lo2 = s2 & mask
    hi2 = s2 >> LIMB_BITS
    s3 = lo2 + jnp.concatenate([pad, hi2[:-1]], axis=0)
    f = _ks_carry(s3)
    return _ks_sub(f, m_ext)[:L]


def _is_zero(v):
    """(L, TN) -> (1, TN) uint32 mask: 1 where the value is 0.

    Mosaic has no unsigned reductions; limbs are < 2^16, so an int32
    max is exact."""
    nz = jnp.max(v.astype(jnp.int32), axis=0, keepdims=True)
    return (nz == 0).astype(jnp.uint32)


def _msel(mask1, a, b):
    """mask1: (1, TN) uint32 in {0,1} -> per-lane select a else b."""
    return jnp.where(mask1.astype(bool), a, b)


class _F:
    """Field helper bound to (m, mp, m_ext) tiles.

    Products go through the ref-based lazy-carry CIOS `_mmul_rows`
    (Mosaic supports dynamic sublane slices only on refs, not values):
    the left operand is staged into a shared VMEM scratch buffer.
    """

    def __init__(self, m, mp, m_ext, buf_ref):
        self.m = m
        self.mp = mp
        self.m_ext = m_ext
        self.buf = buf_ref

    def mul(self, x, y):
        L = self.m.shape[0]
        self.buf[:] = x
        return _mmul_rows(self.buf, 0, L, y, self.m, self.mp, self.m_ext)

    def sq(self, x):
        return self.mul(x, x)

    def add(self, x, y):
        return _fadd(x, y, self.m_ext)

    def sub(self, x, y):
        return _fsub(x, y, self.m_ext)

    def dbl(self, x):
        return self.add(x, x)


def _point_double(F, X, Y, Z):
    """a = -3 Jacobian doubling (same formulas as ec.py:_Curve)."""
    delta = F.sq(Z)
    gamma = F.sq(Y)
    beta = F.mul(X, gamma)
    xmd = F.sub(X, delta)
    alpha = F.mul(F.add(F.dbl(xmd), xmd), F.add(X, delta))
    beta4 = F.dbl(F.dbl(beta))
    beta8 = F.dbl(beta4)
    X3 = F.sub(F.sq(alpha), beta8)
    Z3 = F.sub(F.sub(F.sq(F.add(Y, Z)), gamma), delta)
    g2 = F.sq(gamma)
    g8 = F.dbl(F.dbl(F.dbl(g2)))
    Y3 = F.sub(F.mul(alpha, F.sub(beta4, X3)), g8)
    return X3, Y3, Z3


def _point_add(F, X1, Y1, Z1, X2, Y2, Z2):
    """Branchless general Jacobian addition (cf. ec.py point_add)."""
    Z1Z1 = F.sq(Z1)
    Z2Z2 = F.sq(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(F.mul(Y1, Z2), Z2Z2)
    S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
    H = F.sub(U2, U1)
    R = F.sub(S2, S1)

    HH = F.sq(H)
    HHH = F.mul(H, HH)
    V = F.mul(U1, HH)
    X3 = F.sub(F.sub(F.sq(R), HHH), F.dbl(V))
    Y3 = F.sub(F.mul(R, F.sub(V, X3)), F.mul(S1, HHH))
    Z3 = F.mul(F.mul(Z1, Z2), H)

    p1_inf = _is_zero(Z1)
    p2_inf = _is_zero(Z2)
    h_zero = _is_zero(H)
    r_zero = _is_zero(R)
    same = h_zero * r_zero
    opp = h_zero * (1 - r_zero)

    dX, dY, dZ = _point_double(F, X1, Y1, Z1)
    X3 = _msel(same, dX, X3)
    Y3 = _msel(same, dY, Y3)
    Z3 = _msel(same, dZ, Z3)
    either_inf = 1 - (1 - p1_inf) * (1 - p2_inf)
    Z3 = _msel(opp * (1 - either_inf), jnp.zeros_like(Z3), Z3)
    X3 = _msel(p1_inf, X2, X3)
    Y3 = _msel(p1_inf, Y2, Y3)
    Z3 = _msel(p1_inf, Z2, Z3)
    X3 = _msel(p2_inf, X1, X3)
    Y3 = _msel(p2_inf, Y1, Y3)
    Z3 = _msel(p2_inf, Z1, Z3)
    return X3, Y3, Z3


# ------------------------------------------------------ scalar-mul kernel


def _ec_smul_kernel(
    ndig: int,
    x_ref, y_ref, inf_ref, e_ref, m_ref, one_ref, mp_ref,
    ox_ref, oy_ref, oz_ref,
    tx_ref, ty_ref, tz_ref, mb_ref,
):
    """Fused fixed-window scalar multiplication for one (L, TN) tile.

    tx/ty/tz_ref: (16*L, TN) scratch — Jacobian multiples d*P.
    Outputs are Jacobian (X, Y, Z); the caller batch-normalizes.
    """
    L = x_ref.shape[0]
    TN = x_ref.shape[1]
    m = m_ref[:]
    mp = mp_ref[0, 0]
    one = one_ref[:]
    zero2 = jnp.zeros((2, TN), jnp.uint32)
    m_ext = jnp.concatenate([m, zero2], axis=0)
    F = _F(m, mp, m_ext, mb_ref)

    X1 = x_ref[:]
    Y1 = y_ref[:]
    inf = inf_ref[:1, :]  # (1, TN) 1 = infinity
    Z1 = _msel(inf, jnp.zeros((L, TN), jnp.uint32), one)

    zeros = jnp.zeros((L, TN), jnp.uint32)
    # table entry 0: infinity (X=0, Y=one, Z=0)
    tx_ref[pl.ds(0, L), :] = zeros
    ty_ref[pl.ds(0, L), :] = one
    tz_ref[pl.ds(0, L), :] = zeros
    tx_ref[pl.ds(L, L), :] = X1
    ty_ref[pl.ds(L, L), :] = Y1
    tz_ref[pl.ds(L, L), :] = Z1

    def tbl_body(d, _):
        pX = tx_ref[pl.ds((d - 1) * L, L), :]
        pY = ty_ref[pl.ds((d - 1) * L, L), :]
        pZ = tz_ref[pl.ds((d - 1) * L, L), :]
        nX, nY, nZ = _point_add(F, pX, pY, pZ, X1, Y1, Z1)
        tx_ref[pl.ds(d * L, L), :] = nX
        ty_ref[pl.ds(d * L, L), :] = nY
        tz_ref[pl.ds(d * L, L), :] = nZ
        return 0

    jax.lax.fori_loop(2, 1 << _WINDOW, tbl_body, 0, unroll=False)

    ox_ref[:] = zeros
    oy_ref[:] = one
    oz_ref[:] = zeros

    digits_per_limb = LIMB_BITS // _WINDOW
    dig_mask = jnp.uint32((1 << _WINDOW) - 1)

    def digit_body(k, _):
        j = ndig - 1 - k
        aX, aY, aZ = ox_ref[:], oy_ref[:], oz_ref[:]
        for _i in range(_WINDOW):
            aX, aY, aZ = _point_double(F, aX, aY, aZ)
        limb = j // digits_per_limb
        shift = (j % digits_per_limb) * _WINDOW
        row = e_ref[pl.ds(limb, 1), :]  # (1, TN)
        dig = (row >> shift.astype(jnp.uint32)) & dig_mask
        fX = jnp.zeros((L, TN), jnp.uint32)
        fY = jnp.zeros((L, TN), jnp.uint32)
        fZ = jnp.zeros((L, TN), jnp.uint32)
        for d in range(1 << _WINDOW):
            sel = (dig == jnp.uint32(d)).astype(jnp.uint32)  # (1, TN)
            fX = fX + sel * tx_ref[pl.ds(d * L, L), :]
            fY = fY + sel * ty_ref[pl.ds(d * L, L), :]
            fZ = fZ + sel * tz_ref[pl.ds(d * L, L), :]
        rX, rY, rZ = _point_add(F, aX, aY, aZ, fX, fY, fZ)
        ox_ref[:] = rX
        oy_ref[:] = rY
        oz_ref[:] = rZ
        return 0

    jax.lax.fori_loop(0, ndig, digit_body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("nbits", "tile_n"))
def ec_scalar_mul_pallas(x, y, inf, e, m, mprime, one_mont,
                         nbits: int, tile_n=None):
    """Batched e*P via the fused Jacobian kernel.

    x, y: (N, L) affine Montgomery coords; inf: (N,) bool; e: (N, Le)
    standard limbs.  Returns Jacobian (X, Y, Z) each (N, L) — the
    caller normalizes with the batched Montgomery-trick inversion.
    """
    N, L = x.shape
    ndig = max(1, (nbits + _WINDOW - 1) // _WINDOW)
    need_limbs = (ndig * _WINDOW + LIMB_BITS - 1) // LIMB_BITS
    Le = e.shape[1]
    if Le < need_limbs:
        e = jnp.concatenate(
            [e, jnp.zeros((N, need_limbs - Le), jnp.uint32)], axis=1
        )
        Le = need_limbs
    tn = tile_n or min(TILE_N, _round_up(N, 128))
    mp2 = jnp.asarray(mprime, jnp.uint32).reshape(1, 1)
    m_col = jnp.broadcast_to(m.reshape(L, 1), (L, tn))
    one_col = jnp.broadcast_to(one_mont.reshape(L, 1), (L, tn))
    inf_row = inf.astype(jnp.uint32).reshape(1, N)
    kernel = functools.partial(_ec_smul_kernel, ndig)
    outs = _pallas_call(
        kernel,
        grid=(pl.cdiv(N, tn),),
        in_specs=[
            pl.BlockSpec((L, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Le, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, N), jnp.uint32),
            jax.ShapeDtypeStruct((L, N), jnp.uint32),
            jax.ShapeDtypeStruct((L, N), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM(((1 << _WINDOW) * L, tn), jnp.uint32),
            pltpu.VMEM(((1 << _WINDOW) * L, tn), jnp.uint32),
            pltpu.VMEM(((1 << _WINDOW) * L, tn), jnp.uint32),
            pltpu.VMEM((L, tn), jnp.uint32),
        ],
    )(x.T, y.T, inf_row, e.T, m_col, one_col, mp2)
    X, Y, Z = outs
    return X.T, Y.T, Z.T


# -------------------------------------------- fused multi-exponentiation
#
# sum_i e_i * P_i (written multiplicatively: prod P_i^{e_i}) with the
# same digit-position-parallel structure as mont_expprod_pallas: write
# e_i = sum_j 2^{W j} d_ij, accumulate per-position partial sums
# S_j = sum_i d_ij * P_i at full lane width (ONE batched Jacobian add
# per chunk per position — no per-element doublings), then combine
# sum_j 2^{W j} S_j with W doublings per position.  Replaces the naive
# ECArray.exp_prod (full scalar-mul per element + add tree): ~2x fewer
# field products and every product VMEM-resident.

_EP_JB = 16  # digit positions per accumulate-kernel grid block
_EP_SUPER = 1024  # chunks per super-chunk (table HBM cap)


def _ec_mexp_tbl_kernel(
    x_ref, y_ref, inf_ref, m_ref, one_ref, mp_ref,
    tx_ref, ty_ref, tz_ref, mb_ref,
):
    """Jacobian multiples table for one (L, TN) tile of points."""
    L = x_ref.shape[0]
    TN = x_ref.shape[1]
    m = m_ref[:]
    mp = mp_ref[0, 0]
    one = one_ref[:]
    zero2 = jnp.zeros((2, TN), jnp.uint32)
    m_ext = jnp.concatenate([m, zero2], axis=0)
    F = _F(m, mp, m_ext, mb_ref)

    X1 = x_ref[:]
    Y1 = y_ref[:]
    inf = inf_ref[:1, :]
    Z1 = _msel(inf, jnp.zeros((L, TN), jnp.uint32), one)
    zeros = jnp.zeros((L, TN), jnp.uint32)

    tx_ref[pl.ds(0, L), :] = zeros
    ty_ref[pl.ds(0, L), :] = one
    tz_ref[pl.ds(0, L), :] = zeros
    tx_ref[pl.ds(L, L), :] = X1
    ty_ref[pl.ds(L, L), :] = Y1
    tz_ref[pl.ds(L, L), :] = Z1

    def tbl_body(d, _):
        pX = tx_ref[pl.ds((d - 1) * L, L), :]
        pY = ty_ref[pl.ds((d - 1) * L, L), :]
        pZ = tz_ref[pl.ds((d - 1) * L, L), :]
        nX, nY, nZ = _point_add(F, pX, pY, pZ, X1, Y1, Z1)
        tx_ref[pl.ds(d * L, L), :] = nX
        ty_ref[pl.ds(d * L, L), :] = nY
        tz_ref[pl.ds(d * L, L), :] = nZ
        return 0

    jax.lax.fori_loop(2, 1 << _WINDOW, tbl_body, 0, unroll=False)


def _ec_mexp_acc_kernel(
    tx_ref, ty_ref, tz_ref, e_ref, m_ref, one_ref, mp_ref,
    ox_ref, oy_ref, oz_ref, mb_ref,
):
    """Fold one chunk's table entries into per-position lane partials.

    Grid (n_pos_blocks, n_chunks), chunks fastest (consecutive-revisit
    reduction); row block jj of the outputs holds, per lane t, the
    running Jacobian sum over chunks of d_{t,j} * P_t for position
    j = pb*_EP_JB + jj.
    """
    L = m_ref.shape[0]
    TN = e_ref.shape[1]
    pb = pl.program_id(0)
    c = pl.program_id(1)
    m = m_ref[:]
    mp = mp_ref[0, 0]
    one = one_ref[:]
    zero2 = jnp.zeros((2, TN), jnp.uint32)
    m_ext = jnp.concatenate([m, zero2], axis=0)
    F = _F(m, mp, m_ext, mb_ref)
    digits_per_limb = LIMB_BITS // _WINDOW
    dig_mask = jnp.uint32((1 << _WINDOW) - 1)
    zeros = jnp.zeros((L, TN), jnp.uint32)

    @pl.when(c == 0)
    def _():
        for jj in range(_EP_JB):
            ox_ref[pl.ds(jj * L, L), :] = zeros
            oy_ref[pl.ds(jj * L, L), :] = one
            oz_ref[pl.ds(jj * L, L), :] = zeros

    for jj in range(_EP_JB):
        j = pb * _EP_JB + jj
        limb = j // digits_per_limb
        shift = ((j % digits_per_limb) * _WINDOW).astype(jnp.uint32)
        row = e_ref[pl.ds(limb, 1), :]
        dig = (row >> shift) & dig_mask
        fX = jnp.zeros((L, TN), jnp.uint32)
        fY = jnp.zeros((L, TN), jnp.uint32)
        fZ = jnp.zeros((L, TN), jnp.uint32)
        for d in range(1 << _WINDOW):
            sel = (dig == jnp.uint32(d)).astype(jnp.uint32)
            fX = fX + sel * tx_ref[pl.ds(d * L, L), :]
            fY = fY + sel * ty_ref[pl.ds(d * L, L), :]
            fZ = fZ + sel * tz_ref[pl.ds(d * L, L), :]
        aX = ox_ref[pl.ds(jj * L, L), :]
        aY = oy_ref[pl.ds(jj * L, L), :]
        aZ = oz_ref[pl.ds(jj * L, L), :]
        rX, rY, rZ = _point_add(F, aX, aY, aZ, fX, fY, fZ)
        ox_ref[pl.ds(jj * L, L), :] = rX
        oy_ref[pl.ds(jj * L, L), :] = rY
        oz_ref[pl.ds(jj * L, L), :] = rZ


@functools.partial(jax.jit, static_argnames=("curve", "nbits"))
def ec_multiexp_pallas(curve, x, y, inf, e, nbits: int):
    """sum_i e_i * P_i via the digit-position-parallel kernels.

    curve: arith.ec._Curve (static; per-group singleton).  x, y: (N, L)
    affine Montgomery coords; inf: (N,) bool; e: (N, Le) standard limbs
    < 2^nbits.  Returns ONE Jacobian point (X, Y, Z), each (L,) — the
    caller normalizes.
    """
    ctx = curve.ctx
    m = ctx.m_limbs
    mprime = ctx.mprime
    one_mont = ctx.one_mont
    N, L = x.shape
    ndig = max(1, (nbits + _WINDOW - 1) // _WINDOW)
    n_pb = -(-ndig // _EP_JB)
    ndig_pad = n_pb * _EP_JB
    need_limbs = (ndig_pad * _WINDOW + LIMB_BITS - 1) // LIMB_BITS
    if e.shape[1] < need_limbs:
        e = jnp.concatenate(
            [e, jnp.zeros((N, need_limbs - e.shape[1]), jnp.uint32)],
            axis=1,
        )
    Le = e.shape[1]
    tn = TILE_N
    Npad = _round_up(N, tn)
    if Npad != N:
        pad = Npad - N
        x = jnp.concatenate([x, jnp.zeros((pad, L), jnp.uint32)], axis=0)
        y = jnp.concatenate([y, jnp.zeros((pad, L), jnp.uint32)], axis=0)
        inf = jnp.concatenate([inf, jnp.ones((pad,), bool)], axis=0)
        e = jnp.concatenate([e, jnp.zeros((pad, Le), jnp.uint32)], axis=0)
    n_chunks = Npad // tn
    W = 1 << _WINDOW
    mp2 = jnp.asarray(mprime, jnp.uint32).reshape(1, 1)
    m_col = jnp.broadcast_to(m.reshape(L, 1), (L, tn))
    one_col = jnp.broadcast_to(one_mont.reshape(L, 1), (L, tn))
    xT, yT, eT = x.T, y.T, e.T
    inf_row = inf.astype(jnp.uint32).reshape(1, Npad)

    col_spec = pl.BlockSpec((L, tn), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    fix_spec = pl.BlockSpec((L, tn), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    parts = []
    for s0 in range(0, n_chunks, _EP_SUPER):
        sc = min(_EP_SUPER, n_chunks - s0)
        sl = lambda a: jax.lax.slice_in_dim(
            a, s0 * tn, (s0 + sc) * tn, axis=1
        )
        tbls = _pallas_call(
            _ec_mexp_tbl_kernel,
            grid=(sc,),
            in_specs=[
                col_spec, col_spec,
                pl.BlockSpec((1, tn), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                fix_spec, fix_spec,
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((W * L, tn), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
            ] * 3,
            out_shape=[
                jax.ShapeDtypeStruct((W * L, sc * tn), jnp.uint32)
                for _ in range(3)
            ],
            scratch_shapes=[pltpu.VMEM((L, tn), jnp.uint32)],
        )(sl(xT), sl(yT), sl(inf_row), m_col, one_col, mp2)
        outs = _pallas_call(
            _ec_mexp_acc_kernel,
            grid=(n_pb, sc),
            in_specs=[
                pl.BlockSpec((W * L, tn), lambda pb, c: (0, c),
                             memory_space=pltpu.VMEM),
            ] * 3 + [
                pl.BlockSpec((Le, tn), lambda pb, c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, tn), lambda pb, c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, tn), lambda pb, c: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda pb, c: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((_EP_JB * L, tn), lambda pb, c: (pb, 0),
                             memory_space=pltpu.VMEM),
            ] * 3,
            out_shape=[
                jax.ShapeDtypeStruct((n_pb * _EP_JB * L, tn), jnp.uint32)
                for _ in range(3)
            ],
            scratch_shapes=[pltpu.VMEM((L, tn), jnp.uint32)],
        )(tbls[0], tbls[1], tbls[2], sl(eT), m_col, one_col, mp2)
        parts.append(outs)

    if len(parts) > 1:
        allp = [
            jnp.concatenate([p[i] for p in parts], axis=1)
            for i in range(3)
        ]
    else:
        allp = list(parts[0])
    lanes = allp[0].shape[1]
    # limb-major (ndig_pad*L, lanes) -> element-major (ndig_pad, lanes, L)
    PX, PY, PZ = (
        jnp.transpose(a.reshape(ndig_pad, L, lanes), (0, 2, 1))
        for a in allp
    )

    # cross-lane Jacobian add tree (batched XLA formulas)
    while PX.shape[1] > 1:
        h = PX.shape[1] // 2
        nX, nY, nZ = curve.point_add(
            PX[:, :h], PY[:, :h], PZ[:, :h],
            PX[:, h : 2 * h], PY[:, h : 2 * h], PZ[:, h : 2 * h],
        )
        if PX.shape[1] % 2:
            nX = jnp.concatenate([nX, PX[:, 2 * h :]], axis=1)
            nY = jnp.concatenate([nY, PY[:, 2 * h :]], axis=1)
            nZ = jnp.concatenate([nZ, PZ[:, 2 * h :]], axis=1)
        PX, PY, PZ = nX, nY, nZ
    PX, PY, PZ = PX[:, 0], PY[:, 0], PZ[:, 0]  # (ndig_pad, L)

    # final combine: sum_j 2^{W j} S_j — W doublings + 1 add per position
    def body(k, carry):
        X, Y, Z = carry
        for _ in range(_WINDOW):
            X, Y, Z = curve.point_double(X, Y, Z)
        j = ndig_pad - 1 - k
        pX = jax.lax.dynamic_index_in_dim(PX, j, 0, keepdims=False)
        pY = jax.lax.dynamic_index_in_dim(PY, j, 0, keepdims=False)
        pZ = jax.lax.dynamic_index_in_dim(PZ, j, 0, keepdims=False)
        return curve.point_add(X, Y, Z, pX, pY, pZ)

    zero = jnp.zeros((L,), jnp.uint32)
    init = (zero, one_mont, zero)
    return jax.lax.fori_loop(0, ndig_pad, body, init)


# ------------------------------------------------------ fixed-base kernel


def _ec_fb_kernel(
    ndig: int,
    tx_ref,  # (ndig*16, L) VMEM: affine x of d * 2^(W j) * P
    ty_ref,  # (ndig*16, L) VMEM: affine y
    e_ref,  # (Le, TN)
    m_ref, one_ref, mp_ref,
    ox_ref, oy_ref, oz_ref,
    mb_ref,
):
    """Fixed-base scalar multiplication: no doublings — the table
    absorbs them (the EC analogue of the gmpmee fixed-base route,
    reference: SURVEY.md §2.3).  One mixed Jacobian+affine addition per
    digit; the per-lane digit gather is the exact one-hot f32 matmul of
    the Montgomery fixed-base kernel (entries are 16-bit limbs, exact
    in f32).  Entry d = 0 is the point at infinity, flagged by the
    digit value (its table rows are unused)."""
    L = m_ref.shape[0]
    TN = e_ref.shape[1]
    m = m_ref[:]
    mp = mp_ref[0, 0]
    one = one_ref[:]
    zero2 = jnp.zeros((2, TN), jnp.uint32)
    m_ext = jnp.concatenate([m, zero2], axis=0)
    F = _F(m, mp, m_ext, mb_ref)
    W = 1 << _WINDOW
    digits_per_limb = LIMB_BITS // _WINDOW
    dig_mask = jnp.uint32(W - 1)
    zeros = jnp.zeros((L, TN), jnp.uint32)

    ox_ref[:] = zeros
    oy_ref[:] = one
    oz_ref[:] = zeros

    def digit_body(j, _):
        limb = j // digits_per_limb
        shift = (j % digits_per_limb) * _WINDOW
        row = e_ref[pl.ds(limb, 1), :]  # (1, TN)
        dig = ((row >> shift.astype(jnp.uint32)) & dig_mask).astype(
            jnp.int32
        )
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (W, TN), 0) == dig
        ).astype(jnp.float32)

        def gather(t_ref):
            rows = [t_ref[pl.ds(j * W + d, 1), :] for d in range(W)]
            trow = (
                jnp.concatenate(rows, axis=0)
                .astype(jnp.int32)
                .astype(jnp.float32)
            )  # (16, L)
            return (
                jax.lax.dot_general(
                    trow, onehot,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                .astype(jnp.int32)
                .astype(jnp.uint32)
            )  # (L, TN)

        fX = gather(tx_ref)
        fY = gather(ty_ref)
        finf = (dig == 0).astype(jnp.uint32)  # (1, TN)
        fZ = _msel(finf, zeros, one)
        rX, rY, rZ = _point_add(
            F, ox_ref[:], oy_ref[:], oz_ref[:], fX, fY, fZ
        )
        ox_ref[:] = rX
        oy_ref[:] = rY
        oz_ref[:] = rZ
        return 0

    jax.lax.fori_loop(0, ndig, digit_body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def ec_fb_exp_pallas(table_x, table_y, e, m, mprime, one_mont,
                     tile_n=None):
    """Batched e*P for a FIXED base P via the windowed-table kernel.

    table_x/y: (ndig, 16, L) affine Montgomery coords of d * 2^(W j) * P
    (d = 0 rows ignored).  e: (N, Le) standard limbs.  Returns Jacobian
    (X, Y, Z) each (N, L); the caller normalizes.
    """
    ndig, W, L = table_x.shape
    assert W == 1 << _WINDOW
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
    kernel = functools.partial(_ec_fb_kernel, ndig)
    R = ndig * W
    tbl_spec = pl.BlockSpec((R, L), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    outs = _pallas_call(
        kernel,
        grid=(pl.cdiv(N, tn),),
        in_specs=[
            tbl_spec, tbl_spec,
            pl.BlockSpec((Le, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((L, e.T.shape[1]), jnp.uint32)
            for _ in range(3)
        ],
        scratch_shapes=[pltpu.VMEM((L, tn), jnp.uint32)],
    )(table_x.reshape(R, L), table_y.reshape(R, L), e.T, m_col,
      one_col, mp2)
    X, Y, Z = outs
    return X.T, Y.T, Z.T


# ------------------------------------------------------- point-add kernel


def _ec_add_kernel(
    x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
    m_ref, mp_ref,
    ox_ref, oy_ref, oz_ref,
    mb_ref,
):
    """One batched Jacobian + Jacobian point addition tile."""
    TN = x1_ref.shape[1]
    m = m_ref[:]
    mp = mp_ref[0, 0]
    zero2 = jnp.zeros((2, TN), jnp.uint32)
    m_ext = jnp.concatenate([m, zero2], axis=0)
    F = _F(m, mp, m_ext, mb_ref)
    rX, rY, rZ = _point_add(
        F, x1_ref[:], y1_ref[:], z1_ref[:],
        x2_ref[:], y2_ref[:], z2_ref[:],
    )
    ox_ref[:] = rX
    oy_ref[:] = rY
    oz_ref[:] = rZ


@functools.partial(jax.jit, static_argnames=("tile_n",))
def ec_point_add_pallas(x1, y1, z1, x2, y2, z2, m, mprime, tile_n=None):
    """Batched Jacobian + Jacobian -> Jacobian point addition.

    All coords (N, L) Montgomery form; infinity is Z == 0.
    """
    N, L = x1.shape
    tn = tile_n or min(TILE_N, _round_up(N, 128))
    mp2 = jnp.asarray(mprime, jnp.uint32).reshape(1, 1)
    m_col = jnp.broadcast_to(m.reshape(L, 1), (L, tn))
    io_spec = pl.BlockSpec((L, tn), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    outs = _pallas_call(
        _ec_add_kernel,
        grid=(pl.cdiv(N, tn),),
        in_specs=[io_spec] * 6 + [
            pl.BlockSpec((L, tn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[io_spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((L, N), jnp.uint32) for _ in range(3)
        ],
        scratch_shapes=[pltpu.VMEM((L, tn), jnp.uint32)],
    )(x1.T, y1.T, z1.T, x2.T, y2.T, z2.T, m_col, mp2)
    X, Y, Z = outs
    return X.T, Y.T, Z.T
