"""Batched Montgomery arithmetic over multi-limb integers (JAX/XLA).

This is the device compute core replacing the reference's GMP/gmpmee native
layer (reference: SURVEY.md §2.3 — modular exponentiation, simultaneous
multi-exponentiation `prod b_i^{e_i}` used 23x e.g. PoSBasicTW.java:408-409,
fixed-base exponentiation used by `g.exp(array)` 91x).

Design (TPU-first):
  * elements are ``(..., L)`` uint32 tensors of 16-bit limbs (see limbs.py);
    the batch axis N (ciphertexts) maps onto VPU lanes/sublanes and shards
    across the device mesh; the limb axis stays on-chip;
  * Montgomery multiplication is CIOS with lazy carries: the inner loop
    accumulates 16-bit partial products in 32-bit lanes (<=2^25 after 128
    iterations) and resolves carries once per multiplication with an exact
    scan that simultaneously performs the conditional final subtraction —
    inputs and outputs are always canonical (< m);
  * exponentiation is fixed-window (w=4) square-and-multiply over the batch
    — no data-dependent control flow, identical schedule for every element
    (constant-time by construction, unlike the reference);
  * fixed-base exponentiation uses precomputed radix-2^8 tables shared
    across the batch (the gmpmee fixed-base equivalent);
  * simultaneous multi-exponentiation = batched exponentiation + a
    log-depth product tree over the batch axis.

A Pallas kernel fast path for `mont_mul`/`mont_exp` lives in
`vmn_tpu.ops.mont_kernels`; this module is the portable XLA reference used
on CPU and as fallback.
"""

from __future__ import annotations

import collections
import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vmn_tpu.arith.limbs import (
    LIMB_BITS,
    LIMB_MASK,
    int_to_limbs,
    ints_to_limbs,
    limbs_to_int,
    num_limbs,
)

# ----------------------------------------------------------------- helpers


def _broadcast_pair(a, b):
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    return jnp.broadcast_to(a, shape), jnp.broadcast_to(b, shape)


def _finalize(t, m):
    """Normalize lazy limbs and conditionally subtract the modulus.

    t: (..., L+1) uint32 lazy limbs (each < 2^26) holding a value in [0, 2m).
    m: (L,) uint32 canonical modulus limbs.
    Returns canonical (..., L) uint32 with value = t mod m' semantics
    (t if t < m else t - m).
    """
    L = m.shape[-1]
    mp = jnp.concatenate([m, jnp.zeros((1,), jnp.uint32)]).astype(jnp.int32)
    tt = jnp.moveaxis(t, -1, 0).astype(jnp.int32)  # (L+1, ...)
    mm = jnp.broadcast_to(mp.reshape((L + 1,) + (1,) * (tt.ndim - 1)), tt.shape)

    zeros = jnp.zeros(tt.shape[1:], jnp.int32)

    def step(state, xs):
        carry, borrow = state
        tk, mk = xs
        s = tk + carry
        lo = s & LIMB_MASK
        carry = s >> LIMB_BITS
        d = lo - mk - borrow
        dlo = d & LIMB_MASK
        borrow = (d >> 31) & 1
        return (carry, borrow), (lo, dlo)

    (_, borrow), (lo, dlo) = jax.lax.scan(step, (zeros, zeros), (tt, mm))
    res = jnp.where(borrow[None].astype(bool), lo, dlo)
    return jnp.moveaxis(res, 0, -1)[..., :L].astype(jnp.uint32)


def _mont_mul(a, b, m, mprime):
    """CIOS Montgomery product a*b*R^{-1} mod m; inputs canonical (..., L)."""
    a, b = _broadcast_pair(a, b)
    L = m.shape[-1]
    t = jnp.zeros(a.shape[:-1] + (L + 1,), jnp.uint32)

    def body(i, t):
        ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=-1)  # (..., 1)
        p = ai * b
        t = t.at[..., :L].add(p & LIMB_MASK)
        t = t.at[..., 1:].add(p >> LIMB_BITS)
        q = ((t[..., 0] * mprime) & LIMB_MASK)[..., None]
        p2 = q * m
        t = t.at[..., :L].add(p2 & LIMB_MASK)
        t = t.at[..., 1:].add(p2 >> LIMB_BITS)
        carry = t[..., 0] >> LIMB_BITS
        t = jnp.concatenate(
            [t[..., 1:], jnp.zeros_like(t[..., :1])], axis=-1
        )
        t = t.at[..., 0].add(carry)
        return t

    t = jax.lax.fori_loop(0, L, body, t)
    return _finalize(t, m)


def _sub_borrow(a, b):
    """Exact limbwise a - b: returns (diff mod 2^(16L), borrow (...,))."""
    a, b = _broadcast_pair(a, b)
    aa = jnp.moveaxis(a, -1, 0).astype(jnp.int32)
    bb = jnp.moveaxis(b, -1, 0).astype(jnp.int32)
    zeros = jnp.zeros(aa.shape[1:], jnp.int32)

    def step(borrow, xs):
        ak, bk = xs
        d = ak - bk - borrow
        return (d >> 31) & 1, d & LIMB_MASK

    borrow, d = jax.lax.scan(step, zeros, (aa, bb))
    return jnp.moveaxis(d, 0, -1).astype(jnp.uint32), borrow


def _add_carry(a, b):
    """Exact limbwise a + b mod 2^(16L) (carry out dropped)."""
    a, b = _broadcast_pair(a, b)
    aa = jnp.moveaxis(a, -1, 0)
    bb = jnp.moveaxis(b, -1, 0)
    zeros = jnp.zeros(aa.shape[1:], jnp.uint32)

    def step(carry, xs):
        ak, bk = xs
        s = ak + bk + carry
        return s >> LIMB_BITS, s & LIMB_MASK

    _, s = jax.lax.scan(step, zeros, (aa, bb))
    return jnp.moveaxis(s, 0, -1)


# ------------------------------------------------------------- jitted ops


@jax.jit
def mont_mul(a, b, m, mprime):
    return _mont_mul(a, b, m, mprime)


@jax.jit
def add_mod(a, b, m):
    """(a + b) mod m for canonical a, b < m."""
    s = a + b  # limbs <= 2^17, lazy
    a_, s_ = _broadcast_pair(a, s)
    t = jnp.concatenate([s_, jnp.zeros_like(s_[..., :1])], axis=-1)
    return _finalize(t, m)


@jax.jit
def sub_mod(a, b, m):
    """(a - b) mod m for canonical a, b < m."""
    d, borrow = _sub_borrow(a, b)
    mb = jnp.broadcast_to(m, d.shape)
    d_plus_m = _add_carry(d, mb)
    return jnp.where(borrow[..., None].astype(bool), d_plus_m, d)


@jax.jit
def is_lt(a, b):
    """a < b limbwise big-int compare -> bool (...,)."""
    _, borrow = _sub_borrow(a, b)
    return borrow.astype(bool)


_WINDOW = 4


def _digit(e, j):
    """Extract 4-bit digit j (traced) from (..., Le) exponent limbs."""
    limb = j // (LIMB_BITS // _WINDOW)
    shift = (j % (LIMB_BITS // _WINDOW)) * _WINDOW
    el = jax.lax.dynamic_slice_in_dim(e, limb, 1, axis=-1)[..., 0]
    return (el >> shift) & ((1 << _WINDOW) - 1)


@functools.partial(jax.jit, static_argnames=("nbits",))
def mont_exp(base, e, m, mprime, one_mont, nbits: int):
    """base^e in Montgomery form, fixed 4-bit windows.

    base: (..., L) Montgomery-form canonical.  e: (..., Le) standard-form
    limbs.  Every element follows the identical schedule (no data-dependent
    branching): digits select table entries with gathers.
    """
    L = m.shape[-1]
    shape = jnp.broadcast_shapes(base.shape[:-1], e.shape[:-1])
    base = jnp.broadcast_to(base, shape + (L,))
    e = jnp.broadcast_to(e, shape + e.shape[-1:])
    # Digits past e's last limb must read as zero (dynamic slices clamp,
    # which would repeat the top limb when nbits > 16*Le).
    need_limbs = ((nbits + _WINDOW - 1) // _WINDOW * _WINDOW
                  + LIMB_BITS - 1) // LIMB_BITS
    if e.shape[-1] < need_limbs:
        pad = jnp.zeros(shape + (need_limbs - e.shape[-1],), jnp.uint32)
        e = jnp.concatenate([e, pad], axis=-1)

    one = jnp.broadcast_to(one_mont, shape + (L,))

    # Table of base^d for d in [0, 16), built with a scan so the body
    # is traced once (compile-time matters: this graph nests in every
    # group operation).
    def tbl_step(prev, _):
        nxt = _mont_mul(prev, base, m, mprime)
        return nxt, nxt

    _, tail = jax.lax.scan(
        tbl_step, base, None, length=(1 << _WINDOW) - 2
    )
    table = jnp.concatenate(
        [one[None], base[None], tail], axis=0
    )  # (16, ..., L)

    ndig = (nbits + _WINDOW - 1) // _WINDOW

    def body(k, acc):
        j = ndig - 1 - k
        acc = jax.lax.fori_loop(
            0, _WINDOW, lambda _, a: _mont_mul(a, a, m, mprime), acc
        )
        dig = _digit(e, j)
        idx = jnp.broadcast_to(
            dig[None, ..., None].astype(jnp.int32), (1,) + shape + (L,)
        )
        fac = jnp.take_along_axis(table, idx, axis=0)[0]
        return _mont_mul(acc, fac, m, mprime)

    return jax.lax.fori_loop(0, ndig, body, one)


def _mul_dispatch(a, b, m, mprime, pallas: bool):
    """Montgomery product usable inside jit: Pallas on TPU, XLA otherwise.

    a, b: (N, L) canonical limbs (same shape).
    """
    if pallas and a.ndim == 2 and a.shape[0] > 0:
        from vmn_tpu.ops.mont_kernels import mont_mul_pallas

        return mont_mul_pallas(a, b, m, mprime)
    return _mont_mul(a, b, m, mprime)


@functools.partial(jax.jit, static_argnames=("pallas",))
def _prod_tree(x, m, mprime, one_mont, pallas: bool):
    """Log-depth product over axis 0 — ONE compiled program per shape.

    (The previous implementation dispatched one separately-jitted
    Montgomery product per tree level, compiling a fresh XLA program for
    every intermediate shape — 2·log2(N) compilations per array size and
    a host round-trip per level.)
    """
    n = x.shape[0]
    if n == 1:
        return x[0]
    # pad to a power of two with the multiplicative identity
    p2 = 1 << (n - 1).bit_length()
    if p2 != n:
        pad = jnp.broadcast_to(one_mont, (p2 - n,) + x.shape[1:])
        x = jnp.concatenate([x, pad], axis=0)
    while x.shape[0] > 1:
        h = x.shape[0] // 2
        x = _mul_dispatch(x[:h], x[h:], m, mprime, pallas)
    return x[0]


@functools.partial(jax.jit, static_argnames=("pallas",))
def _prods_scan(x, m, mprime, one_mont, pallas: bool):
    """Inclusive cumulative Montgomery product over axis 0.

    Hillis–Steele over full-size arrays: log2(N) batched products, each
    one Pallas launch inside a single compiled program (the associative
    -scan-of-XLA-mont-mul this replaces compiled minutes-long programs
    and never used the TPU kernels).
    """
    n = x.shape[0]
    d = 1
    while d < n:
        pad = jnp.broadcast_to(one_mont, (d,) + x.shape[1:])
        shifted = jnp.concatenate([pad, x[:-d]], axis=0)
        x = _mul_dispatch(x, shifted, m, mprime, pallas)
        d *= 2
    return x


@functools.partial(jax.jit, static_argnames=("pallas",))
def _rec_lin_scan(mm, aa, m, mprime, one_mont, pallas: bool):
    """Affine-recurrence scan x_i = x_{i-1}·e_i + b_i over axis 0.

    mm: (N, L) multipliers in Montgomery form; aa: (N, L) addends in
    standard form.  Composition of affine maps (m1,a1)∘(m2,a2) =
    (m1·m2, a1·m2 + a2), Hillis–Steele.  Returns standard-form x.
    """
    n = mm.shape[0]
    d = 1
    while d < n:
        pad_m = jnp.broadcast_to(one_mont, (d,) + mm.shape[1:])
        pad_a = jnp.zeros((d,) + aa.shape[1:], aa.dtype)
        m_sh = jnp.concatenate([pad_m, mm[:-d]], axis=0)
        a_sh = jnp.concatenate([pad_a, aa[:-d]], axis=0)
        new_m = _mul_dispatch(m_sh, mm, m, mprime, pallas)
        new_a = add_mod(_mul_dispatch(a_sh, mm, m, mprime, pallas), aa, m)
        mm, aa = new_m, new_a
        d *= 2
    return aa


@functools.partial(jax.jit, static_argnames=("nbits", "pallas"))
def _expprod_shared(bases, e, m, mprime, one_mont, nbits: int,
                    pallas: bool):
    """Simultaneous multi-exponentiation prod_i bases_i^{e_i} with
    SHARED squarings (Straus interleaving).

    The naive expprod (per-element windowed exp + product tree) costs
    ~(nbits + nbits/4)·N products; here the accumulator is a single
    element squared once per bit, so the cost is ~(14 + nbits/4)·N —
    ~5x less for full-size exponents, ~4x for 256-bit batching vectors.
    This is the honest gmpmee `spowm` analogue (reference: SURVEY.md
    §2.3), restructured so the per-digit batch product is a log-depth
    tree of Pallas products instead of a sequential loop.

    bases: (N, L) Montgomery form; e: (N, Le) standard limbs with
    values < 2^nbits.  Returns (L,) Montgomery form.
    """
    N, L = bases.shape
    W = _WINDOW
    digits_per_limb = LIMB_BITS // W
    ndig = max(1, (nbits + W - 1) // W)
    need_limbs = (ndig * W + LIMB_BITS - 1) // LIMB_BITS
    if e.shape[1] < need_limbs:
        e = jnp.concatenate(
            [e, jnp.zeros((N, need_limbs - e.shape[1]), jnp.uint32)], axis=1
        )

    # Pad the batch to a power of two with the identity.
    p2 = 1 << (N - 1).bit_length()
    if p2 != N:
        pad_b = jnp.broadcast_to(one_mont, (p2 - N, L))
        bases = jnp.concatenate([bases, pad_b], axis=0)
        e = jnp.concatenate(
            [e, jnp.zeros((p2 - N, e.shape[1]), jnp.uint32)], axis=0
        )

    # Power table T[d] = bases^d, d in [0, 16): (16, Np, L).
    rows = [jnp.broadcast_to(one_mont, bases.shape), bases]
    for _ in range(2, 1 << W):
        rows.append(_mul_dispatch(rows[-1], bases, m, mprime, pallas))
    T = jnp.stack(rows)

    one_row = jnp.broadcast_to(one_mont, (1, L))

    def body(k, acc):
        j = ndig - 1 - k
        # W squarings of the single accumulator (XLA path: scalar-sized)
        for _ in range(W):
            acc = _mont_mul(acc, acc, m, mprime)
        limb = j // digits_per_limb
        shift = (j % digits_per_limb) * W
        el = jax.lax.dynamic_slice_in_dim(e, limb, 1, axis=1)[:, 0]
        dig = ((el >> shift) & ((1 << W) - 1)).astype(jnp.int32)
        sel = jnp.take_along_axis(
            T, dig[None, :, None], axis=0
        )[0]  # (Np, L)
        # Batch product: log-depth tree of Pallas products.
        while sel.shape[0] > 1:
            h = sel.shape[0] // 2
            sel = _mul_dispatch(sel[:h], sel[h:], m, mprime, pallas)
        return _mont_mul(acc, sel, m, mprime)

    acc = jax.lax.fori_loop(0, ndig, body, one_row)
    return acc[0]


_SCAN_CHUNK_N = 1 << 18  # chunk Hillis-Steele scans above this size
_SCAN_CHUNK = 1 << 16


def _prods_scan_chunked(x, m, mprime, one_mont, pallas: bool):
    """Sequentially chunked cumulative product for huge batches.

    The one-jit Hillis-Steele scan holds every round's buffers when the
    products are Pallas custom calls (XLA does not reuse across custom
    calls): ~20 rounds x 4 arrays = ~10 GB internal peak at N=2^20,
    which OOMs the chip on top of the protocol's live set.  Chunks of
    2^16 bound the peak; the carry composes chunk k into chunk k+1 with
    one broadcast product.  A tiny fetch per chunk drains the queue.
    """
    outs = []
    carry = None  # (L,) Montgomery form
    for s in range(0, x.shape[0], _SCAN_CHUNK):
        part = _prods_scan(x[s : s + _SCAN_CHUNK], m, mprime, one_mont,
                           pallas)
        if carry is not None:
            part = _mul_dispatch(
                part, jnp.broadcast_to(carry, part.shape), m, mprime,
                pallas,
            )
        carry = part[-1]
        np.asarray(part[:1, :1])  # drain (see `backpressure`)
        outs.append(part)
    return jnp.concatenate(outs, axis=0)


def _rec_lin_chunked(mm, aa, m, mprime, one_mont, pallas: bool):
    """Sequentially chunked affine-recurrence scan (see
    _prods_scan_chunked).  Chunk-to-chunk composition mirrors the
    sharded mesh wrapper: x = A_loc + x_in * M_pref per chunk."""
    outs = []
    x_in = None  # (L,) standard form
    for s in range(0, mm.shape[0], _SCAN_CHUNK):
        mmc = mm[s : s + _SCAN_CHUNK]
        aac = aa[s : s + _SCAN_CHUNK]
        a_loc = _rec_lin_scan(mmc, aac, m, mprime, one_mont, pallas)
        if x_in is not None:
            m_pref = _prods_scan(mmc, m, mprime, one_mont, pallas)
            a_loc = add_mod(
                _mont_mul(m_pref, x_in[None, :], m, mprime), a_loc, m
            )
        x_in = a_loc[-1]
        np.asarray(a_loc[:1, :1])  # drain
        outs.append(a_loc)
    return jnp.concatenate(outs, axis=0)


def _expprod_fast(bases, e, m, mprime, one_mont, nbits: int, pallas: bool):
    """Multi-exp dispatch: fused digit-position-parallel Pallas kernels
    for device-sized batches, host-tree Straus otherwise."""
    if pallas and bases.shape[0] >= 64:
        from vmn_tpu.ops.mont_kernels import mont_expprod_pallas

        return mont_expprod_pallas(bases, e, m, mprime, one_mont, nbits)
    return _expprod_shared(bases, e, m, mprime, one_mont, nbits, pallas)


@functools.partial(jax.jit, static_argnames=("entries", "pallas"))
def _fb_table_scan(bases, m, mprime, one_mont, entries: int, pallas: bool):
    """Fixed-base window table on device: T[j, d] = bases_j^d.

    bases: (J, L) Montgomery form — base^(2^(W·j)) per digit position.
    Returns (J, entries, L) Montgomery form.  One compiled scan of
    `entries-2` batched Montgomery products replaces the former host
    Python loop (J·entries bignum modmuls + J·entries int_to_limbs —
    ~2.3 s per base at 2048 bits, paid per session for the h0 table)."""
    J, L = bases.shape
    one = jnp.broadcast_to(one_mont, (J, L))

    def step(carry, _):
        nxt = _mul_dispatch(carry, bases, m, mprime, pallas)
        return nxt, nxt

    if entries <= 2:
        parts = [one[None], bases[None]][:entries]
        return jnp.transpose(jnp.concatenate(parts, axis=0), (1, 0, 2))
    _, rest = jax.lax.scan(step, bases, None, length=entries - 2)
    tbl = jnp.concatenate([one[None], bases[None], rest], axis=0)
    return jnp.transpose(tbl, (1, 0, 2))


@functools.partial(jax.jit)
def _sum_tree(x, m):
    """Log-depth modular sum over axis 0 in one compiled program."""
    n = x.shape[0]
    if n == 1:
        return x[0]
    p2 = 1 << (n - 1).bit_length()
    if p2 != n:
        pad = jnp.zeros((p2 - n,) + x.shape[1:], x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
    while x.shape[0] > 1:
        h = x.shape[0] // 2
        x = add_mod(x[:h], x[h:], m)
    return x[0]


def prod_reduce(x, m, mprime, axis=0):
    """Log-depth product tree along `axis` with Montgomery products."""
    x = jnp.moveaxis(x, axis, 0)
    while x.shape[0] > 1:
        n = x.shape[0]
        h = n // 2
        lo = _mont_mul(x[:h], x[h : 2 * h], m, mprime)
        x = jnp.concatenate([lo, x[2 * h :]], axis=0) if n % 2 else lo
    return x[0]


@functools.partial(jax.jit, static_argnames=("nbits",))
def mont_expprod(bases, e, m, mprime, one_mont, nbits: int):
    """Simultaneous multi-exponentiation prod_i bases_i^{e_i} over axis 0.

    The gmpmee `spowm` equivalent (reference: SURVEY.md §2.3): batched
    windowed exponentiation followed by a log-depth product reduction.
    """
    powers = mont_exp(bases, e, m, mprime, one_mont, nbits)
    return prod_reduce(powers, m, mprime, axis=0)


@functools.partial(jax.jit, static_argnames=("ndig", "fb_window"))
def _fixed_base_exp(table, e, m, mprime, one_mont, ndig: int, fb_window: int):
    """prod_j table[j][digit_j(e)] — shared-base exponentiation.

    table: (J, 2^w, L) Montgomery form.  e: (..., Le) standard limbs.
    """
    L = m.shape[-1]
    shape = e.shape[:-1]
    # zero-pad e so digit reads never clamp at the top limb
    need_limbs = (ndig * fb_window + LIMB_BITS - 1) // LIMB_BITS
    if e.shape[-1] < need_limbs:
        pad = jnp.zeros(shape + (need_limbs - e.shape[-1],), jnp.uint32)
        e = jnp.concatenate([e, pad], axis=-1)
    acc = jnp.broadcast_to(one_mont, shape + (L,))
    digits_per_limb = LIMB_BITS // fb_window
    dig_mask = (1 << fb_window) - 1

    def body(j, acc):
        limb = j // digits_per_limb
        shift = (j % digits_per_limb) * fb_window
        el = jax.lax.dynamic_slice_in_dim(e, limb, 1, axis=-1)[..., 0]
        dig = (el >> shift) & dig_mask
        row = jax.lax.dynamic_slice_in_dim(table, j, 1, axis=0)[0]  # (2^w, L)
        fac = row[dig.astype(jnp.int32)]  # (..., L)
        return _mont_mul(acc, fac, m, mprime)

    return jax.lax.fori_loop(0, ndig, body, acc)


# ------------------------------------------------- host<->device limbs
# Limb values are 16-bit; moving them as uint16 HALVES host<->device
# transfer volume (significant when the device link is a tunnel or
# PCIe and N is large), widening/narrowing on-device.


@jax.jit
def _widen_u16(a):
    return a.astype(jnp.uint32)


@jax.jit
def _narrow_u16(a):
    return a.astype(jnp.uint16)


def device_limbs(arr) -> jnp.ndarray:
    """Host limb array (any uint dtype) -> device uint32 limbs."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint16:
        arr = arr.astype(np.uint16)
    return _widen_u16(jnp.asarray(arr))


_BACKPRESSURE_N = 1 << 18


def backpressure(*arrays) -> None:
    """Drain the device queue at phase boundaries for huge batches.

    JAX allocates every dispatched op's output at ENQUEUE time; a whole
    mix phase dispatched ahead of execution at N = 2^20 (512 MB per
    2048-bit array) transiently holds tens of GB and OOMs the 16 GB
    chip.  A one-element fetch waits for all queued work (in-order
    execution), letting dead intermediate buffers free.  No-op below
    2^18 elements; costs one tunnel round-trip (~ms) above."""
    for a in arrays:
        if hasattr(a, "components"):
            backpressure(*a.components)
            continue
        limbs = getattr(a, "limbs", None)
        if limbs is None:
            limbs = getattr(a, "x", a)  # ECArray coordinate
        if (
            hasattr(limbs, "ndim")
            and limbs.ndim >= 2
            and limbs.shape[0] >= _BACKPRESSURE_N
        ):
            np.asarray(limbs[:1, :1])
            return


def host_limbs(x) -> np.ndarray:
    """Device uint32 limbs -> host uint16 array (half the transfer).

    Multi-process: a global array sharded across hosts is not fully
    addressable locally — gather it first (every process gets the full
    value, which the SPMD protocol layer requires anyway for transcript
    serialization and challenge hashing)."""
    y = _narrow_u16(x)
    if isinstance(y, jax.Array) and not y.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(y, tiled=True))
    return np.asarray(y)


# ------------------------------------------------------- pallas dispatch

_PALLAS_ENABLED: Optional[bool] = None


def use_pallas() -> bool:
    """True when the Pallas TPU kernels should serve the hot ops.

    On the TPU backend the fused kernels are ~8x faster than the XLA
    fallback; on CPU (tests, verifier-only hosts) the portable XLA path
    runs.  Override with VMN_NO_PALLAS=1; VMN_FORCE_PALLAS=1 enables
    the kernel path off-TPU (used with Pallas interpret mode to prove
    the sharded kernel path on the virtual CPU mesh).
    """
    global _PALLAS_ENABLED
    if _PALLAS_ENABLED is None:
        if os.environ.get("VMN_FORCE_PALLAS"):
            _PALLAS_ENABLED = True
        else:
            _PALLAS_ENABLED = (
                not os.environ.get("VMN_NO_PALLAS")
                and jax.default_backend() == "tpu"
            )
    return _PALLAS_ENABLED


def shard_info(*arrays):
    """(mesh, axis) when an operand's batch axis is sharded over >1
    device — the signal to route through the shard_map-wrapped kernels
    in `parallel.mesh` (per-device Pallas programs cannot be GSPMD-
    partitioned like plain XLA ops).

    Only concrete (non-traced) 2-D (N, L) operands with axis 0 mapped
    to a mesh axis count; inside an outer jit the tracers fall back to
    the caller's path.
    """
    from jax.sharding import NamedSharding

    for a in arrays:
        if isinstance(a, jax.core.Tracer) or not isinstance(a, jax.Array):
            continue
        sh = getattr(a, "sharding", None)
        if not isinstance(sh, NamedSharding) or sh.mesh.size <= 1:
            continue
        if a.ndim < 2 or len(sh.spec) < 1 or sh.spec[0] is None:
            continue
        ax = sh.spec[0]
        if isinstance(ax, tuple):
            if len(ax) != 1:
                continue
            ax = ax[0]
        return sh.mesh, ax
    return None


def _flatten_pair(a, e, L):
    """Broadcast leading dims of (.., L) x (.., Le) and flatten to 2D."""
    shape = jnp.broadcast_shapes(a.shape[:-1], e.shape[:-1])
    a = jnp.broadcast_to(a, shape + a.shape[-1:]).reshape(-1, a.shape[-1])
    e = jnp.broadcast_to(e, shape + e.shape[-1:]).reshape(-1, e.shape[-1])
    return shape, a, e


# ---------------------------------------------------------------- context


class MontCtx:
    """Montgomery context for a fixed odd modulus.

    Holds device-resident constants and exposes batched canonical-form
    operations.  Group elements are kept in Montgomery form by the group
    layer; field/ring elements in standard form (they are exponents).
    """

    def __init__(self, m: int):
        if m <= 0 or m % 2 == 0:
            raise ValueError("modulus must be positive and odd")
        self.m = m
        self.nbits = m.bit_length()
        self.L = num_limbs(self.nbits)
        self.R = 1 << (LIMB_BITS * self.L)
        self.R2 = self.R * self.R % m
        self.Rinv = pow(self.R, -1, m)
        self.mprime_int = (-pow(m, -1, 1 << LIMB_BITS)) & LIMB_MASK

        self.m_limbs = jnp.asarray(int_to_limbs(m, self.L))
        self.mprime = jnp.uint32(self.mprime_int)
        self.r2_limbs = jnp.asarray(int_to_limbs(self.R2, self.L))
        self.one_mont = jnp.asarray(int_to_limbs(self.R % m, self.L))
        self.one = jnp.asarray(int_to_limbs(1, self.L))
        self.zero = jnp.asarray(int_to_limbs(0, self.L))
        # Fixed-base tables are large device buffers (a window-8 table at
        # 2048 bits is ~33 MB of HBM).  Session-derived bases (h0 per mix
        # session) would accrete one table per session forever, so the
        # cache is a small LRU: long-lived bases (g, pk) are re-touched
        # every operation and stay resident; stale session tables fall
        # off the end and their HBM is freed.
        self._fb_tables = collections.OrderedDict()
        self._known_ints = collections.OrderedDict()

    # Sized for a k-party verification round: g, pk, per-party keys and
    # the session h0 can each hold a window-4 AND a window-8 entry, so a
    # small cap would thrash (rebuilds cost a full device table build).
    _FB_CACHE_MAX = 24
    _KNOWN_INT_MAX = 256

    # -------------------------------------------------------- conversions

    def to_mont(self, a):
        # route through the dispatching mul: Pallas kernel on TPU for
        # batched arrays (the XLA fallback is ~50x slower per product
        # and sat on every serialization/sampling path)
        return self.mul(a, self.r2_limbs)

    def from_mont(self, a):
        return self.mul(a, self.one)

    def encode(self, xs) -> jnp.ndarray:
        """Python ints -> Montgomery-form device limbs (N, L)."""
        arr = jnp.asarray(ints_to_limbs(list(xs), self.L))
        return self.to_mont(arr)

    def encode_std(self, xs) -> jnp.ndarray:
        """Python ints -> standard-form device limbs (N, L)."""
        return jnp.asarray(ints_to_limbs(list(xs), self.L))

    def decode(self, a) -> list:
        """Montgomery-form limbs -> Python ints."""
        from vmn_tpu.arith.limbs import limbs_to_ints

        return limbs_to_ints(host_limbs(self.from_mont(a)))

    def decode_std(self, a) -> list:
        from vmn_tpu.arith.limbs import limbs_to_ints

        return limbs_to_ints(np.asarray(a))

    # --------------------------------------------------------- operations

    def mul(self, a, b):
        if use_pallas() and (a.ndim > 1 or b.ndim > 1):
            info = shard_info(a, b)
            if info is not None:
                shape, a2, b2 = _flatten_pair(a, b, self.L)
                if a2.shape[0] > 0 and a2.shape[0] % info[0].size == 0:
                    from vmn_tpu.parallel import mesh as pmesh

                    out = pmesh.sharded_mul(
                        a2, b2, self.m_limbs, self.mprime, *info, True
                    )
                    return out.reshape(shape + (self.L,))
                # sharded but not evenly divisible: GSPMD-partitioned
                # XLA path (never the raw per-device kernel)
                return mont_mul(a, b, self.m_limbs, self.mprime)
            from vmn_tpu.ops.mont_kernels import mont_mul_pallas

            shape, a2, b2 = _flatten_pair(a, b, self.L)
            if a2.shape[0] > 0:
                out = mont_mul_pallas(a2, b2, self.m_limbs, self.mprime)
                return out.reshape(shape + (self.L,))
        return mont_mul(a, b, self.m_limbs, self.mprime)

    def add(self, a, b):
        return add_mod(a, b, self.m_limbs)

    def sub(self, a, b):
        return sub_mod(a, b, self.m_limbs)

    def neg(self, a):
        return sub_mod(jnp.broadcast_to(self.zero, a.shape), a, self.m_limbs)

    def exp(self, base, e, nbits: Optional[int] = None):
        nbits = self.nbits if nbits is None else nbits
        if use_pallas():
            if base.ndim == 1 and e.ndim > 1:
                # shared base: route to the fixed-base kernel (no
                # squarings) when the base is host-known
                bi = self.known_int(base)
                if bi is not None:
                    return self.exp_fixed(bi, e, nbits)
            info = shard_info(base, e)
            if info is not None:
                shape, b2, e2 = _flatten_pair(base, e, self.L)
                if b2.shape[0] > 0 and b2.shape[0] % info[0].size == 0:
                    from vmn_tpu.parallel import mesh as pmesh

                    out = pmesh.sharded_exp(
                        b2, e2, self.m_limbs, self.mprime, self.one_mont,
                        nbits, *info, True,
                    )
                    return out.reshape(shape + (self.L,))
                return mont_exp(
                    base, e, self.m_limbs, self.mprime, self.one_mont,
                    nbits,
                )
            from vmn_tpu.ops.mont_kernels import mont_exp_pallas

            shape, b2, e2 = _flatten_pair(base, e, self.L)
            if b2.shape[0] > 0:
                # Bound single-kernel runtime: one fused exp call at
                # N=2^20 x 2048-bit runs ~3 min and trips the TPU
                # worker watchdog ("worker crashed / kernel fault").
                # ~2^29 element-bits per launch keeps each call < ~30 s.
                max_elems = max(1 << 14, (1 << 29) // max(1, nbits))
                if b2.shape[0] > max_elems:
                    outs = []
                    for s in range(0, b2.shape[0], max_elems):
                        part = mont_exp_pallas(
                            b2[s : s + max_elems], e2[s : s + max_elems],
                            self.m_limbs, self.mprime, self.one_mont,
                            nbits,
                        )
                        np.asarray(part[:1, :1])  # drain the queue
                        outs.append(part)
                    out = jnp.concatenate(outs, axis=0)
                else:
                    out = mont_exp_pallas(
                        b2, e2, self.m_limbs, self.mprime, self.one_mont,
                        nbits,
                    )
                return out.reshape(shape + (self.L,))
        return mont_exp(
            base, e, self.m_limbs, self.mprime, self.one_mont, nbits
        )

    def expprod(self, bases, e, nbits: Optional[int] = None):
        nbits = self.nbits if nbits is None else nbits
        if use_pallas() and bases.ndim == 2 and e.ndim == 2:
            info = shard_info(bases, e)
            if info is not None:
                if bases.shape[0] % info[0].size == 0:
                    from vmn_tpu.parallel import mesh as pmesh

                    return pmesh.sharded_exp_prod(
                        bases, e, self.m_limbs, self.mprime,
                        self.one_mont, nbits, *info, True,
                    )
                return _expprod_shared(
                    bases, e, self.m_limbs, self.mprime, self.one_mont,
                    nbits, False,
                )
        if bases.ndim == 2 and e.ndim == 2 and bases.shape[0] >= 16:
            # Shared-squaring multi-exp: fused Yao kernels on device,
            # host-tree Straus otherwise — both ~4-5x fewer products
            # than per-element exp + product tree.
            return _expprod_fast(
                bases, e, self.m_limbs, self.mprime, self.one_mont,
                nbits, use_pallas(),
            )
        if use_pallas():
            powers = self.exp(bases, e, nbits)
            return self.prod(powers, axis=0)
        return mont_expprod(
            bases, e, self.m_limbs, self.mprime, self.one_mont, nbits
        )

    def prod(self, x, axis=0):
        """Product over `axis` — one compiled tree program."""
        if axis != 0:
            x = jnp.moveaxis(x, axis, 0)
        if use_pallas() and x.ndim == 2:
            info = shard_info(x)
            if info is not None:
                if x.shape[0] % info[0].size == 0:
                    from vmn_tpu.parallel import mesh as pmesh

                    return pmesh.sharded_prod(
                        x, self.m_limbs, self.mprime, self.one_mont,
                        *info, True,
                    )
                return _prod_tree(
                    x, self.m_limbs, self.mprime, self.one_mont, False
                )
        return _prod_tree(
            x,
            self.m_limbs,
            self.mprime,
            self.one_mont,
            use_pallas() and x.ndim == 2,
        )

    def prods_scan(self, x):
        """Inclusive cumulative product over axis 0 (Montgomery form)."""
        if use_pallas() and x.ndim == 2:
            info = shard_info(x)
            if info is not None:
                if x.shape[0] % info[0].size == 0:
                    from vmn_tpu.parallel import mesh as pmesh

                    return pmesh.sharded_prods_scan(
                        x, self.m_limbs, self.mprime, self.one_mont,
                        *info, True,
                    )
                return _prods_scan(
                    x, self.m_limbs, self.mprime, self.one_mont, False
                )
        if x.ndim == 2 and x.shape[0] >= _SCAN_CHUNK_N:
            return _prods_scan_chunked(
                x, self.m_limbs, self.mprime, self.one_mont, use_pallas()
            )
        return _prods_scan(
            x, self.m_limbs, self.mprime, self.one_mont, use_pallas()
        )

    def rec_lin(self, mult_mont, add_std):
        """x_i = x_{i-1}·e_i + b_i scan; returns standard-form (N, L)."""
        if use_pallas() and mult_mont.ndim == 2:
            info = shard_info(mult_mont, add_std)
            if info is not None:
                if mult_mont.shape[0] % info[0].size == 0:
                    from vmn_tpu.parallel import mesh as pmesh

                    return pmesh.sharded_rec_lin(
                        mult_mont, add_std, self.m_limbs, self.mprime,
                        self.one_mont, *info, True,
                    )
                return _rec_lin_scan(
                    mult_mont, add_std, self.m_limbs, self.mprime,
                    self.one_mont, False,
                )
        if mult_mont.ndim == 2 and mult_mont.shape[0] >= _SCAN_CHUNK_N:
            return _rec_lin_chunked(
                mult_mont, add_std, self.m_limbs, self.mprime,
                self.one_mont, use_pallas(),
            )
        return _rec_lin_scan(
            mult_mont, add_std, self.m_limbs, self.mprime, self.one_mont,
            use_pallas(),
        )

    def sum(self, x, axis=0):
        """Modular sum over `axis` — one compiled tree program."""
        if axis != 0:
            x = jnp.moveaxis(x, axis, 0)
        if x.ndim == 2:
            info = shard_info(x)
            if info is not None and x.shape[0] % info[0].size == 0:
                from vmn_tpu.parallel import mesh as pmesh

                return pmesh.sharded_sum(x, self.m_limbs, *info)
        return _sum_tree(x, self.m_limbs)

    def reduce_std(self, wide):
        """(…, Lw) canonical limbs of ANY magnitude -> value mod m.

        Splits x = hi·2^(16·L) + lo and uses hi·R mod m = to_mont(hi),
        lo mod m = to_mont(from_mont(lo)) — all batched device ops, no
        per-element Python.  Vectorizes uniform sampling x mod m of
        (nbits+statDist)-bit integers (reference: PRing/PGroup
        randomElementArray semantics).
        """
        L = self.L
        Lw = wide.shape[-1]
        nchunks = -(-Lw // L)
        if nchunks * L != Lw:
            pad = jnp.zeros(
                wide.shape[:-1] + (nchunks * L - Lw,), jnp.uint32
            )
            wide = jnp.concatenate([wide, pad], axis=-1)
        # Horner over L-limb chunks: acc = acc·R + chunk  (mod m);
        # acc·R mod m = to_mont(acc), chunk mod m = to_mont(from_mont(·)).
        acc = None
        for j in range(nchunks - 1, -1, -1):
            chunk = wide[..., j * L : (j + 1) * L]
            cm = self.to_mont(self.from_mont(chunk))
            acc = cm if acc is None else add_mod(
                self.to_mont(acc), cm, self.m_limbs
            )
        return acc

    def inv(self, a, order: Optional[int] = None):
        """Inverse via Fermat: a^(m-2) (m prime), or a^(order-1)."""
        e_int = (self.m - 2) if order is None else (order - 1)
        e = jnp.asarray(int_to_limbs(e_int, num_limbs(e_int.bit_length())))
        return self.exp(a, e, e_int.bit_length())

    # -------------------------------------------------------- fixed base

    def _fb_table_device(self, base_int: int, ndig: int, window: int):
        """(ndig, 2^window, L) Montgomery-form table, built on device.

        Host cost is only `ndig` Python modpows for the per-digit bases;
        the 2^window-entry columns come from one compiled scan of
        batched Montgomery products (see _fb_table_scan)."""
        from vmn_tpu.arith.limbs import ints_to_limbs

        m = self.m
        step = 1 << window
        bases = []
        bj = base_int % m
        for _ in range(ndig):
            bases.append(bj)
            bj = pow(bj, step, m)
        b_mont = self.to_mont(jnp.asarray(ints_to_limbs(bases, self.L)))
        return _fb_table_scan(
            b_mont, self.m_limbs, self.mprime, self.one_mont, step,
            use_pallas(),
        )

    def _fb_cache_get(self, key):
        tbl = self._fb_tables.get(key)
        if tbl is not None:
            self._fb_tables.move_to_end(key)
        return tbl

    def _fb_cache_put(self, key, tbl):
        self._fb_tables[key] = tbl
        while len(self._fb_tables) > self._FB_CACHE_MAX:
            self._fb_tables.popitem(last=False)

    def fb_table_pallas(self, base_int: int, nbits: int):
        """(ndig, 16, L) Montgomery-form window-4 fixed-base table."""
        key = ("pallas4", base_int, nbits)
        tbl = self._fb_cache_get(key)
        if tbl is None:
            ndig = max(1, (nbits + 3) // 4)
            tbl = self._fb_table_device(base_int, ndig, 4)
            self._fb_cache_put(key, tbl)
        return tbl

    def exp_fixed(self, base_int: int, e, nbits: Optional[int] = None):
        """base^e for a shared (host-known) integer base.

        On TPU this runs the fixed-base Pallas kernel (no squarings);
        elsewhere the XLA shared-table path.  `e`: (..., Le) standard
        limbs.
        """
        nbits = self.nbits if nbits is None else nbits
        if use_pallas():
            shape = e.shape[:-1]
            e2 = e.reshape(-1, e.shape[-1])
            info = shard_info(e2)
            if info is not None and (
                e2.shape[0] == 0 or e2.shape[0] % info[0].size != 0
            ):
                return self.fixed_base_exp(base_int, e, nbits)
            if info is not None:
                from vmn_tpu.parallel import mesh as pmesh

                window = 8 if nbits >= 512 else 4
                if window == 8:
                    table = self.fixed_base_table(base_int, nbits, 8)
                else:
                    table = self.fb_table_pallas(base_int, nbits)
                out = pmesh.sharded_fb_exp(
                    table, e2, self.m_limbs, self.mprime, self.one_mont,
                    window, *info, True,
                )
                return out.reshape(shape + (self.L,))
            if e2.shape[0] > 0:
                if nbits >= 512:
                    # Window-8 kernel: half the products of window 4;
                    # the 2^8-entry-per-digit table streams from HBM.
                    from vmn_tpu.ops.mont_kernels import (
                        mont_fb8_exp_pallas,
                    )

                    table = self.fixed_base_table(base_int, nbits, 8)
                    out = mont_fb8_exp_pallas(
                        table, e2, self.m_limbs, self.mprime,
                        self.one_mont,
                    )
                else:
                    from vmn_tpu.ops.mont_kernels import mont_fb_exp_pallas

                    table = self.fb_table_pallas(base_int, nbits)
                    out = mont_fb_exp_pallas(
                        table, e2, self.m_limbs, self.mprime,
                        self.one_mont,
                    )
                return out.reshape(shape + (self.L,))
        return self.fixed_base_exp(base_int, e, nbits)

    def known_int(self, limbs) -> Optional[int]:
        """Concrete Montgomery-form (L,) limbs -> int, cached by bytes.

        Returns None for traced values (inside jit).  Used to route
        shared-base exponentiations onto the fixed-base path.
        """
        if isinstance(limbs, jax.core.Tracer):
            return None
        raw = np.asarray(limbs)
        key = raw.tobytes()
        val = self._known_ints.get(key)
        if val is None:
            val = limbs_to_int(np.asarray(self.from_mont(limbs)))
            self._known_ints[key] = val
            while len(self._known_ints) > self._KNOWN_INT_MAX:
                self._known_ints.popitem(last=False)
        else:
            self._known_ints.move_to_end(key)
        return val

    def fixed_base_table(self, base_int: int, max_ebits: int, window: int = 8):
        """Build (or fetch cached) shared fixed-base table for `base_int`."""
        key = (base_int, max_ebits, window)
        tbl = self._fb_cache_get(key)
        if tbl is None:
            J = (max_ebits + window - 1) // window
            tbl = self._fb_table_device(base_int, J, window)
            self._fb_cache_put(key, tbl)
        return tbl

    def fixed_base_exp(self, base_int: int, e, ebits: int, window: int = 8):
        """base^e for shared integer base, per-element exponents."""
        table = self.fixed_base_table(base_int, ebits, window)
        ndig = (ebits + window - 1) // window
        return _fixed_base_exp(
            table, e, self.m_limbs, self.mprime, self.one_mont, ndig, window
        )

    def __repr__(self):
        return f"MontCtx(bits={self.nbits}, L={self.L})"
