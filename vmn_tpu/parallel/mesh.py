"""Mesh placement + shard-mapped kernel ops for the ciphertext axis.

The mix-net's scaling axis is N, the number of ciphertexts (reference
analogue: VCR thread-split array ops + file-mapped arrays, SURVEY.md
§2.5).  TPU-native design: place every (N, L) limb tensor with the N
axis sharded over a 1-D `jax.sharding.Mesh`.  Two execution paths:

  * portable XLA path — GSPMD partitions the jitted limb ops directly
    (elementwise ops shard trivially, log-depth trees lower to
    per-shard reductions + ICI collectives, `permute` becomes an
    all-to-all gather).  This is what CPU runs use.
  * Pallas fast path — the TPU kernels in `ops/mont_kernels.py` are
    per-device programs, so sharded inputs route through the
    `shard_map`-wrapped ops in this module: each shard runs the fused
    kernel on its local (N/s, L) block and reductions/scans combine
    the tiny per-shard partials with mesh collectives (`all_gather`
    over ICI).  `MontCtx` dispatches here automatically whenever an
    operand's batch axis is sharded over more than one device (see
    `mont.MontCtx` + `mont.shard_info`).

The protocol layer is agnostic: `GArray`/`FArray`/`PPArray` wrap limb
tensors wherever they are placed, so sharding the *inputs* of a session
shards the whole mix.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vmn_tpu.arith import mont

CIPH_AXIS = "ciph"


def ciph_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the ciphertext batch axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (CIPH_AXIS,))


# Backwards-compatible alias (the former parallel/shard.py API).
make_mesh = ciph_mesh


def shard_limbs(limbs, mesh: Mesh, axis: str = CIPH_AXIS):
    """Place an (N, ..., L) limb tensor with the N axis sharded."""
    spec = P(axis, *([None] * (limbs.ndim - 1)))
    return jax.device_put(limbs, NamedSharding(mesh, spec))


shard_garray = shard_limbs


def shard_array(arr, mesh: Mesh):
    """Shard a GArray/FArray/PPArray/PPFArray over the mesh (N axis)."""
    from vmn_tpu.arith.pgroup import FArray, GArray, PPArray, PPFArray

    if isinstance(arr, (PPArray, PPFArray)):
        return type(arr)(
            arr.parent, tuple(shard_array(c, mesh) for c in arr.components)
        )
    if isinstance(arr, GArray):
        return GArray(arr.grp, shard_limbs(arr.limbs, mesh))
    if isinstance(arr, FArray):
        return FArray(arr.field, shard_limbs(arr.limbs, mesh))
    raise TypeError(f"cannot shard {type(arr)!r}")


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


# =====================================================================
# shard_map-wrapped Montgomery ops (the multi-chip Pallas fast path)
# =====================================================================
#
# Every op below runs the per-device kernel (Pallas on TPU; the XLA
# reference implementation under interpret-mode tests) on each shard's
# local block, and combines per-shard partials with mesh collectives.
# Montgomery arithmetic is exact mod m, so any reduction/scan tree
# shape yields bit-identical canonical limbs — sharded results match
# the single-device run exactly.
#
# The factories are lru_cached per (mesh, axis, pallas) so each jitted
# shard_map program is built once.


def _local_mul(a, b, m, mp, pallas: bool):
    if pallas and a.shape[0] > 0:
        from vmn_tpu.ops.mont_kernels import mont_mul_pallas

        return mont_mul_pallas(a, b, m, mp)
    return mont._mont_mul(a, b, m, mp)


def _local_exp(b, e, m, mp, one, nbits: int, pallas: bool):
    if pallas and b.shape[0] > 0:
        from vmn_tpu.ops.mont_kernels import mont_exp_pallas

        return mont_exp_pallas(b, e, m, mp, one, nbits)
    return mont.mont_exp(b, e, m, mp, one, nbits)


def _local_fb(table, e, m, mp, one, window: int, pallas: bool):
    ndig = table.shape[0]
    if pallas and e.shape[0] > 0:
        if window == 8:
            from vmn_tpu.ops.mont_kernels import mont_fb8_exp_pallas

            return mont_fb8_exp_pallas(table, e, m, mp, one)
        from vmn_tpu.ops.mont_kernels import mont_fb_exp_pallas

        return mont_fb_exp_pallas(table, e, m, mp, one)
    return mont._fixed_base_exp(table, e, m, mp, one, ndig, window)


@functools.lru_cache(maxsize=None)
def _mul_fn(mesh: Mesh, axis: str, pallas: bool):
    def local(a, b, m, mp):
        return _local_mul(a, b, m, mp, pallas)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(None), P()),
        out_specs=P(axis, None), check_vma=False,
    ))


def sharded_mul(a, b, m, mp, mesh, axis, pallas):
    """(N, L) x (N, L) Montgomery product, N sharded over the mesh."""
    return _mul_fn(mesh, axis, pallas)(a, b, m, mp)


@functools.lru_cache(maxsize=None)
def _exp_fn(mesh: Mesh, axis: str, pallas: bool, nbits: int):
    def local(b, e, m, mp, one):
        return _local_exp(b, e, m, mp, one, nbits, pallas)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(None), P(), P(None)),
        out_specs=P(axis, None), check_vma=False,
    ))


def sharded_exp(b, e, m, mp, one, nbits, mesh, axis, pallas):
    """b^e elementwise, batch sharded over the mesh."""
    return _exp_fn(mesh, axis, pallas, nbits)(b, e, m, mp, one)


@functools.lru_cache(maxsize=None)
def _fb_fn(mesh: Mesh, axis: str, pallas: bool, window: int):
    def local(table, e, m, mp, one):
        return _local_fb(table, e, m, mp, one, window, pallas)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None), P(axis, None), P(None), P(),
                  P(None)),
        out_specs=P(axis, None), check_vma=False,
    ))


def sharded_fb_exp(table, e, m, mp, one, window, mesh, axis, pallas):
    """Fixed-base exponentiation: replicated table, sharded exponents."""
    return _fb_fn(mesh, axis, pallas, window)(table, e, m, mp, one)


@functools.lru_cache(maxsize=None)
def _prod_fn(mesh: Mesh, axis: str, pallas: bool):
    def local(x, m, mp, one):
        part = mont._prod_tree(x, m, mp, one, pallas)  # (L,)
        parts = jax.lax.all_gather(part, axis)  # (s, L)
        return mont._prod_tree(parts, m, mp, one, False)[None]

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(None), P(), P(None)),
        out_specs=P(axis, None), check_vma=False,
    ))


def sharded_prod(x, m, mp, one, mesh, axis, pallas):
    """Product over the sharded axis 0 -> (L,) (replicated result)."""
    return _prod_fn(mesh, axis, pallas)(x, m, mp, one)[0]


@functools.lru_cache(maxsize=None)
def _sum_fn(mesh: Mesh, axis: str):
    def local(x, m):
        part = mont._sum_tree(x, m)
        parts = jax.lax.all_gather(part, axis)
        return mont._sum_tree(parts, m)[None]

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(None)),
        out_specs=P(axis, None), check_vma=False,
    ))


def sharded_sum(x, m, mesh, axis):
    """Modular sum over the sharded axis 0 -> (L,)."""
    return _sum_fn(mesh, axis)(x, m)[0]


@functools.lru_cache(maxsize=None)
def _expprod_fn(mesh: Mesh, axis: str, pallas: bool, nbits: int):
    def local(bases, e, m, mp, one):
        part = mont._expprod_fast(bases, e, m, mp, one, nbits, pallas)
        parts = jax.lax.all_gather(part, axis)  # (s, L)
        return mont._prod_tree(parts, m, mp, one, False)[None]

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(None), P(), P(None)),
        out_specs=P(axis, None), check_vma=False,
    ))


def sharded_exp_prod(bases, e, m, mp, one, nbits, mesh, axis=CIPH_AXIS,
                     pallas=False):
    """prod_i b_i^{e_i} with the N axis sharded across the mesh.

    Per-shard Straus multi-exp (shared squarings) + an `all_gather` of
    one (L,) partial per shard over ICI + a tiny final combine —
    the gmpmee-spowm analogue at pod scale (reference: SURVEY.md §2.3,
    §2.5 "batch data parallelism").
    """
    return _expprod_fn(mesh, axis, pallas, nbits)(bases, e, m, mp, one)[0]


@functools.lru_cache(maxsize=None)
def _prods_fn(mesh: Mesh, axis: str, pallas: bool):
    def local(x, m, mp, one):
        y = mont._prods_scan(x, m, mp, one, pallas)  # local inclusive
        totals = jax.lax.all_gather(y[-1], axis)  # (s, L)
        # exclusive prefix of the shard totals for THIS shard
        idx = jax.lax.axis_index(axis)
        s = totals.shape[0]
        keep = (jnp.arange(s) < idx)[:, None]
        masked = jnp.where(keep, totals, jnp.broadcast_to(one, totals.shape))
        pre = mont._prod_tree(masked, m, mp, one, False)  # (L,)
        return mont._mont_mul(y, pre[None, :], m, mp)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(None), P(), P(None)),
        out_specs=P(axis, None), check_vma=False,
    ))


def sharded_prods_scan(x, m, mp, one, mesh, axis, pallas):
    """Inclusive cumulative Montgomery product, sharded axis 0."""
    return _prods_fn(mesh, axis, pallas)(x, m, mp, one)


@functools.lru_cache(maxsize=None)
def _rec_lin_fn(mesh: Mesh, axis: str, pallas: bool):
    def local(mm, aa, m, mp, one):
        # Per-shard affine scan with x_in = 0, then compose the incoming
        # state from the previous shards' (M_total, A_last) pairs:
        #   x_i = A_loc_i + x_in * M_pref_i
        a_loc = mont._rec_lin_scan(mm, aa, m, mp, one, pallas)
        m_pref = mont._prods_scan(mm, m, mp, one, pallas)
        pairs_m = jax.lax.all_gather(m_pref[-1], axis)  # (s, L) mont
        pairs_a = jax.lax.all_gather(a_loc[-1], axis)  # (s, L) std
        idx = jax.lax.axis_index(axis)
        s = pairs_m.shape[0]
        zero = jnp.zeros_like(pairs_a[0])

        def step(j, x):
            nxt = mont.add_mod(
                mont._mont_mul(pairs_m[j], x, m, mp), pairs_a[j], m
            )
            return jnp.where(j < idx, nxt, x)

        x_in = jax.lax.fori_loop(0, s, step, zero)  # std form
        return mont.add_mod(
            mont._mont_mul(m_pref, x_in[None, :], m, mp), a_loc, m
        )

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(None), P(), P(None)),
        out_specs=P(axis, None), check_vma=False,
    ))


def sharded_rec_lin(mm, aa, m, mp, one, mesh, axis, pallas):
    """Affine recurrence x_i = x_{i-1}*e_i + b_i, sharded axis 0."""
    return _rec_lin_fn(mesh, axis, pallas)(mm, aa, m, mp, one)


# ----------------------------------------------------------- EC kernels


@functools.lru_cache(maxsize=None)
def _ec_smul_fn(mesh: Mesh, axis: str, nbits: int):
    from vmn_tpu.ops.ec_kernels import ec_scalar_mul_pallas

    def local(x, y, inf, e, m, mp, one):
        return ec_scalar_mul_pallas(x, y, inf, e, m, mp, one, nbits)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P(axis, None),
                  P(None), P(), P(None)),
        out_specs=(P(axis, None), P(axis, None), P(axis, None)),
        check_vma=False,
    ))


def sharded_ec_smul(x, y, inf, e, m, mp, one, nbits, mesh, axis):
    """Batched EC scalar mul (Jacobian out), batch sharded."""
    return _ec_smul_fn(mesh, axis, nbits)(x, y, inf, e, m, mp, one)


@functools.lru_cache(maxsize=None)
def _ec_add_fn(mesh: Mesh, axis: str):
    from vmn_tpu.ops.ec_kernels import ec_point_add_pallas

    def local(x1, y1, z1, x2, y2, z2, m, mp):
        return ec_point_add_pallas(x1, y1, z1, x2, y2, z2, m, mp)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None),) * 6 + (P(None), P()),
        out_specs=(P(axis, None), P(axis, None), P(axis, None)),
        check_vma=False,
    ))


def sharded_ec_add(x1, y1, z1, x2, y2, z2, m, mp, mesh, axis):
    """Batched Jacobian point addition, batch sharded."""
    return _ec_add_fn(mesh, axis)(x1, y1, z1, x2, y2, z2, m, mp)
