"""Sharding the ciphertext batch over a device mesh.

Data parallelism over N is the dominant axis (reference analogue:
VCR's thread-split array ops + multi-host mix-servers, SURVEY.md §2.5).
Elementwise group ops (mul, exp, permute-within-shard) shard trivially;
`expProd`/`prod` do a local log-depth reduction per shard followed by an
`all_gather` of one element per shard and a final tiny combine — the
ICI-friendly analogue of gmpmee's simultaneous multi-exp bucket sums.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vmn_tpu.arith import mont


def make_mesh(n_devices: Optional[int] = None, axis: str = "ciph") -> Mesh:
    """1-D mesh over the ciphertext axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_garray(limbs, mesh: Mesh, axis: str = "ciph"):
    """Place an (N, L) limb tensor with the N axis sharded."""
    return jax.device_put(limbs, NamedSharding(mesh, P(axis, None)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def sharded_exp_prod(limbs, e_limbs, m, mprime, one_mont, nbits: int,
                     mesh: Mesh, axis: str = "ciph"):
    """prod_i b_i^{e_i} with the N axis sharded across the mesh.

    Local per-shard windowed exponentiation + log-depth product tree,
    then an all_gather of the single per-shard partial products and a
    final combine of n_shards elements (runs identically on every
    device; the partials ride ICI).
    """
    from jax import shard_map

    def local(limbs, e_limbs):
        powers = mont.mont_exp(limbs, e_limbs, m, mprime, one_mont, nbits)
        part = mont.prod_reduce(powers, m, mprime, axis=0)  # (L,)
        parts = jax.lax.all_gather(part, axis)  # (n_shards, L)
        return mont.prod_reduce(parts, m, mprime, axis=0)[None]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None),  # each shard returns one (identical) row
        check_vma=False,  # loop carries in mont_exp start replicated
    )  # noqa: E501  (jax.shard_map keyword API, jax >= 0.8)
    out = fn(limbs, e_limbs)
    return out[0]
