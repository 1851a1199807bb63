"""Mesh placement for the protocol layer: shard the ciphertext axis.

The mix-net's scaling axis is N, the number of ciphertexts (reference
analogue: VCR thread-split array ops + file-mapped arrays, SURVEY.md
§2.5).  TPU-native design: place every (N, L) limb tensor with the N
axis sharded over a 1-D `jax.sharding.Mesh` and let GSPMD partition
the compiled programs — elementwise group ops shard trivially, the
log-depth product/scan trees lower to per-shard reductions plus ICI
collectives, and cross-shard `permute` becomes an all-to-all gather.

The protocol layer is agnostic: `GArray`/`FArray`/`PPArray` wrap limb
tensors wherever they are placed, so sharding the *inputs* of a session
shards the whole mix.  (The Pallas kernel fast path is single-device;
multi-device runs use the portable XLA path, which GSPMD partitions —
select with VMN_NO_PALLAS=1 until the kernels grow a shard_map
wrapper.)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CIPH_AXIS = "ciph"


def ciph_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the ciphertext batch axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (CIPH_AXIS,))


def shard_limbs(limbs, mesh: Mesh):
    """Place an (N, ..., L) limb tensor with the N axis sharded."""
    spec = P(CIPH_AXIS, *([None] * (limbs.ndim - 1)))
    return jax.device_put(limbs, NamedSharding(mesh, spec))


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
