"""Device-mesh sharding of the ciphertext axis.

The reference scales by splitting N-element array ops across CPU cores
and hosts (reference: SURVEY.md §2.5).  Here the N axis shards across a
`jax.sharding.Mesh`; the limb axis stays on-chip.  Reductions
(expProd/prod) reduce locally per shard and combine the tiny per-shard
partials with a collective.  Inter-*party* communication never uses
collectives (trust boundary) — only intra-party scale-out does.
"""

from vmn_tpu.parallel.mesh import (  # noqa: F401
    ciph_mesh,
    make_mesh,
    replicate,
    shard_array,
    shard_garray,
    shard_limbs,
    sharded_exp_prod,
)
