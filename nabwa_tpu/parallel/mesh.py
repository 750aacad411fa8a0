"""Device mesh and sharding helpers.

The parallelism model mirrors the reference's (SURVEY §2.9): pure data
parallelism over reads — read batches are sharded over the mesh's `dp` axis,
the FM-index is replicated per chip (bwtio mmap-share per node →
device-replicated arrays here), and the only cross-chip communication is
the per-read-group insert-size histogram reduction at the phase barrier
(replaces the bam2bam PUB/SUB isize broadcast, bam2bam.c:1856-1870).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="dp"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh, tree, axis="dp"):
    """Place batch-leading arrays sharded over the dp axis."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def isize_histogram(positions0, positions1, lengths0, lengths1, mapq0,
                    mapq1, n_bins=100000):
    """Device-side insert-size histogram (the streaming per-RG histogram of
    insert_size.c:50-173 as a bincount).  Under pjit over a dp-sharded batch
    XLA inserts the psum; the host finalizes quantiles like infer_isize."""
    good = (mapq0 >= 20) & (mapq1 >= 20)
    lo = jnp.minimum(positions0, positions1)
    x = jnp.where(positions0 < positions1,
                  positions1 + lengths1 - positions0,
                  positions0 + lengths0 - positions1)
    x = jnp.where(good & (x < n_bins), x, 0)
    # bin 0 is the discard bucket (isizes < 4 never stored,
    # insert_size.c:39-41 uses that as a format tag)
    hist = jnp.zeros(n_bins, dtype=jnp.int32).at[x].add(
        good.astype(jnp.int32))
    return hist.at[0].set(0)
