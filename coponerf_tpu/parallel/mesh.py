"""Device mesh and sharding helpers.

The reference's only parallelism is hand-rolled single-node data parallelism
(mp.spawn + NCCL broadcast/all_reduce, train.py:58-60,141-147,
wrapper.py:21-28).  The TPU-native equivalent: ONE jitted global train step
over a `jax.sharding.Mesh`; the batch is sharded on the 'data' axis, params
are replicated, and XLA's SPMD partitioner inserts the gradient
all-reduce over ICI automatically — no explicit collectives in user code.

Rendering additionally shards the query-ray axis ('rays') when a 2-D mesh is
requested — the honest sequence-parallel analogue for this workload
(65,536 rays/image at eval).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (-1,), axes: Sequence[str] = ("data",), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a pytree of host arrays with the leading dim sharded."""
    sh = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
