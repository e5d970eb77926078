"""Device-mesh configuration for sharded generation and training.

The reference has no distributed framework: generation parallelizes by
launching one process per GPU (scripts/gen_coco.sh, gen_train_kitti15_v2.sh)
and RAFT training uses single-host nn.DataParallel (RAFT/train.py:138).
The TPU-native equivalent (SURVEY.md §2.4) is a `jax.sharding.Mesh` with a
"data" axis: the image/pose batch is sharded across the slice and XLA
inserts any needed collectives over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D data-parallel mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of host arrays, batch axis sharded over the mesh."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
