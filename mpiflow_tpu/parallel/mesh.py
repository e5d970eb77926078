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
HOST_AXIS = "host"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              num_hosts: int = 1) -> Mesh:
    """A data-parallel mesh over the available devices.

    num_hosts > 1 builds a 2-D ("host", "data") mesh of num_hosts rows --
    the multi-slice / multi-host generation shape (SURVEY §2.4): each host
    row consumes its own input shard, sharding within a row rides ICI while
    the rows are independent (nothing crosses DCN in the generation sweep).
    """
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    devices = np.array(devices)
    if num_hosts > 1:
        if devices.size % num_hosts:
            raise ValueError(
                f"{devices.size} devices not divisible by {num_hosts} hosts")
        return Mesh(devices.reshape(num_hosts, -1), (HOST_AXIS, DATA_AXIS))
    return Mesh(devices, (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over every mesh axis (host-major on a
    2-D mesh: slot h*D+d lands on mesh row h, device column d)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of host arrays, batch axis sharded over the mesh."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
