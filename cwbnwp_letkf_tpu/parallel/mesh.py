"""Mesh construction and point-batch sharding.

One mesh axis, ``"grid"``, shards the flattened analysis-point batch — the
analog of the reference's cyclic 2-D (x, y) rank decomposition
(/root/reference/module_mpi_util.f90:38-188).  The reference interleaves
columns cyclically to balance obs density across ranks; under SPMD every
device executes the same padded program, so interleaving is unnecessary —
contiguous equal shards are optimal.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GRID_AXIS = "grid"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over all (or the given) devices, axis name ``"grid"``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (GRID_AXIS,))


def shard_points(mesh: Mesh, *arrays):
    """Device-put arrays sharded along their leading (point-batch) axis."""
    sharding = NamedSharding(mesh, P(GRID_AXIS))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated on the mesh (obs arrays)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
