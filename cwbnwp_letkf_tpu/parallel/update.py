"""Sharded per-variable LETKF update over a device mesh.

``shard_map`` splits the point batch across the ``"grid"`` mesh axis; every
device runs the identical single-device update (ops/update.py) on its slice
with the obs arrays replicated.  This replaces the reference's
scatter -> serial loop -> gather pipeline (letkf_scatter_grid /
letkf_gather_grid, /root/reference/module_mpi_util.f90:190-358): state is
born sharded, so the alltoallv transposes vanish.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.update import DevicePlatform, update_points
from .mesh import GRID_AXIS


def sharded_update_points(
    mesh: Mesh,
    xb,
    points_xyz,
    platforms: Sequence[DevicePlatform],
    ivar: int,
    *,
    inflat: float,
    weight_function: int,
    use_rtpp: bool = False,
    rtpp_alpha: float = 0.85,
    use_rtps: bool = False,
    rtps_alpha: float = 0.85,
    solver_dtype=jnp.float32,
    chunk: int = 4096,
    max_blocks=None,
):
    """Run :func:`~cwbnwp_letkf_tpu.ops.update.update_points` SPMD.

    ``xb [B, k]`` and ``points_xyz [B, 3]`` are sharded along ``B``; platform
    obs data is replicated.  The batch is padded to a multiple of the mesh
    size with zero points (masked naturally: padded points see whatever obs
    they see, but their output rows are dropped before returning).
    Result is identical to the single-device path (tests/test_sharding.py).
    """
    xb = jnp.asarray(xb)
    q = jnp.asarray(points_xyz)
    b, k = xb.shape
    n_dev = mesh.devices.size

    b_pad = -(-b // n_dev) * n_dev
    if b_pad != b:
        xb = jnp.concatenate([xb, jnp.zeros((b_pad - b, k), xb.dtype)])
        q = jnp.concatenate([q, jnp.full((b_pad - b, 3), 1e18, q.dtype)])

    statics = [dp.static for dp in platforms]
    arrays = [(dp.xyz, dp.stats) for dp in platforms]

    def local(xb_l, q_l, arrays_l):
        plats = [
            DevicePlatform(static=st, xyz=xyz, stats=stats)
            for st, (xyz, stats) in zip(statics, arrays_l)
        ]
        return update_points(
            xb_l, q_l, plats, ivar,
            inflat=inflat, weight_function=weight_function,
            use_rtpp=use_rtpp, rtpp_alpha=rtpp_alpha,
            use_rtps=use_rtps, rtps_alpha=rtps_alpha,
            solver_dtype=solver_dtype, chunk=chunk, max_blocks=max_blocks)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(GRID_AXIS), P(GRID_AXIS), P()),
        out_specs=P(GRID_AXIS),
    )
    return f(xb, q, arrays)[:b]


def sharded_update_points_group(
    mesh: Mesh,
    xb,
    points_xyz,
    platforms: Sequence[DevicePlatform],
    ivars,
    *,
    inflats,
    weight_function: int,
    rtpp_alpha,
    rtps_alpha,
    solver_dtype=jnp.float32,
    chunk: int = 4096,
    max_blocks=None,
):
    """SPMD variant of :func:`~cwbnwp_letkf_tpu.ops.update.update_points_group`.

    ``xb [B, V, k]`` / ``points_xyz [B, 3]`` sharded along ``B``; obs
    replicated.  Same padding/masking contract as
    :func:`sharded_update_points`.
    """
    from ..ops.update import update_points_group

    xb = jnp.asarray(xb)
    q = jnp.asarray(points_xyz)
    b, n_vars, k = xb.shape
    n_dev = mesh.devices.size

    b_pad = -(-b // n_dev) * n_dev
    if b_pad != b:
        xb = jnp.concatenate([xb, jnp.zeros((b_pad - b, n_vars, k), xb.dtype)])
        q = jnp.concatenate([q, jnp.full((b_pad - b, 3), 1e18, q.dtype)])

    statics = [dp.static for dp in platforms]
    arrays = [(dp.xyz, dp.stats) for dp in platforms]

    def local(xb_l, q_l, arrays_l):
        plats = [
            DevicePlatform(static=st, xyz=xyz, stats=stats)
            for st, (xyz, stats) in zip(statics, arrays_l)
        ]
        return update_points_group(
            xb_l, q_l, plats, ivars,
            inflats=inflats, weight_function=weight_function,
            rtpp_alpha=rtpp_alpha, rtps_alpha=rtps_alpha,
            solver_dtype=solver_dtype, chunk=chunk, max_blocks=max_blocks)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(GRID_AXIS), P(GRID_AXIS), P()),
        out_specs=P(GRID_AXIS),
    )
    return f(xb, q, arrays)[:b]
