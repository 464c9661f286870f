"""Multi-host helpers: member split, point-sharded assembly, replication."""
import jax
import jax.numpy as jnp
import numpy as np

from cwbnwp_letkf_tpu.parallel import make_mesh
from cwbnwp_letkf_tpu.parallel.multihost import (make_point_sharded,
                                                 my_member_slice,
                                                 replicate_obs)


def test_member_slice_partitions_exactly():
    for k in (8, 96, 7):
        for pc in (1, 3, 8):
            got = []
            for pi in range(pc):
                sl = my_member_slice(k, pi, pc)
                got.extend(range(k)[sl])
            assert got == list(range(k)), (k, pc)


def test_member_slice_balanced():
    sizes = [len(range(96)[my_member_slice(96, pi, 5)]) for pi in range(5)]
    assert max(sizes) - min(sizes) <= 1


def test_make_point_sharded_and_replicate():
    mesh = make_mesh()
    arr = np.arange(8 * 16 * 3, dtype=np.float32).reshape(8 * 16, 3)
    g = make_point_sharded(mesh, arr)
    assert g.shape == arr.shape
    np.testing.assert_array_equal(np.asarray(g), arr)
    assert len(g.sharding.device_set) == len(jax.devices())

    obs = {"xyz": np.ones((5, 3), np.float32), "err": np.ones(5, np.float32)}
    rep = replicate_obs(mesh, obs)
    assert np.asarray(rep["xyz"]).shape == (5, 3)
    assert rep["xyz"].sharding.is_fully_replicated
