"""Radius neighbor search vs the brute-force oracle (kdtree2's own trick,
module_kdtree2.f90:1714-1793)."""
import jax.numpy as jnp
import numpy as np

from cwbnwp_letkf_tpu.constants import GC1999_SQ
from cwbnwp_letkf_tpu.ops.neighbors import (
    NeighborSet,
    normalize_coords,
    radius_neighbors,
)

from . import reference_impl as ref


def _sets(ns: NeighborSet, row: int):
    m = np.asarray(ns.mask[row])
    return set(np.asarray(ns.idx[row])[m].tolist())


def test_matches_brute_force_3d():
    rng = np.random.default_rng(11)
    n, b = 500, 64
    obs = rng.uniform(-8, 8, size=(n, 3))
    q = rng.uniform(-8, 8, size=(b, 3))
    got = radius_neighbors(jnp.asarray(q), jnp.asarray(obs), n_max=64,
                           chunk=32)
    for i in range(b):
        idx, r2 = ref.radius_neighbors_brute(obs.T, q[i], GC1999_SQ)
        assert _sets(got, i) == set(idx.tolist())
        m = np.asarray(got.mask[i])
        # distances agree (sorted: top_k returns nearest-first)
        np.testing.assert_allclose(
            np.sort(np.asarray(got.r2[i])[m]), np.sort(r2), rtol=1e-6,
            atol=1e-9)


def test_cap_keeps_nearest():
    rng = np.random.default_rng(12)
    obs = rng.uniform(-1, 1, size=(300, 3))
    q = np.zeros((1, 3))
    cap = 10
    got = radius_neighbors(jnp.asarray(q), jnp.asarray(obs), n_max=cap)
    assert int(got.mask.sum()) == cap
    idx_all, r2_all = ref.radius_neighbors_brute(obs.T, q[0], GC1999_SQ)
    np.testing.assert_array_equal(
        np.sort(np.asarray(got.idx[0])), np.sort(idx_all[:cap]))


def test_2d_localization_ignores_vertical():
    """vclr < 0 -> vertical coordinate scaled to zero, 2-D search
    (module_localization.f90:151-157)."""
    rng = np.random.default_rng(13)
    obs_m = np.stack([rng.uniform(-2e5, 2e5, 40), rng.uniform(-2e5, 2e5, 40),
                      rng.uniform(0, 2e4, 40)], axis=1)
    q_m = np.stack([rng.uniform(-2e5, 2e5, 8), rng.uniform(-2e5, 2e5, 8),
                    rng.uniform(0, 2e4, 8)], axis=1)
    hclr = 50.0  # km
    obs_n = np.asarray(normalize_coords(jnp.asarray(obs_m), hclr, -1.0))
    q_n = np.asarray(normalize_coords(jnp.asarray(q_m), hclr, -1.0))
    assert (obs_n[:, 2] == 0).all()
    got = radius_neighbors(jnp.asarray(q_n), jnp.asarray(obs_n), n_max=40)
    for i in range(8):
        pts2d = np.concatenate([obs_n[:, :2].T, np.zeros((1, 40))], axis=0)
        idx, _ = ref.radius_neighbors_brute(
            pts2d, [q_n[i, 0], q_n[i, 1], 0.0], GC1999_SQ)
        assert _sets(got, i) == set(idx.tolist())


def test_obs_valid_mask_and_empty():
    rng = np.random.default_rng(14)
    obs = rng.uniform(-1, 1, size=(50, 3))
    q = np.zeros((3, 3))
    valid = np.zeros(50, bool)
    valid[::7] = True
    got = radius_neighbors(jnp.asarray(q), jnp.asarray(obs), n_max=16,
                           obs_valid=jnp.asarray(valid))
    for i in range(3):
        assert _sets(got, i).issubset(set(np.nonzero(valid)[0].tolist()))
    # zero obs: everything masked out
    empty = radius_neighbors(jnp.asarray(q), jnp.zeros((0, 3)), n_max=8)
    assert not bool(empty.mask.any())
