"""Pallas Jacobi eigh kernel vs numpy/XLA (interpret mode on CPU).

The kernel's contract (ops/pallas_eigh.py): unsorted eigenpairs with
``a = v diag(lam) v^T`` — exactly what the order-invariant LETKF solve needs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cwbnwp_letkf_tpu.ops.pallas_eigh import jacobi_eigh
from cwbnwp_letkf_tpu.ops.solver import set_eigh_backend


def _spd(rng, b, k, cond=10.0):
    a = rng.normal(size=(b, k, k)).astype(np.float32)
    a = a @ a.transpose(0, 2, 1) + cond * np.eye(k, dtype=np.float32)
    return a


@pytest.mark.parametrize("k", [4, 13, 40])
def test_jacobi_eigh_reconstructs(k):
    rng = np.random.default_rng(71)
    a = _spd(rng, 6, k)
    lam, v = jacobi_eigh(jnp.asarray(a), interpret=True)
    lam, v = np.asarray(lam), np.asarray(v)

    rec = np.einsum("bik,bk,bjk->bij", v, lam, v)
    scale = np.abs(a).max()
    assert np.abs(rec - a).max() < 3e-5 * scale
    orth = np.einsum("bik,bjk->bij", v, v) - np.eye(k, dtype=np.float32)
    assert np.abs(orth).max() < 1e-5
    ref = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.sort(lam, -1), ref, rtol=1e-4,
                               atol=3e-5 * scale)


def test_jacobi_eigh_nonmultiple_batch():
    """Batch not a multiple of 128 lanes exercises the identity padding."""
    rng = np.random.default_rng(72)
    a = _spd(rng, 3, 8)
    lam, v = jacobi_eigh(jnp.asarray(a), interpret=True)
    assert lam.shape == (3, 8) and v.shape == (3, 8, 8)
    rec = np.einsum("bik,bk,bjk->bij", np.asarray(v), np.asarray(lam),
                    np.asarray(v))
    assert np.abs(rec - a).max() < 3e-4


def test_solver_with_jacobi_backend_matches_xla():
    """Full solve path with the Pallas backend == XLA backend (f32)."""
    from cwbnwp_letkf_tpu.ops.solver import letkf_solve_from_normal

    rng = np.random.default_rng(73)
    b, k = 5, 10
    a_obs = _spd(rng, b, k, cond=0.5) - 0.5 * np.eye(k, dtype=np.float32)
    g = rng.normal(size=(b, k)).astype(np.float32)
    xb = rng.normal(5, 2, (b, k)).astype(np.float32)
    has_obs = np.array([True, True, False, True, True])
    kw = dict(inflat=float(k - 1) / 1.1, use_rtps=True, rtps_alpha=0.9)

    xa_xla = np.asarray(letkf_solve_from_normal(
        jnp.asarray(a_obs), jnp.asarray(g), jnp.asarray(xb),
        kw["inflat"], jnp.asarray(has_obs), use_rtps=True, rtps_alpha=0.9))
    set_eigh_backend("jacobi")
    try:
        xa_jac = np.asarray(letkf_solve_from_normal(
            jnp.asarray(a_obs), jnp.asarray(g), jnp.asarray(xb),
            kw["inflat"], jnp.asarray(has_obs), use_rtps=True,
            rtps_alpha=0.9))
    finally:
        set_eigh_backend("xla")
    np.testing.assert_allclose(xa_jac, xa_xla, rtol=2e-4, atol=2e-4)
    # untouched points must be bit-identical background in both
    np.testing.assert_array_equal(xa_jac[2], xb[2])


def test_set_eigh_backend_validates():
    with pytest.raises(ValueError):
        set_eigh_backend("magma")
