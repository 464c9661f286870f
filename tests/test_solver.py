"""Batched LETKF solve vs the float64 NumPy transcription of letkf_solve."""
import jax.numpy as jnp
import numpy as np
import pytest

from cwbnwp_letkf_tpu.ops import letkf_solve_batch, tune_q

from . import reference_impl as ref


def _random_case(rng, b, k, n):
    xb = rng.normal(5.0, 2.0, size=(b, k))
    yo = rng.normal(0.0, 1.0, size=(b, n))
    yb = rng.normal(0.0, 1.0, size=(b, k, n))
    return xb, yo, yb


@pytest.mark.parametrize("k,n", [(8, 5), (20, 40), (40, 3), (16, 1)])
def test_solve_matches_reference(k, n):
    rng = np.random.default_rng(0)
    b = 17
    xb, yo, yb = _random_case(rng, b, k, n)
    inflat = (k - 1) / 1.2
    has_obs = np.ones(b, bool)

    xa = letkf_solve_batch(
        jnp.asarray(xb), jnp.asarray(yo), jnp.asarray(yb), inflat,
        jnp.asarray(has_obs), solver_dtype=jnp.float64,
    )
    expected = np.stack([ref.letkf_solve(xb[i], yo[i], yb[i], inflat)
                         for i in range(b)])
    np.testing.assert_allclose(np.asarray(xa), expected, rtol=1e-9, atol=1e-9)


def test_solve_float32_close():
    rng = np.random.default_rng(1)
    b, k, n = 33, 24, 30
    xb, yo, yb = _random_case(rng, b, k, n)
    inflat = (k - 1) / 1.5
    xa = letkf_solve_batch(
        jnp.asarray(xb, jnp.float32), jnp.asarray(yo, jnp.float32),
        jnp.asarray(yb, jnp.float32), inflat,
        jnp.ones(b, bool), solver_dtype=jnp.float32,
    )
    expected = np.stack([ref.letkf_solve(xb[i], yo[i], yb[i], inflat)
                         for i in range(b)])
    np.testing.assert_allclose(np.asarray(xa), expected, rtol=2e-3, atol=2e-3)


def test_padded_zero_obs_columns_are_noops():
    """A zero-whitened obs column must be exactly equivalent to absence
    (the padding invariant the whole fixed-k gather design relies on;
    SURVEY.md section 7 'hard parts' (a))."""
    rng = np.random.default_rng(2)
    b, k, n, pad = 9, 12, 7, 13
    xb, yo, yb = _random_case(rng, b, k, n)
    inflat = (k - 1) / 1.1

    yo_pad = np.concatenate([yo, np.zeros((b, pad))], axis=1)
    yb_pad = np.concatenate([yb, np.zeros((b, k, pad))], axis=2)

    args = dict(inflat=inflat, has_obs=jnp.ones(b, bool),
                solver_dtype=jnp.float64)
    xa = letkf_solve_batch(jnp.asarray(xb), jnp.asarray(yo),
                           jnp.asarray(yb), **args)
    xa_pad = letkf_solve_batch(jnp.asarray(xb), jnp.asarray(yo_pad),
                               jnp.asarray(yb_pad), **args)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xa_pad),
                               rtol=1e-12, atol=1e-12)


def test_no_obs_points_keep_background():
    """Reference skips gridpoints with no local obs (letkf_core.f90:220-234)."""
    rng = np.random.default_rng(3)
    b, k, n = 8, 10, 6
    xb, yo, yb = _random_case(rng, b, k, n)
    yo[4:] = 0.0
    yb[4:] = 0.0
    has_obs = np.array([True] * 4 + [False] * 4)
    xa = letkf_solve_batch(
        jnp.asarray(xb), jnp.asarray(yo), jnp.asarray(yb), (k - 1) / 1.3,
        jnp.asarray(has_obs), solver_dtype=jnp.float64,
    )
    np.testing.assert_array_equal(np.asarray(xa)[4:], xb[4:])
    expected = np.stack([ref.letkf_solve(xb[i], yo[i], yb[i], (k - 1) / 1.3)
                         for i in range(4)])
    np.testing.assert_allclose(np.asarray(xa)[:4], expected, rtol=1e-9)


@pytest.mark.parametrize("use_rtpp,use_rtps", [(True, False), (False, True),
                                               (True, True)])
def test_relaxation_matches_reference(use_rtpp, use_rtps):
    rng = np.random.default_rng(4)
    b, k, n = 11, 14, 9
    xb, yo, yb = _random_case(rng, b, k, n)
    inflat = (k - 1) / 1.6
    xa = letkf_solve_batch(
        jnp.asarray(xb), jnp.asarray(yo), jnp.asarray(yb), inflat,
        jnp.ones(b, bool), use_rtpp=use_rtpp, rtpp_alpha=0.95,
        use_rtps=use_rtps, rtps_alpha=0.95, solver_dtype=jnp.float64,
    )
    expected = np.stack([
        ref.letkf_solve(xb[i], yo[i], yb[i], inflat,
                        use_rtpp=use_rtpp, rtpp_alpha=0.95,
                        use_rtps=use_rtps, rtps_alpha=0.95)
        for i in range(b)
    ])
    np.testing.assert_allclose(np.asarray(xa), expected, rtol=1e-9, atol=1e-9)


def test_tune_q_matches_reference():
    rng = np.random.default_rng(5)
    q = rng.normal(0.002, 0.004, size=(6, 5, 4, 10))  # some negatives
    out = tune_q(jnp.asarray(q))
    expected = ref.tune_q(q)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-12, atol=1e-15)
    # member-sum preserved wherever some member is positive
    has_pos = (q > 0).any(-1)
    np.testing.assert_allclose(
        np.asarray(out).sum(-1)[has_pos], q.sum(-1)[has_pos], rtol=1e-10)
    # negatives are zeroed; positives are scaled by the (possibly negative)
    # ratio — matching the reference, which does NOT guarantee positivity
    # when the member sum is negative (letkf_core.f90:719-728).
    neg = np.asarray(out) < 0
    assert not neg[~has_pos].any()
