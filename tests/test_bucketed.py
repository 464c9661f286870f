"""Bucketed (block-culled) localization vs the all-records dense path.

ops/bucketed.py must reproduce ops/dense.py exactly whenever no candidate
block overflows the budget — culled blocks are provably outside every
point's localization ball and the cap/weight math is shared code.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cwbnwp_letkf_tpu.config import MAX_VARS
from cwbnwp_letkf_tpu.obs.base import PlatformStatic, make_platform_obs
from cwbnwp_letkf_tpu.ops.bucketed import (bucket_platform,
                                           bucketed_platform_terms, morton3)
from cwbnwp_letkf_tpu.ops.dense import (dense_platform_terms,
                                        platform_dense_tables)
from cwbnwp_letkf_tpu.ops.neighbors import normalize_coords
from cwbnwp_letkf_tpu.ops.update import prepare_platform, update_points

K = 10


def _platform(rng, nrec, nvar=2, max_lz_pts=50, hclr=40.0, vclr=2.5):
    xyz = np.stack([
        rng.uniform(-2e5, 2e5, nrec),
        rng.uniform(-2e5, 2e5, nrec),
        rng.uniform(0.0, 1.5e4, nrec),
    ], axis=1)
    obs = rng.normal(0.0, 2.0, (nvar, nrec))
    hdxb = obs[:, :, None] + rng.normal(0.0, 1.0, (nvar, nrec, K))
    error = rng.uniform(0.5, 2.0, (nvar, nrec))
    qc = np.zeros((nvar, nrec, K))
    po = make_platform_obs(xyz, obs, hdxb, error, qc, dtype=np.float32)
    st = PlatformStatic(
        name="synop", kind="gts", nvar=nvar, max_lz_pts=max_lz_pts,
        hclr=tuple([hclr] * MAX_VARS), vclr=tuple([vclr] * MAX_VARS),
        err_muti=tuple([1.0] * nvar), err_rej=tuple([1e9] * nvar),
        is_assim=tuple(tuple([True] * MAX_VARS) for _ in range(nvar)),
    )
    return st, po


def _points(rng, b, scale=1.0):
    return np.stack([
        rng.uniform(-2e5 * scale, 2e5 * scale, b),
        rng.uniform(-2e5 * scale, 2e5 * scale, b),
        rng.uniform(0.0, 1.5e4, b),
    ], axis=1)


@pytest.mark.parametrize("weight_function", [0, 1])
@pytest.mark.parametrize("nrec,n_max", [(500, 1000), (700, 40)])
def test_bucketed_matches_dense_no_cull(weight_function, nrec, n_max):
    """max_blocks >= n_blocks: zero culling -> same capped accumulation."""
    rng = np.random.default_rng(0)
    st, po = _platform(rng, nrec, max_lz_pts=n_max)
    dp = prepare_platform(st, po)
    on = normalize_coords(dp.xyz, st.hclr[0], st.vclr[0])
    qn = normalize_coords(jnp.asarray(_points(rng, 128)),
                          st.hclr[0], st.vclr[0])
    tab = platform_dense_tables(dp.stats, st.assim_mask(0))

    a_d, g_d, c_d = dense_platform_terms(
        qn, on, tab, n_max=n_max, weight_function=weight_function)
    bp = bucket_platform(on, tab, block_size=64)
    a_b, g_b, c_b, ovf = bucketed_platform_terms(
        qn, bp, n_max=n_max, weight_function=weight_function,
        max_blocks=bp.n_blocks)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(a_b), np.asarray(a_d),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(c_b), np.asarray(c_d))


def test_bucketed_culls_and_still_matches():
    """Compact query cloud + spread obs: blocks ARE culled, results match."""
    rng = np.random.default_rng(1)
    # 2-D localization, radius small vs the domain so culling is selective
    st, po = _platform(rng, 8192, max_lz_pts=80, hclr=10.0, vclr=-1.0)
    dp = prepare_platform(st, po)
    on = normalize_coords(dp.xyz, st.hclr[0], st.vclr[0])
    # queries concentrated in one corner of the domain
    qn = normalize_coords(jnp.asarray(_points(rng, 256, scale=0.1)),
                          st.hclr[0], st.vclr[0])
    tab = platform_dense_tables(dp.stats, st.assim_mask(0))

    a_d, g_d, c_d = dense_platform_terms(
        qn, on, tab, n_max=80, weight_function=1)
    bp = bucket_platform(on, tab, block_size=64)
    m = bp.n_blocks // 2
    a_b, g_b, c_b, ovf = bucketed_platform_terms(
        qn, bp, n_max=80, weight_function=1, max_blocks=m)
    assert int(ovf) == 0, "budget must cover the corner's candidates"
    np.testing.assert_allclose(np.asarray(a_b), np.asarray(a_d),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(c_b), np.asarray(c_d))


def test_bucketed_overflow_counted():
    """A budget too small for the candidates must be *reported*, not silent."""
    rng = np.random.default_rng(2)
    st, po = _platform(rng, 2048, hclr=1e5, vclr=-1.0)
    dp = prepare_platform(st, po)
    # radius so large every block is a candidate everywhere
    on = normalize_coords(dp.xyz, 1e5, -1.0)
    qn = normalize_coords(jnp.asarray(_points(rng, 64)), 1e5, -1.0)
    tab = platform_dense_tables(dp.stats, st.assim_mask(0))
    bp = bucket_platform(on, tab, block_size=64)
    *_, ovf = bucketed_platform_terms(
        qn, bp, n_max=10_000, weight_function=0, max_blocks=4)
    assert int(ovf) == bp.n_blocks - 4


def test_update_points_auto_matches_dense():
    """End-to-end: auto (bucketed for big R) == dense, incl. Morton order."""
    rng = np.random.default_rng(3)
    # radius small vs domain so the default block budget is plentiful
    st, po = _platform(rng, 9000, hclr=12.0, vclr=1.0)  # > BUCKET_MIN_RECORDS
    dp = prepare_platform(st, po)
    q = jnp.asarray(_points(rng, 777))
    xb = jnp.asarray(rng.normal(2.0, 1.0, size=(777, K)).astype(np.float32))
    # eager call -> the exact block-budget prepass applies, so overflow
    # is zero by construction; this test exercises the wiring (Hilbert
    # point permutation, chunking, diagnostics)
    kw = dict(inflat=(K - 1) / 1.2, weight_function=1, chunk=256)

    xa_dense = update_points(xb, q, [dp], 0, method="dense", **kw)
    xa_auto, diag = update_points(xb, q, [dp], 0, method="auto",
                                  return_diagnostics=True, **kw)
    assert int(diag["bucket_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(xa_auto), np.asarray(xa_dense),
                               rtol=3e-5, atol=3e-5)


def test_plan_then_jit_matches_eager():
    """plan_max_blocks + jitted update == eager update, bitwise."""
    import jax

    from cwbnwp_letkf_tpu.ops.update import plan_max_blocks

    rng = np.random.default_rng(3)
    st, po = _platform(rng, 9000, hclr=12.0, vclr=1.0)
    dp = prepare_platform(st, po)
    q = jnp.asarray(_points(rng, 777))
    xb = jnp.asarray(rng.normal(2.0, 1.0, size=(777, K)).astype(np.float32))
    kw = dict(inflat=(K - 1) / 1.2, weight_function=1, chunk=256)

    xa_eager = np.asarray(update_points(xb, q, [dp], 0, **kw))
    budgets = plan_max_blocks(q, [dp], 0, chunk=256)
    assert budgets and all(v.max_blocks > 0 and v.block_size > 0
                           for v in budgets.values())
    fn = jax.jit(lambda xb_, q_: update_points(xb_, q_, [dp], 0,
                                               max_blocks=budgets, **kw))
    np.testing.assert_array_equal(np.asarray(fn(xb, q)), xa_eager)


def test_morton_locality():
    """Morton order: consecutive keys are spatial neighbors on a grid."""
    g = np.stack(np.meshgrid(np.arange(16.0), np.arange(16.0),
                             np.arange(4.0), indexing="ij"),
                 -1).reshape(-1, 3).astype(np.float32)
    keys = np.asarray(morton3(jnp.asarray(g)))
    order = np.argsort(keys)
    d = np.linalg.norm(np.diff(g[order], axis=0), axis=1)
    rng = np.random.default_rng(0)
    rand = rng.permutation(len(g))
    d_rand = np.linalg.norm(np.diff(g[rand], axis=0), axis=1)
    assert d.mean() < 0.25 * d_rand.mean()
