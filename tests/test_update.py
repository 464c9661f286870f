"""End-to-end per-variable update vs a pure-Python oracle.

The oracle walks every point/platform/record/variable exactly like
letkf_yoyb + letkf_solve (module_letkf_core.f90:300-700): brute-force radius
search, per-obs QC/rejection/whitening, then the k-by-k solve.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from cwbnwp_letkf_tpu.config import MAX_VARS
from cwbnwp_letkf_tpu.constants import GC1999_SQ
from cwbnwp_letkf_tpu.obs.base import PlatformStatic, make_platform_obs
from cwbnwp_letkf_tpu.ops.update import (prepare_platform, update_points,
                                         update_points_group)

from . import reference_impl as ref

K = 6
NORAIN = -5.0


def _mk_gts_platform(rng, nrec, nvar, name="synop"):
    xyz = np.stack([
        rng.uniform(-2e5, 2e5, nrec),
        rng.uniform(-2e5, 2e5, nrec),
        rng.uniform(0.0, 1.5e4, nrec),
    ], axis=1)
    obs = rng.normal(0.0, 2.0, (nvar, nrec))
    hdxb = obs[:, :, None] + rng.normal(0.0, 1.0, (nvar, nrec, K))
    error = rng.uniform(0.5, 2.0, (nvar, nrec))
    qc = np.zeros((nvar, nrec, K))
    qc[:, ::9, :] = -1.0  # some all-member QC failures
    po = make_platform_obs(xyz, obs, hdxb, error, qc, dtype=np.float64)
    st = PlatformStatic(
        name=name, kind="gts", nvar=nvar, max_lz_pts=64,
        hclr=tuple([60.0] * MAX_VARS),
        vclr=tuple([3.0] * MAX_VARS),
        err_muti=tuple(0.8 + 0.1 * v for v in range(nvar)),
        err_rej=tuple([5.0] * nvar),
        is_assim=tuple(tuple([v != 1] * MAX_VARS) for v in range(nvar)),
    )
    return st, po


def _mk_dbz_platform(rng, nrec):
    xyz = np.stack([
        rng.uniform(-1e5, 1e5, nrec),
        rng.uniform(-1e5, 1e5, nrec),
        rng.uniform(0.0, 1.2e4, nrec),
    ], axis=1)
    obs = rng.normal(20.0, 10.0, nrec)
    obs[::5] = NORAIN  # no-rain obs
    hdxb = obs[None, :, None] + rng.normal(0.0, 3.0, (1, nrec, K))
    hdxb[0, ::10, :] = NORAIN  # no-rain ensemble at some records
    po = make_platform_obs(xyz, obs, hdxb, dtype=np.float64)
    st = PlatformStatic(
        name="dbz", kind="radar", nvar=1, max_lz_pts=128,
        hclr=tuple([12.0] * MAX_VARS),
        vclr=tuple([-1.0] * MAX_VARS),  # 2-D localization
        err_muti=(2.5,), err_rej=(20.0,),
        is_assim=(tuple([True] * MAX_VARS),), is_dbz=True,
    )
    return st, po


def _oracle(xb, pts, plats, ivar, inflat, wf, **flags):
    b, k = xb.shape
    xa = np.array(xb, np.float64, copy=True)
    for i in range(b):
        yo, yb = [], []
        for st, po in plats:
            if st.hclr[ivar] <= 0 or not any(st.assim_mask(ivar)):
                continue
            hinv = 1.0 / (st.hclr[ivar] * 1e3)
            vinv = 1.0 / (st.vclr[ivar] * 1e3) if st.vclr[ivar] > 0 else 0.0
            d = (po.xyz - pts[i]) * np.array([hinv, hinv, vinv])
            r2 = (d ** 2).sum(1)
            for r in np.nonzero(r2 <= GC1999_SQ)[0]:
                for v in range(st.nvar):
                    if not st.assim_mask(ivar)[v]:
                        continue
                    if not (po.qc[v, r] >= 0).any():
                        continue
                    ok, yo1, yb1 = ref.whiten_obs(
                        po.obs[v, r], po.hdxb[v, r], po.error[v, r] * st.err_muti[v],
                        float(r2[r]), st.err_rej[v], wf,
                        norain_value=(NORAIN if st.is_dbz else None))
                    if ok:
                        yo.append(yo1)
                        yb.append(yb1)
        if yo:
            xa[i] = ref.letkf_solve(xb[i], np.array(yo),
                                    np.stack(yb, axis=1), inflat, **flags)
    return xa


@pytest.mark.parametrize("wf", [0, 1])
def test_update_points_matches_oracle(wf):
    rng = np.random.default_rng(21)
    plats = [_mk_gts_platform(rng, 80, 3), _mk_dbz_platform(rng, 60)]
    b = 40
    pts = np.stack([
        rng.uniform(-2e5, 2e5, b),
        rng.uniform(-2e5, 2e5, b),
        rng.uniform(0.0, 1.5e4, b),
    ], axis=1)
    pts[:5, 0] += 5e6  # far outside every localization ball -> must skip
    xb = rng.normal(10.0, 3.0, (b, K))
    inflat = (K - 1) / 1.4
    ivar = 2

    dev = [prepare_platform(st, po, norain_value=NORAIN) for st, po in plats]
    xa = update_points(
        jnp.asarray(xb), jnp.asarray(pts), dev, ivar,
        inflat=inflat, weight_function=wf, solver_dtype=jnp.float64,
        chunk=16)
    expected = _oracle(xb, pts, plats, ivar, inflat, wf)
    np.testing.assert_allclose(np.asarray(xa), expected, rtol=1e-8, atol=1e-10)
    # some points must actually have been updated, some skipped
    changed = np.abs(np.asarray(xa) - xb).max(1) > 0
    assert changed.any() and (~changed).any()


def test_update_points_rtpp_rtps():
    rng = np.random.default_rng(22)
    plats = [_mk_gts_platform(rng, 50, 2)]
    b = 12
    pts = np.stack([rng.uniform(-1e5, 1e5, b), rng.uniform(-1e5, 1e5, b),
                    rng.uniform(0, 1e4, b)], axis=1)
    xb = rng.normal(0.0, 1.0, (b, K))
    inflat = (K - 1) / 1.0
    dev = [prepare_platform(st, po) for st, po in plats]
    xa = update_points(
        jnp.asarray(xb), jnp.asarray(pts), dev, 0,
        inflat=inflat, weight_function=0, use_rtpp=True, rtpp_alpha=0.9,
        use_rtps=True, rtps_alpha=0.7, solver_dtype=jnp.float64, chunk=12)
    expected = _oracle(xb, pts, plats, 0, inflat, 0, use_rtpp=True,
                       rtpp_alpha=0.9, use_rtps=True, rtps_alpha=0.7)
    np.testing.assert_allclose(np.asarray(xa), expected, rtol=1e-8, atol=1e-10)


def test_update_points_inactive_variable_is_noop():
    rng = np.random.default_rng(23)
    st, po = _mk_gts_platform(rng, 30, 2)
    st_off = PlatformStatic(**{**st.__dict__, "hclr": tuple([-1.0] * MAX_VARS)})
    xb = rng.normal(size=(8, K))
    pts = np.zeros((8, 3))
    xa = update_points(jnp.asarray(xb), jnp.asarray(pts),
                       [prepare_platform(st_off, po)], 0,
                       inflat=5.0, weight_function=0)
    np.testing.assert_array_equal(np.asarray(xa), xb)


def test_update_points_group_matches_per_variable():
    """Fused group path == per-variable path for each ivar in the group.

    The group members share localization (hclr/vclr/is_assim constant across
    MAX_VARS in the fixture) but differ in inflation and relaxation; the
    eigenvector-sharing trick (A_v = a_obs + inflat_v I) must reproduce each
    separately-solved variable.
    """
    rng = np.random.default_rng(24)
    plats = [_mk_gts_platform(rng, 70, 3), _mk_dbz_platform(rng, 50)]
    b, v = 30, 3
    pts = np.stack([rng.uniform(-2e5, 2e5, b), rng.uniform(-2e5, 2e5, b),
                    rng.uniform(0, 1.4e4, b)], axis=1)
    xb = rng.normal(8.0, 2.0, (b, v, K))
    ivars = (0, 2, 3)
    inflats = tuple((K - 1) / rho for rho in (1.0, 1.4, 1.1))
    rtpp = (0.0, 0.9, 0.0)
    rtps = (0.7, 0.0, 0.0)

    dev = [prepare_platform(st, po, norain_value=NORAIN) for st, po in plats]
    grouped = update_points_group(
        jnp.asarray(xb), jnp.asarray(pts), dev, ivars,
        inflats=inflats, weight_function=0,
        rtpp_alpha=rtpp, rtps_alpha=rtps,
        solver_dtype=jnp.float64, chunk=16)
    for vi, ivar in enumerate(ivars):
        single = update_points(
            jnp.asarray(xb[:, vi]), jnp.asarray(pts), dev, ivar,
            inflat=inflats[vi], weight_function=0,
            use_rtpp=rtpp[vi] > 0, rtpp_alpha=rtpp[vi],
            use_rtps=rtps[vi] > 0, rtps_alpha=rtps[vi],
            solver_dtype=jnp.float64, chunk=16)
        np.testing.assert_allclose(
            np.asarray(grouped[:, vi]), np.asarray(single),
            rtol=1e-8, atol=1e-9)


def test_update_points_group_inactive_is_noop():
    rng = np.random.default_rng(25)
    st, po = _mk_gts_platform(rng, 30, 2)
    st_off = PlatformStatic(**{**st.__dict__, "hclr": tuple([-1.0] * MAX_VARS)})
    xb = rng.normal(size=(8, 2, K))
    from cwbnwp_letkf_tpu.ops.update import update_points_group
    xa = update_points_group(
        jnp.asarray(xb), jnp.asarray(np.zeros((8, 3))),
        [prepare_platform(st_off, po)], (0, 1),
        inflats=(5.0, 5.0), weight_function=0,
        rtpp_alpha=(0.0, 0.0), rtps_alpha=(0.0, 0.0))
    np.testing.assert_array_equal(np.asarray(xa), xb)
