"""Fused multi-group cycle (ops/cycle.py) vs the per-group path.

The cycle program shares point ordering, candidate culling, gathers and
tables across variable groups; each group's math is otherwise identical to
ops/update.update_points_group, so with exact (planned) budgets the fused
analyses must match the per-group analyses to accumulation-order tolerance
(the wide-metric candidate set is a superset whose extra rows carry exactly
zero weight — see ops/cycle.py module docstring).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cwbnwp_letkf_tpu.config import MAX_VARS
from cwbnwp_letkf_tpu.obs.base import PlatformStatic
from cwbnwp_letkf_tpu.obs.synthetic import (correlated_ensemble,
                                            idealized_grid,
                                            synthetic_gts_platform)
from cwbnwp_letkf_tpu.ops.cycle import (CycleGroup, plan_cycle_budgets,
                                        update_points_cycle)
from cwbnwp_letkf_tpu.ops.update import (plan_max_blocks, prepare_platform,
                                         update_points_group)

K = 12

#: production-shaped grouping: per-group (ivars, {plat: (hclr, vclr)})
GROUPS_SPEC = (
    ((0, 1), {"synop": (50.0, 3.0), "vr": (36.0, 3.0)}),
    ((2,),   {"synop": (50.0, 3.0), "vr": (12.0, 3.0)}),
    ((3, 4), {"synop": (50.0, 3.0), "vr": (24.0, 3.0)}),
    ((5,),   {"synop": (50.0, -1.0), "vr": (24.0, -1.0)}),  # 2-D group
)


def _case(nobs_vr=9000, nx=24, nz=6):
    rng = np.random.default_rng(3)
    pts = idealized_grid(nx, nx, nz, dx_m=50e3)
    truth, xb = correlated_ensemble(rng, pts, K, n_bumps=6, length_m=2e5)

    def radii(plat):
        h = [-1.0] * MAX_VARS
        v = [-1.0] * MAX_VARS
        for ivars, rmap in GROUPS_SPEC:
            if plat in rmap:
                for iv in ivars:
                    h[iv], v[iv] = rmap[plat]
        return tuple(h), tuple(v)

    plats = []
    for name, nobs, nvar, cap, err in (
            ("synop", 300, 5, 40, 0.5),
            ("vr", nobs_vr, 1, 60, 1.0)):
        st0, po = synthetic_gts_platform(
            rng, pts, truth, xb, name=name, nobs=nobs, nvar=nvar,
            obs_err=err, max_lz_pts=cap, extent_frac=1.0)
        h, v = radii(name)
        st = PlatformStatic(
            name=name, kind=st0.kind, nvar=nvar, max_lz_pts=cap,
            hclr=h, vclr=v, err_muti=st0.err_muti, err_rej=st0.err_rej,
            is_assim=st0.is_assim)
        plats.append(prepare_platform(st, po))
    return pts, xb, plats


def _groups():
    out = []
    for ivars, _ in GROUPS_SPEC:
        nv = len(ivars)
        out.append(CycleGroup(
            ivars=tuple(ivars),
            inflats=tuple((K - 1) / (1.6 if iv < 3 else 1.1)
                          for iv in ivars),
            rtpp_alpha=(0.9,) * nv,
            rtps_alpha=(0.95,) * nv,
        ))
    return out


@pytest.mark.parametrize("weight_function", [0, 1])
def test_cycle_matches_per_group(weight_function):
    pts, xb, plats = _case()
    groups = _groups()
    b = pts.shape[0]
    v_tot = sum(len(g.ivars) for g in groups)
    rng = np.random.default_rng(11)
    xb_v = np.stack([xb * (1.0 + 0.03 * vi) + rng.standard_normal(
        (b, K)).astype(np.float32) * 0.01 for vi in range(v_tot)], axis=1)

    budgets = plan_cycle_budgets(
        jnp.asarray(pts), plats, groups, chunk=1024, subchunk=256,
        method="auto")
    xa_c, diag = update_points_cycle(
        jnp.asarray(xb_v), jnp.asarray(pts), plats, groups,
        weight_function=weight_function, chunk=1024, subchunk=256,
        max_blocks=budgets or None, return_diagnostics=True)
    assert int(diag["bucket_overflow"]) == 0

    col = 0
    for grp in groups:
        nv = len(grp.ivars)
        gb = plan_max_blocks(jnp.asarray(pts), plats, grp.ivars[0],
                             chunk=1024)
        xa_g = update_points_group(
            jnp.asarray(xb_v[:, col:col + nv]), jnp.asarray(pts), plats,
            grp.ivars, inflats=grp.inflats,
            weight_function=weight_function,
            rtpp_alpha=grp.rtpp_alpha, rtps_alpha=grp.rtps_alpha,
            chunk=1024, max_blocks=gb or None)
        np.testing.assert_allclose(
            np.asarray(xa_c[:, col:col + nv]), np.asarray(xa_g),
            rtol=0, atol=5e-4 * float(np.abs(np.asarray(xa_g)).max()),
            err_msg=f"group ivars={grp.ivars}")
        col += nv


def test_cycle_budget_overflow_counts():
    """An undersized budget must surface as overflow, not silent drops."""
    pts, xb, plats = _case(nobs_vr=9000, nx=16, nz=4)
    groups = _groups()
    b = pts.shape[0]
    v_tot = sum(len(g.ivars) for g in groups)
    xb_v = np.broadcast_to(xb[:, None, :], (b, v_tot, K)).copy()
    from cwbnwp_letkf_tpu.ops.update import BucketBudget

    budgets = plan_cycle_budgets(
        jnp.asarray(pts), plats, groups, chunk=1024, subchunk=256)
    tight = {name: BucketBudget(bb.block_size, max(1, bb.max_blocks // 8))
             for name, bb in budgets.items()}
    _, diag = update_points_cycle(
        jnp.asarray(xb_v), jnp.asarray(pts), plats, groups,
        weight_function=0, chunk=1024, subchunk=256, max_blocks=tight,
        return_diagnostics=True)
    assert int(diag["bucket_overflow"]) > 0


def test_cycle_no_active_platform_group_keeps_background():
    """A group no platform feeds must return its background untouched."""
    pts, xb, plats = _case(nobs_vr=9000, nx=16, nz=4)
    groups = list(_groups())
    # ivar 7 has hclr=-1 on every platform -> inactive group
    groups.append(CycleGroup(ivars=(7,), inflats=((K - 1) / 1.1,),
                             rtpp_alpha=(0.9,), rtps_alpha=(0.95,)))
    b = pts.shape[0]
    v_tot = sum(len(g.ivars) for g in groups)
    xb_v = np.broadcast_to(xb[:, None, :], (b, v_tot, K)).copy()
    xa = update_points_cycle(
        jnp.asarray(xb_v), jnp.asarray(pts), plats, groups,
        weight_function=0, chunk=1024, subchunk=256)
    np.testing.assert_array_equal(np.asarray(xa[:, -1]), xb_v[:, -1])
