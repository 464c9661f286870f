"""Driver-level variable fusion: fused groups == per-variable loop.

The fused path computes one neighbor search + eigh per gridpoint per
*localization-signature group* (driver._group_variables) instead of per
variable; results must match the reference-shaped per-variable loop.
"""
import numpy as np
import pytest

from cwbnwp_letkf_tpu.config import LetkfConfig
from cwbnwp_letkf_tpu.driver import _group_variables, prepare_platforms, run_analysis
from cwbnwp_letkf_tpu.models.state import read_ensemble
from cwbnwp_letkf_tpu.obs.base import make_platform_obs
from cwbnwp_letkf_tpu.projection import LambertProjection

from .wrf_fixtures import make_wrf_ensemble

K = 4

NML = """
&control
 nmember          = {k}
 var_update       = 'T', 'P', 'QVAPOR', 'W'
 weight_function  = 0
 wrf_mp_physics   = 4
/
&projection
 cen_lon  = 120.0
 cen_lat  = 23.7
 truelat1 = 10.0
 truelat2 = 40.0
 sta_lon  = 120.0
/
&observations
 synop_nml % use_it     = T
 synop_nml % max_lz_pts = 40
 synop_nml % hclr       = 30., 30., 30., 30.
 synop_nml % vclr       =  3.,  3.,  3.,  3.
 synop_nml % u % is_assim = T, T, T, T
 synop_nml % v % is_assim = T, T, T, T
 synop_nml % t % is_assim = T, T, T, T
 synop_nml % q % is_assim = T, T, T, T
/
&inflation
 multi_infl = 1.2, 1.1, 1.3, 1.2
 use_RTPS   = T, F, F, F
 RTPS       = 0.9, 0.9, 0.9, 0.9
 use_RTPP   = F, T, F, F
 RTPP       = 0.8, 0.8, 0.8, 0.8
/
"""


def _setup(tmp_path):
    make_wrf_ensemble(str(tmp_path), K, seed=7)
    nml = tmp_path / "input.nml"
    nml.write_text(NML.format(k=K))
    cfg = LetkfConfig.from_namelist(str(nml))
    paths = [str(tmp_path / f"wrfinput_nc_{m+1:03d}") for m in range(K)]

    proj = LambertProjection.from_config(cfg.projection)
    rng = np.random.default_rng(11)
    nobs = 25
    lat = rng.uniform(23.55, 23.85, nobs)
    lon = rng.uniform(119.85, 120.15, nobs)
    x, y = proj.lonlat_to_xy(lon, lat)
    alt = rng.uniform(0.0, 5e3, nobs)
    xyz = np.stack([x, y, alt], 1)
    obs = rng.normal(0.0, 2.0, (5, nobs))
    hdxb = obs[:, :, None] + rng.normal(0.0, 1.0, (5, nobs, K))
    err = rng.uniform(0.5, 1.5, (5, nobs))
    po = make_platform_obs(xyz, obs, hdxb, err)
    return cfg, paths, {"synop": po}


def test_fused_groups_match_per_variable(tmp_path):
    cfg, paths, obs_data = _setup(tmp_path)

    # T, P, QVAPOR share stagger + localization signature -> one group;
    # W (vstag=1) must land in its own group.
    platforms = prepare_platforms(cfg, obs_data)
    groups = _group_variables(cfg, platforms)
    sizes = sorted(len(m) for _, m in groups)
    assert sizes == [1, 3]

    ens_a = read_ensemble(paths, cfg)
    ens_b = read_ensemble(paths, cfg)
    run_analysis(cfg, ens_a, obs_data, chunk=128, fuse_variables=True)
    run_analysis(cfg, ens_b, obs_data, chunk=128, fuse_variables=False)

    for f in ("t", "p", "qv", "w"):
        a, b = ens_a.field(f), ens_b.field(f)
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5, err_msg=f)
        assert not np.array_equal(a, read_ensemble(paths, cfg).field(f)), (
            f"{f} was not updated at all")


def test_run_metrics_populated(tmp_path):
    from cwbnwp_letkf_tpu.metrics import RunMetrics

    cfg, paths, obs_data = _setup(tmp_path)
    ens = read_ensemble(paths, cfg)
    metrics = RunMetrics()
    run_analysis(cfg, ens, obs_data, chunk=128, metrics=metrics)

    d = metrics.to_dict()
    assert d["platforms"] and d["platforms"][0]["name"] == "synop"
    assert d["platforms"][0]["records"] == 25
    assert 0.0 < d["platforms"][0]["acceptance_rate"] <= 1.0
    assert len(d["groups"]) == 2  # T+P+QVAPOR fused, W separate
    assert d["total_var_points"] > 0
    assert d["var_points_per_s"] > 0
    assert "update" in d["stages_s"]
