"""Lambert projection vs the float64 transcription of projection.f90."""
import jax.numpy as jnp
import numpy as np

from cwbnwp_letkf_tpu.config import ProjectionConfig
from cwbnwp_letkf_tpu.projection import LambertProjection

from . import reference_impl as ref


def test_lonlat_to_xy_matches_reference():
    cfg = ProjectionConfig()  # production defaults (config.f90:71-75)
    proj = LambertProjection.from_config(cfg)
    rng = np.random.default_rng(7)
    lons = rng.uniform(cfg.sta_lon - 15, cfg.sta_lon + 15, 64)
    lats = rng.uniform(8.0, 42.0, 64)
    x, y = proj.lonlat_to_xy(jnp.asarray(lons), jnp.asarray(lats))
    for i in range(64):
        ex, ey = ref.lambert_lonlat_to_xy(
            lons[i], lats[i], cfg.cen_lat, cfg.truelat1, cfg.truelat2,
            cfg.sta_lon)
        np.testing.assert_allclose(float(x[i]), ex, rtol=1e-9)
        np.testing.assert_allclose(float(y[i]), ey, rtol=1e-9)


def test_origin_maps_near_zero():
    cfg = ProjectionConfig()
    proj = LambertProjection.from_config(cfg)
    x, y = proj.lonlat_to_xy(jnp.asarray(cfg.sta_lon), jnp.asarray(cfg.cen_lat))
    assert abs(float(x)) < 1e-6
    assert abs(float(y)) < 1e-6
