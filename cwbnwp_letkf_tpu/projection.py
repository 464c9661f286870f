"""Lambert conformal conic projection, vectorized for JAX.

Re-designs ``module_projection.f90`` (/root/reference/module_projection.f90:
21-50).  The reference maps (lon, lat) in degrees to planar meters so grid
points and observations share one Cartesian frame for the localization
distance search.  Here the map is a pure function over arrays (any shape),
jit/vmap-friendly, and precomputes the projection constants once.

Math (two standard parallels lat1, lat2, standard longitude lon0, origin
latitude lat0; all from the ``projection`` namelist):

    n   = ln(cos lat1 / cos lat2) / ln(tan(pi/4 + lat2/2) / tan(pi/4 + lat1/2))
    F   = cos(lat1) * tan(pi/4 + lat1/2)^n / n
    rh0 = R * F / tan(pi/4 + lat0/2)^n
    rh  = R * F / tan(pi/4 + lat/2)^n
    x   = rh * sin(n * (lon - lon0))
    y   = rh0 - rh * cos(n * (lon - lon0))

which is algebraically identical to projection.f90:31-50 (the reference
writes tan via cotan and exp/log).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from .config import ProjectionConfig
from .constants import D2R, EARTH_RADIUS


class LambertProjection(NamedTuple):
    """Precomputed projection constants (proj_init, projection.f90:21-35)."""

    lon0: float
    n: float
    f: float
    rh0: float

    @staticmethod
    def from_config(cfg: ProjectionConfig) -> "LambertProjection":
        lat0 = cfg.cen_lat * D2R
        lat1 = cfg.truelat1 * D2R
        lat2 = cfg.truelat2 * D2R
        lon0 = cfg.sta_lon * D2R
        n = math.log(math.cos(lat1) / math.cos(lat2)) / math.log(
            math.tan(0.5 * (0.5 * math.pi + lat2))
            / math.tan(0.5 * (0.5 * math.pi + lat1))
        )
        f = math.cos(lat1) * math.tan(0.5 * (0.5 * math.pi + lat1)) ** n / n
        rh0 = EARTH_RADIUS * f / math.tan(0.5 * (0.5 * math.pi + lat0)) ** n
        return LambertProjection(lon0=lon0, n=n, f=f, rh0=rh0)

    def lonlat_to_xy(self, lon, lat):
        """Map lon/lat (degrees, any broadcastable shape) -> (x, y) meters.

        Mirrors lonlat_to_xy (projection.f90:37-50).
        """
        lat_r = lat * D2R
        # rh = R * F * cotan(pi/4 + lat/2)^n, via exp/log like the reference
        cot = 1.0 / jnp.tan(0.5 * (0.5 * jnp.pi + lat_r))
        rh = EARTH_RADIUS * self.f * jnp.exp(self.n * jnp.log(cot))
        dlon = self.n * (lon * D2R - self.lon0)
        x = rh * jnp.sin(dlon)
        y = self.rh0 - rh * jnp.cos(dlon)
        return x, y
