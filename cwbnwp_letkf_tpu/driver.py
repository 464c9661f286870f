"""Top-level LETKF analysis driver: the reference's ``letkf_driver``.

Orchestrates the per-variable update loop of
/root/reference/module_letkf_core.f90:21-298 over the gridded WRF ensemble:
for each ``var_update`` entry — stagger dispatch, analysis-point coordinates
(cached per stagger class, mirroring check_coordinate letkf_core.f90:735-747),
the batched sharded point update, and the moisture positivity fix for Q*
variables (letkf_core.f90:252-278).

Where the reference scatters one variable at a time over ranks and loops
serially per gridpoint, here each variable's full point batch runs as one
sharded device computation; platform obs stats are prepared once for the
whole cycle (they are variable-independent).
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .config import LetkfConfig
from .models.state import WrfEnsemble
from .models.variables import VAR_TABLE
from .models.vcoord import analysis_points, mean_geopotential_height
from .obs.base import PlatformObs, PlatformStatic, platform_statics_from_config
from .ops.solver import tune_q
from .ops.update import DevicePlatform, prepare_platform, update_points
from .projection import LambertProjection


class StageTimer:
    """Wall-clock stage log (the reference's timer(), mpi_util.f90:66-71)."""

    def __init__(self, log=print, enabled: bool = True):
        self.t0 = time.time()
        self.log = log
        self.enabled = enabled

    def stamp(self, msg: str):
        if self.enabled:
            self.log(f"{time.time() - self.t0:7.3f} sec ==========> {msg}")


def prepare_platforms(
    cfg: LetkfConfig,
    obs_data: Dict[str, PlatformObs],
) -> List[DevicePlatform]:
    """Pair configured platform statics with their parsed obs arrays."""
    out = []
    for st in platform_statics_from_config(cfg):
        po = obs_data.get(st.name)
        if po is None or po.nrec == 0:
            continue
        if po.nvar != st.nvar:
            raise ValueError(
                f"platform {st.name}: expected {st.nvar} observed vars, "
                f"got {po.nvar}")
        out.append(prepare_platform(st, po, norain_value=cfg.norain_value))
    return out


def run_analysis(
    cfg: LetkfConfig,
    ens: WrfEnsemble,
    obs_data: Dict[str, PlatformObs],
    *,
    mesh=None,
    chunk: int = 4096,
    timer: Optional[StageTimer] = None,
) -> WrfEnsemble:
    """In-place LETKF analysis of ``ens`` for every ``var_update`` variable."""
    import jax.numpy as jnp

    from .parallel.update import sharded_update_points

    timer = timer or StageTimer(enabled=False)
    proj = LambertProjection.from_config(cfg.projection)
    platforms = prepare_platforms(cfg, obs_data)
    solver_dtype = jnp.float64 if cfg.solver_dtype == "float64" else jnp.float32
    quirk = cfg.replicate_stagger_quirk

    z_w = mean_geopotential_height(ens)
    pts_cache: Dict[Tuple[int, int], Tuple[np.ndarray, Tuple[int, int, int]]] = {}

    for ivar, vname in enumerate(cfg.var_update):
        if not vname:
            break
        spec = VAR_TABLE.get(vname)
        if spec is None:
            raise ValueError(
                f"unknown analysis variable {vname!r} "
                "(letkf_core.f90:159-161 aborts likewise)")
        if not any(dp.static.active(ivar) for dp in platforms):
            continue  # no platform assimilates this variable (letkf_core.f90:66)
        timer.stamp(f"update {vname}")

        key = (spec.hstag, spec.vstag)
        if key not in pts_cache:
            pts_cache[key] = analysis_points(
                ens, proj, spec.hstag, spec.vstag, z_w, quirk=quirk)
        pts, (ux, uy, uz) = pts_cache[key]

        full = ens.field(spec.field)
        if full.ndim == 3:  # MU: [nx, ny, k] -> treat as one level
            region = full[:ux, :uy, None, :]
        else:
            region = full[:ux, :uy, :uz, :]
        xb = region.reshape(-1, ens.k)

        kwargs = dict(
            inflat=(ens.k - 1) / cfg.inflation.multi_infl[ivar],
            weight_function=cfg.weight_function,
            use_rtpp=bool(cfg.inflation.use_rtpp[ivar]),
            rtpp_alpha=cfg.inflation.rtpp_alpha[ivar],
            use_rtps=bool(cfg.inflation.use_rtps[ivar]),
            rtps_alpha=cfg.inflation.rtps_alpha[ivar],
            solver_dtype=solver_dtype,
            chunk=chunk,
        )
        if mesh is not None:
            xa = sharded_update_points(
                mesh, jnp.asarray(xb), jnp.asarray(pts), platforms, ivar,
                **kwargs)
        else:
            xa = update_points(
                jnp.asarray(xb), jnp.asarray(pts), platforms, ivar, **kwargs)

        if spec.tune_q:
            xa = tune_q(xa)  # letkf_core.f90:252-278

        xa_np = np.asarray(xa, dtype=full.dtype).reshape(ux, uy, uz, ens.k)
        if full.ndim == 3:
            full[:ux, :uy, :] = xa_np[:, :, 0, :]
        else:
            full[:ux, :uy, :uz, :] = xa_np

    return ens
