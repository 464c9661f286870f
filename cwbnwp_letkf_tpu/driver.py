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
from .metrics import RunMetrics
from .models.state import WrfEnsemble
from .models.variables import VAR_TABLE
from .models.vcoord import analysis_points, mean_geopotential_height
from .obs.base import PlatformObs, PlatformStatic, platform_statics_from_config
from .ops.solver import tune_q
from .ops.update import (DevicePlatform, plan_max_blocks, prepare_platform,
                         update_points, update_points_group)
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


def _group_variables(cfg, platforms):
    """Group ``var_update`` entries that can share one weight computation.

    Two variables fuse when they share (a) analysis points — identical
    stagger — and (b) the localization signature every active platform
    applies to them: ``(hclr, vclr, assim_mask)``.  Then their local obs
    sets and whitened normal terms are identical and ``A_v`` differs only by
    ``inflat_v * I`` (see ops/solver.letkf_solve_group_from_normal).  The
    reference has no such notion — it rebuilds trees and redoes every solve
    per variable (letkf_core.f90:59-297).

    Returns a list of groups ``[(key, [(ivar, vname, spec), ...]), ...]`` in
    first-appearance order; variables nothing assimilates are dropped
    (letkf_core.f90:66).
    """
    groups: Dict[tuple, list] = {}
    order = []
    for ivar, vname in enumerate(cfg.var_update):
        if not vname:
            break
        spec = VAR_TABLE.get(vname)
        if spec is None:
            raise ValueError(
                f"unknown analysis variable {vname!r} "
                "(letkf_core.f90:159-161 aborts likewise)")
        sig = []
        for dp in platforms:
            st = dp.static
            if st.active(ivar):
                sig.append((st.name, st.hclr[ivar], st.vclr[ivar],
                            st.assim_mask(ivar)))
        if not sig:
            continue
        key = (spec.hstag, spec.vstag, tuple(sig))
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append((ivar, vname, spec))
    return [(key, groups[key]) for key in order]


def run_analysis(
    cfg: LetkfConfig,
    ens: WrfEnsemble,
    obs_data: Dict[str, PlatformObs],
    *,
    mesh=None,
    chunk: int = 4096,
    timer: Optional[StageTimer] = None,
    fuse_variables: bool = True,
    metrics: Optional[RunMetrics] = None,
    device_breakdown: bool = False,
    distributed: bool = False,
) -> WrfEnsemble:
    """In-place LETKF analysis of ``ens`` for every ``var_update`` variable.

    ``fuse_variables=True`` (default) updates variables sharing a
    localization signature in one fused pass — one neighbor search + one
    eigh per gridpoint per *group* instead of per variable.  Set False for
    the reference-shaped one-variable-at-a-time loop (identical results up
    to eigh roundoff; tests/test_update.py).

    ``distributed=True`` runs the multi-host pipeline (the reference's
    multi-rank ``main``, cwb_letkf.f90:20-81): ``ens`` must hold only THIS
    process's member block (``StreamingWrfEnsemble(members=member_block())``
    — its ``k`` stays the full ensemble size and its mean geopotential is
    global), ``mesh`` must span all processes' devices, and every process
    must pass identical obs.  Per group: local member columns -> member-
    sharded assembly -> the GSPMD member->point transpose (the reference's
    ``letkf_scatter_grid`` alltoallv, module_mpi_util.f90:190-267) ->
    point-sharded fused update -> inverse transpose -> this process writes
    its own members (``letkf_gather_grid``, mpi_util.f90:269-358).
    """
    import jax.numpy as jnp

    from .parallel.update import (sharded_update_points,
                                  sharded_update_points_cycle)

    timer = timer or StageTimer(enabled=False)
    metrics = metrics if metrics is not None else RunMetrics()
    k_ens = cfg.nmember
    if distributed:
        if mesh is None:
            raise ValueError("distributed=True requires a global mesh")
        if not fuse_variables:
            raise ValueError(
                "distributed mode supports the fused path only")
        if getattr(ens, "k", k_ens) != k_ens:
            raise ValueError(
                "distributed=True needs an ensemble whose k is the FULL "
                "member count with a local member block "
                "(StreamingWrfEnsemble(members=member_block(...)))")
    if cfg.accum_precision != "high":
        from .ops.dense import set_accum_precision

        set_accum_precision(cfg.accum_precision)
    proj = LambertProjection.from_config(cfg.projection)
    platforms = prepare_platforms(cfg, obs_data)
    for dp in platforms:
        metrics.add_platform(dp)
    metrics.stage("prepare_platforms")
    solver_dtype = jnp.float64 if cfg.solver_dtype == "float64" else jnp.float32
    quirk = cfg.replicate_stagger_quirk

    if mesh is not None:
        metrics.record_mesh(mesh, ens.nx * ens.ny * ens.nz)

    z_w = mean_geopotential_height(ens)
    pts_cache: Dict[Tuple[int, int], Tuple[np.ndarray, Tuple[int, int, int]]] = {}
    infl = cfg.inflation
    n_shards = int(mesh.devices.size) if mesh is not None else 1

    def points_for(spec):
        key = (spec.hstag, spec.vstag)
        if key not in pts_cache:
            pts_cache[key] = analysis_points(
                ens, proj, spec.hstag, spec.vstag, z_w, quirk=quirk)
        return pts_cache[key]

    if not fuse_variables:
        for key, members in _group_variables(cfg, platforms):
            for ivar, vname, spec in members:
                timer.stamp(f"update {vname}")
                pts, (ux, uy, uz) = points_for(spec)
                xb = ens.load_group([spec], ux, uy, uz)[:, 0, :]
                kwargs = dict(
                    inflat=(k_ens - 1) / infl.multi_infl[ivar],
                    weight_function=cfg.weight_function,
                    use_rtpp=bool(infl.use_rtpp[ivar]),
                    rtpp_alpha=infl.rtpp_alpha[ivar],
                    use_rtps=bool(infl.use_rtps[ivar]),
                    rtps_alpha=infl.rtps_alpha[ivar],
                    solver_dtype=solver_dtype,
                    chunk=chunk,
                )
                if mesh is not None:
                    # per-shard budget planning: inside shard_map the exact
                    # prepass cannot run (traced), so unplanned budgets fall
                    # back to the heuristic and can silently drop obs
                    budgets = plan_max_blocks(
                        jnp.asarray(pts), platforms, ivar, chunk=chunk,
                        solver_dtype=solver_dtype, n_shards=n_shards)
                    xa = sharded_update_points(
                        mesh, jnp.asarray(xb), jnp.asarray(pts), platforms,
                        ivar, max_blocks=budgets or None, **kwargs)
                else:
                    xa = update_points(
                        jnp.asarray(xb), jnp.asarray(pts), platforms, ivar,
                        **kwargs)
                if spec.tune_q:
                    xa = tune_q(xa)  # letkf_core.f90:252-278
                ens.store_group([spec], np.asarray(xa)[:, None, :],
                                ux, uy, uz)
        ens.finish()
        return ens

    import jax

    from .ops.cycle import (CycleGroup, plan_cycle_budgets,
                            update_points_cycle)

    # ---- phase 0: plan one CYCLE per point set up front ------------------
    # Variable groups sharing their analysis points (same stagger) fuse
    # into ONE traced cycle program that shares point ordering, candidate
    # culling, gathers and obs tables across the groups (ops/cycle.py);
    # the per-group walls of round 3 showed the cycle accumulation-bound
    # precisely because each group re-did that shared work.  Analysis
    # points and exact budgets involve host round-trips, so planning stays
    # out of the pipelined loop below.
    def _cycle_group(members):
        ivars = tuple(iv for iv, _, _ in members)
        return CycleGroup(
            ivars=ivars,
            inflats=tuple((k_ens - 1) / infl.multi_infl[iv]
                          for iv in ivars),
            rtpp_alpha=tuple(
                infl.rtpp_alpha[iv] if infl.use_rtpp[iv] else 0.0
                for iv in ivars),
            rtps_alpha=tuple(
                infl.rtps_alpha[iv] if infl.use_rtps[iv] else 0.0
                for iv in ivars),
        )

    by_pts: Dict[Tuple[int, int], dict] = {}
    pts_order = []
    for key, members in _group_variables(cfg, platforms):
        spec0 = members[0][2]
        pkey = (spec0.hstag, spec0.vstag)
        if pkey not in by_pts:
            by_pts[pkey] = []
            pts_order.append(pkey)
        by_pts[pkey].append(members)

    plans = []
    for pkey in pts_order:
        members_lists = by_pts[pkey]
        spec0 = members_lists[0][0][2]
        pts, dims = points_for(spec0)
        pts_d = jnp.asarray(pts)
        cgroups = tuple(_cycle_group(members) for members in members_lists)
        budgets = plan_cycle_budgets(
            pts_d, platforms, cgroups, chunk=chunk,
            solver_dtype=solver_dtype, n_shards=n_shards)
        members = [mv for members in members_lists for mv in members]
        kwargs = dict(
            weight_function=cfg.weight_function,
            solver_dtype=solver_dtype,
            chunk=chunk,
        )
        plans.append(dict(members=members, groups=cgroups, pts_d=pts_d,
                          dims=dims, budgets=budgets, kwargs=kwargs))
    metrics.stage("plan_groups")

    # ---- pipelined load -> compute -> store ------------------------------
    # The reference's nonblocking obs broadcasts overlap comms with compute
    # (issued cwb_letkf.f90:55-57, awaited letkf_core.f90:50); the analog
    # here is a one-group-deep software pipeline: while the device runs
    # group g, the host reads group g+1's fields (disk-bound in streaming
    # mode) and enqueues their H2D transfer + compute behind g.  The
    # blocking result fetch of g then runs concurrently with g+1's upload.
    def launch(plan):
        specs = [spec for _, _, spec in plan["members"]]
        ux, uy, uz = plan["dims"]
        t0 = time.time()
        # single host staging buffer + one async transfer: filling [B, V, k]
        # slice by slice avoids per-variable host copies + a device-side
        # stack (round-1 did jnp.stack of V separate transfers)
        xb_host = ens.load_group(specs, ux, uy, uz)
        if distributed:
            # [B, V, k_local] local columns -> global point-sharded [B, V, k]
            # (the reference's member-rank read + scatter alltoallv)
            from .parallel.multihost import member_group_to_points

            xb_stack = member_group_to_points(mesh, xb_host, k_ens)
        else:
            xb_stack = jax.device_put(xb_host)                   # [B, V, k]
        load_s = time.time() - t0
        if mesh is not None:
            xa_stack, diag = sharded_update_points_cycle(
                mesh, xb_stack, plan["pts_d"], platforms, plan["groups"],
                max_blocks=plan["budgets"] or None,
                return_diagnostics=True, **plan["kwargs"])
        else:
            # obs arrays as jit ARGUMENTS (the shard_map path's pattern):
            # closing over the platforms would bake the obs tables into the
            # program as constants — gigabytes at radar volume, shipped to
            # the compiler per trace, and a forced recompile every cycle
            # when the obs change.  The in-program table/bucket rebuild is
            # one cheap pass per cycle call.
            statics = [dp.static for dp in platforms]

            def prog(xb_s, pts_s, arrays):
                plats = [DevicePlatform(static=st, xyz=xyz, stats=stats)
                         for st, (xyz, stats) in zip(statics, arrays)]
                return update_points_cycle(
                    xb_s, pts_s, plats, plan["groups"],
                    max_blocks=plan["budgets"] or None,
                    return_diagnostics=True, **plan["kwargs"])

            arrays = [(dp.xyz, dp.stats) for dp in platforms]
            xa_stack, diag = jax.jit(prog)(xb_stack, plan["pts_d"], arrays)
        return xa_stack, diag, load_s, time.time()

    def drain(plan, launched):
        xa_stack, diag, load_s, t_disp = launched
        members = plan["members"]
        names = "+".join(v for _, v, _ in members)
        ux, uy, uz = plan["dims"]
        specs = [spec for _, _, spec in members]
        if distributed:
            from .parallel.multihost import points_to_member_columns

            tq = {vi for vi, (_, _, spec) in enumerate(members)
                  if spec.tune_q}
            if tq:
                import jax.numpy as jnp_

                # tune_q rescales over the member axis, which is unsharded
                # in point layout — apply on-device BEFORE the inverse
                # transpose (each host only holds its own columns after)
                def _tq(x):
                    return jnp_.stack(
                        [tune_q(x[:, vi, :]) if vi in tq else x[:, vi, :]
                         for vi in range(len(specs))], axis=1)

                xa_stack = jax.jit(_tq)(xa_stack)
            xa_np = points_to_member_columns(mesh, xa_stack, k_ens)
            ens.store_group(specs, xa_np, ux, uy, uz)
        else:
            xa_np = np.empty((ux * uy * uz, len(specs), ens.k), np.float32)
            for vi, (ivar, vname, spec) in enumerate(members):
                xa = xa_stack[:, vi, :]
                if spec.tune_q:
                    xa = tune_q(xa)  # letkf_core.f90:252-278
                xa_np[:, vi, :] = np.asarray(xa)
            ens.store_group(specs, xa_np, ux, uy, uz)
        overflow = int(diag["bucket_overflow"])
        ns_resid = float(diag["ns_residual"])
        if overflow:
            # planned budgets make this impossible; reaching it means a
            # caller bypassed planning (heuristic budgets) and obs were
            # silently dropped — surface it loudly
            import warnings

            warnings.warn(
                f"group {names}: bucketed accumulation dropped "
                f"{overflow} candidate block(s); analysis is missing obs. "
                "Size max_blocks via plan_max_blocks (n_shards=mesh size).",
                RuntimeWarning, stacklevel=2)
        metrics.add_group([v for _, v, _ in members],
                          int(plan["pts_d"].shape[0]),
                          time.time() - t_disp + load_s,
                          bucket_overflow=overflow, ns_residual=ns_resid,
                          load_s=load_s)

    inflight = None
    for gi, plan in enumerate(plans):
        timer.stamp("update " + "+".join(v for _, v, _ in plan["members"]))
        if inflight is None:
            inflight = launch(plan)
            continue
        nxt = launch(plan)       # host IO + H2D overlap previous compute
        drain(plans[gi - 1], inflight)
        inflight = nxt
    if inflight is not None:
        drain(plans[-1], inflight)
    ens.finish()

    metrics.stage("update")

    if device_breakdown:
        # Per-stage device-time attribution on a sample of the first group's
        # points (profiling.device_breakdown) — the reference offers only
        # whole-stage wall clocks (mpi_util.f90:66-71).
        from .profiling import device_breakdown as _breakdown

        groups = _group_variables(cfg, platforms)
        if groups:
            ivar0, _, spec0 = groups[0][1][0]
            pts, (ux, uy, uz) = points_for(spec0)
            xb = ens.load_group([spec0], ux, uy, uz)[:, 0, :]
            metrics.device_breakdown = _breakdown(
                jnp.asarray(xb), jnp.asarray(pts), platforms, ivar0,
                weight_function=cfg.weight_function,
                inflat=(ens.k - 1) / infl.multi_infl[ivar0])
            metrics.stage("device_breakdown")
    return ens
