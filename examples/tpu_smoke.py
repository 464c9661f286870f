"""On-hardware smoke gate: compile + run every TPU-only code path.

Rounds 1 and 2 both lost their benchmark to Pallas compile failures that the
interpret-mode CPU tests structurally cannot see (round 1: scoped-VMEM OOM at
k=40; round 2: i64 Mosaic legalization under ``jax_enable_x64``).  This
script is the gate for that failure class: it runs under the bench's EXACT
flags (x64 on, persistent compile cache) and compiles + executes, on the
real chip:

  1. the parallel-order Pallas Jacobi kernel (even k = 40, the bench shape),
  2. the sequential-rotation Pallas Jacobi kernel (odd k = 9),
  3. the Newton-Schulz inverse-sqrt solve path (the production default),
  4. one production-grouped ``update_points_group`` with a platform large
     enough to take the BUCKETED accumulation branch,
  5. the float64 XLA-eigh group solve (the parity path the bench measures),

asserting finiteness (and reconstruction, for the eigh kernels) on each.

Run it before shipping any kernel/solver change:

    timeout 580 python examples/tpu_smoke.py

Exit code 0 = every TPU-only path compiles and runs.  Target: < 60 s warm
(first cold run pays remote-tunnel compiles, 60-120 s each).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np  # noqa: E402


def main():
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # THE flag that killed round 2: the bench enables x64 for its f64 parity
    # measurement, and every kernel must still compile under it.
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    from cwbnwp_letkf_tpu.ops.pallas_eigh import jacobi_eigh
    from cwbnwp_letkf_tpu.ops.solver import ns_invsqrt

    backend = jax.default_backend()
    interpret = backend == "cpu"
    print(f"[smoke] backend={backend} x64=on interpret={interpret}",
          flush=True)
    t_all = time.time()
    rng = np.random.default_rng(0)

    def check_eigh(k, label):
        t0 = time.time()
        y = rng.standard_normal((256, k, 30)).astype(np.float32)
        a = jnp.asarray(y @ np.transpose(y, (0, 2, 1))
                        + 3.0 * np.eye(k, dtype=np.float32))
        lam, v = jacobi_eigh(a, interpret=interpret)
        # reconstruct on HOST in float64: a device-side einsum would run at
        # the TPU's default bf16 matmul precision and measure ~3e-3 of bf16
        # noise instead of the kernel's actual error
        lam_h = np.asarray(lam, np.float64)
        v_h = np.asarray(v, np.float64)
        a_h = np.asarray(a, np.float64)
        rec = np.einsum("bik,bk,bjk->bij", v_h, lam_h, v_h)
        err = float(np.max(np.abs(rec - a_h)) / np.max(np.abs(a_h)))
        assert np.isfinite(err) and err < 1e-4, (label, err)
        print(f"[smoke] {label}: reconstruction rel-err {err:.2e} "
              f"({time.time() - t0:.1f} s)", flush=True)

    check_eigh(40, "pallas jacobi parallel-order k=40")
    check_eigh(9, "pallas jacobi sequential k=9")

    # Newton-Schulz inverse-sqrt — the production solve path.
    t0 = time.time()
    k = 40
    y = rng.standard_normal((512, k, 100)).astype(np.float32) * 0.5
    a_obs = jnp.asarray(y @ np.transpose(y, (0, 2, 1)))
    z, iters, resid = jax.jit(
        lambda a: ns_invsqrt(a, (k - 1) / 1.1, return_info=True))(a_obs)
    zi = np.asarray(z)
    assert np.isfinite(zi).all()
    print(f"[smoke] ns_invsqrt: iters={int(iters)} resid={float(resid):.2e} "
          f"({time.time() - t0:.1f} s)", flush=True)
    assert float(resid) < 1e-3, float(resid)

    # Packed Pallas Newton-Schulz kernel (the round-4 production solve) at
    # the bench k=40 AND at production k=96 (falls back to XLA there —
    # supports() is False — so the k=96 check exercises the dispatch).
    t0 = time.time()
    from cwbnwp_letkf_tpu.ops.pallas_ns import ns_invsqrt_pallas, supports

    z_p, _, resid_p = jax.jit(lambda a: ns_invsqrt_pallas(
        a, (k - 1) / 1.1, interpret=interpret, return_info=True))(a_obs)
    z_ph = np.asarray(z_p)
    assert np.isfinite(z_ph).all()
    assert float(resid_p) < 1e-3, float(resid_p)
    dmax = float(np.max(np.abs(z_ph - zi)) / np.max(np.abs(zi)))
    assert dmax < 1e-4, f"pallas NS diverges from XLA NS: {dmax}"
    print(f"[smoke] pallas NS (packed m=3): resid={float(resid_p):.2e} "
          f"vs-xla {dmax:.2e} ({time.time() - t0:.1f} s)", flush=True)

    # k=96 production shape: packed kernel unsupported (2*96 > 128) -> the
    # solver dispatch must route to XLA NS; also guards the Jacobi VMEM
    # budget logic the production config would hit.
    t0 = time.time()
    from cwbnwp_letkf_tpu.ops.pallas_eigh import (VMEM_BUDGET_BYTES,
                                                  jacobi_vmem_bytes)

    assert not supports(96)
    k96 = 96
    y96 = rng.standard_normal((128, k96, 150)).astype(np.float32) * 0.4
    a96 = jnp.asarray(y96 @ np.transpose(y96, (0, 2, 1)))
    z96, it96, r96 = jax.jit(lambda a: ns_invsqrt(
        a, (k96 - 1) / 1.1, return_info=True))(a96)
    assert np.isfinite(np.asarray(z96)).all()
    assert float(r96) < 1e-3, float(r96)
    fits = jacobi_vmem_bytes(k96) <= VMEM_BUDGET_BYTES
    print(f"[smoke] k=96 NS: iters={int(it96)} resid={float(r96):.2e} "
          f"jacobi-vmem-fits={fits} ({time.time() - t0:.1f} s)", flush=True)

    # Production-grouped update taking the BUCKETED branch (R >= 8192).
    t0 = time.time()
    from cwbnwp_letkf_tpu.obs.synthetic import (correlated_ensemble,
                                                idealized_grid,
                                                synthetic_gts_platform)
    from cwbnwp_letkf_tpu.ops.update import (plan_max_blocks,
                                             prepare_platform,
                                             update_points_group)

    pts = idealized_grid(32, 32, 8, dx_m=10e3)
    truth, xb = correlated_ensemble(rng, pts, k)
    st, po = synthetic_gts_platform(rng, pts, truth, xb, name="vr",
                                    nobs=9000, obs_err=1.0, max_lz_pts=300,
                                    extent_frac=1.0)
    dev = prepare_platform(st, po)
    pts_d = jnp.asarray(pts)
    budgets = plan_max_blocks(pts_d, [dev], 0, chunk=1024)
    assert "vr" in budgets, "bucketed branch not taken (R below threshold?)"
    xb_v = jnp.broadcast_to(jnp.asarray(xb)[:, None, :],
                            (pts.shape[0], 2, k))

    @jax.jit
    def grp(xb_a, pts_a):
        return update_points_group(
            xb_a, pts_a, [dev], (0, 0),
            inflats=((k - 1) / 1.1, (k - 1) / 1.6), weight_function=0,
            rtpp_alpha=(0.95, 0.0), rtps_alpha=(0.0, 0.95), chunk=1024,
            max_blocks=budgets, return_diagnostics=True)

    xa, diag = grp(xb_v, pts_d)
    xa_h = np.asarray(xa)
    ovf = int(diag["bucket_overflow"])
    assert np.isfinite(xa_h).all()
    assert ovf == 0, f"bucketed overflow {ovf} with planned budgets"
    moved = float(np.mean(np.abs(xa_h - np.asarray(xb)[:, None, :])))
    assert moved > 0, "update was a no-op"
    print(f"[smoke] bucketed group update: budgets={budgets} overflow=0 "
          f"mean|xa-xb|={moved:.3f} ({time.time() - t0:.1f} s)", flush=True)

    # Fused multi-group cycle (round-4 production path): shared culling +
    # per-group terms + per-outer-chunk solves in one program.
    t0 = time.time()
    from cwbnwp_letkf_tpu.ops.cycle import (CycleGroup, plan_cycle_budgets,
                                            update_points_cycle)

    cgroups = (
        CycleGroup(ivars=(0,), inflats=((k - 1) / 1.1,),
                   rtpp_alpha=(0.95,), rtps_alpha=(0.0,)),
        CycleGroup(ivars=(1,), inflats=((k - 1) / 1.6,),
                   rtpp_alpha=(0.0,), rtps_alpha=(0.95,)),
    )
    cbud = plan_cycle_budgets(pts_d, [dev], cgroups, chunk=1024,
                              subchunk=256)
    xa_c, diag_c = jax.jit(lambda x, q: update_points_cycle(
        x, q, [dev], cgroups, weight_function=0, chunk=1024, subchunk=256,
        max_blocks=cbud or None, return_diagnostics=True))(xb_v, pts_d)
    assert np.isfinite(np.asarray(xa_c)).all()
    assert int(diag_c["bucket_overflow"]) == 0
    dvs = float(np.max(np.abs(np.asarray(xa_c) - xa_h)))
    print(f"[smoke] fused cycle: overflow=0 max|cycle-pergroup|={dvs:.2e} "
          f"({time.time() - t0:.1f} s)", flush=True)

    # shard_map leg on the real chip (1-device mesh): the manual-axes
    # tracing rules differ from plain jit — round-3 found the NS
    # while_loop's unvarying carry crashing ONLY here (varying-manual-axes
    # check), a class invisible to both plain-jit TPU runs and CPU tests.
    t0 = time.time()
    from cwbnwp_letkf_tpu.parallel import make_mesh
    from cwbnwp_letkf_tpu.parallel.update import sharded_update_points_group

    mesh = make_mesh(jax.devices()[:1])
    xa_s, diag_s = sharded_update_points_group(
        mesh, xb_v, pts_d, [dev], (0, 0),
        inflats=((k - 1) / 1.1, (k - 1) / 1.6), weight_function=0,
        rtpp_alpha=(0.95, 0.0), rtps_alpha=(0.0, 0.95), chunk=1024,
        max_blocks=budgets, return_diagnostics=True)
    assert np.isfinite(np.asarray(xa_s)).all()
    assert int(diag_s["bucket_overflow"]) == 0
    print(f"[smoke] shard_map group update ok ({time.time() - t0:.1f} s)",
          flush=True)

    # float64 group solve (XLA eigh; TPU f64 is emulated) — the parity path.
    t0 = time.time()
    from cwbnwp_letkf_tpu.ops.solver import letkf_solve_group_from_normal

    nb = 256
    a64 = jnp.asarray(np.asarray(a_obs[:nb], np.float64))
    g64 = jnp.asarray(rng.standard_normal((nb, k)))
    xb64 = jnp.asarray(rng.standard_normal((nb, 2, k)))
    xa64 = jax.jit(lambda a, g, x: letkf_solve_group_from_normal(
        a, g, x, ((k - 1) / 1.1, (k - 1) / 1.6), jnp.ones(nb, bool),
        rtpp_alpha=(0.95, 0.95), rtps_alpha=(0.95, 0.95),
        solver_dtype=jnp.float64))(a64, g64, xb64)
    assert np.isfinite(np.asarray(xa64)).all()
    print(f"[smoke] f64 group solve ok ({time.time() - t0:.1f} s)",
          flush=True)

    print(f"[smoke] ALL PASS in {time.time() - t_all:.1f} s on {backend}",
          flush=True)


if __name__ == "__main__":
    main()
