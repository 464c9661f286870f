"""One-off: device-time split of the FUSED production cycle on the TPU.

Splits the round-4 fused-cycle wall (bench.bench_production) into
(a) accumulation only — the shared cull/gather + per-group weight and
normal-term matmuls with the k x k solves skipped, and (b) the full cycle —
to decide whether round-4's remaining optimization effort goes to the
accumulation (stacked per-mask matmuls, shared distance terms) or the solve
(packed Pallas NS batching across groups).

Run on the real chip: python examples/profile_cycle.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def _fetch(x):
    import jax

    h = np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1024])
    assert np.isfinite(h).all()
    return h


def main():
    import jax
    import jax.numpy as jnp

    from cwbnwp_letkf_tpu.ops import cycle as C
    from cwbnwp_letkf_tpu.ops.update import DevicePlatform, prepare_platform

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    pts, xb, plats = bench.build_case()
    K = bench.K
    dev = [prepare_platform(st, po) for st, po in plats]
    statics = [dp.static for dp in dev]
    arrays = [(dp.xyz, dp.stats) for dp in dev]
    xb_d = jnp.asarray(xb)
    pts_d = jnp.asarray(pts)
    b = pts.shape[0]
    groups = bench._prod_cycle_groups()
    v_tot = sum(len(g.ivars) for g in groups)
    budgets = C.plan_cycle_budgets(pts_d, dev, groups, chunk=4096,
                                   subchunk=512)
    print(f"[prof] budgets: {budgets}", flush=True)

    def accum_only(xb_a, pts_a, arrays_a):
        """The cycle's accumulation stages with the solves skipped."""
        plats_a = [DevicePlatform(static=st, xyz=xyz, stats=stats)
                   for st, (xyz, stats) in zip(statics, arrays_a)]
        q = pts_a
        plans = C._resolve_plans(plats_a, groups, method="auto",
                                 solver_dtype=jnp.float32,
                                 max_blocks=budgets)
        plans = [C._materialize_plan(p) for p in plans]
        perm = C._cycle_point_perm(q, plans, "auto")
        if perm is not None:
            q = q[perm]
        chunk, sub = 4096, 512
        n_chunks = -(-b // chunk)
        q_p = jnp.broadcast_to(q[-1:], (n_chunks * chunk, 3)).at[:b].set(q)
        n_groups = len(groups)

        def inner(qs):
            c = qs.shape[0]
            a_all = jnp.zeros((n_groups, c, K, K), jnp.float32)
            g_all = jnp.zeros((n_groups, c, K), jnp.float32)
            cnt_all = jnp.zeros((n_groups, c), jnp.int32)
            for plan in plans:
                if plan.kind == "bucketed":
                    outs, _ = C._bucketed_cycle_terms(
                        qs, plan, groups, 0, jnp.float32)
                else:
                    outs = C._dense_cycle_terms(
                        qs, plan, groups, 0, jnp.float32)
                for ci, gi in enumerate(plan.clients):
                    a_p, g_p, c_p = outs[ci]
                    a_all = a_all.at[gi].add(a_p)
                    g_all = g_all.at[gi].add(g_p)
                    cnt_all = cnt_all.at[gi].add(c_p)
            return a_all, g_all, cnt_all

        a, g, cnt = jax.lax.map(
            inner, q_p.reshape(n_chunks * chunk // sub, sub, 3))
        return a.sum(), g.sum(), cnt.sum()

    accum_fn = jax.jit(accum_only)

    @jax.jit
    def cycle_fn(xb_a, pts_a, arrays_a):
        plats_a = [DevicePlatform(static=st, xyz=xyz, stats=stats)
                   for st, (xyz, stats) in zip(statics, arrays_a)]
        xb_v = jnp.broadcast_to(xb_a[:, None, :], (b, v_tot, K))
        return C.update_points_cycle(
            xb_v, pts_a, plats_a, groups, weight_function=0,
            chunk=4096, subchunk=512, max_blocks=budgets)

    @jax.jit
    def solve_only(xb_a, pts_a):
        """Per-chunk stacked solves on synthetic normal terms."""
        from cwbnwp_letkf_tpu.ops.solver import letkf_solve_cycle_from_normal

        chunk = 4096
        n_chunks = -(-b // chunk)
        xb_v = jnp.broadcast_to(xb_a[:, None, :], (b, v_tot, K))
        xb_p = jnp.zeros((n_chunks * chunk, v_tot, K),
                         xb_v.dtype).at[:b].set(xb_v)
        n_groups = len(groups)
        sizes = [len(g.ivars) for g in groups]
        col0 = [0]
        for s_ in sizes:
            col0.append(col0[-1] + s_)

        def body(xbc):
            c = xbc.shape[0]
            a = jnp.broadcast_to(
                jnp.eye(K, dtype=jnp.float32) * 3.0, (n_groups, c, K, K))
            a = a + 0.01 * xbc[None, :, 0, :, None] * xbc[None, :, 0, None, :]
            g = jnp.ones((n_groups, c, K), jnp.float32)
            xa_cols, sdiag = letkf_solve_cycle_from_normal(
                [a[gi] for gi in range(n_groups)],
                [g[gi] for gi in range(n_groups)],
                [xbc[:, col0[gi]:col0[gi + 1], :] for gi in range(n_groups)],
                [grp.inflats for grp in groups],
                [jnp.ones((c,), bool) for _ in range(n_groups)],
                rtpp_alpha_groups=[grp.rtpp_alpha for grp in groups],
                rtps_alpha_groups=[grp.rtps_alpha for grp in groups],
                solver_dtype=jnp.float32, return_diagnostics=True)
            return jnp.concatenate(xa_cols, axis=1), sdiag["ns_residual"]

        xa, r = jax.lax.map(
            body, xb_p.reshape(n_chunks, chunk, v_tot, K))
        return xa.sum(), r.max()

    for name, fn in (("accum_only", accum_fn), ("full_cycle", cycle_fn),
                     ("solve_only", lambda x, p, a: solve_only(x, p))):
        _fetch(fn(xb_d, pts_d, arrays))
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _fetch(fn(xb_d, pts_d, arrays))
            best = min(best, time.time() - t0)
        print(f"[prof] {name}: {best:.2f} s", flush=True)


if __name__ == "__main__":
    main()
