"""One-off: per-stage device-time split of a production group on the TPU.

Measures, for the bench's UV group (synop dense + vr bucketed, k=40,
327,680 points), the wall time of (a) accumulation only (normal terms),
(b) solve only (NS from precomputed normal terms), (c) the full group
update — to decide where round-4 optimization effort goes (VERDICT round-3
weak #1/#2: is the cycle accumulation-bound or solve-bound?).

Run on the real chip: python examples/profile_groups.py
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

    from cwbnwp_letkf_tpu.ops.update import (DevicePlatform, plan_max_blocks,
                                             prepare_platform,
                                             update_points_group,
                                             _platform_accumulators,
                                             _accumulate_chunk,
                                             _maybe_morton_perm, _resolve_kind)
    from cwbnwp_letkf_tpu.ops.solver import letkf_solve_group_from_normal
    from cwbnwp_letkf_tpu.ops.neighbors import normalize_coords

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    pts, xb, plats = bench.build_case()
    K = bench.K
    dev = [prepare_platform(st, po) for st, po in plats]
    b = pts.shape[0]
    pts_d = jnp.asarray(pts)
    xb_d = jnp.asarray(xb)
    chunk = 2048

    name, ivars, _ = bench.PROD_GROUPS[0]      # UV: synop(50,3) + vr(36,3)
    iv0 = ivars[0]
    budgets = plan_max_blocks(pts_d, dev, iv0, chunk=chunk)
    print("budgets:", budgets, file=sys.stderr)

    # ---- full group update (reference number) ----
    nv = len(ivars)
    kw = dict(ivars=ivars,
              inflats=tuple((K - 1) / bench.MULTI_INFL[iv] for iv in ivars),
              weight_function=0, rtpp_alpha=(0.95,) * nv,
              rtps_alpha=(0.95,) * nv, chunk=chunk)
    statics = [dp.static for dp in dev]
    arrays = [(dp.xyz, dp.stats) for dp in dev]

    @jax.jit
    def group_fn(xb_a, pts_a, arrays_a):
        plats_a = [DevicePlatform(static=st, xyz=xyz, stats=stats)
                   for st, (xyz, stats) in zip(statics, arrays_a)]
        xb_v = jnp.broadcast_to(xb_a[:, None, :], (b, nv, K))
        return update_points_group(xb_v, pts_a, plats_a, max_blocks=budgets,
                                   **kw)

    _fetch(group_fn(xb_d, pts_d, arrays))
    t0 = time.time()
    _fetch(group_fn(xb_d, pts_d, arrays))
    t_full = time.time() - t0
    print(f"full group:   {t_full:.3f} s", file=sys.stderr)

    # ---- accumulation only ----
    active = [(dp, normalize_coords(dp.xyz, dp.static.hclr[iv0],
                                    dp.static.vclr[iv0]))
              for dp in dev if dp.static.active(iv0) and dp.xyz.shape[0] > 0]
    kinds = [_resolve_kind("auto", dp) for dp, _ in active]

    @jax.jit
    def accum_fn(pts_a, arrays_a):
        plats_a = [DevicePlatform(static=st, xyz=xyz, stats=stats)
                   for st, (xyz, stats) in zip(statics, arrays_a)]
        act = [(dp, normalize_coords(dp.xyz, dp.static.hclr[iv0],
                                     dp.static.vclr[iv0]))
               for dp in plats_a
               if dp.static.active(iv0) and dp.xyz.shape[0] > 0]
        q = pts_a
        perm, _ = _maybe_morton_perm(q, "auto", act, kinds, iv0)
        if perm is not None:
            q = q[perm]
        n_chunks = -(-b // chunk)
        b_pad = n_chunks * chunk
        q_p = jnp.broadcast_to(q[-1:], (b_pad, 3)).at[:b].set(q)
        accs = _platform_accumulators(act, kinds, iv0, budgets, jnp.float32,
                                      q_chunks=q_p.reshape(n_chunks, chunk, 3))

        def body(qc):
            return _accumulate_chunk(qc, accs, iv0, 0, jnp.float32, chunk, K)

        return jax.lax.map(body, q_p.reshape(n_chunks, chunk, 3))

    out = accum_fn(pts_d, arrays)
    _fetch(out)
    t0 = time.time()
    _fetch(accum_fn(pts_d, arrays))
    t_acc = time.time() - t0
    print(f"accumulation: {t_acc:.3f} s", file=sys.stderr)

    # ---- solve only (from precomputed normal terms, same chunked map) ----
    a_all, g_all, cnt_all, _ = out      # [NC, C, k, k] etc.
    inflats = kw["inflats"]

    @jax.jit
    def solve_fn(a_all, g_all, cnt_all, xb_a):
        n_chunks = a_all.shape[0]
        xb_v = jnp.broadcast_to(xb_a[:, None, :], (b, nv, K))
        b_pad = n_chunks * chunk
        xb_p = jnp.zeros((b_pad, nv, K), xb_v.dtype).at[:b].set(xb_v)

        def body(args):
            a, g, cnt, xbc = args
            xa, _ = letkf_solve_group_from_normal(
                a, g, xbc, inflats, cnt > 0,
                rtpp_alpha=kw["rtpp_alpha"], rtps_alpha=kw["rtps_alpha"],
                return_diagnostics=True)
            return xa

        return jax.lax.map(body, (a_all, g_all, cnt_all,
                                  xb_p.reshape(n_chunks, chunk, nv, K)))

    _fetch(solve_fn(a_all, g_all, cnt_all, xb_d))
    t0 = time.time()
    _fetch(solve_fn(a_all, g_all, cnt_all, xb_d))
    t_sol = time.time() - t0
    print(f"solve:        {t_sol:.3f} s", file=sys.stderr)
    print(f"acc+sol={t_acc + t_sol:.3f} vs full={t_full:.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
