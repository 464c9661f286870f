"""Multi-device scaling-efficiency harness (BASELINE.md: >=85% at N hosts).

Measures the sharded production-style group update at several mesh sizes
and reports parallel efficiency:

  efficiency(n) = wall(1 device) / (n * wall(n devices))

On real hardware run it on the full slice (JAX_PLATFORMS default); without
one, `--mock` runs on N virtual CPU devices to validate the HARNESS — mock
numbers measure host-core contention, not ICI scaling, and say nothing
about the >=85% target (stated in the output).

Usage:
  python examples/scaling_bench.py                  # real devices
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python examples/scaling_bench.py --mock

Prints one JSON line: {"walls_s": {...}, "efficiency": {...}, "mock": bool}
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mock", action="store_true",
                    help="virtual CPU devices: validates the harness only")
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--members", type=int, default=20)
    ap.add_argument("--nobs", type=int, default=5000)
    ap.add_argument("--chunk", type=int, default=2048)
    args = ap.parse_args()

    import jax

    if args.mock:
        # sitecustomize imports jax at interpreter start, so the
        # JAX_PLATFORMS env var is already consumed — the config update is
        # the only reliable way to force the virtual-CPU mesh here
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from cwbnwp_letkf_tpu.obs.synthetic import (correlated_ensemble,
                                                idealized_grid,
                                                synthetic_gts_platform)
    from cwbnwp_letkf_tpu.ops.update import prepare_platform
    from cwbnwp_letkf_tpu.parallel.mesh import make_mesh, shard_points
    from cwbnwp_letkf_tpu.parallel.update import sharded_update_points

    devs = jax.devices()
    k = args.members
    rng = np.random.default_rng(0)
    side = int(np.sqrt(args.points / 16))
    pts = idealized_grid(side, side, 16, dx_m=8e3)
    truth, xb = correlated_ensemble(rng, pts, k, n_bumps=6)
    st, po = synthetic_gts_platform(
        rng, pts, truth, xb, nobs=args.nobs, nvar=2, hclr_km=40.0,
        vclr_km=3.0, max_lz_pts=100, extent_frac=1.0)
    dp = prepare_platform(st, po)
    b = pts.shape[0]

    sizes = sorted({1, 2, len(devs)} & set(range(1, len(devs) + 1)))
    walls = {}
    for n in sizes:
        mesh = make_mesh(devs[:n])
        bb = (b // (n * args.chunk)) * n * args.chunk or n * args.chunk
        xb_s, pts_s = shard_points(mesh, jnp.asarray(xb[:bb]),
                                   jnp.asarray(pts[:bb]))

        def run():
            xa = sharded_update_points(
                mesh, xb_s, pts_s, [dp], 0, inflat=(k - 1) / 1.1,
                weight_function=0, chunk=args.chunk)
            return np.asarray(xa.reshape(-1)[:64])

        run()  # compile
        best = min(_timed(run) for _ in range(3))
        walls[n] = best
        print(f"n={n}: {best:.3f}s", file=sys.stderr, flush=True)

    eff = {n: walls[sizes[0]] * sizes[0] / (n * walls[n]) for n in sizes}

    # ---- analytic leg (round-3 verdict weak #3 / next-round #6) ----------
    # Per-shard balance + per-cycle comm volumes are MEASURED from the case;
    # the efficiency-vs-hosts curve is a labeled MODEL folding them with
    # explicit bandwidth assumptions (parallel/scaling_model.py docstring).
    from cwbnwp_letkf_tpu.parallel import scaling_model as sm

    imb = {}
    shard_counts = {}
    for chips in (4, 8, 16, 32):
        w = np.asarray(sm.shard_work(pts, [dp], 0, chips))
        if w.sum() > 0:
            imb[chips] = float(w.max() / w.mean())
        shard_counts[str(chips)] = {
            "points_per_shard": -(-b // chips),
            "work_imbalance": round(imb.get(chips, 1.0), 4),
        }
    model = sm.predict(
        b, 1, k, walls[sizes[0]], sm.obs_bytes([dp]),
        n_hosts=(1, 2, 4, 8), imbalance=imb,
        born_sharded=False)
    model["shards"] = shard_counts

    print(json.dumps({
        "walls_s": {str(n): round(w, 3) for n, w in walls.items()},
        "efficiency": {str(n): round(e, 3) for n, e in eff.items()},
        "points": b, "k": k, "mock": bool(args.mock),
        "note": ("mock CPU run: validates the harness, measures host-core "
                 "contention, NOT ICI scaling" if args.mock else
                 "real-device run"),
        "analytic": model,
    }))


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
