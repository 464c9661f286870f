"""Benchmark: analysis grid-points/s for one LETKF variable update.

Run on the real TPU chip (default env).  Prints ONE JSON line:

  {"metric": "analysis_grid_points_per_s", "value": N, "unit": "points/s",
   "vs_baseline": R}

``vs_baseline`` compares against a socket-equivalent CPU baseline measured
in-process: a per-gridpoint NumPy/LAPACK transcription of the reference's
serial solve (dsyevd + gemv per point, module_letkf_core.f90:598-700) on a
sampled subset, scaled to 48 cores (one A64FX socket, the reference's target
node, /root/reference/Makefile:8).  The reference itself publishes no numbers
(BASELINE.md), so this stand-in anchors the ratio.

Case: k=40 members, 128x128x20 idealized grid (327,680 points), one 5-var
conventional platform (2,000 records, cap 100) + one radar-style platform
(20,000 records, cap 300) — obs densities at the production caps
(/root/reference/input.nml:34,48).
"""
import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

K = 40
SOCKET_CORES = 48  # A64FX socket (FX1000 node)


def build_case():
    from cwbnwp_letkf_tpu.obs.synthetic import (
        correlated_ensemble, idealized_grid, synthetic_gts_platform)

    rng = np.random.default_rng(0)
    pts = idealized_grid(128, 128, 20, dx_m=3e3)
    truth, xb = correlated_ensemble(rng, pts, K, n_bumps=8)
    st_g, po_g = synthetic_gts_platform(
        rng, pts, truth, xb, name="synop", nobs=2000, nvar=5,
        hclr_km=50.0, vclr_km=3.0, max_lz_pts=100)
    st_r, po_r = synthetic_gts_platform(
        rng, pts, truth, xb, name="vr", nobs=20000, nvar=1,
        obs_err=1.0, hclr_km=12.0, vclr_km=2.0, max_lz_pts=300)
    return pts, xb, [(st_g, po_g), (st_r, po_r)]


def bench_tpu(pts, xb, plats):
    import jax
    import jax.numpy as jnp
    from cwbnwp_letkf_tpu.ops.update import prepare_platform, update_points

    dev = [prepare_platform(st, po) for st, po in plats]
    xb_d = jnp.asarray(xb)
    pts_d = jnp.asarray(pts)

    def run():
        return jax.block_until_ready(update_points(
            xb_d, pts_d, dev, 0, inflat=(K - 1) / 1.1, weight_function=0,
            use_rtps=True, rtps_alpha=0.9, chunk=4096))

    run()  # warm up / compile
    t0 = time.time()
    xa = run()
    dt = time.time() - t0
    assert bool(jnp.isfinite(xa).all())
    return pts.shape[0] / dt, dt


def bench_cpu_baseline(pts, xb, plats, n_sample=40):
    """Per-point NumPy/LAPACK stand-in for the reference's serial solve."""
    from cwbnwp_letkf_tpu.constants import GC1999_SQ

    rng = np.random.default_rng(1)
    sample = rng.choice(pts.shape[0], n_sample, replace=False)
    prepared = []
    for st, po in plats:
        hinv = 1.0 / (st.hclr[0] * 1e3)
        vinv = 1.0 / (st.vclr[0] * 1e3) if st.vclr[0] > 0 else 0.0
        scale = np.array([hinv, hinv, vinv])
        mean = po.hdxb.mean(-1)
        bg = po.hdxb - mean[..., None]
        omm = po.obs - mean
        err = po.error * np.array(st.err_muti)[:, None]
        prepared.append((po.xyz * scale, scale, omm, bg, err))

    t0 = time.time()
    for i in sample:
        yo_all, yb_all = [], []
        for (oxyz, scale, omm, bg, err) in prepared:
            d = oxyz - pts[i] * scale
            r2 = (d ** 2).sum(1)
            hit = np.nonzero(r2 <= GC1999_SQ)[0]
            if hit.size == 0:
                continue
            w = 1.0 / (err[:, hit] * np.exp(0.25 * r2[hit]))
            yo_all.append((omm[:, hit] * w).ravel())
            yb_all.append((bg[:, hit, :] * w[..., None]).reshape(-1, K))
        if not yo_all:
            continue
        yo = np.concatenate(yo_all)
        yb = np.concatenate(yb_all, 0).T  # [K, n]
        a = ((K - 1) / 1.1) * np.eye(K) + yb @ yb.T
        lam, vec = np.linalg.eigh(a)
        pa = (vec / lam) @ vec.T
        w_sqrt = (vec / np.sqrt(lam)) @ vec.T
        wm = pa @ (yb @ yo)
        xm = xb[i].mean()
        xp = xb[i] - xm
        _ = xm + wm @ xp + np.sqrt(K - 1.0) * (w_sqrt @ xp)
    dt = time.time() - t0
    return n_sample / dt


def main():
    pts, xb, plats = build_case()
    tpu_pps, wall = bench_tpu(pts, xb, plats)
    cpu_core_pps = bench_cpu_baseline(pts, xb, plats)
    vs = tpu_pps / (cpu_core_pps * SOCKET_CORES)
    print(json.dumps({
        "metric": "analysis_grid_points_per_s",
        "value": round(tpu_pps, 1),
        "unit": "points/s",
        "vs_baseline": round(vs, 2),
        "detail": {
            "points": int(pts.shape[0]),
            "k": K,
            "wall_s": round(wall, 2),
            "cpu_core_points_per_s": round(cpu_core_pps, 1),
            "socket_cores": SOCKET_CORES,
        },
    }))


if __name__ == "__main__":
    main()
