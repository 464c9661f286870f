"""Drive ``run_analysis`` itself on the TPU through the streaming CLI.

Round-3 verdict missing #3: every on-chip number so far came from calling
``update_points_group`` directly — the pipelined driver (host reads + H2D
overlapped behind the previous cycle's compute, the reference's
nonblocking-obs slot, cwb_letkf.f90:55-57 / letkf_core.f90:50) had never
run on hardware.  This script builds a synthetic production-grouped WRF
case on disk (member NetCDF files + GTS omboma text + VR radar text), runs
the REAL streaming CLI on the chip, and writes its metrics JSON — per-group
walls, ``load_s`` (host I/O hidden behind compute), bucketed overflow, NS
residuals — to ``TPU_CLI_METRICS_r05.json`` at the repo root for the
committed record.

    timeout 1400 python examples/tpu_cli_drive.py

Case: 64x64x16 domain, k=24 members, 10 analysis variables in 4 radii
groups across 6 stagger point-sets, synop 500 recs x 5 vars + VR radar
30,000 recs (bucketed path).
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np  # noqa: E402

K = 24
NX, NY, NZ = 64, 64, 16
N_VR = 30_000

#: production-shaped namelist: the input.nml radii/grouping pattern
#: (/root/reference/input.nml:24-55) at WSM5 microphysics (qr, qs)
NML = """
&control
 write_analy_mean = T
 wrf_mp_physics   = 4
 nmember          = {k}
 var_update       = 'U','V','W','T','QVAPOR','QRAIN','QSNOW','MU','P','PH'
 weight_function  = 0
/
&projection
 cen_lon  = 120.0
 cen_lat  = 23.7
 truelat1 = 10.0
 truelat2 = 40.0
 sta_lon  = 120.0
/
&observations
 radar_nml % vr % use_it   = T
 radar_nml % vr % max_lz_pts = 300
 radar_nml % vr % err_rej  = 8.
 radar_nml % vr % error    = 1.
 radar_nml % vr % hclr     = 36., 36., 12., 24., 24.,  8.,  8., 24., 24., 24.
 radar_nml % vr % vclr     =  3.,  3.,  3.,  3.,  3.,  2.,  2., -1., -1., -1.
 synop_nml % use_it        = T
 synop_nml % max_lz_pts    = 100
 synop_nml % hclr          = 50., 50., 50., 50., 50., -1., -1., 50., 50., 50.
 synop_nml % vclr          =  3.,  3.,  3.,  3.,  3., -1., -1., -1., -1., -1.
 synop_nml % u % is_assim  = T, T, T, T, T, F, F, T, T, T
 synop_nml % v % is_assim  = T, T, T, T, T, F, F, T, T, T
 synop_nml % t % is_assim  = T, T, T, T, T, F, F, T, T, T
 synop_nml % p % is_assim  = F, F, F, F, F, F, F, F, F, F
 synop_nml % q % is_assim  = T, T, T, T, T, F, F, T, T, T
/
&inflation
 multi_infl = 1.6, 1.6, 1.6, 1.6, 1.1, 1.1, 1.1, 1.1, 1.1, 1.1
 use_RTPP   = T, T, T, T, T, T, T, T, T, T
 RTPP       = 0.95, 0.95, 0.95, 0.95, 0.95, 0.95, 0.95, 0.95, 0.95, 0.95
 use_RTPS   = T, T, T, T, T, T, T, T, T, T
 RTPS       = 0.95, 0.95, 0.95, 0.95, 0.95, 0.95, 0.95, 0.95, 0.95, 0.95
/
"""


def build_case(d):
    from tests.wrf_fixtures import make_wrf_ensemble

    from cwbnwp_letkf_tpu.obs.gts import GtsRecords, write_member_file
    from cwbnwp_letkf_tpu.obs.radar import write_radar_file

    rng = np.random.default_rng(42)
    make_wrf_ensemble(d, K, seed=6, nx=NX, ny=NY, nz=NZ, dlat=0.02)
    with open(os.path.join(d, "input.nml"), "w") as fh:
        fh.write(NML.format(k=K))

    # GTS synop: 500 stations in-domain
    nobs = 500
    base = GtsRecords()
    for i in range(nobs):
        base.ids.append(f"S{i:04d}")
        base.lat.append(float(rng.uniform(23.1, 24.3)))
        base.lon.append(float(rng.uniform(119.4, 120.6)))
        base.pre.append(1000.0)
        base.obs.append([float(rng.normal(5, 1)), float(rng.normal(-3, 1)),
                         float(rng.normal(301, 1)), 1000.0,
                         float(abs(rng.normal(8e-3, 1e-3)))])
        base.qc.append([0, 0, 0, 0, 0])
        base.err.append([1.0, 1.0, 0.8, 1.0, 1e-3])
        base.level.append(1)
    for m in range(K):
        rec = GtsRecords(
            **{f: list(getattr(base, f))
               for f in ("ids", "lat", "lon", "pre", "obs", "qc", "err",
                         "level")},
            omb=[[float(rng.normal(0, s)) for s in (1, 1, 1, 1, 1e-3)]
                 for _ in range(nobs)])
        write_member_file(os.path.join(d, f"gts_letkf_{m+1:03d}"),
                          {"synop": rec})

    # VR radar: 30k records -> the bucketed culling path
    lon = rng.uniform(119.4, 120.6, N_VR)
    lat = rng.uniform(23.1, 24.3, N_VR)
    alt = rng.uniform(0.0, 8e3, N_VR)
    obs = rng.normal(0.0, 5.0, N_VR)
    for m in range(K):
        hd = obs + rng.normal(0, 2.0, N_VR)
        data = np.stack([obs, hd, lon, lat, alt], axis=1)
        write_radar_file(os.path.join(d, f"VR_letkf_{m+1:03d}"), data)


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(repo, ".jax_cache"))
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cwbnwp_letkf_tpu.cli import main as cli_main

    with tempfile.TemporaryDirectory() as d:
        t0 = time.time()
        build_case(d)
        print(f"[drive] case built ({time.time() - t0:.1f} s)", flush=True)
        out = os.path.join(d, "out")
        mpath = os.path.join(d, "metrics.json")
        t0 = time.time()
        rc = cli_main(["--input", d, "--output", out, "--stream",
                       "--metrics-json", mpath])
        wall = time.time() - t0
        assert rc == 0
        with open(mpath) as fh:
            metrics = json.load(fh)
        for m in range(K):
            p = os.path.join(out, f"wrfout_nc_{m+1:03d}")
            assert os.path.exists(p), p
        assert os.path.exists(os.path.join(out, "wrfout_nc_mean"))

    metrics["drive"] = {
        "backend": jax.default_backend(),
        "case": {"nx": NX, "ny": NY, "nz": NZ, "k": K,
                 "synop_records": 500, "vr_records": N_VR},
        "cli_wall_s": round(wall, 2),
        "mode": "--stream (one variable group resident; pipelined "
                "load->compute->store)",
    }
    out_path = os.path.join(repo, "TPU_CLI_METRICS_r05.json")
    with open(out_path, "w") as fh:
        json.dump(metrics, fh, indent=1)
        fh.write("\n")
    print(f"[drive] CLI wall {wall:.1f} s on {jax.default_backend()}; "
          f"metrics -> {out_path}", flush=True)
    for g in metrics.get("groups", []):
        print(f"[drive]   group {g}", flush=True)


if __name__ == "__main__":
    main()
