"""Peak host RSS: eager whole-ensemble ingest vs the streaming pipeline.

The reference bounds per-rank memory by holding ONE analysis variable in
distributed memory at a time (scatter -> update -> gather looped over <= 16
variables, /root/reference/module_letkf_core.f90:59-297).  The eager
``read_ensemble`` path instead loads every prognostic field up front — at
production scale (450x450x52 x 96 members, /root/reference/input.nml:6)
that is ~4 GB/field, > 80 GB resident.  ``--stream``
(models/state.StreamingWrfEnsemble) restores the reference's bound: one
variable group resident at a time.

This harness runs the SAME analysis twice in fresh subprocesses (eager /
streaming) on a synthetic WRF ensemble and reports each child's
``ru_maxrss``.  Host-memory measurement only, so the update runs on CPU —
device placement does not change host residency.

Measured on this image (one eager field-equivalent = nx*ny*nz*k*4 bytes;
the ~0.8 GB Python+JAX runtime floor is common to both):

    nx=ny=96, nz=24, k=16 (14 MB/field):   eager  787 MB, stream  909 MB
    nx=ny=192, nz=30, k=24 (101 MB/field): eager 2322 MB, stream 1783 MB

At toy scale the runtime floor plus the pipeline's two-groups-in-flight
staging dominates and streaming has no edge; at 101 MB/field the eager
path's ~12 resident fields (~1.2 GB) already cost 0.5 GB more than
streaming's bounded staging, and the gap grows LINEARLY with field size
while streaming stays at O(groups-in-flight staging): at the production
shape (4 GB/field, ~20 fields) eager needs > 80 GB of host RAM where
streaming holds a few field-equivalents.

Usage:  python examples/memory_bench.py [--nx 96 --nz 24 --k 16]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

NML = """
&control
 nmember          = {k}
 var_update       = 'U', 'V', 'T', 'QVAPOR', 'P', 'PH', 'MU'
 weight_function  = 0
 wrf_mp_physics   = 4
/
&projection
 cen_lon  = 120.0
 cen_lat  = 23.7
 truelat1 = 10.0
 truelat2 = 40.0
 sta_lon  = 120.0
/
&observations
 synop_nml % use_it     = T
 synop_nml % max_lz_pts = 50
 synop_nml % hclr       = 30., 30., 30., 30., 30., 30., 30.
 synop_nml % vclr       =  3.,  3.,  3.,  3., -1., -1., -1.
 synop_nml % u % is_assim = T, T, F, F, F, F, F
 synop_nml % t % is_assim = F, F, T, F, T, T, T
 synop_nml % q % is_assim = F, F, F, T, F, F, F
/
&inflation
 multi_infl = 1.2, 1.2, 1.2, 1.1, 1.2, 1.2, 1.2
 use_RTPS   = F, F, F, F, F, F, F
 use_RTPP   = F, F, F, F, F, F, F
/
"""


def build_case(workdir, nx, ny, nz, k):
    import numpy as np

    from cwbnwp_letkf_tpu.obs.gts import GtsRecords, write_member_file
    from wrf_fixtures import make_wrf_ensemble

    make_wrf_ensemble(workdir, k, seed=1, nx=nx, ny=ny, nz=nz)
    with open(os.path.join(workdir, "input.nml"), "w") as fh:
        fh.write(NML.format(k=k))
    rng = np.random.default_rng(5)
    nobs = 200
    base = GtsRecords()
    for i in range(nobs):
        base.ids.append(f"S{i:04d}")
        base.lat.append(float(rng.uniform(23.5, 23.9)))
        base.lon.append(float(rng.uniform(119.8, 120.2)))
        base.pre.append(1000.0)
        base.obs.append([float(rng.normal(5, 1)), float(rng.normal(-3, 1)),
                         float(rng.normal(301, 1)), 1000.0,
                         float(abs(rng.normal(8e-3, 1e-3)))])
        base.qc.append([0] * 5)
        base.err.append([1.0, 1.0, 0.8, 1.0, 1e-3])
        base.level.append(1)
    for m in range(k):
        rec = GtsRecords(
            **{f: list(getattr(base, f))
               for f in ("ids", "lat", "lon", "pre", "obs", "qc", "err",
                         "level")},
            omb=[[float(rng.normal(0, s)) for s in (1, 1, 1, 1, 1e-3)]
                 for _ in range(nobs)])
        write_member_file(os.path.join(workdir, f"gts_letkf_{m+1:03d}"),
                          {"synop": rec})


def run_child(mode, workdir, outdir):
    """One analysis in ``mode``; prints its own peak RSS as JSON."""
    import resource

    import jax

    jax.config.update("jax_platforms", "cpu")

    from cwbnwp_letkf_tpu.cli import main as cli_main

    args = ["--input", workdir, "--output", outdir, "--quiet",
            "--no-mesh", "--chunk", "4096"]
    if mode == "stream":
        args.append("--stream")
    rc = cli_main(args)
    assert rc == 0
    peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(json.dumps({"mode": mode, "peak_rss_mb": round(peak_kb / 1024.0)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=96)
    ap.add_argument("--ny", type=int, default=96)
    ap.add_argument("--nz", type=int, default=24)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--child", choices=("eager", "stream"), default=None)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    if args.child:
        run_child(args.child, args.workdir, args.outdir)
        return

    field_mb = args.nx * args.ny * args.nz * args.k * 4 / 2**20
    print(f"case: {args.nx}x{args.ny}x{args.nz} k={args.k} "
          f"(one ensemble field = {field_mb:.0f} MB)")
    with tempfile.TemporaryDirectory() as tmp:
        workdir = os.path.join(tmp, "input")
        os.makedirs(workdir)
        build_case(workdir, args.nx, args.ny, args.nz, args.k)
        for mode in ("eager", "stream"):
            outdir = os.path.join(tmp, f"out_{mode}")
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child", mode, "--workdir", workdir, "--outdir", outdir,
                   "--nx", str(args.nx), "--ny", str(args.ny),
                   "--nz", str(args.nz), "--k", str(args.k)]
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 check=True)
            print(out.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    main()
