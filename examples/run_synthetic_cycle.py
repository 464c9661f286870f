"""End-to-end synthetic cycle: generate inputs, run the CLI, score vs truth.

    python examples/run_synthetic_cycle.py [workdir]

Generates a complete synthetic input directory (WRF members + namelist +
GTS omboma files around a known truth), drives the full CLI pipeline
(the reference's cwb_letkf.f90 flow), and reports analysis-mean RMSE vs
truth — which must drop relative to the prior mean.
"""
import sys
import tempfile

from cwbnwp_letkf_tpu.cli import main as cli_main
from cwbnwp_letkf_tpu.synthetic_case import generate_case, score_case


def main(workdir=None):
    workdir = workdir or tempfile.mkdtemp(prefix="letkf_case_")
    input_dir = f"{workdir}/input"
    output_dir = f"{workdir}/output"

    case = generate_case(input_dir, k=8, nx=24, ny=20, nz=6, n_obs=40)
    rc = cli_main(["--input", input_dir, "--output", output_dir,
                   "--chunk", "512"])
    assert rc == 0, "CLI failed"

    scores = score_case(case, output_dir)
    print(f"prior-mean RMSE vs truth:    {scores['rmse_prior']:.3f} K")
    print(f"analysis-mean RMSE vs truth: {scores['rmse_analysis']:.3f} K")
    assert scores["rmse_analysis"] < scores["rmse_prior"], (
        "analysis did not improve on the prior")
    print("SYNTHETIC CYCLE OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
