"""Synthetic full-cycle generator: inputs -> CLI -> analysis beats prior."""
import numpy as np

from cwbnwp_letkf_tpu.cli import main as cli_main
from cwbnwp_letkf_tpu.synthetic_case import generate_case, score_case


def test_generated_case_cycle_improves_rmse(tmp_path):
    input_dir = str(tmp_path / "input")
    output_dir = str(tmp_path / "output")
    case = generate_case(input_dir, k=6, nx=16, ny=14, nz=4, n_obs=30,
                         seed=5)

    rc = cli_main(["--input", input_dir, "--output", output_dir,
                   "--quiet", "--chunk", "256"])
    assert rc == 0

    scores = score_case(case, output_dir)
    assert scores["rmse_analysis"] < 0.7 * scores["rmse_prior"], scores


def test_generated_case_weight_function_gc(tmp_path):
    """Gaspari-Cohn weighting path also improves the analysis."""
    input_dir = str(tmp_path / "input")
    output_dir = str(tmp_path / "output")
    case = generate_case(input_dir, k=6, nx=16, ny=14, nz=4, n_obs=30,
                         seed=6, weight_function=1)

    rc = cli_main(["--input", input_dir, "--output", output_dir,
                   "--quiet", "--chunk", "256"])
    assert rc == 0
    scores = score_case(case, output_dir)
    assert scores["rmse_analysis"] < scores["rmse_prior"], scores
