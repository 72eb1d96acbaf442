"""Smoke test for the variant-comparison analysis tool — the matrix names
must stay runnable and the RMSE files + summary schema stable."""

import numpy as np

from icp_variants_tpu.analysis import compare_variants as cv


def test_matrix_entries_run_and_write_files(tmp_path):
    out = str(tmp_path)
    summary = cv.run_variants(["plane_linear", "gicp_linear"], out)
    assert set(summary) == {"plane_linear", "gicp_linear"}
    for name, row in summary.items():
        vals = np.loadtxt(f"{out}/{name}_RMSE.txt")
        assert vals.shape == (20,)
        assert row["final_rmse"] == float(vals[-1])
        assert 0 <= row["iters_to_90pct"] <= 20
    # The GICP extension must beat point-to-plane on the bunny pair — the
    # headline claim recorded in PARITY.md.
    assert (
        summary["gicp_linear"]["final_rmse"]
        < summary["plane_linear"]["final_rmse"] / 5
    )


def test_every_matrix_config_is_valid():
    for name, cfg in cv.VARIANTS.items():
        assert cfg.n_iterations == 20, name
        assert cfg.describe()  # banner renders for every extension combo
