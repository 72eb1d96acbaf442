"""High-level register() API + CLI dispatcher tests."""

import numpy as np
import pytest

import icp_variants_tpu as icp


class TestRegister:
    def test_synthetic_pair(self):
        rng = np.random.default_rng(0)
        tgt = rng.uniform(-1, 1, (800, 3)).astype(np.float32)
        tgt[:, 2] = 0.3 * np.sin(3 * tgt[:, 0]) * np.cos(3 * tgt[:, 1])
        ang = 0.05
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
            np.float32,
        )
        src = tgt @ R.T + np.array([0.03, -0.02, 0.01], np.float32)

        res = icp.register(
            src, tgt,
            icp.ICPConfig(
                metric=icp.Metric.POINT_TO_PLANE,
                minimizer=icp.Minimizer.LINEAR,
                max_distance=0.05, n_iterations=15,
            ),
            gt_source_points=src, gt_target_points=tgt,
        )
        assert res.final_rmse < 6e-3
        assert res.pose.shape == (4, 4)
        # Recovered pose inverts the applied transform.
        inv = np.linalg.inv(res.pose)
        np.testing.assert_allclose(inv[:3, :3], R, atol=0.02)

    def test_normals_estimated_when_missing(self):
        rng = np.random.default_rng(1)
        pts = rng.standard_normal((300, 3)).astype(np.float32)
        res = icp.register(
            pts, pts, icp.ICPConfig(n_iterations=2, max_distance=1.0)
        )
        assert np.isfinite(res.pose).all()
        assert (res.num_matches > 0).all()


class TestCLI:
    def test_bunny_subcommand(self, capsys):
        from icp_variants_tpu.__main__ import main

        rc = main(["bunny", "--linear", "--metric", "1"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "final RMSE" in out

    def test_experiments_subcommand(self, tmp_path, capsys):
        from icp_variants_tpu.__main__ import main

        csv_path = tmp_path / "exp.csv"
        csv_path.write_text(
            "expName,expType,useLinear,useMetric,matchingMethod,"
            "selectionMethod,weightingMethod,useMultiresolution,"
            "numIterations,maxMatchingDist,samplingProba\n"
            "c0,bunny,1,2,0,0,0,0,4,0.0003,1.0\n"
        )
        rc = main(["experiments", str(csv_path), "--out-dir", str(tmp_path / "o")])
        assert rc == 0
        assert "final_rmse" in capsys.readouterr().out
