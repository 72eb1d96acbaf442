"""Workload-level end-to-end tests: TUM room tracking, ETH benchmark sweep,
experiment harness (references: main.cpp:183-514, experiment.cpp)."""

import os

import numpy as np
import pytest
from PIL import Image

from icp_variants_tpu.data import pcd_io
from icp_variants_tpu.pipeline.config import (
    ICPConfig, Matching, Metric, Minimizer, Selection,
)
from icp_variants_tpu.workloads import eth, experiments, room

H, W = 48, 64


def make_wavy_tum_dataset(root, n_frames=3, shift_per_frame=0.005):
    """Small TUM sequence: a wavy surface translated along +x each frame,
    with a consistent ground-truth trajectory."""
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    fx = 525.0 * W / 640
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    fy = 525.0 * H / 480
    vv, uu = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")

    depth_lines, rgb_lines, gt_lines = [], [], []
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        ts = 100.0 + i * 0.1
        # Surface z(x, y) in WORLD coordinates; camera i at x = -shift*i
        # looking down +z (camera coords = world shifted by +shift*i in x).
        # depth(u,v) solves z for the pixel ray; with a height field over x,
        # iterate once (wave is gentle).
        shift = shift_per_frame * i
        z = np.full((H, W), 2.0)
        for _ in range(8):
            x_world = (uu - cx) / fx * z - shift
            y_world = (vv - cy) / fy * z
            z = 2.0 + 0.12 * np.sin(4.0 * x_world) * np.cos(4.0 * y_world)
        depth_png = np.round(z * 5000).astype(np.uint16)
        dname, cname = f"depth/{i}.png", f"rgb/{i}.png"
        Image.fromarray(depth_png).save(os.path.join(root, dname))
        rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        Image.fromarray(rgb, "RGB").save(os.path.join(root, cname))
        depth_lines.append(f"{ts} {dname}")
        rgb_lines.append(f"{ts} {cname}")
        # Camera-to-world: translation (-shift, 0, 0); quaternion identity.
        gt_lines.append(f"{ts} {-shift} 0 0 0 0 0 1")
    for name, lines in (
        ("depth.txt", depth_lines), ("rgb.txt", rgb_lines),
        ("groundtruth.txt", gt_lines),
    ):
        with open(os.path.join(root, name), "w") as f:
            f.write("# h\n# h\n# h\n" + "\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tum")
    make_wavy_tum_dataset(str(d))
    return str(d)


class TestRoom:
    @pytest.mark.parametrize("matching", [Matching.KNN, Matching.PROJECTIVE])
    def test_tracks_frames(self, tum_dir, matching, monkeypatch):
        from icp_variants_tpu.data import tum as tum_mod

        cfg = room.default_config(
            metric=Metric.POINT_TO_PLANE,
            minimizer=Minimizer.LINEAR,
            matching=matching,
            n_iterations=25,
            max_distance=0.1,
        )
        # Shrink the sensor to the synthetic resolution for test speed.
        old_init = tum_mod.VirtualSensor.__init__

        def patched(self, dataset_dir, increment=1, width=640, height=480):
            old_init(self, dataset_dir, increment=increment, width=W, height=H)

        monkeypatch.setattr(tum_mod.VirtualSensor, "__init__", patched)
        res = room.reconstruct_room(tum_dir, cfg, frame_step=1, max_frames=1, seed=0)

        assert len(res.final_rmse) == 2
        for init_r, final_r in zip(res.initial_rmse, res.final_rmse):
            # Every frame improves on its initial error. k-NN correspondences
            # slide on smooth surfaces and stall at the NN fixed point, so
            # only projective gets an absolute accuracy bound — the same
            # k-NN-vs-projective gap the reference presentation reports on
            # TUM freiburg1_xyz.
            assert final_r < max(init_r, 1e-4) * 0.95
        assert res.final_rmse[-1] < 8e-3


def make_eth_sequence(tmp_path, n_points=400, n_pairs=2):
    rng = np.random.default_rng(0)
    data_dir = tmp_path / "plain"
    data_dir.mkdir()
    rows = []
    for i in range(n_pairs):
        # A wavy surface; source = target transformed by a known pose.
        xy = rng.uniform(-2, 2, (n_points, 2))
        z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        tgt = np.column_stack([xy, z]).astype(np.float32)
        ang = 0.08
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
            np.float32,
        )
        t = np.array([0.05, -0.03, 0.02], np.float32)
        # GT pose maps original source -> perturbed; the driver perturbs the
        # source with it, so store source = target here and pose = (R, t).
        pcd_io.write_pcd(str(data_dir / f"t{i}.pcd"), tgt)
        pcd_io.write_pcd(str(data_dir / f"s{i}.pcd"), tgt)
        pose = np.concatenate([R, t[:, None]], axis=1).reshape(-1)
        rows.append(
            f"{i},s{i}.pcd,t{i}.pcd,0.9," + ",".join(f"{x:.6f}" for x in pose)
        )
    csv_path = tmp_path / "plain_global.csv"
    with open(csv_path, "w") as f:
        f.write("id,source,target,overlap," + ",".join(f"t{k}" for k in range(12)) + "\n")
        f.write("\n".join(rows) + "\n")
    return str(csv_path)


class TestETH:
    def test_benchmark_sweep(self, tmp_path):
        csv_path = make_eth_sequence(tmp_path)
        cfg = eth.default_config(
            metric=Metric.POINT_TO_PLANE,
            minimizer=Minimizer.LINEAR,
            n_iterations=15,
            max_distance=0.05,
        )
        res = eth.align_eth(csv_path, cfg, pose_scaling=0.5, seed=0)
        assert len(res.pairs) == 2
        for p in res.pairs:
            assert p.final_error < p.initial_error * 0.5
            assert p.final_rmse < p.initial_rmse * 0.5
        assert 0 <= res.index_min_error < 2

    def test_pose_scaling_validation(self, tmp_path):
        csv_path = make_eth_sequence(tmp_path, n_pairs=1)
        with pytest.raises(ValueError):
            eth.align_eth(csv_path, pose_scaling=0.0)

    def test_scale_pose_identity(self):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = (1, 2, 3)
        half = eth.scale_pose(pose, 0.5)
        np.testing.assert_allclose(half[:3, 3], (0.5, 1.0, 1.5), atol=1e-6)
        np.testing.assert_allclose(half[:3, :3], np.eye(3), atol=1e-6)


class TestExperiments:
    def test_bunny_rows_and_resume(self, tmp_path):
        csv_path = tmp_path / "exp.csv"
        with open(csv_path, "w") as f:
            f.write(
                "expName,expType,useLinear,useMetric,matchingMethod,"
                "selectionMethod,weightingMethod,useMultiresolution,"
                "numIterations,maxMatchingDist,samplingProba\n"
            )
            f.write("b0,bunny,1,1,0,0,0,0,5,0.0003,1.0\n")
            f.write("b1,bunny,1,2,0,0,1,0,5,0.0003,1.0\n")
        out_dir = str(tmp_path / "out")
        summary = experiments.run_experiments(str(csv_path), out_dir=out_dir)
        assert len(summary) == 2
        assert os.path.exists(os.path.join(out_dir, "b0_RMSE.txt"))
        vals = np.loadtxt(os.path.join(out_dir, "b0_RMSE.txt"))
        assert vals.shape == (5,)
        # Resume: re-run must SKIP completed rows, not recompute them —
        # summary equality alone also holds for a deterministic full
        # re-run, so observe skipping via the output file's mtime.
        rmse_path = os.path.join(out_dir, "b0_RMSE.txt")
        mtime = os.path.getmtime(rmse_path)
        summary2 = experiments.run_experiments(str(csv_path), out_dir=out_dir)
        assert summary2 == summary
        assert os.path.getmtime(rmse_path) == mtime


class TestReferenceMatrix:
    def test_shipped_24_config_matrix_parses(self):
        """The reference's full 24-config bunny matrix
        (Data/bunny_experiments.csv:2-25) must translate row-for-row into
        valid ICPConfigs through the 11-column schema."""
        rows = experiments.read_experiment_csv("assets/bunny_experiments.csv")
        assert len(rows) == 24
        assert {r.exp_type for r in rows} == {"bunny"}
        assert len({r.name for r in rows}) == 24
        metrics = {r.config.metric for r in rows}
        assert metrics == {Metric.POINT_TO_POINT, Metric.POINT_TO_PLANE,
                           Metric.SYMMETRIC}
        assert {r.config.minimizer for r in rows} == {
            Minimizer.LINEAR, Minimizer.NONLINEAR_LM,
        }
        assert any(r.config.multi_resolution for r in rows)
        assert any(r.config.selection == Selection.RANDOM for r in rows)
        for r in rows:
            assert r.config.n_iterations == 20
            assert r.config.max_distance == 0.0003  # main.cpp:61-75


class TestHeadlineConfigParity:
    """One config source of truth (ROADMAP r3): the bench headline arm IS
    the production ETH sweep's config, and both obtain their matcher
    plumbing (kd gating) through the same config-driven gates — so
    `python -m icp_variants_tpu eth` can never silently run a matcher
    combination the benchmark didn't measure."""

    def test_bench_headline_equals_cli_eth_config(self):
        import bench

        # CLI equivalent of the headline workload:
        #   python -m icp_variants_tpu eth poses.csv \
        #       --metric 2 --linear --selection 1 --selection-proba 0.01
        cli_cfg = eth.default_config(
            metric=Metric.SYMMETRIC, minimizer=Minimizer.LINEAR,
            selection=Selection.RANDOM, selection_proba=0.01,
        )
        assert bench.headline_config() == cli_cfg

    def test_headline_matcher_gates(self):
        import bench
        from icp_variants_tpu.pipeline import icp

        cfg = bench.headline_config()
        # The measured-winner defaults: warm matcher on
        # (scripts/evidence/warm_ab_sweep_log.txt: 12.7 vs 11.5 pairs/s); the
        # losing block-aligned query reorder is deleted outright.
        assert cfg.kd_warm_start
        assert icp._kd_selection_applies(cfg)
        assert not hasattr(cfg, "kd_query_order")


class TestETHBatch:
    def test_batch_matches_sequential(self, tmp_path):
        csv_path = make_eth_sequence(tmp_path, n_pairs=3)
        cfg = eth.default_config(
            metric=Metric.POINT_TO_PLANE,
            minimizer=Minimizer.LINEAR,
            n_iterations=8,
            max_distance=0.05,
        )
        seq = eth.align_eth(csv_path, cfg, pose_scaling=0.5, capacity=512, seed=0)
        bat = eth.align_eth_batch(
            csv_path, cfg, pose_scaling=0.5, capacity=512, batch_size=2, seed=0
        )
        assert len(bat.pairs) == 3
        for p_seq, p_bat in zip(seq.pairs, bat.pairs):
            # Same convergence basin; PRNG streams differ (batch splits keys
            # differently), so allow small slack.
            assert abs(p_seq.final_error - p_bat.final_error) < max(
                0.2 * p_seq.final_error, 1e-3
            )
            assert p_bat.final_error < p_bat.initial_error * 0.5

    def test_sweep_checkpoint_resume(self, tmp_path):
        """Checkpointed sweep: a rerun resumes completed batches verbatim,
        a truncated (crash-simulating) checkpoint recomputes only the
        missing batch bit-identically, and a checkpoint from a different
        config is ignored."""
        csv_path = make_eth_sequence(tmp_path, n_pairs=4)
        cfg = eth.default_config(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            n_iterations=6, max_distance=0.05,
        )
        ck = str(tmp_path / "ckpt")
        kw = dict(pose_scaling=0.5, capacity=512, batch_size=2, seed=0,
                  checkpoint_dir=ck)
        full = eth.align_eth_batch(csv_path, cfg, **kw)
        assert len(full.pairs) == 4

        # Complete checkpoint: everything restored, nothing recomputed.
        resumed = eth.align_eth_batch(csv_path, cfg, **kw)
        for pf, pr in zip(full.pairs, resumed.pairs):
            np.testing.assert_array_equal(pf.pose, pr.pose)
            assert pf.final_error == pr.final_error

        # Simulated crash after batch 1: drop the second batch from the
        # checkpoint; the rerun recomputes exactly that batch with the same
        # per-batch PRNG key, so results are bit-identical to the full run.
        ckobj = eth._SweepCheckpoint(ck, csv_path, cfg, 4, 2, 0.5, 0,
                                     capacity=512)
        partial = eth.ETHRunResult()
        assert ckobj.load_into(partial) == {0, 1, 2, 3}
        partial.pairs = [p for p in partial.pairs if p.index < 2]
        ckobj.save(partial)
        recomputed = eth.align_eth_batch(csv_path, cfg, **kw)
        for pf, pr in zip(full.pairs, recomputed.pairs):
            np.testing.assert_array_equal(pf.pose, pr.pose)

        # A checkpoint written under a different config must be ignored.
        other = eth.align_eth_batch(
            csv_path, cfg.replace(n_iterations=7), **kw
        )
        assert len(other.pairs) == 4
        assert other.pairs[0].rmse_per_iteration.shape[0] == 7

    def test_trajectory_refinement(self, tmp_path):
        csv_path = make_eth_sequence(tmp_path, n_pairs=3)
        cfg = eth.default_config(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            n_iterations=8, max_distance=0.05,
        )
        res = eth.align_eth_batch(
            csv_path, cfg, pose_scaling=0.5, capacity=512, batch_size=3
        )
        odometry, refined, graph = eth.refine_trajectory(res)
        assert odometry.shape == refined.shape == (4, 4, 4)
        assert np.isfinite(refined).all()
        for P_ in refined:
            np.testing.assert_allclose(
                P_[:3, :3] @ P_[:3, :3].T, np.eye(3), atol=1e-4
            )
        # The fixture's source and target scans are IDENTICAL clouds, so the
        # true scan-to-scan transform is the identity: each pair's ICP
        # estimate composed with its applied perturbation must collapse to
        # ~I (raw p.pose is the perturbation's inverse — far from I — so
        # this catches dropping the composition). Ditto the chained
        # trajectory: every absolute pose stays near the identity.
        for p in res.pairs:
            assert np.linalg.norm(p.pose - np.eye(4)) > 0.05
            np.testing.assert_allclose(p.relative_pose, np.eye(4), atol=0.02)
        for traj in (odometry, refined):
            for P_ in traj:
                np.testing.assert_allclose(P_, np.eye(4), atol=0.05)

    def test_refinement_reduces_error_on_noisy_chain(self):
        """Pose-graph refinement beats raw odometry on a noisy ETH-style
        result chain with a loop-closure edge (quantitative, not just
        rigidity)."""
        from icp_variants_tpu.core import se3
        from icp_variants_tpu.parallel import pose_graph
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        n_pairs = 6

        def rot_z(a):
            c, s = np.cos(a), np.sin(a)
            return np.array(
                [[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                np.float32,
            )

        # GT trajectory: drive 1 m, turn 60° — a hexagon returning to the
        # start, so the loop closure has real leverage over drift.
        step = rot_z(2 * np.pi / n_pairs)
        step[0, 3] = 1.0
        gt_rel = [step for _ in range(n_pairs)]
        gt_abs = [np.eye(4, dtype=np.float32)]
        for r in gt_rel:
            gt_abs.append((gt_abs[-1] @ r).astype(np.float32))

        pairs = []
        for k in range(n_pairs):
            # Noisy ICP estimate of the relative edge, split between an
            # applied perturbation and the "ICP pose" the way align_eth does.
            noise = np.asarray(
                se3.increment_to_matrix(
                    jnp.asarray(rng.normal(0, 0.01, 6), jnp.float32)
                )
            )
            perturbation = eth.scale_pose(gt_rel[k], 0.4)
            icp_pose = (
                noise @ gt_rel[k] @ np.linalg.inv(perturbation)
            ).astype(np.float32)
            pairs.append(eth.ETHPairResult(
                index=k, initial_error=1.0, final_error=0.1,
                initial_rmse=1.0, final_rmse=0.1,
                rmse_per_iteration=np.zeros(1),
                benchmark_per_iteration=np.zeros(1),
                pose=icp_pose, perturbation=perturbation,
            ))
        res = eth.ETHRunResult(pairs=pairs)
        odometry, refined, graph = eth.refine_trajectory(res)
        # Add the loop closure (scan n == scan 0) and re-refine.
        graph = pose_graph.PoseGraph(
            edge_i=jnp.concatenate([graph.edge_i, jnp.asarray([n_pairs], jnp.int32)]),
            edge_j=jnp.concatenate([graph.edge_j, jnp.asarray([0], jnp.int32)]),
            rel_poses=jnp.concatenate([graph.rel_poses, jnp.eye(4)[None]]),
            weights=jnp.concatenate([graph.weights, jnp.asarray([4.0])]),
        )
        refined = np.asarray(pose_graph.refine(odometry, graph, n_iterations=10))

        def traj_err(traj):
            return np.sqrt(np.mean([
                np.sum((t[:3, 3] - g[:3, 3]) ** 2)
                for t, g in zip(traj, gt_abs)
            ]))

        assert traj_err(refined) < 0.6 * traj_err(odometry)

    def test_cli_refine_end_to_end(self, tmp_path, capsys):
        """`eth --refine --loop-closure-radius`: the pose-graph capstone
        reachable from the production CLI — sweep, chain, closure
        registration, refine, GT trajectory error report."""
        from icp_variants_tpu.__main__ import main

        csv_path = make_eth_sequence(tmp_path, n_pairs=4)
        rc = main([
            "eth", csv_path, "--batch", "4", "--linear", "--metric", "1",
            "--iterations", "6", "--refine", "--loop-closure-radius", "1.0",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "trajectory ATE vs GT" in out
        assert "refine:" in out
        # The fixture's scans sit near the origin, so proximity candidates
        # exist and at least the chain edges are reported.
        import re

        m = re.search(r"refine: (\d+) poses, (\d+) edges", out)
        assert m and int(m.group(1)) == 5 and int(m.group(2)) >= 4

    def test_find_loop_closures_proximity_rules(self):
        """Separation floor, radius cut, greedy farthest-first pick, and
        one-closure-per-scan exclusivity."""
        # A square loop: scan 4 returns to scan 0's position.
        traj = []
        for p in [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0.05)]:
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [p[0], p[1], 0.0]
            traj.append(T)
        got = eth.find_loop_closures(
            np.stack(traj), radius=0.2, min_separation=3)
        assert got == [(0, 4)]
        # Nothing within radius -> no candidates.
        assert eth.find_loop_closures(
            np.stack(traj), radius=0.01, min_separation=3) == []
        # min_separation excludes adjacent/near-adjacent pairs even when
        # they are close in space.
        assert eth.find_loop_closures(
            np.stack(traj), radius=5.0, min_separation=10) == []


class TestBatchLoading:
    def test_get_items_matches_get_item(self, tmp_path):
        from icp_variants_tpu.data.loaders import ETHDataLoader

        csv_path = make_eth_sequence(tmp_path, n_pairs=3)
        loader = ETHDataLoader(csv_path, capacity=512)
        batch = loader.get_items([0, 2])
        for sample, i in zip(batch, [0, 2]):
            ref = loader.get_item(i)
            np.testing.assert_array_equal(
                np.asarray(sample.source.points), np.asarray(ref.source.points)
            )
            np.testing.assert_array_equal(
                np.asarray(sample.target.points), np.asarray(ref.target.points)
            )
            np.testing.assert_array_equal(
                np.asarray(sample.source.normals),
                np.asarray(ref.source.normals),
            )
            np.testing.assert_array_equal(sample.pose, ref.pose)

    def test_get_items_bad_index(self, tmp_path):
        from icp_variants_tpu.data.loaders import ETHDataLoader

        csv_path = make_eth_sequence(tmp_path, n_pairs=2)
        loader = ETHDataLoader(csv_path, capacity=512)
        with pytest.raises(IndexError):
            loader.get_items([0, 5])


class TestLoadTimeDownsample:
    def test_downsample_strides_points(self, tmp_path):
        from icp_variants_tpu.data.loaders import ETHDataLoader

        csv_path = make_eth_sequence(tmp_path, n_points=400, n_pairs=1)
        full = ETHDataLoader(csv_path, capacity=512)
        down = ETHDataLoader(csv_path, capacity=512, downsample=4)
        assert int(np.asarray(down[0].source.valid).sum()) == 100
        # stride-4 subset of the full load (pre-Morton row order)
        assert (down.point_counts() == -(-full.point_counts() // 4)).all()
        # The kept points must be exactly rows [::4] of the raw file —
        # counts alone can't distinguish the stride from "first quarter".
        from icp_variants_tpu.data import pcd_io as _pcd

        raw = _pcd.read_pcd(
            str(tmp_path / "plain" / "s0.pcd")
        )[::4]
        cloud = down[0].source
        kept = np.asarray(cloud.points)[np.asarray(cloud.valid)]

        def canon(a):
            return a[np.lexsort(a.T)]

        np.testing.assert_allclose(canon(kept), canon(raw), rtol=1e-6)

    def test_downsampled_sweep_runs(self, tmp_path):
        from icp_variants_tpu.workloads import eth

        csv_path = make_eth_sequence(tmp_path, n_pairs=1)
        cfg = eth.default_config(
            minimizer=__import__(
                "icp_variants_tpu.pipeline.config", fromlist=["Minimizer"]
            ).Minimizer.LINEAR,
            n_iterations=5, max_distance=1.0,
        )
        res = eth.align_eth(
            csv_path, cfg, pose_scaling=0.5, capacity=256, downsample=2,
        )
        assert res.pairs[0].final_error < res.pairs[0].initial_error
