"""Distributed pose-graph refinement tests (parallel/pose_graph.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_variants_tpu.core import se3
from icp_variants_tpu.parallel import pose_graph


def make_loop_problem(v=8, noise=0.02, seed=0):
    """Circular trajectory with noisy sequential edges + one loop closure."""
    rng = np.random.default_rng(seed)
    gt = []
    for k in range(v):
        ang = 2 * np.pi * k / v
        R = np.asarray(
            se3.axis_angle_to_matrix(jnp.asarray([0, 0, ang], jnp.float32))
        )
        t = np.array([np.cos(ang), np.sin(ang), 0.0], np.float32)
        gt.append(np.asarray(se3.pose_matrix(jnp.asarray(R), jnp.asarray(t))))
    gt = np.stack(gt)

    def noisy(T):
        w = rng.standard_normal(6).astype(np.float32) * noise
        return np.asarray(se3.increment_to_matrix(jnp.asarray(w))) @ T

    # Sequential edges: A_{k,k+1} = T_k^-1 T_{k+1} (+ noise).
    pair = []
    for k in range(v - 1):
        rel = np.linalg.inv(gt[k]) @ gt[k + 1]
        pair.append(noisy(rel.astype(np.float32)))
    pair = np.stack(pair)
    # Loop closure v-1 -> 0 with LOW noise (anchors the drift).
    loop_rel = (np.linalg.inv(gt[v - 1]) @ gt[0]).astype(np.float32)
    return gt, pair, loop_rel


def pose_rmse(poses, gt):
    # The trajectory is anchored at identity (gauge fixed on pose 0) while gt
    # starts at gt[0]; align gauges by left-multiplying with gt[0].
    poses = [gt[0] @ np.asarray(P_) for P_ in poses]
    pts = np.random.default_rng(1).standard_normal((50, 3)).astype(np.float32)
    errs = []
    for P_, G in zip(poses, gt):
        a = pts @ np.asarray(P_)[:3, :3].T + np.asarray(P_)[:3, 3]
        b = pts @ G[:3, :3].T + G[:3, 3]
        errs.append(np.mean(np.sum((a - b) ** 2, axis=1)))
    return float(np.sqrt(np.mean(errs)))


class TestPoseGraph:
    def test_chain_refinement_with_loop_closure(self):
        gt, pair, loop_rel = make_loop_problem()
        odo, graph = pose_graph.sequential_graph(pair)
        v = len(odo)
        # Append the loop-closure edge.
        graph = pose_graph.PoseGraph(
            edge_i=jnp.concatenate([graph.edge_i, jnp.asarray([v - 1], jnp.int32)]),
            edge_j=jnp.concatenate([graph.edge_j, jnp.asarray([0], jnp.int32)]),
            rel_poses=jnp.concatenate([graph.rel_poses, jnp.asarray(loop_rel)[None]]),
            weights=jnp.concatenate([graph.weights, jnp.asarray([5.0], jnp.float32)]),
        )
        refined = np.asarray(pose_graph.refine(odo, graph, n_iterations=10))
        err_odo = pose_rmse(odo, gt)
        err_ref = pose_rmse(refined, gt)
        assert err_ref < err_odo * 0.7, (err_odo, err_ref)
        # Rigid output.
        for P_ in refined:
            np.testing.assert_allclose(P_[:3, :3] @ P_[:3, :3].T, np.eye(3), atol=1e-4)

    def test_perfect_edges_are_fixed_point(self):
        gt, _, _ = make_loop_problem(noise=0.0)
        rel = np.stack(
            [np.linalg.inv(gt[k]) @ gt[k + 1] for k in range(len(gt) - 1)]
        ).astype(np.float32)
        odo, graph = pose_graph.sequential_graph(rel)
        refined = np.asarray(pose_graph.refine(odo, graph, n_iterations=5))
        for a, b in zip(refined, odo):
            np.testing.assert_allclose(a, b, atol=1e-4)

    def test_zero_weight_edges_ignored(self):
        gt, pair, _ = make_loop_problem()
        odo, graph = pose_graph.sequential_graph(pair)
        # Add a WRONG edge with zero weight: must not change the result.
        bogus = np.eye(4, dtype=np.float32)
        bogus[:3, 3] = (100, 100, 100)
        graph2 = pose_graph.PoseGraph(
            edge_i=jnp.concatenate([graph.edge_i, jnp.asarray([0], jnp.int32)]),
            edge_j=jnp.concatenate([graph.edge_j, jnp.asarray([3], jnp.int32)]),
            rel_poses=jnp.concatenate([graph.rel_poses, jnp.asarray(bogus)[None]]),
            weights=jnp.concatenate([graph.weights, jnp.asarray([0.0], jnp.float32)]),
        )
        a = np.asarray(pose_graph.refine(odo, graph, n_iterations=4))
        b = np.asarray(pose_graph.refine(odo, graph2, n_iterations=4))
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestShardedPoseGraph:
    def test_matches_single_device(self):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        mesh = jax.make_mesh((4,), ("pairs",), devices=jax.devices()[:4])
        gt, pair, loop_rel = make_loop_problem(v=10)
        odo, graph = pose_graph.sequential_graph(pair)
        single = np.asarray(pose_graph.refine(odo, graph, n_iterations=6))
        sharded = np.asarray(
            pose_graph.refine_sharded(odo, graph, mesh, n_iterations=6)
        )
        np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)


def make_chain_with_closures(v, closure_frac=0.05, noise=0.02, seed=3):
    """Long noisy chain trajectory + random loop closures between nearby
    revisits (a circular path walked multiple times, so closures are
    geometrically meaningful)."""
    rng = np.random.default_rng(seed)
    laps = 4
    gt = []
    for k in range(v):
        ang = 2 * np.pi * laps * k / v
        R = np.asarray(
            se3.axis_angle_to_matrix(jnp.asarray([0, 0, ang], jnp.float32)))
        t = np.array([np.cos(ang), np.sin(ang), 0.002 * k], np.float32)
        gt.append(np.asarray(se3.pose_matrix(jnp.asarray(R), jnp.asarray(t))))
    gt = np.stack(gt)

    def noisy(T):
        w = rng.standard_normal(6).astype(np.float32) * noise
        return np.asarray(se3.increment_to_matrix(jnp.asarray(w))) @ T

    pair = np.stack([
        noisy((np.linalg.inv(gt[k]) @ gt[k + 1]).astype(np.float32))
        for k in range(v - 1)
    ])
    odo, graph = pose_graph.sequential_graph(pair)
    # Loop closures: ~closure_frac*V random (i, j) pairs one lap apart
    # (same angular position), with LOW noise.
    per_lap = v // laps
    n_close = max(1, int(closure_frac * v))
    ei = [int(graph.edge_i[k]) for k in range(v - 1)]
    ej = [int(graph.edge_j[k]) for k in range(v - 1)]
    rels = [np.asarray(graph.rel_poses[k]) for k in range(v - 1)]
    ws = [1.0] * (v - 1)
    for _ in range(n_close):
        i = int(rng.integers(0, v - per_lap - 1))
        j = i + per_lap
        ei.append(i)
        ej.append(j)
        rels.append((np.linalg.inv(gt[i]) @ gt[j]).astype(np.float32))
        ws.append(5.0)
    graph = pose_graph.PoseGraph(
        edge_i=jnp.asarray(np.array(ei, np.int32)),
        edge_j=jnp.asarray(np.array(ej, np.int32)),
        rel_poses=jnp.asarray(np.stack(rels)),
        weights=jnp.asarray(np.array(ws, np.float32)),
    )
    return gt, odo, graph


class TestBlockSparseScale:
    def test_cg_matches_dense_solver(self, monkeypatch):
        """On a graph just over the dense threshold the matrix-free CG
        path must reproduce the dense block solve (same normal
        equations, solved two ways)."""
        gt, odo, graph = make_chain_with_closures(v=120, seed=4)
        assert len(odo) > pose_graph.DENSE_MAX_POSES
        cg = np.asarray(pose_graph.refine(odo, graph, n_iterations=4,
                                          n_cg=400))
        monkeypatch.setattr(pose_graph, "DENSE_MAX_POSES", 10_000)
        dense = np.asarray(pose_graph.refine(odo, graph, n_iterations=4))
        np.testing.assert_allclose(cg, dense, rtol=1e-3, atol=2e-4)

    def test_thousand_pose_chain_refines_in_seconds(self):
        """SURVEY §2.2 SP-row scale: 1,000 poses + 5% loop closures must
        refine on CPU in seconds (the old flattened-jacfwd path built a
        dense (6E, 6V) Jacobian and a 6000x6000 solve per step) with the
        loop-closure error reduced."""
        import time

        gt, odo, graph = make_chain_with_closures(v=1000, seed=5)
        t0 = time.perf_counter()
        refined = np.asarray(
            pose_graph.refine(odo, graph, n_iterations=6, n_cg=150))
        wall = time.perf_counter() - t0
        err_odo = pose_rmse(odo, gt)
        err_ref = pose_rmse(refined, gt)
        assert err_ref < err_odo * 0.7, (err_odo, err_ref)
        for P_ in refined[::100]:
            np.testing.assert_allclose(
                P_[:3, :3] @ P_[:3, :3].T, np.eye(3), atol=1e-3)
        # Generous bound for a loaded CI host; the point is "seconds,
        # not minutes/OOM".
        assert wall < 120, wall

    def test_sharded_cg_matches_single_device(self):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        mesh = jax.make_mesh((4,), ("pairs",), devices=jax.devices()[:4])
        gt, odo, graph = make_chain_with_closures(v=120, seed=6)
        single = np.asarray(pose_graph.refine(odo, graph, n_iterations=4))
        sharded = np.asarray(
            pose_graph.refine_sharded(odo, graph, mesh, n_iterations=4))
        np.testing.assert_allclose(sharded, single, rtol=1e-3, atol=2e-4)
