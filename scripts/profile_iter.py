"""Stage-differencing profiler for the bench iteration (real TPU).

Builds jitted 50-iteration scans at the exact bench shapes where successive
variants add one pipeline stage; timing differences attribute per-iteration
cost to each stage. Results append to scripts/evidence/profile_log.txt (flushed +
fsynced — background shells in this environment buffer stdout until exit).

Run:  python scripts/profile_iter.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence", "profile_log.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    sys.path.insert(0, "/root/repo")
    import bench
    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.core import se3
    from icp_variants_tpu.ops import knn, rejection, selection, weighting
    from icp_variants_tpu.pipeline import icp
    from icp_variants_tpu.pipeline.config import (
        ICPConfig, Metric, Minimizer, Selection,
    )
    from icp_variants_tpu.solvers import linear

    B = bench.BATCH_PAIRS
    N_ITER = bench.N_ITERATIONS
    P = bench.SELECTION_P
    MAXD = bench.MAX_DISTANCE

    src_pts, src_nrm = bench.synth_cloud(bench.N_POINTS, 0)
    tgt_pts, tgt_nrm = bench.synth_cloud(bench.N_POINTS, 0)
    ang = 0.05
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    src_pts = src_pts @ R.T + np.array([0.5, -0.3, 0.1], np.float32)
    src_nrm = src_nrm @ R.T

    source = cloud_lib.from_numpy(src_pts, normals=src_nrm, morton_order=True)
    target = cloud_lib.from_numpy(tgt_pts, normals=tgt_nrm, morton_order=True)
    sources = icp.stack_clouds([source] * B)
    targets = icp.stack_clouds([target] * B)
    log(f"clouds built: capacity={source.capacity}")

    cap = source.capacity
    k_cap = icp._compact_capacity(cap, P)
    n_draw = min(int(cap * P + 0.5), k_cap)
    log(f"k_cap={k_cap} n_draw={n_draw}")

    def timed(name, fn, *args):
        # compile
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
            jax.device_get(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / reps
        per_iter_ms = dt / N_ITER * 1e3
        log(f"{name:24s} total={dt*1e3:8.2f} ms   per-iter={per_iter_ms:7.3f} ms"
            f"   per-pair-iter={per_iter_ms/B*1e3:7.1f} us")
        return dt

    # ---- stage bodies ------------------------------------------------------
    def select_stage(source, pose, key):
        sel_idx, sel_mask = selection.random_indices(key, cap, n_draw, k_cap)
        sel_mask = sel_mask & source.valid[sel_idx]
        pts = jnp.where(
            sel_mask[:, None], source.points[sel_idx], cloud_lib.PAD_SENTINEL
        )
        nrm = source.normals[sel_idx]
        src_q = se3.transform_points(pts, pose)
        src_q = jnp.where(sel_mask[:, None], src_q, 0.0)
        src_n = se3.transform_normals(nrm, pose)
        return src_q, src_n, sel_mask

    def scan_program(body):
        @jax.jit
        def run(sources, targets, keys):
            def one(source, target, key):
                index = knn.build_target_index(target.points, tile_t=knn.V2_TILE_T)
                ks = jax.random.split(key, N_ITER)
                def step(pose, k):
                    return body(source, target, index, pose, k)
                pose, outs = jax.lax.scan(step, jnp.eye(4, dtype=jnp.float32), ks)
                return pose, outs
            return jax.vmap(one)(sources, targets, keys)
        return run

    keys = jax.random.split(jax.random.PRNGKey(0), B)

    # 0) scan floor: trivial body
    def body_floor(source, target, index, pose, k):
        return pose + 0.0 * pose, jnp.float32(0)

    # 1) selection + gather + transform
    def body_sel(source, target, index, pose, k):
        src_q, src_n, sel_mask = select_stage(source, pose, k)
        return pose, jnp.sum(src_q) + jnp.sum(src_n)

    # 2) + visit lists only (no kernel)
    def body_sel_vl(source, target, index, pose, k):
        src_q, src_n, sel_mask = select_stage(source, pose, k)
        q = knn._pad_rows(knn._pad_features(src_q), knn.TILE_Q, 0.0)
        nq_tiles = q.shape[0] // knn.TILE_Q
        qtiles = q.reshape(nq_tiles, knn.TILE_Q, knn.FEATURE_PAD)
        bound_val = jnp.float32(MAXD) * (1.0 + 1e-6) + 1e-30
        vlist, lblist, counts, _c0 = knn._visit_lists(
            jnp.min(qtiles, axis=1), jnp.max(qtiles, axis=1),
            index.bbox_min, index.bbox_max, bound_val,
        )
        return pose, (jnp.sum(vlist) + jnp.sum(counts)).astype(jnp.float32)

    # 3) + the full k-NN kernel
    def body_sel_knn(source, target, index, pose, k):
        src_q, src_n, sel_mask = select_stage(source, pose, k)
        idx, d2, valid = knn.match_indexed(src_q, index, MAXD, query_mask=sel_mask)
        return pose, jnp.sum(d2 * valid)

    # 4) + gather matched rows + weighting + rejection
    def body_sel_knn_gather(source, target, index, pose, k):
        src_q, src_n, sel_mask = select_stage(source, pose, k)
        idx, d2, valid = knn.match_indexed(src_q, index, MAXD, query_mask=sel_mask)
        idx = jnp.clip(idx, 0, target.capacity - 1)
        valid = valid & target.valid[idx]
        tgt_p = target.points[idx]
        tgt_n = target.normals[idx]
        valid = rejection.normal_angle_mask(src_n, tgt_n, valid)
        return pose, jnp.sum(tgt_p) + jnp.sum(valid)

    # 5) full iteration (matching bench config) — via run_icp_batch for a
    #    cache-hit on the bench executable.
    cfg = ICPConfig(
        metric=Metric.SYMMETRIC,
        minimizer=Minimizer.LINEAR,
        selection=Selection.RANDOM_FAST,
        selection_proba=P,
        n_iterations=N_ITER,
        max_distance=MAXD,
    )

    def run_full(sources, targets, key):
        res = icp.run_icp_batch(cfg, sources, targets, key=key)
        return res.pose

    log("=== stage-differencing profile (B=%d, %d iters) ===" % (B, N_ITER))
    timed("0 scan floor", scan_program(body_floor), sources, targets, keys)
    timed("1 +selection", scan_program(body_sel), sources, targets, keys)
    timed("2 +visit lists", scan_program(body_sel_vl), sources, targets, keys)
    timed("3 +knn kernel", scan_program(body_sel_knn), sources, targets, keys)
    timed("4 +gather/rej", scan_program(body_sel_knn_gather), sources, targets, keys)
    timed("5 full bench", run_full, sources, targets, jax.random.PRNGKey(1))
    log("done")


if __name__ == "__main__":
    main()
