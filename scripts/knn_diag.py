"""Diagnose v2 kernel: exactness mismatches (tie or bug?) + cost split
(visit lists vs kernel; argmin vs matmul; prune effectiveness)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence", "knn_diag_log.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    import bench
    from icp_variants_tpu.ops import knn
    from scipy.spatial import cKDTree

    src, _ = bench.synth_cloud(bench.N_POINTS, 0)
    tgt, _ = bench.synth_cloud(bench.N_POINTS, 0)
    ang = 0.05
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    src = src @ R.T + np.array([0.5, -0.3, 0.1], np.float32)
    src = src[np.argsort(knn.morton_codes_np(src))]
    tgt = tgt[np.argsort(knn.morton_codes_np(tgt))]

    cap, k_cap, n_draw = len(src), 4736, 3651
    rng = np.random.default_rng(0)
    slots = np.arange(k_cap)
    starts = (slots * cap) // n_draw
    ends = ((slots + 1) * cap) // n_draw
    u = rng.random(k_cap)
    idx = np.minimum(starts + (u * np.maximum(ends - starts, 1)).astype(int), cap - 1)
    q = src[idx]
    q[n_draw:] = q[0]
    qj = jnp.asarray(q)
    tj = jnp.asarray(tgt)

    # --- exactness: tie or bug? --------------------------------------------
    index = knn.build_target_index(tj, tile_t=512)
    idx1, d21 = knn.nn_search_pruned_v2(qj, index, 10.0, tile_t=512, chunk=8)
    idx1 = np.asarray(jax.device_get(idx1))
    d21 = np.asarray(jax.device_get(d21))
    dref, iref = cKDTree(tgt).query(q, k=1, workers=-1)
    within = dref * dref <= 10.0
    bad = np.flatnonzero(within & (idx1 != iref))
    log(f"mismatches: {len(bad)} / {within.sum()}")
    for b in bad[:10]:
        ours = tgt[idx1[b]] if idx1[b] >= 0 else None
        d_ours = ((q[b] - ours) ** 2).sum() if ours is not None else -1
        d_ref = dref[b] ** 2
        log(f"  q={b}: ours_idx={idx1[b]} ref_idx={iref[b]} "
            f"d2_ours_f64={d_ours:.9e} d2_ref_f64={d_ref:.9e} "
            f"delta={d_ours - d_ref:.3e} kernel_d2={d21[b]:.9e}")

    # --- cost split ---------------------------------------------------------
    N_IT = 20

    def timed(name, fn, *args):
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(3):
            jax.device_get(jax.tree.leaves(out := fn(*args))[0])
        dt = (time.perf_counter() - t0) / 3 / N_IT
        log(f"{name:32s} {dt * 1e3:8.3f} ms/iter")
        return dt

    bound_val = jnp.float32(10.0) * (1 + 1e-6) + 1e-30

    # visit lists alone, per iteration
    @jax.jit
    def vl_only(q):
        def body(c, i):
            qq = q + c
            qp = knn._pad_rows(knn._pad_features(qq), 256, 0.0)
            qtiles = qp.reshape(-1, 256, knn.FEATURE_PAD)
            vlist, suffix, counts, _c0 = knn._visit_lists(
                jnp.min(qtiles, axis=1), jnp.max(qtiles, axis=1),
                index.bbox_min, index.bbox_max, bound_val,
            )
            return c + 0.0 * jnp.sum(suffix[0, :1]), jnp.sum(counts)
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(N_IT))[1]

    # full v2 (lists + kernel)
    @jax.jit
    def v2_full(q):
        def body(c, i):
            qq = q + c
            idxq, d2 = knn.nn_search_pruned_v2(qq, index, 10.0, tile_t=512, chunk=8)
            return c + 0.0 * jnp.sum(d2) * 1e-30, jnp.sum(d2)
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(N_IT))[1]

    timed("visit lists only", vl_only, qj)
    timed("v2 full (lists+kernel)", v2_full, qj)

    # active-chunk statistics on device (what does the prune actually do?)
    qp = knn._pad_rows(knn._pad_features(qj), 256, 0.0)
    qtiles = qp.reshape(-1, 256, knn.FEATURE_PAD)
    vlist, suffix, counts, _c0 = knn._visit_lists(
        jnp.min(qtiles, axis=1), jnp.max(qtiles, axis=1),
        index.bbox_min, index.bbox_max, bound_val,
    )
    counts = np.asarray(jax.device_get(counts))
    sfx = np.asarray(jax.device_get(suffix))
    # with true final per-tile worst-best from scipy
    d2w = np.minimum(dref * dref, 10.0).reshape(-1, 256)
    wb_final = d2w.max(axis=1)
    active = []
    for r in range(len(counts)):
        nch = (counts[r] + 7) // 8
        a = 0
        for k in range(nch):
            if sfx[r, k * 8] <= wb_final[r]:
                a += 1
        active.append((nch, a))
    log(f"chunks per qtile (total, active@final-wb): {active}")
    log("done")


if __name__ == "__main__":
    main()
