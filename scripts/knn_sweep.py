"""Real-TPU microbenchmark of the visited-list k-NN kernel at bench shapes.

Sweeps (tile_t, chunk) for nn_search_pruned_v2 inside a 20-iteration scan
(visit-list construction included, CSE defeated by per-iteration query
jitter). Appends to scripts/evidence/knn_sweep_log.txt.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence", "knn_sweep_log.txt")


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

    # Stratified 1% selection like the bench pipeline (anchor-pinned mask).
    cap, k_cap, n_draw = len(src), 4736, 3651
    rng = np.random.default_rng(0)
    slots = np.arange(k_cap)
    starts = (slots * cap) // n_draw
    ends = ((slots + 1) * cap) // n_draw
    u = rng.random(k_cap)
    idx = np.minimum(starts + (u * np.maximum(ends - starts, 1)).astype(int), cap - 1)
    q = src[idx]
    q[n_draw:] = q[0]  # anchor-pinned masked rows
    q = jnp.asarray(q)
    tgt_j = jnp.asarray(tgt)
    N_ITER = 20

    def timed_scan(tile_t, chunk, tile_q=256):
        index = knn.build_target_index(tgt_j, tile_t=tile_t)
        jax.device_get(index.bbox_min)

        @jax.jit
        def run(q):
            def body(c, i):
                qq = q + c  # defeat CSE; c stays ~0
                idx, d2 = knn.nn_search_pruned_v2(
                    qq, index, 10.0, tile_q=tile_q, tile_t=tile_t, chunk=chunk
                )
                return c + 0.0 * jnp.sum(d2) * 1e-30, jnp.sum(d2)
            c, outs = jax.lax.scan(body, jnp.float32(0), jnp.arange(N_ITER))
            return outs

        out = run(q)
        jax.device_get(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.device_get(run(q))
        dt = (time.perf_counter() - t0) / reps / N_ITER
        log(f"tile_q={tile_q:4d} tile_t={tile_t:5d} chunk={chunk:3d}: "
            f"{dt*1e3:8.3f} ms/call (incl. visit lists)")
        return dt

    log("=== knn v2 sweep (4736 q vs 365k t, bound 10, 20-iter scan) ===")
    for tile_t, chunk, tile_q in (
        (1024, 4, 128),   # current production default (reference point)
        (2048, 2, 128),   # same 4k window, half the DMA count
        (2048, 4, 128),   # 8k window, quarter-rate scalar loop
        (4096, 2, 128),   # 8k window, giant pages
        (2048, 2, 64),    # tighter query bboxes against bigger pages
        (1024, 8, 128),   # deeper chunks at fine pages
    ):
        try:
            timed_scan(tile_t, chunk, tile_q)
        except Exception as e:  # noqa: BLE001
            log(f"tile_t={tile_t} chunk={chunk} tq={tile_q}: FAILED {type(e).__name__}: {e}")

    # Correctness spot-check on hardware at the best-looking config.
    from scipy.spatial import cKDTree
    index = knn.build_target_index(tgt_j, tile_t=512)
    idx1, d21 = knn.nn_search_pruned_v2(q, index, 10.0, tile_t=512, chunk=8)
    idx1 = np.asarray(jax.device_get(idx1))
    dref, iref = cKDTree(tgt).query(np.asarray(q), k=1, workers=-1)
    within = dref * dref <= 10.0
    agree = (idx1[within] == iref[within]).mean()
    log(f"hardware exactness vs scipy (within bound): {agree:.6f}")
    log("done")


if __name__ == "__main__":
    main()
