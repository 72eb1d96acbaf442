"""TPU micro-bench: per-query k-d matcher (v3) vs the visited-list kernel
(v2) at bench scale — 4.7k queries vs 365k targets, bound 10, inside a
20-iteration scan like the production ICP loop.

Appends to scripts/evidence/knn_v3_log.txt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence", "knn_v3_log.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from icp_variants_tpu.ops import kdtree, knn  # noqa: E402

N_IT = 20


def main():
    from scipy.spatial import cKDTree

    src, _ = bench.synth_cloud(bench.N_POINTS, 0)
    tgt, _ = bench.synth_cloud(bench.N_POINTS, 1)
    src = src[np.argsort(knn.morton_codes_np(src))]
    tgt = tgt[np.argsort(knn.morton_codes_np(tgt))]
    rng = np.random.default_rng(0)
    sel = np.flatnonzero(rng.random(len(src)) < 0.01)
    ang = 0.05
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0],
         [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    q = (src[sel] @ R.T + np.array([0.5, -0.3, 0.1], np.float32))
    k_cap = 4736
    qpad = np.concatenate([q, np.tile(q[:1], (k_cap - len(q), 1))])
    qj = jnp.asarray(qpad)
    tj = jnp.asarray(tgt)

    t0 = time.perf_counter()
    kd = kdtree.build_kd_index(tgt)
    kd = jax.tree.map(jax.device_put, kd)
    log(f"kd build (host): {time.perf_counter()-t0:.2f} s  "
        f"blocks {kd.block_pts.shape}")
    index = knn.build_target_index(tj, tile_t=knn.V2_TILE_T)

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args)
            jax.device_get(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / 3 / N_IT
        log(f"{name:34s} {dt*1e3:8.3f} ms/iter (compile {compile_s:.0f} s)")
        return out

    @jax.jit
    def v2_scan(q):
        def body(c, _):
            idx, d2 = knn.nn_search_pruned_v2(q + c, index, 10.0)
            return c + 1e-30 * jnp.sum(d2), (jnp.sum(idx), jnp.sum(d2))
        return jax.lax.scan(body, jnp.float32(0), None, length=N_IT)[1]

    @jax.jit
    def v3_scan(q):
        def body(c, _):
            idx, d2, fail = kdtree.nn_search_kd(q + c, kd, 10.0)
            return c + 1e-30 * jnp.sum(d2), (
                jnp.sum(idx), jnp.sum(d2), jnp.sum(fail))
        return jax.lax.scan(body, jnp.float32(0), None, length=N_IT)[1]

    @jax.jit
    def v3_full_scan(q):
        def body(c, _):
            idx, d2, valid = kdtree.match_kd(q + c, kd, index, 10.0)
            return c + 1e-30 * jnp.sum(d2), (jnp.sum(idx), jnp.sum(d2))
        return jax.lax.scan(body, jnp.float32(0), None, length=N_IT)[1]

    log("=== v3 micro-bench (4736 q vs 365k t, bound 10, 20-iter scan) ===")
    timed("v2 visited-list kernel", v2_scan, qj)
    out3 = timed("v3 kd (no fallback)", v3_scan, qj)
    log(f"  v3 fail count/iter: {np.asarray(out3[2])[:4]}")
    timed("v3 kd + per-query-bound fallback", v3_full_scan, qj)

    # exactness on hardware
    idx, d2, valid = kdtree.match_kd(qj, kd, index, 10.0)
    idx = np.asarray(jax.device_get(idx))[:len(q)]
    d2v = np.asarray(jax.device_get(d2))[:len(q)]
    dref, iref = cKDTree(tgt).query(q, k=1, workers=-1)
    w = dref * dref <= 10.0
    agree = (idx[w] == iref[w]) | np.isclose(
        d2v[w], (dref * dref)[w], rtol=1e-5, atol=1e-6)
    log(f"hardware exactness vs scipy (within bound): {agree.mean():.6f}")
    log("done")


if __name__ == "__main__":
    main()
