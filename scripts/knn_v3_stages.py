"""Stage-split timing of v3 kd matcher variants on TPU.
Appends to scripts/evidence/knn_v3_log.txt."""

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
K1, K2 = kdtree.K1_DEFAULT, kdtree.K2_DEFAULT


def main():
    src, _ = bench.synth_cloud(bench.N_POINTS, 0)
    tgt, _ = bench.synth_cloud(bench.N_POINTS, 1)
    src = src[np.argsort(knn.morton_codes_np(src))]
    tgt = tgt[np.argsort(knn.morton_codes_np(tgt))]
    rng = np.random.default_rng(0)
    sel = np.flatnonzero(rng.random(len(src)) < 0.01)
    q = src[sel] + 0.1
    k_cap = 4736
    qpad = np.concatenate([q, np.tile(q[:1], (k_cap - len(q), 1))])
    qj = jnp.asarray(qpad)

    kd = jax.tree.map(jax.device_put, kdtree.build_kd_index(tgt))
    d, nl, cap = kd.leaf_pts.shape
    nc = kd.coarse_min.shape[0]
    fanout = nl // nc
    # (L, cap, D) row-major copy for native-gather comparison
    leaf_pts_rm = jnp.asarray(
        np.ascontiguousarray(np.asarray(kd.leaf_pts).transpose(1, 2, 0)))

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
        log(f"{name:40s} {dt*1e3:8.3f} ms/iter (compile {compile_s:.0f} s)")
        return out

    def scan_of(stage):
        @jax.jit
        def f(q):
            def body(c, _):
                out = stage(q + c)
                return c + 1e-30 * out, out
            return jax.lax.scan(body, jnp.float32(0), None, length=N_IT)[1]
        return f

    # ---- level 1 variants --------------------------------------------------
    def lb1_coordwise(q):
        return kdtree._box_lb(q, kd.coarse_min, kd.coarse_max)

    def lb1_bcast(q):
        gap = jnp.maximum(
            jnp.maximum(kd.coarse_min[None] - q[:, None, :],
                        q[:, None, :] - kd.coarse_max[None]), 0.0)
        return jnp.sum(gap * gap, -1)

    def stage_lb1_cw(q):
        return jnp.sum(lb1_coordwise(q)) * 1e-30

    def stage_lb1_bc(q):
        return jnp.sum(lb1_bcast(q)) * 1e-30

    def stage_ex1(q):
        sel1, r1 = kdtree._extract_min(lb1_coordwise(q), K1)
        return (jnp.sum(sel1) + jnp.sum(r1)).astype(jnp.float32) * 1e-30

    # ---- level 2 variants --------------------------------------------------
    def sel1_of(q):
        sel1, r1 = kdtree._extract_min(lb1_coordwise(q), K1)
        return sel1

    def leafids_of(sel1):
        return (
            sel1[:, :, None] * fanout
            + jnp.arange(fanout, dtype=jnp.int32)[None, None, :]
        ).reshape(-1, K1 * fanout)

    def stage_lb2_cw(q):
        leaf_ids = leafids_of(sel1_of(q))
        lb2 = None
        for j in range(d):
            gap = jnp.maximum(
                jnp.maximum(kd.leaf_min[:, j][leaf_ids] - q[:, j:j + 1],
                            q[:, j:j + 1] - kd.leaf_max[:, j][leaf_ids]), 0.0)
            lb2 = gap * gap if lb2 is None else lb2 + gap * gap
        return jnp.sum(lb2) * 1e-30

    def stage_lb2_bc(q):
        leaf_ids = leafids_of(sel1_of(q))
        gap = jnp.maximum(
            jnp.maximum(kd.leaf_min[leaf_ids] - q[:, None, :],
                        q[:, None, :] - kd.leaf_max[leaf_ids]), 0.0)
        return jnp.sum(jnp.sum(gap * gap, -1)) * 1e-30

    def sel2_cw(q):
        leaf_ids = leafids_of(sel1_of(q))
        lb2 = None
        for j in range(d):
            gap = jnp.maximum(
                jnp.maximum(kd.leaf_min[:, j][leaf_ids] - q[:, j:j + 1],
                            q[:, j:j + 1] - kd.leaf_max[:, j][leaf_ids]), 0.0)
            lb2 = gap * gap if lb2 is None else lb2 + gap * gap
        pick2, r2 = kdtree._extract_min(lb2, K2)
        return jnp.take_along_axis(leaf_ids, pick2, axis=1)

    def stage_sel2(q):
        return jnp.sum(sel2_cw(q)).astype(jnp.float32) * 1e-30

    # ---- gather+distance variants -----------------------------------------
    def stage_gd_coordwise(q):
        sel2 = sel2_cw(q)
        d2 = None
        for j in range(d):
            candj = kd.leaf_pts[j][sel2]
            diff = candj - q[:, j, None, None]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        per_leaf = jnp.min(d2, axis=2)
        return jnp.sum(jnp.min(per_leaf, 1)) * 1e-30

    def stage_gd_rowmajor(q):
        sel2 = sel2_cw(q)
        cand = leaf_pts_rm[sel2]                      # (N, k2, cap, D)
        d2 = jnp.sum((q[:, None, None, :] - cand) ** 2, -1)
        return jnp.sum(jnp.min(d2, (1, 2))) * 1e-30

    log("=== v3 stage split round 2 ===")
    timed("lb1 coordwise", scan_of(stage_lb1_cw), qj)
    timed("lb1 broadcast-3d", scan_of(stage_lb1_bc), qj)
    timed("lb1+extract1 (cw)", scan_of(stage_ex1), qj)
    timed("..+lb2 coordwise", scan_of(stage_lb2_cw), qj)
    timed("..+lb2 broadcast-3d", scan_of(stage_lb2_bc), qj)
    timed("..+extract2 (sel2, cw)", scan_of(stage_sel2), qj)
    timed("..+gather+dist coordwise", scan_of(stage_gd_coordwise), qj)
    timed("..+gather+dist rowmajor-3d", scan_of(stage_gd_rowmajor), qj)
    log("done")


if __name__ == "__main__":
    main()
