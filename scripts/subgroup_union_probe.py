"""Host probe: per-subgroup block-membership unions at bench conditions.

The bitmap kernel evaluates every query tile (tile_q=128) against the
UNION of its queries' member blocks — each of the 128 queries pays
distances against ~all ~50 member blocks although its own top-K(4) +
radius set is ~4. This probe quantifies, from the real bench geometry,
how much VPU work a finer compute granularity would save: for subgroup
widths 8/16/32/128 it reports the mean per-subgroup union size and the
total (subgroup x member-block) compute volume relative to today's
tile-level scheme, in the cold regime (radius = threshold) and the ideal
warm regime (radius = exact NN distance — the tightest the granule cache
could ever deliver).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.spatial import cKDTree

LOG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "evidence", "subgroup_union_log.txt"
)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import bench
    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import kdtree

    sp, sn, tp, tn = bench.make_pairs()[0]
    sc = cloud_lib.from_numpy(sp, normals=sn, morton_order=True)
    tc = cloud_lib.from_numpy(tp, normals=tn, morton_order=True)
    spts = np.asarray(sc.points)
    svalid = np.asarray(sc.valid)
    tpts = np.asarray(tc.points)
    kd = kdtree.build_kd_index(tpts, np.asarray(tc.valid))
    bmin = np.asarray(kd.block_min)
    bmax = np.asarray(kd.block_max)
    nc = len(bmin)
    cap = kd.pages.shape[2]
    bound = bench.MAX_DISTANCE
    k_top = kdtree.K_DEFAULT

    rng = np.random.default_rng(0)
    sel = rng.random(len(spts)) < bench.SELECTION_P
    sel &= svalid
    q = spts[np.flatnonzero(sel)]
    nq = len(q)
    log(f"queries {nq}, blocks {nc}, cap {cap}")

    # Box lower bounds (nq, nc).
    lb = np.zeros((nq, nc), np.float32)
    for j in range(3):
        gap = np.maximum(
            np.maximum(bmin[None, :, j] - q[:, j : j + 1],
                       q[:, j : j + 1] - bmax[None, :, j]),
            0.0,
        )
        lb += gap * gap

    # Per-query top-K by lb.
    topk = np.argpartition(lb, k_top, axis=1)[:, :k_top]
    topk_lb = np.take_along_axis(lb, topk, axis=1)

    dnn = cKDTree(tpts).query(q, k=1, workers=-1)[0].astype(np.float32)

    for regime, radius in (
        ("cold (radius=threshold)", np.full(nq, bound, np.float32)),
        ("ideal-warm (radius=exact NN d2)", dnn * dnn * (1 + 1e-6)),
    ):
        # hit = top-K blocks with lb <= radius (the warm kernel membership).
        hit = np.zeros((nq, nc), bool)
        ok = topk_lb <= radius[:, None]
        rows = np.repeat(np.arange(nq), k_top).reshape(nq, k_top)
        hit[rows[ok], topk[ok]] = True

        base = None
        for width in (8, 16, 32, 128):
            ng = nq // width
            g = hit[: ng * width].reshape(ng, width, nc).any(axis=1)
            sizes = g.sum(axis=1)
            volume = float((sizes * width).sum()) * cap  # candidate evals
            if width == 128:
                base = volume
            log(
                f"{regime:34s} width {width:3d}: union mean "
                f"{sizes.mean():6.2f} max {sizes.max():3d}, "
                f"candidate volume {volume/1e6:8.1f}M"
            )
        for width in (8, 16, 32):
            ng = nq // width
            g = hit[: ng * width].reshape(ng, width, nc).any(axis=1)
            volume = float((g.sum(axis=1) * width).sum()) * cap
            log(
                f"{regime:34s} width {width:3d}: compute saving vs 128 = "
                f"{base / volume:5.2f}x"
            )
    log("done")


if __name__ == "__main__":
    main()
