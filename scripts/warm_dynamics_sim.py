"""Host-side simulation of the warm-start cache dynamics on the REAL bench
workload: scipy ICP (exact NN, symmetric linear solve via the repo's CPU
solver) over the actual 365k-point pair, tracking per-iteration:

* pose convergence (match RMSE),
* granule-cache seeding + radius distribution,
* per-query-tile hot/cold membership counts vs the real kd index
  (the bitmap kernel's work driver), for several granule sizes and the
  top-K=4 cap.

Lets us tune kd_warm_granule and predict the e2e win without the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.spatial import cKDTree

LOG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "evidence", "warm_dynamics_log.txt"
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
    import jax.numpy as jnp

    import bench
    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import kdtree
    from icp_variants_tpu.solvers import linear

    sp, sn, tp, tn = bench.make_pairs()[0]
    sc = cloud_lib.from_numpy(sp, normals=sn, morton_order=True)
    tc = cloud_lib.from_numpy(tp, normals=tn, morton_order=True)
    spts = np.asarray(sc.points)
    snrm = np.asarray(sc.normals)
    tpts = np.asarray(tc.points)
    tnrm = np.asarray(tc.normals)
    kd = kdtree.build_kd_index(tpts, np.asarray(tc.valid))
    bmin, bmax = np.asarray(kd.block_min), np.asarray(kd.block_max)
    nc = len(bmin)
    tree = cKDTree(tpts)
    n = len(spts)
    bound = 10.0
    p = bench.SELECTION_P
    rng = np.random.default_rng(0)

    TILE = 128
    K = 4
    GS = [32, 64, 128, 256]
    caches = {g: np.full(n // g + 1, -1, np.int64) for g in GS}

    pose = np.eye(4, dtype=np.float32)
    solve = jax.jit(
        lambda s, t, ns, nt, w, v: linear.estimate_pose_symmetric(
            s, t, ns, nt, w, v
        )
    )

    def lb_blocks(q):
        gap = np.maximum(
            np.maximum(bmin[None] - q[:, None], q[:, None] - bmax[None]), 0
        )
        return (gap * gap).sum(-1)

    stats = {g: [] for g in GS}
    for it in range(bench.N_ITERATIONS):
        sel = np.flatnonzero(rng.random(n) < p)
        q = spts[sel] @ pose[:3, :3].T + pose[:3, 3]
        qn = snrm[sel] @ pose[:3, :3].T
        d, idx = tree.query(q, k=1, workers=-1)
        d2 = d * d
        ok = d2 <= bound
        # 60-deg rejection like the bench config
        dot = np.abs(np.sum(qn * tnrm[idx], axis=1))
        ok &= dot >= 0.5

        # Membership model per granule size (pad queries to tile multiple).
        lb = lb_blocks(q.astype(np.float32))
        order = np.argsort(lb, axis=1)[:, :K]
        topk = np.zeros_like(lb, bool)
        np.put_along_axis(topk, order, True, axis=1)
        resid = np.partition(lb, K, axis=1)[:, K]
        for g in GS:
            cache = caches[g]
            gid = sel // g
            cached = cache[gid]
            has = cached >= 0
            r = np.where(
                has,
                ((q - tpts[np.clip(cached, 0, n - 1)]) ** 2).sum(1)
                * (1 + 1e-6),
                bound,
            )
            r = np.minimum(r, bound)
            member = topk & (lb <= r[:, None])
            hot = member & (lb <= 0.0)
            npad = -(-len(q) // TILE) * TILE
            mt = np.zeros((npad, nc), bool)
            ht = np.zeros((npad, nc), bool)
            mt[: len(q)] = member
            ht[: len(q)] = hot
            mtile = mt.reshape(-1, TILE, nc).any(1)
            htile = ht.reshape(-1, TILE, nc).any(1)
            fail_rate = float((resid <= np.minimum(d2, bound)).mean())
            stats[g].append(
                (
                    float(np.sqrt(r[r < bound]).mean() if (r < bound).any() else np.nan),
                    float(has.mean()),
                    float(mtile.sum(1).mean()),
                    float(htile.sum(1).mean()),
                    fail_rate,
                )
            )
            # Cache update: valid matches scatter (last-wins like the
            # device path).
            cache[gid[ok]] = idx[ok]

        # Pose update with the real solver.
        inc = np.asarray(
            jax.device_get(
                solve(
                    jnp.asarray(q), jnp.asarray(tpts[idx]),
                    jnp.asarray(qn), jnp.asarray(tnrm[idx]),
                    jnp.ones(len(q), jnp.float32), jnp.asarray(ok),
                )
            )
        )
        pose = inc @ pose
        rmse = float(np.sqrt(np.mean(d2[ok]))) if ok.any() else float("nan")
        if it < 6 or it % 10 == 9:
            g = 128
            mr, seed, mb, hb, fr = stats[g][-1]
            log(
                f"it {it:2d}: rmse {rmse:7.4f} matches {ok.sum():5d} | "
                f"G=128: seeded {seed:4.2f} mean_r {mr:6.3f} "
                f"blocks/tile {mb:5.1f} (hot {hb:4.1f}) fail {fr:.3f}"
            )

    log("=== per-G summary (mean over iters 5..49) ===")
    for g in GS:
        arr = np.array(stats[g][5:])
        log(
            f"G={g:4d}: seeded {arr[:,1].mean():4.2f} "
            f"mean_r {np.nanmean(arr[:,0]):6.3f} "
            f"blocks/tile {arr[:,2].mean():5.1f} (hot {arr[:,3].mean():4.1f}) "
            f"fail {arr[:,4].mean():.3f}"
        )
    log("done")


def qorder_effect():
    """Membership counts with vs without the block-aligned enumeration at
    bench conditions (pose converged; radii = granule-level)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import bench
    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import kdtree

    sp, sn, tp, tn = bench.make_pairs()[0]
    sc = cloud_lib.from_numpy(sp, normals=sn, morton_order=True)
    tc = cloud_lib.from_numpy(tp, normals=tn, morton_order=True)
    spts = np.asarray(sc.points)
    tpts = np.asarray(tc.points)
    kd = kdtree.build_kd_index(tpts, np.asarray(tc.valid))
    bmin, bmax = np.asarray(kd.block_min), np.asarray(kd.block_max)
    order = kdtree.build_query_order(
        spts, np.asarray(sc.valid), kd
    )
    tree = cKDTree(tpts)
    rng = np.random.default_rng(1)
    n = len(spts)
    K, TILE = 4, 128

    def lb_blocks(q):
        gap = np.maximum(
            np.maximum(bmin[None] - q[:, None], q[:, None] - bmax[None]), 0
        )
        return (gap * gap).sum(-1)

    for name, enum in (("morton", np.arange(n)), ("block-aligned", order)):
        pos = np.flatnonzero(rng.random(n) < 0.01)
        sel = enum[pos]
        q = spts[sel]  # converged pose: source ~ target frame + perturb
        lb = lb_blocks(q.astype(np.float32))
        topk = np.zeros_like(lb, bool)
        np.put_along_axis(
            topk, np.argsort(lb, axis=1)[:, :K], True, axis=1
        )
        qm = q + rng.normal(0, 0.4, q.shape).astype(np.float32)
        _, im = tree.query(qm, k=1, workers=-1)
        r = np.minimum(((q - tpts[im]) ** 2).sum(1) * (1 + 1e-6), 10.0)
        member = topk & (lb <= r[:, None])
        hot = member & (lb <= 0.0)
        npad = -(-len(q) // TILE) * TILE
        mt = np.zeros((npad, member.shape[1]), bool)
        ht = np.zeros_like(mt)
        mt[: len(q)] = member
        ht[: len(q)] = hot
        mtile = mt.reshape(-1, TILE, member.shape[1]).any(1)
        htile = ht.reshape(-1, TILE, member.shape[1]).any(1)
        log(
            f"qorder[{name:13s}]: blocks/tile {mtile.sum(1).mean():5.1f} "
            f"(hot {htile.sum(1).mean():4.1f}, max {mtile.sum(1).max()})"
        )


if __name__ == "__main__":
    if "--qorder" in sys.argv:
        qorder_effect()
    else:
        main()
