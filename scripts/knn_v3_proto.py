"""CPU prototype of the per-query 'v3' matcher over a balanced k-d
partition (recursive median splits -> equal-count leaves with DISJOINT
axis-aligned boxes; Morton tiles' overlapping AABBs made residual bounds
useless -- 64% fail).

  level 1: K1 argmin-extractions over coarse-node lower bounds (NQ, n_coarse)
  level 2: K2 argmin-extractions over leaf lbs of selected coarse (NQ, K1*F)
  gather:  (NQ, K2, leaf_cap, 3) candidates, direct-difference distances
  exact:   d2* < min(residual_lb1, residual_lb2) else fallback flag

Measures fail rates + verifies exactness against scipy.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.spatial import cKDTree

import bench
from icp_variants_tpu.ops import knn

BOUND = 10.0


def kd_partition(points, depth):
    """Recursive axis-median partition; returns permutation and per-leaf
    (start, count). Splits along the widest axis of each node's bbox."""
    n = len(points)
    perm = np.arange(n)
    nodes = [(0, n)]
    for _ in range(depth):
        nxt = []
        for s, c in nodes:
            seg = perm[s:s + c]
            p = points[seg]
            ax = int(np.argmax(p.max(0) - p.min(0)))
            h = c // 2
            ordv = np.argpartition(p[:, ax], h)
            perm[s:s + c] = seg[ordv]
            nxt.append((s, h))
            nxt.append((s + h, c - h))
        nodes = nxt
    return perm, nodes


def lb_to_boxes_np(q, bmin, bmax, chunk=512):
    out = np.empty((len(q), len(bmin)), np.float32)
    for s in range(0, len(q), chunk):
        qq = q[s:s + chunk]
        gap = np.maximum(
            np.maximum(bmin[None] - qq[:, None, :], qq[:, None, :] - bmax[None]), 0
        )
        out[s:s + chunk] = (gap * gap).sum(-1)
    return out


class V3Index:
    def __init__(self, tgt, leaf_depth=12, coarse_depth=9):
        self.fanout = 2 ** (leaf_depth - coarse_depth)
        perm, leaves = kd_partition(tgt, leaf_depth)
        self.perm = perm
        cap = max(c for _, c in leaves)
        self.cap = cap
        nl = len(leaves)
        pts = np.full((nl, cap, 3), 1e9, np.float32)
        self.leaf_orig = np.full((nl, cap), -1, np.int64)
        for i, (s, c) in enumerate(leaves):
            pts[i, :c] = tgt[perm[s:s + c]]
            self.leaf_orig[i, :c] = perm[s:s + c]
        self.leaf_pts = pts
        ptsm = np.where(pts > 9e8, np.nan, pts)
        self.l_min = np.nanmin(ptsm, axis=1)
        self.l_max = np.nanmax(ptsm, axis=1)
        # coarse = groups of `fanout` consecutive leaves
        self.c_min = self.l_min.reshape(-1, self.fanout, 3).min(1)
        self.c_max = self.l_max.reshape(-1, self.fanout, 3).max(1)
        print(f"  index: {nl} leaves cap {cap}, {len(self.c_min)} coarse, "
              f"fanout {self.fanout}")


def run(q, index, K1, K2):
    nq = len(q)
    F = index.fanout
    lb1 = lb_to_boxes_np(q, index.c_min, index.c_max)
    sel1 = np.empty((nq, K1), np.int64)
    w = lb1
    for k in range(K1):
        sel1[:, k] = w.argmin(1)
        w[np.arange(nq), sel1[:, k]] = np.inf
    r1 = w.min(1)

    leafids = (sel1[:, :, None] * F + np.arange(F)[None, None, :]).reshape(nq, -1)
    gap = np.maximum(
        np.maximum(index.l_min[leafids] - q[:, None, :],
                   q[:, None, :] - index.l_max[leafids]), 0)
    lb2 = (gap * gap).sum(-1)
    sel2 = np.empty((nq, K2), np.int64)
    w = lb2
    for k in range(K2):
        a = w.argmin(1)
        sel2[:, k] = leafids[np.arange(nq), a]
        w[np.arange(nq), a] = np.inf
    r2 = w.min(1)

    cand = index.leaf_pts[sel2]  # (NQ, K2, cap, 3)
    d2 = ((q[:, None, None, :] - cand) ** 2).sum(-1).reshape(nq, -1)
    best = d2.argmin(1)
    d2s = d2[np.arange(nq), best]
    idx = index.leaf_orig[sel2[np.arange(nq), best // index.cap],
                          best % index.cap]

    resid = np.minimum(r1, r2)
    fail = resid <= np.minimum(d2s, BOUND)
    return idx, d2s, fail


def main():
    src, _ = bench.synth_cloud(bench.N_POINTS, 0)
    tgt, _ = bench.synth_cloud(bench.N_POINTS, 1)
    src = src[np.argsort(knn.morton_codes_np(src))]
    rng = np.random.default_rng(0)
    sel = np.flatnonzero(rng.random(len(src)) < 0.01)

    index = V3Index(tgt)
    tree = cKDTree(tgt)

    for ang, tr in ((0.05, 0.5), (0.005, 0.05), (0.0, 0.0)):
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0],
             [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        q = (src[sel] @ R.T + np.array([tr, -tr * 0.6, tr * 0.2], np.float32))
        dref, iref = tree.query(q, k=1, workers=-1)
        d2ref = (dref * dref).astype(np.float32)
        within = d2ref <= BOUND
        for K1, K2 in ((2, 4), (4, 6), (4, 8), (6, 8), (6, 12)):
            t0 = time.time()
            idx, d2s, fail = run(q, index, K1, K2)
            ok = ~fail
            m = ok & within
            # f32 tie tolerance: compare distances, not indices
            agree = (idx[m] == iref[m]) | (
                np.abs(d2s[m] - d2ref[m]) <= 1e-4 + 1e-4 * d2ref[m])
            nbad = (~agree).sum()
            print(
                f"ang={ang:5.3f} K1={K1} K2={K2}: fail {fail.mean()*100:6.2f}%  "
                f"bad(non-failed) {nbad}  ({time.time()-t0:.1f}s)")
            if nbad:
                b = np.flatnonzero(m)[~agree][:5]
                for bi in b:
                    print(f"    q={bi} ours={idx[bi]} d2={d2s[bi]:.6e} "
                          f"ref={iref[bi]} d2ref={d2ref[bi]:.6e} "
                          f"resid={np.minimum(10.0, d2s[bi]):.3e}")


if __name__ == "__main__":
    main()
