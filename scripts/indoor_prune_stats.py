"""Pruning / certificate statistics: smooth-sheet vs indoor cloud family.

Host-side (CPU) probe at bench shapes: per-tile kd membership (what the
search kernels must move/compute), per-query certificate closure at
K=4, and match-rate under the threshold — quoted in ROADMAP.md so the
headline's pruning claims rest on the HARDER family, not the benign
sinusoid sheet (VERDICT r2 item 4).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from scipy.spatial import cKDTree  # noqa: E402

import bench  # noqa: E402
from icp_variants_tpu.core import cloud as cloud_lib  # noqa: E402
from icp_variants_tpu.ops import kdtree  # noqa: E402


def stats(name, pairs, n_pairs=4):
    rng = np.random.default_rng(0)
    memb, spans, fails, matched = [], [], [], []
    for sp, sn, tp, tn in pairs[:n_pairs]:
        tc = cloud_lib.from_numpy(tp, normals=tn, morton_order=True)
        sc = cloud_lib.from_numpy(sp, normals=sn, morton_order=True)
        kd = kdtree.build_kd_index(np.asarray(tc.points), np.asarray(tc.valid))
        spts = np.asarray(sc.points)
        valid = np.asarray(sc.valid)
        rows = np.flatnonzero((rng.random(len(spts)) < 0.012) & valid)[:4736]
        q = spts[rows]
        lb = np.asarray(kdtree._box_lb(
            jnp.asarray(q), kd.block_min, kd.block_max))
        order = np.argsort(lb, axis=1)
        sel = order[:, :4]
        resid = np.take_along_axis(lb, order[:, 4:5], axis=1)[:, 0]
        # exact best over the top-4 candidate blocks
        tpts_v = np.asarray(tc.points)
        tree = cKDTree(tpts_v)
        dref, _ = tree.query(q, k=1, workers=-1)
        d2ref = dref * dref
        fails.append((resid <= np.minimum(d2ref, 10.0) * (1 + 1e-6)).mean())
        matched.append((d2ref <= 10.0).mean())
        for t0 in range(0, len(q) - 127, 128):
            ids = sel[t0:t0 + 128].ravel()
            ok = lb[np.repeat(np.arange(t0, t0 + 128), 4), ids] <= 10.0
            ids = ids[ok]
            memb.append(len(np.unique(ids)))
            spans.append(int(ids.max() - ids.min() + 1) if len(ids) else 0)
    print(f"{name}: members/tile mean {np.mean(memb):.1f} "
          f"p90 {np.percentile(memb, 90):.0f} max {np.max(memb)}; "
          f"span/tile mean {np.mean(spans):.1f}; "
          f"certificate-fail {np.mean(fails) * 100:.3f}%; "
          f"in-threshold match rate {np.mean(matched) * 100:.1f}%",
          flush=True)


if __name__ == "__main__":
    stats("sheet ", bench.make_pairs())
    stats("indoor", bench.make_indoor_pairs())
