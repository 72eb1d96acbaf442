"""Host-side diagnostic: how many blocks does each 128-query tile's
membership cover under (a) kd-union top-K=4, (b) warm radii at several
staleness levels? Counts drive the visited-list kernel's work."""
import numpy as np, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from scipy.spatial import cKDTree

pairs = bench.make_pairs()[:1]
sp, sn, tp, tn = pairs[0]

from icp_variants_tpu.core import cloud as cloud_lib
import jax
jax.config.update("jax_platforms", "cpu")
tc = cloud_lib.from_numpy(tp, normals=tn, morton_order=True)
sc = cloud_lib.from_numpy(sp, normals=sn, morton_order=True)
from icp_variants_tpu.ops import kdtree
kd = kdtree.build_kd_index(np.asarray(tc.points), np.asarray(tc.valid))
bmin, bmax = np.asarray(kd.block_min), np.asarray(kd.block_max)

rng = np.random.default_rng(0)
spts = np.asarray(sc.points)
rows = np.flatnonzero(rng.random(len(spts)) < 0.02)[:4736]
assert len(rows) == 4736
q = spts[rows]
tree = cKDTree(tp)

def lb_of(q):
    gap = np.maximum(np.maximum(bmin[None] - q[:, None], q[:, None] - bmax[None]), 0)
    return (gap * gap).sum(-1)

def report(name, member):
    m = member.reshape(-1, 128, member.shape[1]).any(1)
    print(f"{name:28s}: mean blocks/tile {m.sum(1).mean():7.1f}  max {m.sum(1).max()}")

lb = lb_of(q)
# union top-K=4
sel = np.argsort(lb, 1)[:, :4]
member = np.zeros_like(lb, bool)
np.put_along_axis(member, sel, True, 1)
report("union top-4 (current prod)", member)

for sigma in (0.5, 0.2, 0.05, 0.01):
    q_now = q  # current positions
    q_prev = q + rng.normal(0, sigma, q.shape).astype(np.float32)  # stale by sigma
    _, iprev = tree.query(q_prev, k=1, workers=-1)
    r = ((q_now - tp[iprev]) ** 2).sum(1) * (1 + 1e-6)
    r = np.minimum(r, 10.0)
    report(f"warm radii (stale {sigma})", lb <= r[:, None])
# radius = threshold (iteration 1)
report("radius=bound (iter 1)", lb <= 10.0)

# --- granule cache + per-tile-bbox membership -----------------------------
print("\n=== granule cache + per-tile membership ===")
def tile_lb(qm, qM):
    gap = np.maximum(np.maximum(bmin[None] - qM[:, None], qm[:, None] - bmax[None]), 0)
    return (gap * gap).sum(-1)

for G in (64, 128, 256):
    for it, seeded_frac in (("iter2", 1 - (1 - 0.01) ** (64 if G==64 else G) ** 0), None, ):
        break
    # simulate: granules seeded with probability 1-(1-p)^(G*iters)
    for iters in (1, 3, 10):
        p_seed = 1 - (1 - 0.01) ** (G * iters)
        gid = rows // G
        rng2 = np.random.default_rng(42 + G + iters)
        seeded = rng2.random(len(q)) < p_seed
        # granule-mate match: NN of a point within granule diameter
        diam = np.sqrt(G / 228.0)  # ~granule patch side, m
        qmate = q + rng2.normal(0, diam / 2, q.shape).astype(np.float32)
        _, imate = tree.query(qmate, k=1, workers=-1)
        r = ((q - tp[imate]) ** 2).sum(1) * (1 + 1e-6)
        r = np.where(seeded, np.minimum(r, 10.0), 10.0)
        qt = q.reshape(-1, 128, 3)
        qm, qM = qt.min(1), qt.max(1)
        lbt = tile_lb(qm, qM)
        tb = r.reshape(-1, 128).max(1)
        member = lbt <= tb[:, None]
        print(f"G={G:4d} after iter {iters:2d} (seeded {p_seed:.2f}): "
              f"mean blocks/tile {member.sum(1).mean():7.1f} max {member.sum(1).max()}")
