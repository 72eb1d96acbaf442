"""TPU stage breakdown of the kd matchers: XLA prefix (lb/member/lists)
vs the visited-list kernel vs full search, union vs warm-radius."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence", "warm_stage_log.txt")
def log(m):
    line = f"[{time.strftime('%H:%M:%S')}] {m}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n"); f.flush(); os.fsync(f.fileno())

import numpy as np
import jax, jax.numpy as jnp
import bench
from icp_variants_tpu.core import cloud as cloud_lib
from icp_variants_tpu.ops import kdtree, knn
from scipy.spatial import cKDTree

B, NQ = 16, 4736
pairs = bench.make_pairs()
tclouds = [cloud_lib.from_numpy(tp, normals=tn, morton_order=True) for (_,_,tp,tn) in pairs]
kd = kdtree.stack_kd_indexes([
    kdtree.build_kd_index(np.asarray(t.points), np.asarray(t.valid)) for t in tclouds])
sclouds = [cloud_lib.from_numpy(sp, normals=sn, morton_order=True) for (sp,sn,_,_) in pairs]
rng = np.random.default_rng(0)
qs, rs = [], []
for i, sc in enumerate(sclouds):
    pts = np.asarray(sc.points); valid = np.asarray(sc.valid)
    rows = np.flatnonzero((rng.random(len(pts)) < 0.02) & valid)[:NQ]
    q = pts[rows]
    tp = pairs[i][2]
    qprev = q + rng.normal(0, 0.05, q.shape).astype(np.float32)
    _, iprev = cKDTree(tp).query(qprev, k=1, workers=-1)
    r = ((q - tp[iprev])**2).sum(1).astype(np.float32) * (1+1e-6)
    qs.append(q); rs.append(np.minimum(r, 10.0))
q = jnp.asarray(np.stack(qs)); r = jnp.asarray(np.stack(rs))

def scan20(fn):
    def run(*a):
        def body(c, _):
            out = fn(a[0] + c*1e-6, *a[1:])
            return c + 1.0, jax.tree.map(lambda x: x[..., :1], out)
        _, outs = jax.lax.scan(body, 0.0, None, length=20)
        return outs
    return jax.jit(run)

def timeit(name, fn, *a):
    t0 = time.perf_counter(); out = fn(*a)
    jax.device_get(jax.tree.leaves(out)[0]); tc = time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*a)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter()-t0)/3/20*1000
    log(f"{name:32s}: {dt:8.3f} ms/iter-batch ({dt/B:6.3f}/pair, compile {tc:.0f}s)")

# 1. union full
vm_union = jax.vmap(lambda qq, kk: kdtree.nn_search_kd_union(qq, kk, 10.0), (0, 0))
timeit("union full", scan20(lambda qq: vm_union(qq, kd)), q)

# 2. warm full (stale 0.05 radii)
vm_warm = jax.vmap(lambda qq, rr, kk: kdtree.nn_search_kd_radius(qq, kk, 10.0, rr), (0, 0, 0))
timeit("warm full (stale .05)", scan20(lambda qq: vm_warm(qq, r, kd)), q)

# 3. warm full radius=bound (iter-1 cost)
rb = jnp.full_like(r, 10.0)
timeit("warm full (radius=bound)", scan20(lambda qq: vm_warm(qq, rb, kd)), q)

# 4. XLA prefix of warm: lb + member + lists (no kernel)
def warm_prefix(queries, radius, index):
    d = index.block_min.shape[1]; nc = index.pages.shape[0]
    qp = knn._pad_rows(knn._pad_features(queries[:, :d]), 128, 0.0)
    nqt = qp.shape[0] // 128
    bound_val = jnp.float32(10.0)*(1+1e-6)+1e-30
    binit = jnp.pad(jnp.minimum(radius, bound_val), (0, qp.shape[0]-queries.shape[0]), constant_values=-1.0)
    lb = kdtree._box_lb(qp[:, :d], index.block_min, index.block_max)
    member = jnp.any((lb <= binit[:, None]).reshape(nqt, 128, nc), axis=1)
    lb_tile = jnp.min(lb.reshape(nqt, 128, nc), axis=1)
    tile_bound = jnp.maximum(jnp.max(binit.reshape(nqt, 128), axis=1), 1e-30)[:, None]
    return knn._visit_lists_from(lb_tile, member, tile_bound)
vm_pre = jax.vmap(warm_prefix, (0, 0, 0))
timeit("warm XLA prefix only", scan20(lambda qq: vm_pre(qq, r, kd)), q)

# 5. union XLA prefix (lb + extract + member + lists)
def union_prefix(queries, index):
    d = index.block_min.shape[1]; nc = index.pages.shape[0]
    qp = knn._pad_rows(knn._pad_features(queries[:, :d]), 128, 0.0)
    nqt = qp.shape[0] // 128
    lb = kdtree._box_lb(qp[:, :d], index.block_min, index.block_max)
    sel, resid = kdtree._extract_min(lb, 4)
    rows = (jnp.arange(qp.shape[0], dtype=jnp.int32) // 128)[:, None]
    member = jnp.zeros((nqt, nc), bool)
    member = member.at[jnp.broadcast_to(rows, sel.shape).reshape(-1), sel.reshape(-1)].set(True)
    lb_tile = jnp.min(lb.reshape(nqt, 128, nc), axis=1)
    bound_val = jnp.float32(10.0)*(1+1e-6)+1e-30
    return knn._visit_lists_from(lb_tile, member, jnp.broadcast_to(bound_val, (nqt, 1)))
vm_upre = jax.vmap(union_prefix, (0, 0))
timeit("union XLA prefix only", scan20(lambda qq: vm_upre(qq, kd)), q)
log("done")
