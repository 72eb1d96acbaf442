"""Decompose nn_search_kd_radius: pallas prefix / +visit lists / kernel-only."""
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
    q = pts[rows]; tp = pairs[i][2]
    qprev = q + rng.normal(0, 0.05, q.shape).astype(np.float32)
    _, iprev = cKDTree(tp).query(qprev, k=1, workers=-1)
    r = ((q - tp[iprev])**2).sum(1).astype(np.float32) * (1+1e-6)
    qs.append(q); rs.append(np.minimum(r, 10.0))
q = jnp.asarray(np.stack(qs)); r = jnp.asarray(np.stack(rs))

def scan20(fn):
    def run(*a):
        def body(c, _):
            out = fn(a[0] + c*1e-6, *a[1:])
            return c + 1.0, jax.tree.map(lambda x: x[..., :1] if x.ndim else x, out)
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
    log(f"{name:34s}: {dt:8.3f} ms/iter-batch ({dt/B:6.3f}/pair, compile {tc:.0f}s)")

TQ = 128
def padq(queries):
    return knn._pad_rows(knn._pad_features(queries[:, :3]), kdtree._PREFIX_GROUP*TQ, 0.0)

def stage_prefix(queries, radius, index):
    qp = padq(queries)
    bound_val = jnp.float32(10.0)*(1+1e-6)+1e-30
    binit = jnp.pad(jnp.minimum(radius, bound_val), (0, qp.shape[0]-queries.shape[0]), constant_values=-1.0)
    member, hot, lb_tile, _resid, _mask, _rng = kdtree._radius_prefix(qp, binit, index, tile_q=TQ, k=0, interpret=False)
    return member.astype(jnp.float32) + hot.astype(jnp.float32) + lb_tile

def stage_lists(queries, radius, index):
    qp = padq(queries)
    nqt = qp.shape[0] // TQ
    bound_val = jnp.float32(10.0)*(1+1e-6)+1e-30
    binit = jnp.pad(jnp.minimum(radius, bound_val), (0, qp.shape[0]-queries.shape[0]), constant_values=-1.0)
    member, hot, lb_tile, _resid, _mask, _rng = kdtree._radius_prefix(qp, binit, index, tile_q=TQ, k=0, interpret=False)
    tb = jnp.maximum(jnp.max(binit.reshape(nqt, TQ), axis=1), 1e-30)[:, None]
    vlist, suffix, counts, counts0 = knn._visit_lists_from(lb_tile, member, tb)
    return vlist[..., :1].astype(jnp.float32) + suffix[..., :1] + counts[:, None].astype(jnp.float32)

SKIP = True
if not SKIP: timeit("pallas prefix only", scan20(lambda qq: jax.vmap(stage_prefix, (0,0,0))(qq, r, kd)), q)
if not SKIP: timeit("prefix + visit lists", scan20(lambda qq: jax.vmap(stage_lists, (0,0,0))(qq, r, kd)), q)
vm_warm = jax.vmap(lambda qq, rr, kk: kdtree.nn_search_kd_radius(qq, kk, 10.0, rr), (0, 0, 0))
if not SKIP: timeit("warm full", scan20(lambda qq: vm_warm(qq, r, kd)), q)
log("done")

def bound_case():
    rb = jnp.full_like(r, 10.0)
    timeit("warm full (radius=bound)", scan20(lambda qq: vm_warm(qq, rb, kd)), q)
    # loose-ish granule radii (stale 0.4)
    import numpy as _np
    rng2 = _np.random.default_rng(7)
    rl = jnp.asarray(_np.minimum(_np.asarray(r) * 0 + (0.4 + 0.1*rng2.random(r.shape))**2, 10.0).astype(_np.float32))
    timeit("warm full (granule-ish r~0.2)", scan20(lambda qq: vm_warm(qq, rl, kd)), q)
bound_case()
log("done2")
