"""Union-kernel matcher vs flat-gather kd vs v2 visited-list at bench
shapes (16 pairs, 4736 queries each vs 365k targets, bound 10, 20-iter
scan)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence", "kd_union_bench_log.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import bench
    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import kdtree, knn

    B, NQ = 16, 4736
    pairs = bench.make_pairs()
    tclouds = [
        cloud_lib.from_numpy(tp, normals=tn, morton_order=True)
        for (_, _, tp, tn) in pairs
    ]
    kd = kdtree.stack_kd_indexes([
        kdtree.build_kd_index(np.asarray(t.points), np.asarray(t.valid))
        for t in tclouds
    ])
    tin = jax.tree.map(lambda *xs: jnp.stack(xs), *[
        knn.build_target_index(t.points, tile_t=knn.V2_TILE_T)
        for t in tclouds
    ])
    rng = np.random.default_rng(0)
    # Pipeline-realistic queries: p=0.01 Bernoulli rows of the MORTON-
    # ORDERED source cloud (the compacted-selection gather preserves the
    # order), slightly perturbed — query tiles are spatially coherent,
    # which is what the per-tile union exploits. Uniform unordered queries
    # make every tile's union span the whole cloud (first probe run in the
    # log: 5.2 ms/pair vs 1.5 gather — an artifact of unordered queries).
    sclouds = [
        cloud_lib.from_numpy(sp, normals=sn, morton_order=True)
        for (sp, sn, _, _) in pairs
    ]
    qs = []
    for b, sc in enumerate(sclouds):
        pts = np.asarray(sc.points)
        valid = np.asarray(sc.valid)
        rows = np.flatnonzero((rng.random(len(pts)) < 0.012) & valid)[:NQ]
        rows = np.pad(rows, (0, NQ - len(rows)), mode="edge")
        qs.append(pts[rows] + rng.normal(0, 0.02, (NQ, 3)).astype(np.float32))
    q = jnp.asarray(np.stack(qs).astype(np.float32))
    log(f"=== union vs gather vs v2, {B} pairs x {NQ} q (morton-coherent), 20-iter scan ===")

    def scan_of(fn):
        def run(qb):
            def body(c, _):
                out = fn(qb + c * 1e-6)
                return c + 1.0, jax.tree.map(lambda x: x[..., :1], out)
            _, outs = jax.lax.scan(body, 0.0, None, length=20)
            return outs
        return jax.jit(run)

    def timeit(name, fn):
        t0 = time.perf_counter()
        out = fn(q)
        jax.device_get(jax.tree.leaves(out)[0])
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(q)
        jax.device_get(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / 3 / 20 * 1000
        log(f"{name:34s} {dt:8.3f} ms/iter-batch ({dt/B:6.3f}/pair, compile {tc:.0f}s)")

    vm_union = jax.vmap(
        lambda qq, kk: kdtree.nn_search_kd_union(qq, kk, 10.0), (0, 0))
    timeit("union kernel", scan_of(lambda qb: vm_union(qb, kd)))
    fails = jax.device_get(jax.vmap(
        lambda qq, kk: kdtree.nn_search_kd_union(qq, kk, 10.0)[2].sum(),
        (0, 0))(q, kd))
    log(f"  union fail counts per pair: {np.asarray(fails).tolist()}")

    vm_gather = jax.vmap(
        lambda qq, kk: kdtree.nn_search_kd(qq, kk, 10.0), (0, 0))
    timeit("flat-gather search", scan_of(lambda qb: vm_gather(qb, kd)))

    vm_v2 = jax.vmap(
        lambda qq, tt: knn.nn_search_pruned_v2(qq, tt, 10.0), (0, 0))
    timeit("v2 visited-list (radius)", scan_of(lambda qb: vm_v2(qb, tin)))

    # exactness on hardware vs scipy, pair 0
    from scipy.spatial import cKDTree
    i_u, d2_u, fail_u = kdtree.nn_search_kd_union(q[0], kd and jax.tree.map(lambda x: x[0], kd), 10.0)
    tpts = np.asarray(tclouds[0].points)
    dref, iref = cKDTree(tpts).query(np.asarray(q[0]), k=1, workers=-1)
    d2ref = dref * dref
    i_u, d2_u, fail_u = np.asarray(i_u), np.asarray(d2_u), np.asarray(fail_u)
    w = (~fail_u) & (d2ref <= 10.0)
    agree = ((i_u[w] == iref[w]) | np.isclose(d2_u[w], d2ref[w], rtol=1e-5)).mean()
    log(f"hardware exactness (pair 0, ~fail rows): {agree:.6f}  fail={fail_u.mean():.4f}")
    log("done")


if __name__ == "__main__":
    main()


def tile_q_sweep():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import bench
    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import kdtree

    B, NQ = 16, 4736
    pairs = bench.make_pairs()
    tclouds = [
        cloud_lib.from_numpy(tp, normals=tn, morton_order=True)
        for (_, _, tp, tn) in pairs
    ]
    kd = kdtree.stack_kd_indexes([
        kdtree.build_kd_index(np.asarray(t.points), np.asarray(t.valid))
        for t in tclouds
    ])
    sclouds = [
        cloud_lib.from_numpy(sp, normals=sn, morton_order=True)
        for (sp, sn, _, _) in pairs
    ]
    rng = np.random.default_rng(0)
    qs = []
    for sc in sclouds:
        pts = np.asarray(sc.points)
        valid = np.asarray(sc.valid)
        rows = np.flatnonzero((rng.random(len(pts)) < 0.012) & valid)[:NQ]
        rows = np.pad(rows, (0, NQ - len(rows)), mode="edge")
        qs.append(pts[rows] + rng.normal(0, 0.02, (NQ, 3)).astype(np.float32))
    q = jnp.asarray(np.stack(qs).astype(np.float32))
    log(f"=== union tile_q sweep ({B} pairs, 20-iter scan) ===")

    def scan_of(fn):
        def run(qb):
            def body(c, _):
                out = fn(qb + c * 1e-6)
                return c + 1.0, jax.tree.map(lambda x: x[..., :1], out)
            _, outs = jax.lax.scan(body, 0.0, None, length=20)
            return outs
        return jax.jit(run)

    for tq in (64, 128, 256):
        vm = jax.vmap(
            lambda qq, kk: kdtree.nn_search_kd_union(qq, kk, 10.0, tile_q=tq),
            (0, 0))
        fn = scan_of(lambda qb: vm(qb, kd))
        t0 = time.perf_counter()
        out = fn(q)
        jax.device_get(jax.tree.leaves(out)[0])
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(q)
        jax.device_get(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / 3 / 20 * 1000
        log(f"tile_q={tq:4d}: {dt:8.3f} ms/iter-batch ({dt/B:6.3f}/pair, compile {tc:.0f}s)")
    log("done")
