"""Resident-pages kernel vs union matcher at bench shapes (16 pairs,
4736 queries each vs 365k targets, bound 10, 20-iter scan) + hardware
exactness of the resident path."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "evidence", "resident_bench_log.txt"
)


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
    nc, _, tile_t = jax.tree.leaves(kd)[4].shape[1:]  # pages (B, nc, 8, tt)
    log(f"pages: nc={nc} tile_t={tile_t} "
        f"bytes/pair={nc * 8 * tile_t * 4 / 1e6:.2f} MB "
        f"fits={knn.resident_fits(nc, tile_t)}")
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
    log(f"=== resident vs union, {B} pairs x {NQ} q, 20-iter scan ===")

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
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(q)
            jax.device_get(jax.tree.leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / 3 / 20 * 1000)
        log(f"{name:34s} {best:8.3f} ms/iter-batch "
            f"({best / B:6.3f}/pair, compile {tc:.0f}s)")

    vm_res = jax.vmap(
        lambda qq, kk: kdtree.nn_search_kd_resident(qq, kk, 10.0), (0, 0))
    timeit("resident kernel", scan_of(lambda qb: vm_res(qb, kd)))

    vm_union = jax.vmap(
        lambda qq, kk: kdtree.nn_search_kd_union(qq, kk, 10.0), (0, 0))
    timeit("union kernel", scan_of(lambda qb: vm_union(qb, kd)))

    # Hardware exactness vs scipy, pair 0 + fail counts for all pairs.
    from scipy.spatial import cKDTree
    kd0 = jax.tree.map(lambda x: x[0], kd)
    i_r, d2_r, fail_r = map(
        np.asarray, kdtree.nn_search_kd_resident(q[0], kd0, 10.0))
    tpts = np.asarray(tclouds[0].points)
    dref, iref = cKDTree(tpts).query(np.asarray(q[0]), k=1, workers=-1)
    d2ref = dref * dref
    w = (~fail_r) & (d2ref <= 10.0)
    agree = ((i_r[w] == iref[w]) | np.isclose(d2_r[w], d2ref[w], rtol=1e-5)).mean()
    log(f"hardware exactness (pair 0, ~fail rows): {agree:.6f} "
        f"fail={fail_r.mean():.4f}")
    assert agree == 1.0, "resident kernel mismatch on hardware"
    fails = jax.device_get(jax.vmap(
        lambda qq, kk: kdtree.nn_search_kd_resident(qq, kk, 10.0)[2].sum(),
        (0, 0))(q, kd))
    log(f"  resident fail counts per pair: {np.asarray(fails).tolist()}")
    log("done")


if __name__ == "__main__":
    main()


def gate_sweep():
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
    log(f"=== resident gate-width sweep ({B} pairs, 20-iter scan) ===")

    def scan_of(fn):
        def run(qb):
            def body(c, _):
                out = fn(qb + c * 1e-6)
                return c + 1.0, jax.tree.map(lambda x: x[..., :1], out)
            _, outs = jax.lax.scan(body, 0.0, None, length=20)
            return outs
        return jax.jit(run)

    # tile_q=256 OOMs the prefix kernel's 16 MB scoped VMEM (measured:
    # 20.08M requested) — resident sweeps stay at tile_q=128.
    import itertools
    for gw, tq in itertools.product((64, 128), (256,)):
        if gw > tq:
            continue
        vm = jax.vmap(
            lambda qq, kk, gw=gw, tq=tq: kdtree.nn_search_kd_resident(
                qq, kk, 10.0, gate_width=gw, tile_q=tq), (0, 0))
        fn = scan_of(lambda qb, vm=vm: vm(qb, kd))
        t0 = time.perf_counter()
        out = fn(q)
        jax.device_get(jax.tree.leaves(out)[0])
        tc = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(q)
            jax.device_get(jax.tree.leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / 3 / 20 * 1000)
        log(f"gate={gw:3d} tile_q={tq:3d}: {best:8.3f} ms/iter-batch "
            f"({best / B:6.3f}/pair, compile {tc:.0f}s)")
    log("done")


def probe_decomp():
    """Fixed-cost bisection of the resident kernel: probe=2 (page copy +
    code DMA only), probe=1 (+ walk), full (gate=8). Differences isolate
    the bulk copy, the scalar walk, and the gated compute."""
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
    log(f"=== resident probe decomposition ({B} pairs, 20-iter scan) ===")

    def scan_of(fn):
        def run(qb):
            def body(c, _):
                out = fn(qb + c * 1e-6)
                return c + 1.0, jax.tree.map(lambda x: x[..., :1], out)
            _, outs = jax.lax.scan(body, 0.0, None, length=20)
            return outs
        return jax.jit(run)

    import functools

    @functools.partial(jax.jit, static_argnames=("probe",))
    def search_probe(qb, kd, probe):
        def one(qq, kk):
            d = kk.block_min.shape[1]
            qp = knn._pad_rows(
                knn._pad_features(qq[:, :d]),
                kdtree._PREFIX_GROUP * kdtree.TILE_Q_DEFAULT, 0.0)
            bound = jnp.float32(10.0) * (1 + 1e-6) + 1e-30
            binit = jnp.pad(
                jnp.full((qq.shape[0],), bound, jnp.float32),
                (0, qp.shape[0] - qq.shape[0]), constant_values=-1.0)
            member, hot, lb_tile, resid, submask, _rng = kdtree._radius_prefix(
                qp, binit, kk, tile_q=128, k=4, interpret=False)
            dist, idx = knn._run_resident_kernel_flat(
                qp[None], binit[None], hot[None], (member & ~hot)[None],
                lb_tile[None], submask[None], kk.pages[None], 10.0,
                tile_q=128, tile_t=kk.pages.shape[2], n_features=d,
                gate_width=8, interpret=False, probe=probe)
            return dist[0], idx[0]
        return jax.vmap(one)(qb, kd)

    for probe, name in ((2, "copy+codeDMA only"), (1, "+ scalar walk"),
                        (0, "full (gate=8)")):
        fn = scan_of(lambda qb, probe=probe: search_probe(qb, kd, probe))
        t0 = time.perf_counter()
        out = fn(q)
        jax.device_get(jax.tree.leaves(out)[0])
        tc = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(q)
            jax.device_get(jax.tree.leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / 3 / 20 * 1000)
        log(f"probe={probe} {name:22s}: {best:8.3f} ms/iter-batch "
            f"({best / B:6.3f}/pair, compile {tc:.0f}s)")
    # Also: prefix alone (the XLA-visible part of the bitmap path).
    fn = scan_of(lambda qb: jax.vmap(
        lambda qq, kk: kdtree._radius_prefix(
            knn._pad_rows(knn._pad_features(qq[:, :3]), 1024, 0.0),
            jnp.full((5120,), 10.0, jnp.float32), kk,
            tile_q=128, k=4, interpret=False)[0])(qb, kd))
    t0 = time.perf_counter()
    out = fn(q)
    jax.device_get(jax.tree.leaves(out)[0])
    tc = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(q)
        jax.device_get(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / 3 / 20 * 1000)
    log(f"prefix kernel only            : {best:8.3f} ms/iter-batch "
        f"({best / B:6.3f}/pair, compile {tc:.0f}s)")
    log("done")


def block_sweep():
    """Resident kernel vs kd block size: with zero per-block DMA, finer
    blocks cut per-query candidates (K x cap) at the same page bytes —
    the union path's DMA-issue argument against them no longer applies."""
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
    log(f"=== resident block_target sweep ({B} pairs, 20-iter scan) ===")

    def scan_of(fn):
        def run(qb):
            def body(c, _):
                out = fn(qb + c * 1e-6)
                return c + 1.0, jax.tree.map(lambda x: x[..., :1], out)
            _, outs = jax.lax.scan(body, 0.0, None, length=20)
            return outs
        return jax.jit(run)

    from scipy.spatial import cKDTree
    for bt in (768, 512, 384, 256):
        kd = kdtree.stack_kd_indexes([
            kdtree.build_kd_index(
                np.asarray(t.points), np.asarray(t.valid), block_target=bt)
            for t in tclouds
        ])
        nc, _, tile_t = jax.tree.leaves(kd)[4].shape[1:]
        vm = jax.vmap(
            lambda qq, kk: kdtree.nn_search_kd_resident(qq, kk, 10.0), (0, 0))
        fn = scan_of(lambda qb, vm=vm, kd=kd: vm(qb, kd))
        t0 = time.perf_counter()
        out = fn(q)
        jax.device_get(jax.tree.leaves(out)[0])
        tc = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(q)
            jax.device_get(jax.tree.leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / 3 / 20 * 1000)
        # exactness spot-check on pair 0
        kd0 = jax.tree.map(lambda x: x[0], kd)
        i_r, d2_r, fail_r = map(
            np.asarray, kdtree.nn_search_kd_resident(q[0], kd0, 10.0))
        tpts = np.asarray(tclouds[0].points)
        dref, iref = cKDTree(tpts).query(np.asarray(q[0]), k=1, workers=-1)
        d2ref = dref * dref
        w = (~fail_r) & (d2ref <= 10.0)
        agree = ((i_r[w] == iref[w])
                 | np.isclose(d2_r[w], d2ref[w], rtol=1e-5)).mean()
        log(f"bt={bt:4d} (nc={nc:4d} cap={tile_t:4d}): {best:8.3f} "
            f"ms/iter-batch ({best / B:6.3f}/pair, compile {tc:.0f}s, "
            f"agree {agree:.6f} fail {fail_r.mean():.4f})")
    log("done")
