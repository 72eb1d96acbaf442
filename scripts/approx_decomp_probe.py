"""Resident-kernel decomposition + sweeps at the APPROXIMATE arm's k=1
membership (checks=16): probe bisection (copy/walk/full), gate-width and
tile_q sweeps. The k=4 sweeps (scripts/evidence/resident_bench_log.txt)
picked gate=64/tile_q=128; with ~4x fewer member blocks per tile the
balance may shift. Appends to scripts/evidence/approx_arm_log.txt.
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
LOG = os.path.join(REPO, "scripts", "evidence", "approx_arm_log.txt")


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
    log(f"=== approx (k=1) resident decomposition + sweeps ({B} pairs) ===")

    def scan_of(fn):
        def run(qb):
            def body(c, _):
                out = fn(qb + c * 1e-6)
                return c + 1.0, jax.tree.map(lambda x: x[..., :1], out)
            _, outs = jax.lax.scan(body, 0.0, None, length=20)
            return outs
        return jax.jit(run)

    @functools.partial(
        jax.jit, static_argnames=("probe", "k", "tile_q", "gate_width"))
    def search_probe(qb, kd, probe=0, k=1, tile_q=128, gate_width=64):
        def one(qq, kk):
            d = kk.block_min.shape[1]
            qp = knn._pad_rows(
                knn._pad_features(qq[:, :d]),
                kdtree._PREFIX_GROUP * tile_q, 0.0)
            bound = jnp.float32(10.0) * (1 + 1e-6) + 1e-30
            binit = jnp.pad(
                jnp.full((qq.shape[0],), bound, jnp.float32),
                (0, qp.shape[0] - qq.shape[0]), constant_values=-1.0)
            member, hot, lb_tile, resid, submask, _rng = kdtree._radius_prefix(
                qp, binit, kk, tile_q=tile_q, k=k, interpret=False)
            dist, idx = knn._run_resident_kernel_flat(
                qp[None], binit[None], hot[None], (member & ~hot)[None],
                lb_tile[None], submask[None], kk.pages[None], 10.0,
                tile_q=tile_q, tile_t=kk.pages.shape[2], n_features=d,
                gate_width=gate_width, interpret=False, probe=probe)
            return dist[0], idx[0]
        return jax.vmap(one)(qb, kd)

    def timeit(name, **kw):
        fn = scan_of(lambda qb: search_probe(qb, kd, **kw))
        # The remote compile service throws transient HTTP errors
        # (1-400 s latency, occasional dropped responses) — retry the
        # compiling call a few times before giving up on the config.
        for attempt in range(4):
            t0 = time.perf_counter()
            try:
                out = fn(q)
                jax.device_get(jax.tree.leaves(out)[0])
                break
            except Exception as e:  # noqa: BLE001 — transient compile RPC
                log(f"{name}: compile attempt {attempt} failed "
                    f"({type(e).__name__}: {str(e)[:120]}); retrying")
                time.sleep(20)
        else:
            log(f"{name}: SKIPPED (compile failed 4x)")
            return
        tc = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(q)
            jax.device_get(jax.tree.leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / 3 / 20 * 1000)
        log(f"{name:34s}: {best:8.3f} ms/iter-batch "
            f"({best / B:6.3f}/pair, compile {tc:.0f}s)")

    timeit("k=1 probe=2 copy+codeDMA", probe=2, k=1)
    timeit("k=1 probe=1 +walk", probe=1, k=1)
    timeit("k=1 full gate=64", probe=0, k=1)
    timeit("k=1 full gate=32", probe=0, k=1, gate_width=32)
    timeit("k=1 full gate=16", probe=0, k=1, gate_width=16)
    timeit("k=1 full gate=128", probe=0, k=1, gate_width=128)
    timeit("k=1 full gate=64 tile_q=256", probe=0, k=1, tile_q=256)
    timeit("k=1 full gate=128 tile_q=256", probe=0, k=1, tile_q=256,
           gate_width=128)
    timeit("k=4 full gate=64 (ref)", probe=0, k=4)
    log("decomp done")
    return 0


if __name__ == "__main__":
    sys.exit(main())


def followup():
    """gate=32 + tile_q=256 combo and per-k gate check (run after main)."""
    # Reuse main()'s machinery by calling it with a trimmed sweep is
    # clumsy; quickest is to re-import and rebuild the closures here.
    import numpy as np
    import jax
    import jax.numpy as jnp
    import functools

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
    log(f"=== followup: gate32+tq256 combos ===")

    def scan_of(fn):
        def run(qb):
            def body(c, _):
                out = fn(qb + c * 1e-6)
                return c + 1.0, jax.tree.map(lambda x: x[..., :1], out)
            _, outs = jax.lax.scan(body, 0.0, None, length=20)
            return outs
        return jax.jit(run)

    @functools.partial(
        jax.jit, static_argnames=("probe", "k", "tile_q", "gate_width"))
    def search_probe(qb, kd, probe=0, k=1, tile_q=128, gate_width=64):
        def one(qq, kk):
            d = kk.block_min.shape[1]
            qp = knn._pad_rows(
                knn._pad_features(qq[:, :d]),
                kdtree._PREFIX_GROUP * tile_q, 0.0)
            bound = jnp.float32(10.0) * (1 + 1e-6) + 1e-30
            binit = jnp.pad(
                jnp.full((qq.shape[0],), bound, jnp.float32),
                (0, qp.shape[0] - qq.shape[0]), constant_values=-1.0)
            member, hot, lb_tile, resid, submask, _rng = kdtree._radius_prefix(
                qp, binit, kk, tile_q=tile_q, k=k, interpret=False)
            dist, idx = knn._run_resident_kernel_flat(
                qp[None], binit[None], hot[None], (member & ~hot)[None],
                lb_tile[None], submask[None], kk.pages[None], 10.0,
                tile_q=tile_q, tile_t=kk.pages.shape[2], n_features=d,
                gate_width=gate_width, interpret=False, probe=probe)
            return dist[0], idx[0]
        return jax.vmap(one)(qb, kd)

    def timeit(name, **kw):
        fn = scan_of(lambda qb: search_probe(qb, kd, **kw))
        for attempt in range(4):
            t0 = time.perf_counter()
            try:
                out = fn(q)
                jax.device_get(jax.tree.leaves(out)[0])
                break
            except Exception as e:  # noqa: BLE001
                log(f"{name}: compile attempt {attempt} failed "
                    f"({type(e).__name__}: {str(e)[:120]}); retrying")
                time.sleep(20)
        else:
            log(f"{name}: SKIPPED (compile failed 4x)")
            return
        tc = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(q)
            jax.device_get(jax.tree.leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / 3 / 20 * 1000)
        log(f"{name:34s}: {best:8.3f} ms/iter-batch "
            f"({best / B:6.3f}/pair, compile {tc:.0f}s)")

    timeit("k=1 gate=32 tile_q=256", k=1, tile_q=256, gate_width=32)
    timeit("k=1 gate=16 tile_q=256", k=1, tile_q=256, gate_width=16)
    timeit("k=1 gate=32 (rep)", k=1, gate_width=32)
    timeit("k=4 gate=32", k=4, gate_width=32)
    timeit("k=2 gate=32", k=2, gate_width=32)
    log("followup done")
    return 0
