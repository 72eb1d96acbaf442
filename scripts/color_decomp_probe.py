"""Color-multires FINE-LEVEL decomposition on hardware.

The color config's cost is concentrated in the 24 full-resolution
iterations (307200 6-dim queries vs the 512-block color kd index) of the
35-iteration multires schedule — the coarse levels run at sliced
capacity in the segmented driver and are noise. This probe pins where
those fine iterations go:

1. fused per-stage split of the production executable (selection /
   matching / weighting / rejection / solver) via the stop-after
   differencing profiler, single frame, SELECT_ALL, checks=16;
2. matcher-internal bisection at the same shapes: prefix kernel alone,
   resident kernel probe=2 (copy+code DMA), probe=1 (+walk), full — the
   same method as the ETH k=1 decomposition (approx_arm_log.txt);
3. gate-width / tile_q sweep of the full matcher at color shapes (the
   ETH-shape winner gate=32 need not transfer: dense image-order tiles
   have far tighter per-gate spans than sparse Morton-scattered ones).

Appends to scripts/evidence/color_decomp_log.txt.
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
LOG = os.path.join(REPO, "scripts", "evidence", "color_decomp_log.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from icp_variants_tpu.ops import kdtree, knn
    from icp_variants_tpu.pipeline import icp, profiling

    state = bench.prepare_tum_state()
    src = jax.tree.map(lambda x: x[0], state["sources_full"])
    tgt = jax.tree.map(lambda x: x[0], state["targets_cmp"])

    cfg = bench._tum_base_config(
        color_icp=True, matching_checks=16, n_iterations=10)
    kd = icp.build_kd_for(cfg, tgt)
    nc, cap = kd.block_orig.shape
    tile_t = kd.pages.shape[2]
    log(f"=== color fine-level decomposition: nc={nc} cap={cap} "
        f"tile_t={tile_t} d={kd.block_min.shape[1]} ===")

    # --- 1. fused per-stage split of the production executable ---------
    if "--skip-fused" not in sys.argv:
        times = profiling.profile_fused_stages(
            cfg, src, tgt, key=jax.random.PRNGKey(0), kd_index=kd)
        log("fused stages (ms/iter at 307200 queries):\n" + times.report())

    # --- 2+3. matcher-internal bisection + sweeps ----------------------
    q6 = knn.color_features(src.points, src.colors)
    nq = q6.shape[0]

    def scan_of(fn):
        # Carry only a SCALAR digest per iteration: stacked (iters, Nq)
        # outputs are ~12 MB and their device_get rides the tunnel,
        # inflating per-iter attributions by several ms.
        def run(qb):
            def body(c, _):
                out = fn(qb + c * 1e-6)
                dig = sum(jnp.sum(x[:128].astype(jnp.float32))
                          for x in jax.tree.leaves(out))
                return c + 1.0, dig
            _, outs = jax.lax.scan(body, 0.0, None, length=10)
            return outs
        return jax.jit(run)

    @functools.partial(
        jax.jit,
        static_argnames=("probe", "k", "tile_q", "gate_width", "stage"))
    def search_probe(qq, kk, probe=0, k=1, tile_q=128, gate_width=None,
                     stage="full"):
        if stage == "production":
            # The exact production entry point (what match_kd calls at
            # checks>0 when the resident layout fits).
            idx, d2, _fail = kdtree.nn_search_kd_resident(
                qq, kk, 0.1, k=k, tile_q=tile_q, gate_width=gate_width,
                orig_map=False)
            return idx, d2
        d = kk.block_min.shape[1]
        qp = knn._pad_rows(
            knn._pad_features(qq[:, :d]),
            kdtree._PREFIX_GROUP * tile_q, 0.0)
        bound = jnp.float32(0.1) * (1 + 1e-6) + 1e-30
        binit = jnp.pad(
            jnp.full((qq.shape[0],), bound, jnp.float32),
            (0, qp.shape[0] - qq.shape[0]), constant_values=-1.0)
        gw = knn.RESIDENT_GATE_WIDTH if gate_width is None else gate_width
        member, hot, lb_tile, resid, submask, rng_rows = (
            kdtree._radius_prefix(
                qp, binit, kk, tile_q=tile_q, k=k, interpret=False,
                n_gate=tile_q // gw))
        if stage == "prefix":
            return (member.sum() + hot.sum() + resid.sum()).reshape(1, 1)
        dist, idx = knn._run_resident_kernel_flat(
            qp[None], binit[None], hot[None], (member & ~hot)[None],
            lb_tile[None], submask[None], kk.pages[None], 0.1,
            tile_q=tile_q, tile_t=kk.pages.shape[2], n_features=d,
            gate_width=gw, interpret=False, probe=probe,
            ranges_rows=rng_rows[None])
        return dist[0], idx[0]

    def timeit(name, **kw):
        fn = scan_of(lambda qb: search_probe(qb, kd, **kw))
        for attempt in range(4):
            t0 = time.perf_counter()
            try:
                out = fn(q6)
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
                out = fn(q6)
            jax.device_get(jax.tree.leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / 3 / 10 * 1000)
        log(f"{name:40s}: {best:8.3f} ms/frame-iter (compile {tc:.0f}s)")

    log(f"matcher bisection at {nq} queries (scalar-digest carry):")
    timeit("production nn_search_kd_resident g=32", stage="production", k=1)
    timeit("production nn_search_kd_resident g=64", stage="production",
           k=1, gate_width=64)
    timeit("prefix only (k=1, gate=32)", stage="prefix", k=1)
    timeit("probe=2 copy+codeDMA", probe=2, k=1)
    timeit("probe=1 +walk", probe=1, k=1)
    timeit("full k=1 gate=32", probe=0, k=1)
    timeit("full k=1 gate=64", probe=0, k=1, gate_width=64)
    timeit("full k=1 gate=128", probe=0, k=1, gate_width=128)
    timeit("full k=1 gate=32 tile_q=256", probe=0, k=1, tile_q=256)
    timeit("full k=1 gate=64 tile_q=256", probe=0, k=1, tile_q=256,
           gate_width=64)
    timeit("full k=4 gate=32 (exact-arm width)", probe=0, k=4)
    log("color decomposition done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
