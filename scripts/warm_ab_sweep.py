"""A/B the production matcher end-to-end on the bench program:
union (kd_warm_start=False) vs warm (True), and sweep the warm knobs
(granule G, top-K cap). One full 16-pair 50-iter program per config."""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "evidence", "warm_ab_sweep_log.txt"
)

_ANSI = re.compile(r"\x1b\[[0-9;]*[a-zA-Z]")


def log(msg):
    msg = _ANSI.sub("", str(msg))
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    import numpy as np
    import jax

    import bench
    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import kdtree
    from icp_variants_tpu.pipeline import icp
    from icp_variants_tpu.pipeline.config import (
        ICPConfig, Metric, Minimizer, Selection,
    )

    pairs = bench.make_pairs()
    base = ICPConfig(
        metric=Metric.SYMMETRIC, minimizer=Minimizer.LINEAR,
        selection=Selection.RANDOM, selection_proba=bench.SELECTION_P,
        n_iterations=bench.N_ITERATIONS, max_distance=bench.MAX_DISTANCE,
    )
    sources = icp.stack_clouds([
        cloud_lib.from_numpy(sp, normals=sn, morton_order=True)
        for (sp, sn, _, _) in pairs
    ])
    tclouds = [
        cloud_lib.from_numpy(tp, normals=tn, morton_order=True)
        for (_, _, tp, tn) in pairs
    ]
    targets = icp.stack_clouds(tclouds)

    kd_cache = {}

    def kds_for(block_target):
        if block_target not in kd_cache:
            kd_cache[block_target] = kdtree.stack_kd_indexes([
                kdtree.build_kd_index(
                    np.asarray(t.points), np.asarray(t.valid),
                    block_target=block_target,
                )
                for t in tclouds
            ])
        return kd_cache[block_target]

    def run_with(cfg, label, block_target=768, b=None):
        # (The block-aligned query-order arms this sweep also measured in
        # round 3 used machinery that has since been deleted — it lost in
        # every configuration; the log retains those measurements.)
        kds = kds_for(block_target)
        src, tgt = sources, targets
        if b is not None and b != bench.BATCH_PAIRS:
            import jax.numpy as jnp

            reps = -(-b // bench.BATCH_PAIRS)
            tile = lambda x: jnp.concatenate([x] * reps)[:b]  # noqa: E731
            src = jax.tree.map(tile, sources)
            tgt = jax.tree.map(tile, targets)
            kds = jax.tree.map(tile, kds)
        nb = b or bench.BATCH_PAIRS

        def run(seed):
            res = icp.run_icp_batch(
                cfg, src, tgt, key=jax.random.PRNGKey(seed),
                kd_indexes=kds,
            )
            jax.device_get(res.pose)
            return res

        t0 = time.perf_counter()
        res = run(0)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for s in range(3):
            run(s + 1)
        dt = (time.perf_counter() - t0) / 3 / nb
        nm = int(np.asarray(jax.device_get(res.trace.num_matches))[0, -1])
        log(
            f"{label:34s}: {1.0/dt:7.3f} pairs/s "
            f"({dt*1000:6.1f} ms/pair, compile {tc:.0f} s, "
            f"final matches {nm})"
        )

    configs = [
        (base, "warm G=128 bt=768 (default)", {}),
        (base.replace(kd_warm_start=False), "union (warm off)", {}),
        (base.replace(kd_warm_tile_q=64), "warm tile_q=64", {}),
        (base, "warm B=32", {"b": 32}),
        (base.replace(kd_warm_granule=32), "warm G=32", {}),
    ]
    for cfg, label, kw in configs:
        try:
            run_with(cfg, label, **kw)
        except Exception as e:  # noqa: BLE001
            log(f"{label}: FAILED {type(e).__name__}: {str(e)[:150]}")
    log("done")


if __name__ == "__main__":
    main()
