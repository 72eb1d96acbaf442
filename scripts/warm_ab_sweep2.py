"""Follow-up A/B sweep (round 3): per-arm qorder control.

The first sweep (warm_ab_sweep.py) ran most arms with the block-aligned
query reorder ON, which costs the warm path ~30% (scattered per-granule
radii) — so its knob arms were contaminated. This one re-ran the knob
sweep with qorder OFF for warm arms, plus the never-measured arm
UNION + qorder. RESULT (scripts/evidence/warm_ab_sweep2_log.txt): qorder lost in
every configuration (union 7.7 vs 11.5 pairs/s; warm 9.2 vs 12.7), so
the query-order machinery was deleted from the package; this script now
keeps only the surviving arms so it stays runnable.
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "evidence", "warm_ab_sweep2_log.txt"
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
    sclouds = [
        cloud_lib.from_numpy(sp, normals=sn, morton_order=True)
        for (sp, sn, _, _) in pairs
    ]
    tclouds = [
        cloud_lib.from_numpy(tp, normals=tn, morton_order=True)
        for (_, _, tp, tn) in pairs
    ]
    sources = icp.stack_clouds(sclouds)
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

    def run_with(cfg, label, block_target=768):
        kds = kds_for(block_target)

        def run(seed):
            res = icp.run_icp_batch(
                cfg, sources, targets, key=jax.random.PRNGKey(seed),
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
        dt = (time.perf_counter() - t0) / 3 / bench.BATCH_PAIRS
        nm = int(np.asarray(jax.device_get(res.trace.num_matches))[0, -1])
        log(
            f"{label:34s}: {1.0/dt:7.3f} pairs/s "
            f"({dt*1000:6.1f} ms/pair, compile {tc:.0f} s, "
            f"final matches {nm})"
        )

    configs = [
        (base, "warm [baseline]", {}),
        (base, "warm bt=512", {"block_target": 512}),
        (base, "warm bt=384", {"block_target": 384}),
        (base.replace(kd_warm_tile_q=256), "warm tile_q=256", {}),
        (base.replace(kd_warm_granule=64), "warm G=64", {}),
        (base.replace(kd_warm_granule=256), "warm G=256", {}),
    ]
    for cfg, label, kw in configs:
        for attempt in range(2):
            try:
                run_with(cfg, label, **kw)
                break
            except Exception as e:  # noqa: BLE001
                log(
                    f"{label}: attempt {attempt} FAILED "
                    f"{type(e).__name__}: {str(e)[:150]}"
                )
                time.sleep(10)
    log("done")


if __name__ == "__main__":
    main()
