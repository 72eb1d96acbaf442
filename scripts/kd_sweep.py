"""Sweep the kd matcher's (block_target, K) over the full 16-pair bench
program. Current default: block_target=768 (-> 512 blocks of ~714 at ETH
capacity), K=4. Smaller blocks move less data per query but issue more
gather rows and widen the lb/extraction stage.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence", "kd_sweep_log.txt")


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

    import bench
    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import kdtree
    from icp_variants_tpu.pipeline import icp
    from icp_variants_tpu.pipeline.config import (
        ICPConfig, Metric, Minimizer, Selection,
    )

    pairs = bench.make_pairs()
    cfg = ICPConfig(
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

    def run_with(block_target, k):
        kdtree.K_DEFAULT = k
        kds = kdtree.stack_kd_indexes([
            kdtree.build_kd_index(
                np.asarray(t.points), np.asarray(t.valid),
                block_target=block_target,
            )
            for t in tclouds
        ])
        def run(seed):
            res = icp.run_icp_batch(
                cfg, sources, targets, key=jax.random.PRNGKey(seed),
                kd_indexes=kds,
            )
            jax.device_get(res.pose)
        t0 = time.perf_counter()
        run(0)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for s in range(2):
            run(s + 1)
        dt = (time.perf_counter() - t0) / 2 / bench.BATCH_PAIRS
        nb = 1 << kdtree.kd_depth_for(tclouds[0].points.shape[0], block_target)
        log(
            f"block_target={block_target:5d} (nb={nb:5d}) K={k}: "
            f"{1.0/dt:7.3f} pairs/s (compile {tc:.0f} s)"
        )

    log(f"=== kd (block_target, K) sweep, {bench.BATCH_PAIRS} pairs ===")
    for bt, k in [
        (768, 4),       # current default (512 blocks of ~714)
        (512, 6),       # 1024 blocks of ~357
        (512, 8),
        (512, 4),
        (768, 6),
        (1536, 3),      # 256 blocks of ~1428
    ]:
        try:
            run_with(bt, k)
        except Exception as e:  # noqa: BLE001
            log(f"block_target={bt} K={k}: FAILED {type(e).__name__}: {e}")
    log("done")


if __name__ == "__main__":
    main()
