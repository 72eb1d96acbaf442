"""Repeat the headline (RANDOM + kd) timed run several times to measure
run-to-run variance over the tunneled backend."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "evidence", "headline_variance_log.txt"
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
    kd_list = [
        kdtree.build_kd_index(np.asarray(t.points), np.asarray(t.valid))
        for t in tclouds
    ]
    kds = kdtree.stack_kd_indexes(kd_list)
    sclouds = [
        cloud_lib.from_numpy(sp, normals=sn, morton_order=True)
        for (sp, sn, _, _) in pairs
    ]
    query_orders = np.stack([
        kdtree.build_query_order(
            np.asarray(s.points), np.asarray(s.valid), kd
        )
        for s, kd in zip(sclouds, kd_list)
    ])

    def run(seed):
        res = icp.run_icp_batch(
            cfg, sources, targets, key=jax.random.PRNGKey(seed),
            kd_indexes=kds, query_orders=query_orders,
        )
        jax.device_get(res.pose)

    t0 = time.perf_counter()
    run(0)
    log(f"compile+first run: {time.perf_counter() - t0:.1f} s")
    for rep in range(6):
        t0 = time.perf_counter()
        for s in range(3):
            run(rep * 3 + s + 1)
        dt = (time.perf_counter() - t0) / 3 / bench.BATCH_PAIRS
        log(f"rep {rep}: {1.0/dt:7.3f} pairs/s ({dt*1000:.1f} ms/pair)")
    log("done")


if __name__ == "__main__":
    main()
