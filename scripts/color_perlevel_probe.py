"""Per-level cost attribution for the segmented color driver.

The grouped-segment A/B showed program count is NOT the cost (2.038 vs
2.041 f/s), yet dropping the 10 coarse levels saved 59 ms/frame — so
the cost is in-program compute at coarse strides. Hypothesis: a
stride-S slice of the Morton/raster-ordered image spreads each
128-query tile across the whole cloud, so per-tile block membership in
the resident kernel approaches ALL blocks and every tile pays a
near-full-table scan.

This probe times each single-level program individually (k iterations
at the level's slice shape, scalar-digest carry) and reports
ms/frame-iter per stride. Appends to block_target_probe.txt.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "evidence", "block_target_probe.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    import jax

    import bench
    from icp_variants_tpu.ops import kdtree
    from icp_variants_tpu.pipeline import icp

    log("=== per-level cost attribution (color checks16) ===")
    tum_state = bench.prepare_tum_state()
    cfg = bench._tum_base_config(
        color_icp=True, multi_resolution=True, matching_checks=16)
    sources, targets = tum_state["sources_full"], tum_state["targets_cmp"]
    tgt0 = jax.tree.map(lambda x: x[0], targets)
    kd0 = icp.build_kd_for(cfg, tgt0)
    kd_indexes = kdtree.stack_kd_indexes([kd0] * bench.TUM_BATCH_FRAMES)
    b = sources.points.shape[0]

    n_it = 4
    for stride in (2048, 512, 128, 32, 8, 2):
        src_l = icp._slice_clouds_stride_jit(sources, stride=stride)
        cfg_l = cfg.replace(multi_resolution=False, n_iterations=n_it)

        def run():
            res = icp.run_icp_batch(
                cfg_l, src_l, targets, key=jax.random.PRNGKey(0),
                kd_indexes=kd_indexes)
            jax.device_get(res.pose)

        run()  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            run()
        dt = (time.perf_counter() - t0) / reps
        per_it = dt * 1000 / n_it / b
        log(f"stride {stride:5d} (cap {src_l.points.shape[1]:7d}): "
            f"{per_it:7.3f} ms/frame-iter  ({dt*1000:.1f} ms/batch-run)")
    log("per-level attribution done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
