"""Decompose the segmented color driver's per-level overhead (round 5).

The ROADMAP's round-6 headroom list claims the segmented driver pays
~12 per-level program floors; this probe measures that claim directly
by timing the full segmented run against a monkeypatched schedule that
drops the 10 coarse single-iteration programs (strides 2048..4),
keeping only stride-2 (1 iter) + stride-1 (24 iters). The coarse
levels' COMPUTE is tiny (~76.6k queries total across all ten), so the
difference is almost entirely launch/eager-dispatch overhead — the
prize available to level-grouping / in-program slicing.

Timing only — the truncated schedule is NOT an accuracy-valid config.
Appends to scripts/evidence/block_target_probe.txt.
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
    import bench
    from icp_variants_tpu.core import cloud as cloud_lib

    log("=== segmented color per-level floor decomposition ===")
    tum_state = bench.prepare_tum_state()

    full_schedule = cloud_lib.multires_stride_schedule

    def truncated(num_points, n_iterations, enabled, minimum_points=100):
        s = full_schedule(num_points, n_iterations, enabled, minimum_points)
        return np.asarray([x for x in s.tolist() if x <= 2], np.int32)

    dt = bench.bench_color_multires(tum_state, matching_checks=16)
    log(f"full schedule (12 programs, 35 iters): {1.0/dt:.3f} f/s "
        f"({dt*1000:.1f} ms/frame)")

    cloud_lib.multires_stride_schedule = truncated
    try:
        dt2 = bench.bench_color_multires(tum_state, matching_checks=16)
    finally:
        cloud_lib.multires_stride_schedule = full_schedule
    log(f"fine-only schedule (2 programs, 25 iters): {1.0/dt2:.3f} f/s "
        f"({dt2*1000:.1f} ms/frame)")
    log(f"coarse-levels total cost: {(dt-dt2)*1000:.1f} ms/frame "
        f"across 10 programs ({(dt-dt2)*100:.1f} ms/program-frame)")
    log("level floor decomposition done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
