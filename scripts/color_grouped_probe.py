"""Grouped-segment driver A/B at the color defaults (round 5).

The level-floor decomposition measured 5.9 ms/frame of launch/dispatch
overhead per coarse level program (scripts/evidence/
block_target_probe.txt); the segment planner now groups the 11 coarse
levels into 3 programs ([2048..16], [8,4], [2]) with coarser members
stride-masked in-scan. This probe captures accuracy + throughput
together (the honesty rule) for both arms at the committed defaults.

Appends to scripts/evidence/block_target_probe.txt.
"""

import os
import sys
import time

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
    from icp_variants_tpu.pipeline import icp

    log("=== grouped-segment driver A/B (color defaults) ===")
    tum_state = bench.prepare_tum_state()

    def capture(label, **ov):
        for attempt in range(4):
            try:
                t, r = bench.measure_color_accuracy(tum_state, **ov)
                dt = bench.bench_color_multires(tum_state, **ov)
                log(f"{label}: {1.0/dt:.3f} f/s  t_err={t*1000:.3f} mm "
                    f"r={r:.5f}")
                return
            except Exception as e:  # noqa: BLE001
                log(f"{label} attempt {attempt} failed "
                    f"({type(e).__name__}: {str(e)[:120]}); retrying")
                time.sleep(10)
        log(f"{label}: all attempts failed")

    capture("color checks16 GROUPED (4 programs)", matching_checks=16)
    # Ungrouped control (the pre-change 12-program driver) via the
    # planner's overhead knob.
    icp.SEGMENT_PROGRAM_OVERHEAD_MS = 0.0
    try:
        capture("color checks16 ungrouped control", matching_checks=16)
    finally:
        icp.SEGMENT_PROGRAM_OVERHEAD_MS = 5.0
    capture("color exact GROUPED", )
    log("grouped A/B done (10x bar = 2.093 f/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
