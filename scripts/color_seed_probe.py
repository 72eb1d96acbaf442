"""Seeded-membership honesty probes for the color config (round 5).

Measures, on hardware, the things the match-loss artifact taught us to
measure TOGETHER (ROADMAP round-5 log, item 2): throughput AND
segmented-driver accuracy for
- the committed defaults (bt=1536, SEED_MAX_PARENT_STRIDE=2),
- record mode (X=0 — no seeding),
- X=4 (seeds the stride-2 level too),
- neighboring block sizes.

Appends to scripts/evidence/block_target_probe.txt. The accuracy call
runs run_icp_batch_multires_segmented — the same executable family the
throughput number rides; never measure one without the other.
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

    log("=== color seed/blocksize honesty probe ===")
    tum_state = bench.prepare_tum_state()

    def run(label, x=None, **ov):
        if x is not None:
            icp.SEED_MAX_PARENT_STRIDE = x
            ov = dict(ov, lm_function_tolerance=1e-6 * (1 + x * 1e-5))
        t, r = bench.measure_color_accuracy(
            tum_state, matching_checks=16, **ov)
        dt = bench.bench_color_multires(tum_state, matching_checks=16, **ov)
        log(f"{label}: {1.0/dt:.3f} f/s  t_err={t*1000:.3f} mm r={r:.5f}")

    run("defaults (bt=1536 X=2 seeded)")
    run("bt=1536 X=0 record", x=0)
    run("bt=1536 X=4 seeded", x=4)
    icp.SEED_MAX_PARENT_STRIDE = 2
    run("bt=1024 X=2", kd_block_target=1024)
    run("bt=2048 X=2", kd_block_target=2048)
    log("color seed probe done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
