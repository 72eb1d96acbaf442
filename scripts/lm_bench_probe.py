"""Nonlinear-LM arm at ETH bench shapes — one evidence capture.

The reference's ACTUAL ETH default is the Ceres (nonlinear LM) optimizer
with point-to-point (main.cpp:22-41, USE_LINEAR_ICP 0), while every
benched config here runs Minimizer.LINEAR. This probe measures the LM
arm's ETH-scale throughput once, both matching arms, point-to-point and
point-to-plane, so the parity claim for the reference's default
configuration has a measured perf number (VERDICT r4 item 4).

The LM path pays <=10 inner Marquardt-Nielsen steps per ICP iteration
(solvers/gauss_newton.py; the reference pays the same through Ceres,
ICPOptimizer.h:352-360) — the question is only what that costs on-chip
relative to the closed-form linear solve.

Appends to scripts/evidence/lm_bench_log.txt.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
LOG = os.path.join(REPO, "scripts", "evidence", "lm_bench_log.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    import bench
    from icp_variants_tpu.pipeline.config import Metric, Minimizer, Selection

    pairs = bench.make_pairs()
    state = bench.prepare_host_state(pairs)
    log("=== nonlinear-LM arm at ETH bench shapes (16-pair batch) ===")

    def run(name, **ov):
        try:
            dt = bench.bench_tpu(pairs, Selection.RANDOM, state=state, **ov)
            log(f"{name:58s}: {1.0/dt:6.2f} pairs/s")
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")

    # The reference's RUN_ETH_ICP default: point-to-point + Ceres LM.
    run("LM point-to-point  checks=16 (ref default config)",
        metric=Metric.POINT_TO_POINT, minimizer=Minimizer.NONLINEAR_LM,
        matching_checks=16)
    run("LM point-to-point  exact",
        metric=Metric.POINT_TO_POINT, minimizer=Minimizer.NONLINEAR_LM)
    run("LM point-to-plane  checks=16",
        metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.NONLINEAR_LM,
        matching_checks=16)
    # Linear comparators at the same metrics (the benched family is
    # symmetric linear; these isolate the minimizer swap).
    run("linear point-to-point  checks=16",
        metric=Metric.POINT_TO_POINT, minimizer=Minimizer.LINEAR,
        matching_checks=16)
    run("linear point-to-plane  checks=16",
        metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
        matching_checks=16)
    log("LM bench done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
