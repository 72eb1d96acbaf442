"""Batched stop-after stage profile at the bench shapes: where do the
non-matching milliseconds go at 16 pairs/iteration?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "evidence", "batched_stage_log.txt")


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
    from icp_variants_tpu.pipeline import icp

    pairs = bench.make_pairs()
    state = bench.prepare_host_state(pairs)
    cfg = bench.headline_config().replace(kd_warm_start=False)
    log("=== batched stop-after profile (16 pairs, 50 iters, cold kd) ===")
    totals = {}
    for stage in ("floor", "selection", "matching", "weighting",
                  "rejection", "solve", None):
        def run(seed, stage=stage):
            res = icp.run_icp_batch(
                cfg, state["sources"], state["targets"],
                key=jax.random.PRNGKey(seed),
                kd_indexes=state["kd_indexes"], stop_after=stage,
            )
            jax.device_get(jax.tree.leaves(res)[0])
        t0 = time.perf_counter()
        run(0)
        tc = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for s in range(2):
                run(s + 1)
            best = min(best, (time.perf_counter() - t0) / 2)
        totals[stage] = best
        log(f"stop_after={str(stage):10s}: {best * 1000:8.2f} ms/run "
            f"({best / 50 / 16 * 1e3:6.3f} ms/pair/iter, compile {tc:.0f}s)")
    order = ["floor", "selection", "matching", "weighting", "rejection",
             "solve", None]
    prev = 0.0
    for st in order:
        d = (totals[st] - prev) / 50 / 16 * 1e3
        log(f"  stage {str(st):10s}: {d:+7.3f} ms/pair/iter")
        prev = totals[st]
    log("done")


if __name__ == "__main__":
    main()
