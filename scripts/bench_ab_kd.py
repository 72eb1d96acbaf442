"""A/B the headline bench path: kd (v3) matcher vs visited-list (v2) alone.

Back-to-back interleaved reps on the real chip to beat backend variance.
Appends to scripts/evidence/bench_ab_kd_log.txt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence", "bench_ab_kd_log.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    import bench
    from icp_variants_tpu.pipeline.config import Selection

    pairs = bench.make_pairs()
    reps = 3
    results = {"kd": [], "v2": []}
    # warm both compiles first
    log("warming kd path (compile)...")
    t0 = time.perf_counter()
    dt = bench.bench_tpu(pairs, Selection.RANDOM, use_kd=True)
    log(f"kd warm+timed: {1.0/dt:.3f} pairs/s (wall {time.perf_counter()-t0:.0f}s)")
    results["kd"].append(1.0 / dt)
    t0 = time.perf_counter()
    dt = bench.bench_tpu(pairs, Selection.RANDOM, use_kd=False)
    log(f"v2 warm+timed: {1.0/dt:.3f} pairs/s (wall {time.perf_counter()-t0:.0f}s)")
    results["v2"].append(1.0 / dt)
    for r in range(reps):
        dt = bench.bench_tpu(pairs, Selection.RANDOM, use_kd=True)
        results["kd"].append(1.0 / dt)
        log(f"rep {r}: kd {results['kd'][-1]:.3f} pairs/s")
        dt = bench.bench_tpu(pairs, Selection.RANDOM, use_kd=False)
        results["v2"].append(1.0 / dt)
        log(f"rep {r}: v2 {results['v2'][-1]:.3f} pairs/s")
    for k, v in results.items():
        log(f"{k}: best {max(v):.3f}  all {[round(x,3) for x in v]}")
    log("done")


if __name__ == "__main__":
    main()
