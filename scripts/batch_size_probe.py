"""Batch-size scaling of the kd-path bench program: 8/16/32 pairs."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "evidence", "batch_size_probe_log.txt"
)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    import bench
    from icp_variants_tpu.pipeline.config import Selection

    log("=== batch-size scaling, kd path ===")
    for b in (8, 16, 32):
        bench.BATCH_PAIRS = b
        pairs = bench.make_pairs()
        t0 = time.perf_counter()
        dt = bench.bench_tpu(pairs, Selection.RANDOM, use_kd=True)
        log(
            f"B={b:3d}: {1.0/dt:7.3f} pairs/s "
            f"(wall incl. compile {time.perf_counter()-t0:.0f} s)"
        )
    log("done")


if __name__ == "__main__":
    main()
