"""Committed-path capture after the 6-dim Morton source ordering landed
in bench.prepare_tum_state (both arms + accuracy, per the honesty rule).
Appends to scripts/evidence/block_target_probe.txt."""

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

    log("=== committed morton6 capture (color, both arms) ===")
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

    capture("color checks16 morton6 committed", matching_checks=16)
    capture("color exact morton6 committed")
    log("committed morton6 capture done (bar 2.093 f/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
