"""Hardware A/B of the FLANN-parity approximate matching arm
(ICPConfig.matching_checks) against the exact default, on the two configs
the round-3 verdict flagged: the ETH headline (sparse selection, resident
kernel) and TUM color-multires (dense 6-dim, warm+resident).

For each arm: throughput + an accuracy metric vs the known synthetic
ground truth (mean pose error after registration). Appends to
scripts/evidence/approx_arm_log.txt.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
LOG = os.path.join(REPO, "scripts", "evidence", "approx_arm_log.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def eth_pose_errors(pairs, poses):
    """Mean |T_est @ T_true - I| translation error over the batch (the
    synthetic pairs' true transforms are known from make_pairs)."""
    errs = []
    for i, _ in enumerate(pairs):
        ang = 0.05 + 0.01 * i
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0],
             [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        shift = np.array([0.5 - 0.1 * i, -0.3 + 0.05 * i, 0.1], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = shift
        err = np.asarray(poses[i]) @ T - np.eye(4)
        errs.append(float(np.abs(err[:3, 3]).max()))
    return float(np.mean(errs))


def main():
    import jax

    import bench
    from icp_variants_tpu.pipeline import icp
    from icp_variants_tpu.pipeline.config import Selection

    log(f"=== approx arm probe, checks sweep ===")

    pairs = bench.make_pairs()
    state = bench.prepare_host_state(pairs)

    for checks in (0, 16, 1536):
        dt = bench.bench_tpu(
            pairs, Selection.RANDOM, state=state,
            **({"matching_checks": checks} if checks else {}),
        )
        cfg = bench.headline_config(
            Selection.RANDOM,
            **({"matching_checks": checks} if checks else {}),
        )
        res = icp.run_icp_batch(
            cfg, state["sources"], state["targets"],
            key=jax.random.PRNGKey(1), kd_indexes=state["kd_indexes"],
        )
        poses = jax.device_get(res.pose)
        err = eth_pose_errors(pairs, poses)
        log(
            f"eth checks={checks}: {1.0 / dt:.4f} pairs/s "
            f"({dt * 1e3:.1f} ms/pair), mean |t| err {err:.5f} m"
        )

    tum_state = bench.prepare_tum_state()
    for checks in (0, 16, 1536):
        dt = bench.bench_color_multires(
            tum_state,
            **({"matching_checks": checks} if checks else {}),
        )
        log(
            f"color_multires checks={checks}: {1.0 / dt:.4f} frames/s "
            f"({dt:.3f} s/frame)"
        )

    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
