"""Pose-accuracy probe on the hard indoor family: the estimated poses
must invert the applied perturbations despite 20-40% non-overlap and
independent sampling (no point-level GT — compare SE(3) directly)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    import bench
    from icp_variants_tpu.pipeline import icp

    import sys as _sys

    trim = float(_sys.argv[1]) if len(_sys.argv) > 1 else 1.0
    pairs = bench.make_indoor_pairs()
    state = bench.prepare_host_state(pairs)
    cfg = bench.headline_config().replace(trim_ratio=trim)
    print(f"trim_ratio={trim}", flush=True)
    res = icp.run_icp_batch(
        cfg, state["sources"], state["targets"],
        key=jax.random.PRNGKey(0), kd_indexes=state["kd_indexes"],
    )
    poses = np.asarray(jax.device_get(res.pose))
    rot_errs, trn_errs = [], []
    for i, pose in enumerate(poses):
        ang = 0.04 + 0.008 * i
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0],
             [np.sin(ang), np.cos(ang), 0],
             [0, 0, 1]], np.float32)
        shift = np.array([0.4 - 0.06 * i, -0.25 + 0.04 * i, 0.05], np.float32)
        gt = np.eye(4, dtype=np.float32)
        gt[:3, :3] = R.T                # the aligning pose inverts (R, t)
        gt[:3, 3] = -R.T @ shift
        err = np.linalg.inv(gt) @ pose
        ang_err = np.degrees(np.arccos(
            np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1)))
        trn_err = float(np.linalg.norm(err[:3, 3]))
        rot_errs.append(float(ang_err))
        trn_errs.append(trn_err)
        print(f"pair {i:2d}: rot err {ang_err:7.4f} deg, "
              f"trans err {trn_err:7.4f} m", flush=True)
    print(f"median: rot {np.median(rot_errs):.4f} deg, "
          f"trans {np.median(trn_errs):.4f} m "
          f"(perturbations were 2.3-6.9 deg, 0.25-0.65 m)", flush=True)


if __name__ == "__main__":
    main()
