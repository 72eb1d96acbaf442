"""Full-resolution (640x480) TUM room bench on the real chip: projective vs
k-NN matching — per-run time and final RMSE (the reference presentation's
"projective beats k-NN at convergence" claim, VERDICT item 8).

Appends to scripts/evidence/bench_projective_log.txt.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "evidence", "bench_projective_log.txt"
)


def log(msg):
    with open(LOG, "a") as f:
        f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
        f.flush()
        os.fsync(f.fileno())


import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

H, W = 480, 640


def make_wavy_tum_dataset(root, n_frames=3, shift_per_frame=0.005):
    """Full-res copy of tests/test_workloads.make_wavy_tum_dataset."""
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    fx, fy = 525.0, 525.0
    cx, cy = 319.5, 239.5
    vv, uu = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    depth_lines, rgb_lines, gt_lines = [], [], []
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        ts = 100.0 + i * 0.1
        shift = shift_per_frame * i
        z = np.full((H, W), 2.0)
        for _ in range(8):
            x_world = (uu - cx) / fx * z - shift
            y_world = (vv - cy) / fy * z
            z = 2.0 + 0.12 * np.sin(4.0 * x_world) * np.cos(4.0 * y_world)
        Image.fromarray(np.round(z * 5000).astype(np.uint16)).save(
            os.path.join(root, f"depth/{i}.png")
        )
        Image.fromarray(
            rng.integers(0, 255, (H, W, 3), dtype=np.uint8), "RGB"
        ).save(os.path.join(root, f"rgb/{i}.png"))
        depth_lines.append(f"{ts} depth/{i}.png")
        rgb_lines.append(f"{ts} rgb/{i}.png")
        gt_lines.append(f"{ts} {-shift} 0 0 0 0 0 1")
    for name, lines in (
        ("depth.txt", depth_lines), ("rgb.txt", rgb_lines),
        ("groundtruth.txt", gt_lines),
    ):
        with open(os.path.join(root, name), "w") as f:
            f.write("# h\n# h\n# h\n" + "\n".join(lines) + "\n")


def main():
    from icp_variants_tpu.pipeline.config import (
        Matching, Metric, Minimizer,
    )
    from icp_variants_tpu.workloads import room

    root = tempfile.mkdtemp(prefix="tum_fullres_")
    make_wavy_tum_dataset(root)
    log(f"=== full-res TUM ({W}x{H}), 2 tracked frames, 35 iters ===")

    results = {}
    for matching in (Matching.KNN, Matching.PROJECTIVE):
        cfg = room.default_config(
            metric=Metric.POINT_TO_PLANE,
            minimizer=Minimizer.LINEAR,
            matching=matching,
            n_iterations=35,
            max_distance=0.1,
        )
        t0 = time.perf_counter()
        res = room.reconstruct_room(root, cfg, frame_step=1, max_frames=1, seed=0)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = room.reconstruct_room(root, cfg, frame_step=1, max_frames=1, seed=0)
        warm_s = time.perf_counter() - t0
        n_runs = len(res.final_rmse)
        per_iter_ms = warm_s / (n_runs * cfg.n_iterations) * 1e3
        results[matching.name] = res
        log(
            f"{matching.name:10s}: warm {warm_s:6.2f} s for {n_runs} frames "
            f"(~{per_iter_ms:6.2f} ms/iter incl. host loads; first run {compile_s:.1f} s)"
        )
        log(f"  initial RMSE: {[f'{r:.5f}' for r in res.initial_rmse]}")
        log(f"  final   RMSE: {[f'{r:.5f}' for r in res.final_rmse]}")

    knn_final = results["KNN"].final_rmse[-1]
    proj_final = results["PROJECTIVE"].final_rmse[-1]
    log(
        f"projective/knn final-RMSE ratio: {proj_final / max(knn_final, 1e-12):.3f} "
        f"({'projective wins' if proj_final < knn_final else 'knn wins'})"
    )
    log("done")


if __name__ == "__main__":
    main()
