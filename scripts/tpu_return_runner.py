"""One-shot orchestrator for when the TPU tunnel returns: hardware
exactness check of the warm bitmap kernel at the CURRENT defaults, the
color seed/blocksize honesty probe (throughput + segmented accuracy
together — ROADMAP r5 item 2), then the headline bench (which also
warms the driver's end-of-round compile cache). Appends everything to
scripts/evidence/tpu_return_log.txt."""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "evidence", "tpu_return_log.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def hardware_exactness():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    import bench
    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import kdtree

    sp, sn, tp, tn = bench.make_pairs()[0]
    tc = cloud_lib.from_numpy(tp, normals=tn, morton_order=True)
    sc = cloud_lib.from_numpy(sp, normals=sn, morton_order=True)
    kd = kdtree.build_kd_index(np.asarray(tc.points), np.asarray(tc.valid))
    rng = np.random.default_rng(0)
    spts = np.asarray(sc.points)
    rows = np.flatnonzero(rng.random(len(spts)) < 0.02)[:4736]
    q = spts[rows]
    bound = np.float32(10.0) * (1 + 1e-6) + 1e-30
    # Loose radii (top-K + certificate regime) and tight (cache regime).
    tree = cKDTree(tp)
    dref, iref = tree.query(q, k=1, workers=-1)
    d2ref = (dref * dref).astype(np.float32)
    for name, radius in [
        ("bound", np.full(len(q), bound, np.float32)),
        ("tight", np.minimum(d2ref * (1 + 1e-6) + 1e-30, bound)),
    ]:
        i, d2, fail = kdtree.nn_search_kd_warm(
            jnp.asarray(q), kd, 10.0, jnp.asarray(radius))
        i, d2, fail = map(np.asarray, (i, d2, fail))
        w = (d2ref <= 10.0) & ~fail
        agree = ((i[w] == iref[w]) | np.isclose(
            d2[w], d2ref[w], rtol=1e-5, atol=1e-6)).mean()
        log(f"hardware exactness ({name} radii): agree {agree:.6f} "
            f"fail {fail.mean():.4f}")
        assert agree == 1.0, f"hardware mismatch at {name} radii"


def main():
    log("=== TPU return runner ===")
    t0 = time.perf_counter()
    hardware_exactness()
    log(f"exactness OK ({time.perf_counter() - t0:.0f} s)")
    for script in ("color_seed_probe.py",):
        log(f"--- running {script} ---")
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "scripts", script)],
            check=False,
        )
    log("--- running bench.py ---")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, check=False,
    )
    for line in out.stdout.strip().splitlines()[-2:]:
        log(f"bench: {line}")
    log("done")


if __name__ == "__main__":
    main()
