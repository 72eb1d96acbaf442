"""Certificate-failure rates of nn_search_kd across (block_target, K) on
bench-shaped data — checks whether the kd_sweep timings were confounded by
the cond-gated fallback firing (any fail => the whole batch pays the
fallback kernel that iteration).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence", "kd_fail_probe_log.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import bench
    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import kdtree

    tgt_pts, tgt_nrm = bench.synth_cloud(bench.N_POINTS, 0)
    tc = cloud_lib.from_numpy(tgt_pts, normals=tgt_nrm, morton_order=True)
    rng = np.random.default_rng(1)
    # ETH-style queries: p=0.01 of a perturbed copy
    sel = rng.random(bench.N_POINTS) < bench.SELECTION_P
    q = jnp.asarray(tgt_pts[sel] + rng.normal(0, 0.02, (sel.sum(), 3)).astype(np.float32))
    log(f"=== kd certificate fail rates, {q.shape[0]} queries vs 365k ===")
    for bt, ks in [(768, (2, 3, 4, 6)), (384, (4, 6, 8)), (1536, (2, 3))]:
        kd = kdtree.build_kd_index(
            np.asarray(tc.points), np.asarray(tc.valid), block_target=bt)
        nc = kd.block_min.shape[0]
        for k in ks:
            _, _, fail = kdtree.nn_search_kd(q, kd, bench.MAX_DISTANCE, k=k)
            rate = float(jax.device_get(jnp.mean(fail.astype(jnp.float32))))
            nfail = int(jax.device_get(jnp.sum(fail)))
            log(f"blocks={nc:5d} K={k}: fail {nfail:5d} ({100*rate:6.3f}%)")
    log("done")


if __name__ == "__main__":
    main()
