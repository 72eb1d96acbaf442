"""Pod scaling-efficiency harness (BASELINE north-star: >= 80% on 2 hosts).

Run the SAME command on every host of a pod slice. On a TPU pod no
coordinates are needed (the runtime advertises them); for the CPU
rehearsal pass them explicitly:

    # pod (each host):
    python scripts/pod_scaling_bench.py
    # pod, 1-host baseline (run on one host of the same slice type):
    python scripts/pod_scaling_bench.py --single
    # CPU rehearsal (the test launches these):
    python scripts/pod_scaling_bench.py --coordinator 127.0.0.1:PORT \
        --nprocs 2 --proc-id RANK --toy

Workload = the bench.py headline (ETH-scale symmetric linear ICP, RANDOM
p=0.01, kd matching when it gates in), with the ``pairs`` mesh axis
spanning ALL hosts' devices — the embarrassingly-parallel axis, so DCN
carries only dispatch and the final trace gather. The coordinator prints
one JSON line::

    {"world": N_PROCS, "pairs": B, "pairs_per_sec": X,
     "pairs_per_sec_per_host": X/N}

Scaling efficiency = pairs_per_sec_per_host(N hosts) divided by
pairs_per_sec_per_host(1 host), from two invocations. Expected >= 0.95 on
a pod at ETH shapes (zero cross-pair collectives); the >= 80% target
(BASELINE.json) leaves margin for dispatch skew.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--nprocs", type=int, default=None)
    ap.add_argument("--proc-id", type=int, default=None)
    ap.add_argument("--single", action="store_true",
                    help="skip distributed init: 1-host baseline run")
    ap.add_argument("--pairs-per-host", type=int, default=16)
    ap.add_argument("--cap", type=int, default=365_000)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--toy", action="store_true",
                    help="CPU rehearsal shapes (tiny clouds, 4 virtual "
                    "devices per process)")
    args = ap.parse_args()

    if args.toy:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    if args.toy:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import bench
    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import kdtree
    from icp_variants_tpu.parallel import distributed, sharded_icp
    from icp_variants_tpu.pipeline import icp

    if not args.single:
        distributed.initialize(
            args.coordinator, num_processes=args.nprocs,
            process_id=args.proc_id,
        )
    world = jax.process_count()
    mesh = distributed.global_mesh(points_per_pair=1)
    n_pairs = args.pairs_per_host * world

    if args.toy:
        cap, iters = 2048, 5
    else:
        cap, iters = args.cap, args.iters
    cfg = bench.headline_config().replace(n_iterations=iters)

    # Replicated host data (same seeds on every process): device_put onto
    # the global sharding slices each process's shards out of it.
    def pair(i):
        tgt_pts, tgt_nrm = bench.synth_cloud(cap, 2 * i)
        ang = 0.03 + 0.004 * i
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0],
             [np.sin(ang), np.cos(ang), 0],
             [0, 0, 1]], np.float32)
        src_pts = (tgt_pts @ R.T + [0.2, -0.1, 0.05]).astype(np.float32)
        return (
            cloud_lib.from_numpy(src_pts, normals=(tgt_nrm @ R.T),
                                 morton_order=True),
            cloud_lib.from_numpy(tgt_pts, normals=tgt_nrm,
                                 morton_order=True),
        )

    pairs = [pair(i) for i in range(n_pairs)]
    sources = icp.stack_clouds([s for s, _ in pairs])
    targets = icp.stack_clouds([t for _, t in pairs])
    kds = [icp.build_kd_for(cfg, t) for _, t in pairs]
    kd_indexes = (
        kdtree.stack_kd_indexes(kds) if all(k is not None for k in kds)
        else None
    )

    def run(seed):
        res = sharded_icp.run_icp_batch_sharded(
            cfg, sources, targets, mesh,
            key=jax.random.PRNGKey(seed), kd_indexes=kd_indexes,
        )
        # A real cross-host transfer (device_get of the replicated-enough
        # pose output) — block_until_ready is unreliable over the tunneled
        # backend.
        jax.device_get(
            jax.experimental.multihost_utils.process_allgather(
                res.pose, tiled=True)
            if world > 1 else res.pose
        )

    import jax.experimental.multihost_utils  # noqa: F401  (used in run)

    run(0)   # compile
    run(0)   # warm dispatch
    t0 = time.perf_counter()
    for s in range(args.runs):
        run(s + 1)
    dt = (time.perf_counter() - t0) / (args.runs * n_pairs)

    if distributed.is_coordinator():
        print(json.dumps({
            "world": world,
            "pairs": n_pairs,
            "cap": cap,
            "iters": iters,
            "kd_path": kd_indexes is not None,
            "pairs_per_sec": round(1.0 / dt, 4),
            "pairs_per_sec_per_host": round(1.0 / dt / world, 4),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
