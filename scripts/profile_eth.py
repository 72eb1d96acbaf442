"""Fused per-stage TimeMeasure of the ETH-scale bench config on the real
chip, for both selection modes. Appends to scripts/evidence/profile_eth_log.txt."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence", "profile_eth_log.txt")


def log(msg):
    with open(LOG, "a") as f:
        f.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
        f.flush()
        os.fsync(f.fileno())


import numpy as np  # noqa: E402

import bench  # noqa: E402
from icp_variants_tpu.core import cloud as cloud_lib  # noqa: E402
from icp_variants_tpu.pipeline import profiling  # noqa: E402
from icp_variants_tpu.pipeline.config import (  # noqa: E402
    ICPConfig, Metric, Minimizer, Selection,
)

sp, sn, tp, tn = bench.make_pairs()[0]
source = cloud_lib.from_numpy(sp, normals=sn, morton_order=True)
target = cloud_lib.from_numpy(tp, normals=tn, morton_order=True)

for sel in (Selection.RANDOM_FAST, Selection.RANDOM):
    cfg = ICPConfig(
        metric=Metric.SYMMETRIC,
        minimizer=Minimizer.LINEAR,
        selection=sel,
        selection_proba=bench.SELECTION_P,
        n_iterations=bench.N_ITERATIONS,
        max_distance=bench.MAX_DISTANCE,
    )
    log(f"=== {sel.name} ===")
    times = profiling.profile_fused_stages(cfg, source, target, repetitions=2)
    for line in times.report().splitlines():
        log(line)
    log(f"full_run {times.full_run * 1e3:.1f} ms   wall {times.total_wall:.1f} s")
    eff = profiling.kernel_efficiency(
        cfg, source, target, times.matching, times.solver
    )
    for line in eff.splitlines():
        log(line)

log("done")
