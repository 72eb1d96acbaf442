"""Sweep AA-ICP (m, CLAMP) on the PRODUCTION scan path (CPU).

The eager probe (aa_safeguard_probe.py) and the jitted scan diverge in the
chaotic terminal regime, so constants must be picked on the real path.
Criteria: (a) bunny default (tight threshold) final RMSE vs plain;
(b) smooth synthetic pair: iterations to reach plain's 14-iter error.
"""

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from icp_variants_tpu.core import cloud as cloud_lib  # noqa: E402
from icp_variants_tpu.pipeline import icp  # noqa: E402
from icp_variants_tpu.pipeline.config import (  # noqa: E402
    ICPConfig, Metric, Minimizer,
)
from icp_variants_tpu.solvers import anderson  # noqa: E402
from icp_variants_tpu.workloads import bunny as bw  # noqa: E402


def smooth_pair(n=3000, ang=0.25, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
    tgt = np.column_stack([xy, z]).astype(np.float32)
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    src = (tgt @ R.T + np.array([0.15, -0.1, 0.05], np.float32))
    return src.astype(np.float32), tgt, R, np.array([0.15, -0.1, 0.05],
                                                    np.float32)


def run_smooth(m):
    src, tgt, R, shift = smooth_pair()
    source = cloud_lib.from_numpy(src, morton_order=True)
    target = cloud_lib.from_numpy(tgt, morton_order=True)
    base = ICPConfig(metric=Metric.POINT_TO_POINT, minimizer=Minimizer.LINEAR,
                     max_distance=1.0, n_iterations=14, anderson_m=m)
    src_rows = np.asarray(source.points)
    kw = dict(gt_source_points=src_rows,
              gt_target_points=(src_rows - shift) @ R,
              gt_valid=np.asarray(source.valid))
    res = icp.run_icp(base, source, target, key=jax.random.PRNGKey(0), **kw)
    return np.asarray(res.trace.rmse)


if __name__ == "__main__":
    plain_b = bw.align_bunny(bw.default_config())
    plain_s = run_smooth(0)
    print(f"plain  bunny={plain_b.final_rmse:.5f}  smooth14={plain_s[-1]:.2e}")
    for clamp in (2.0, 3.0, 5.0):
        anderson.CLAMP = clamp
        jax.clear_caches()  # CLAMP is baked in at trace time
        for m in (2, 3, 5):
            b = bw.align_bunny(bw.default_config(anderson_m=m))
            s = run_smooth(m)
            hit = (s <= plain_s[-1])
            it = int(np.argmax(hit)) if hit.any() else -1
            print(f"clamp={clamp} m={m}: bunny={b.final_rmse:.5f} "
                  f"(x{b.final_rmse / plain_b.final_rmse:.2f})  "
                  f"smooth final={s[-1]:.2e} hit14@{it}")
