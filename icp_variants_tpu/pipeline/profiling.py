"""Per-stage instrumentation — the TimeMeasure equivalent + JAX tracing.

The reference brackets each pipeline stage with ``clock()`` and prints
per-iteration averages (TimeMeasure.h:7-62, filled at
ICPOptimizer.h:245-302). Under jit the stages fuse into one device program,
so two complementary tools are provided:

* :func:`profile_stages` — an EAGER per-stage breakdown: runs one ICP
  iteration stage by stage with ``block_until_ready`` brackets, several
  repetitions, and reports the same six accumulators the reference prints
  (selection / matching / weighting / rejection / solver / convergence).
  Use it to understand where time goes; the production path stays fused.
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of the REAL fused program.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from icp_variants_tpu.core import cloud as cloud_lib
from icp_variants_tpu.core import se3
from icp_variants_tpu.core.cloud import Cloud
from icp_variants_tpu.ops import knn, projective, rejection, selection, weighting
from icp_variants_tpu.pipeline import measure
from icp_variants_tpu.pipeline.config import ICPConfig, Matching, Selection
from icp_variants_tpu.pipeline.icp import _solve


@dataclass
class StageTimes:
    """Mirror of the reference's six accumulators (TimeMeasure.h:20-26),
    in seconds, averaged over repetitions."""

    selection: float = 0.0
    matching: float = 0.0
    weighting: float = 0.0
    rejection: float = 0.0
    solver: float = 0.0
    convergence: float = 0.0
    n_iterations: int = 0

    def report(self) -> str:
        """calculateIterationTime-style report (TimeMeasure.h:43-60)."""
        total = (
            self.selection + self.matching + self.weighting
            + self.rejection + self.solver
        )
        lines = [
            "Mean time per ICP iteration:",
            f"  selection:   {self.selection * 1e3:9.3f} ms",
            f"  matching:    {self.matching * 1e3:9.3f} ms",
            f"  weighting:   {self.weighting * 1e3:9.3f} ms",
            f"  rejection:   {self.rejection * 1e3:9.3f} ms",
            f"  solver:      {self.solver * 1e3:9.3f} ms",
            f"  total:       {total * 1e3:9.3f} ms",
            f"  convergence (whole run wall-clock): {self.convergence:.3f} s",
        ]
        return "\n".join(lines)


def _timed(fn, *args, **kwargs):
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def profile_stages(
    cfg: ICPConfig,
    source: Cloud,
    target: Cloud,
    pose=None,
    repetitions: int = 3,
    key=None,
) -> StageTimes:
    """Eager per-stage timing of one ICP iteration (post-compilation:
    each stage runs once for warmup, then ``repetitions`` timed passes)."""
    if pose is None:
        pose = jnp.eye(4, dtype=jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(0)

    times = StageTimes(n_iterations=repetitions)
    t_run0 = time.perf_counter()

    sel_fn = jax.jit(
        lambda k: selection.random_sampling(k, source.valid, cfg.selection_proba)
        if cfg.selection == Selection.RANDOM
        else source.valid
    )
    transform_fn = jax.jit(
        lambda p, mask: (
            jnp.where(
                mask[:, None],
                se3.transform_points(source.points, p),
                cloud_lib.PAD_SENTINEL,
            ),
            se3.transform_normals(source.normals, p),
        )
    )
    if cfg.matching == Matching.PROJECTIVE:
        match_fn = jax.jit(
            lambda pts, mask: projective.projective_match(
                pts, target.points, target.valid,
                fx=cfg.projective_fx, fy=cfg.projective_fy,
                cx=cfg.projective_cx, cy=cfg.projective_cy,
                width=cfg.projective_width, height=cfg.projective_height,
                window=cfg.projective_window,
                max_distance=cfg.max_distance, query_mask=mask,
            )
        )
    elif cfg.color_icp:
        tfeat = knn.color_features(target.points, target.colors)
        match_fn = jax.jit(
            lambda pts, mask: knn.match(
                knn.color_features(pts, source.colors), tfeat,
                cfg.max_distance, query_mask=mask,
            )
        )
    else:
        match_fn = jax.jit(
            lambda pts, mask: knn.match(
                pts, target.points, cfg.max_distance, query_mask=mask
            )
        )

    def gather_fn(pts, nrm, idx, valid):
        idx = jnp.clip(idx, 0, target.capacity - 1)
        return weighting.MatchArrays(
            src_points=pts,
            tgt_points=target.points[idx],
            src_normals=nrm,
            tgt_normals=target.normals[idx],
            src_colors=source.colors,
            tgt_colors=target.colors[idx],
            valid=valid & target.valid[idx],
        )

    weight_fn = jax.jit(lambda m: weighting.apply_weights(cfg.weighting, m, cfg.max_distance))
    reject_fn = jax.jit(
        lambda m: rejection.normal_angle_mask(m.src_normals, m.tgt_normals, m.valid)
    )
    solve_fn = jax.jit(lambda m, w: _solve(cfg, m, w))

    for rep in range(repetitions + 1):  # rep 0 = warmup/compile
        k = jax.random.fold_in(key, rep)
        mask, dt_sel = _timed(sel_fn, k)
        (pts, nrm), _ = _timed(transform_fn, pose, mask)
        (idx, _d2, valid), dt_match = _timed(match_fn, pts, mask)
        m = gather_fn(pts, nrm, idx, valid)
        w, dt_weight = _timed(weight_fn, m)
        newvalid, dt_reject = _timed(reject_fn, m)
        m = m._replace(valid=newvalid if cfg.rejection else m.valid)
        _inc, dt_solve = _timed(solve_fn, m, w)
        if rep == 0:
            continue
        times.selection += dt_sel / repetitions
        times.matching += dt_match / repetitions
        times.weighting += dt_weight / repetitions
        times.rejection += dt_reject / repetitions
        times.solver += dt_solve / repetitions

    times.convergence = time.perf_counter() - t_run0
    return times


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/icp_tpu_trace"):
    """jax.profiler trace of the real fused program (TensorBoard-loadable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
