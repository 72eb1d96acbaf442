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
import math
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
    in seconds (eager harness: mean over repetitions; fused harness: min
    over repetitions — contention-robust for differencing)."""

    selection: float = 0.0
    matching: float = 0.0
    weighting: float = 0.0
    rejection: float = 0.0
    solver: float = 0.0
    convergence: float = 0.0
    n_iterations: int = 0
    # Fused-profile extras: full production run time, total wall clock of
    # the profiling session, and the per-iteration scan/dispatch floor
    # (stage times are measured ABOVE this floor; zero for the eager
    # profiler).
    full_run: float = 0.0
    total_wall: float = 0.0
    overhead: float = 0.0

    def report(self) -> str:
        """calculateIterationTime-style report (TimeMeasure.h:43-60)."""
        total = (
            self.selection + self.matching + self.weighting
            + self.rejection + self.solver + self.convergence
        )
        lines = [
            f"Mean time per ICP iteration ({self.n_iterations} iterations):",
            f"  selection:   {self.selection * 1e3:9.3f} ms",
            f"  matching:    {self.matching * 1e3:9.3f} ms",
            f"  weighting:   {self.weighting * 1e3:9.3f} ms",
            f"  rejection:   {self.rejection * 1e3:9.3f} ms",
            f"  solver:      {self.solver * 1e3:9.3f} ms",
            f"  convergence: {self.convergence * 1e3:9.3f} ms",
            f"  total:       {total * 1e3:9.3f} ms",
        ]
        if self.overhead:
            lines.append(
                f"  scan/dispatch floor: {self.overhead * 1e3:9.3f} ms"
                " (not attributed to stages)"
            )
        if self.full_run:
            lines.append(f"  full fused run: {self.full_run:.4f} s")
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
    each stage runs once for warmup, then ``repetitions`` timed passes).

    NOTE: this eager harness models the LEGACY full-tile pipeline only —
    mask-based RANDOM selection (no compaction) and the unindexed tile
    matcher — as a stage-isolation diagnostic. For numbers representative
    of the production executable (compacted selection, kd matching, warm
    cache, query ordering, fusion) use :func:`profile_fused_stages` /
    :func:`fused_report`.
    """
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

    times.total_wall = time.perf_counter() - t_run0
    return times


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/icp_tpu_trace"):
    """jax.profiler trace of the real fused program (TensorBoard-loadable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


# ---------------------------------------------------------------------------
# Fused (in-scan) TimeMeasure — stage-differencing the REAL compiled program
# ---------------------------------------------------------------------------

# v5e per-chip ballpark peaks for the efficiency report: f32 matmuls at
# HIGHEST precision run as multi-pass bf16 on the MXU (~1/3 of the 197
# TFLOP/s bf16 peak); HBM streams ~819 GB/s.
PEAK_F32_FLOPS = 6.6e13
PEAK_HBM_BYTES = 8.19e11

_STAGES = ("floor", "selection", "matching", "weighting", "rejection", "solve", None)


def profile_fused_stages(
    cfg: ICPConfig,
    source: Cloud,
    target: Cloud,
    *,
    key=None,
    repetitions: int = 3,
    run_benchmark: bool = False,
    kd_index=None,
) -> StageTimes:
    """Per-stage timing of the REAL fused scan (TimeMeasure.h:20-60
    semantics inside one compiled program).

    Runs the production executable truncated after each pipeline stage
    (``stop_after`` probes — same `lax.scan`, same kernels) and attributes
    per-iteration time by differencing. Unlike :func:`profile_stages`, the
    numbers include exactly the fusion/overlap the production program gets.
    """
    from icp_variants_tpu.pipeline import icp as icp_mod

    if repetitions < 1:
        raise ValueError(
            f"repetitions must be >= 1, got {repetitions} (0 would yield "
            "inf stage totals from the min-estimator)"
        )
    if key is None:
        key = jax.random.PRNGKey(0)

    def run_variant(stage):
        res = icp_mod.run_icp(
            cfg, source, target, key=key, run_benchmark=run_benchmark,
            stop_after=stage, kd_index=kd_index,
        )
        # device_get: block_until_ready returns early over tunneled backends.
        jax.device_get(res.trace.rmse)
        return res

    wall0 = time.perf_counter()
    totals = {}
    for stage in _STAGES:
        run_variant(stage)  # compile + warm
        # MIN over repetitions, not mean: stage attribution differences
        # runs taken at different times, so one contention spike on a
        # shared host inflates a single stage's diff; the min is the
        # contention-robust estimator for a fixed-work program.
        best = math.inf
        for _ in range(repetitions):
            t0 = time.perf_counter()
            run_variant(stage)
            best = min(best, time.perf_counter() - t0)
        totals[stage] = best

    n_iter = int(
        cloud_lib.multires_stride_schedule(
            int(jax.device_get(source.num_valid())), cfg.n_iterations,
            cfg.multi_resolution, cfg.multi_resolution_min_points,
        ).shape[0]
    )

    def per_iter(a, b):
        return max(totals[a] - (totals[b] if b is not ... else 0.0), 0.0) / n_iter

    times = StageTimes(n_iterations=n_iter)
    times.overhead = totals["floor"] / n_iter
    times.selection = per_iter("selection", "floor")
    times.matching = per_iter("matching", "selection")
    times.weighting = per_iter("weighting", "matching")
    times.rejection = per_iter("rejection", "weighting")
    times.solver = per_iter("solve", "rejection")
    times.convergence = per_iter(None, "solve")
    times.total_wall = time.perf_counter() - wall0
    times.full_run = totals[None]
    return times


def matcher_work_model(
    cfg: ICPConfig,
    source: Cloud,
    target: Cloud,
    key=None,
    kd_index=None,
):
    """MODELED byte/FLOP counts of the matching kernel at iteration 0.

    The visit/membership counts are computed from the real iteration-0
    query set with the same lb/bbox logic the kernels' prefix stages use
    (device-evaluated, not hand-estimated), but the bytes/FLOPs derived
    from them are a MODEL: the kernels' running-best prunes skip part of
    both, so these are upper bounds. ``tests/test_aux.py`` pins the
    membership reconstruction against the interpret-mode kernel inputs.

    Returns ``(visited, n_tiles, nq_pad, m_bytes, m_flops, label)``.
    """
    from icp_variants_tpu.pipeline import icp as icp_mod

    if key is None:
        key = jax.random.PRNGKey(0)

    # Reconstruct iteration-0 queries exactly like stage 1 does: under
    # multi-resolution, the coarsest initial stride (modeling stride 1
    # would overstate the query count by the stride factor).
    from icp_variants_tpu.ops import selection as sel_mod

    keys = jax.random.split(key, max(cfg.n_iterations, 1))
    stride0 = int(
        cloud_lib.multires_stride_schedule(
            int(jax.device_get(source.num_valid())), cfg.n_iterations,
            cfg.multi_resolution, cfg.multi_resolution_min_points,
        )[0]
    )
    if cfg.selection == Selection.RANDOM_FAST:
        k_cap = icp_mod._compact_capacity(source.capacity, cfg.selection_proba)
        n_draw = min(int(source.capacity * cfg.selection_proba + 0.5), k_cap)
        sel_idx, sel_mask = sel_mod.random_indices(
            keys[0], source.capacity, n_draw, k_cap
        )
        q = source.points[sel_idx]
    elif cfg.selection == Selection.RANDOM and cfg.compact_queries:
        k_cap = icp_mod._compact_capacity(source.capacity, cfg.selection_proba)
        sel_idx, in_range = sel_mod.bernoulli_gap_indices(
            keys[0], cfg.selection_proba, jnp.int32(stride0),
            source.capacity, k_cap,
        )
        sel_mask = in_range & source.valid[sel_idx]
        q = source.points[sel_idx]
    else:
        q = source.points
        sel_mask = source.valid
    anchor = q[jnp.argmax(sel_mask)]
    q = jnp.where(sel_mask[:, None], q, anchor)

    if kd_index is not None:
        # Warm bitmap search (the production kd path): each query tile
        # DMAs its hot+cold member block pages once and takes direct-
        # difference distances for every (query, candidate); the prefix
        # kernel adds one (nq x n_blocks x D) lb pass in VMEM. Membership
        # here is the top-K union at the threshold radius — the iteration-0
        # upper bound (warm radii can only shrink it).
        from icp_variants_tpu.ops import kdtree

        nc = kd_index.pages.shape[0]
        d = kd_index.block_min.shape[1]
        cap_pad = kd_index.pages.shape[2]
        tq = cfg.kd_warm_tile_q or kdtree.TILE_Q_DEFAULT
        # The approximate arm (matching_checks > 0) caps membership at
        # checks_to_k blocks; the exact arm runs K_DEFAULT.
        if cfg.matching_checks > 0:
            kk = kdtree.checks_to_k(cfg.matching_checks, kd_index)
        else:
            kk = min(kdtree.K_DEFAULT, nc)
        qp = knn._pad_rows(
            knn._pad_features(q), kdtree._PREFIX_GROUP * tq, 0.0
        )
        lb = kdtree._box_lb(qp[:, :d], kd_index.block_min, kd_index.block_max)
        sel, _ = kdtree._extract_min(lb, kk)
        nqt = qp.shape[0] // tq
        rows_t = (jnp.arange(qp.shape[0], dtype=jnp.int32) // tq)[:, None]
        # Exactly the prefix kernel's membership: top-k picks INTERSECTED
        # with the radius (at iteration 0 the threshold bound), pad rows
        # frozen out — tests/test_aux.py pins this against the
        # interpret-mode prefix.
        bound = jnp.float32(cfg.max_distance) * (1 + 1e-6) + 1e-30
        hit = (
            (jnp.take_along_axis(lb, sel, axis=1) <= bound)
            & (jnp.arange(qp.shape[0])[:, None] < q.shape[0])
        )
        member = jnp.zeros((nqt, nc), bool)
        member = member.at[
            jnp.broadcast_to(rows_t, sel.shape).reshape(-1), sel.reshape(-1)
        ].max(hit.reshape(-1))
        visited = int(jax.device_get(jnp.sum(member)))
        nq = int(q.shape[0])
        m_bytes = visited * 8 * cap_pad * 4
        m_flops = (
            visited * cap_pad * tq * (3 * d + 2)   # kernel distances
            + nq * nc * (3 * d + 2)                # prefix lb pass (VMEM)
        )
        from icp_variants_tpu.pipeline.icp import _warm_applies

        if _warm_applies(cfg):
            kind = "warm"
        elif knn.resident_fits(nc, cap_pad):
            kind = "resident"
        else:
            kind = "union"
        if cfg.matching_checks > 0:
            kind += f" approx(checks={cfg.matching_checks}, k={kk})"
        matcher_line = (
            f"  kd {kind} matcher: {visited} member blocks/iter "
            f"({visited / max(nqt, 1):.1f}/tile of {nc}): "
            f"modeled {m_bytes / 1e6:.1f} MB, {m_flops / 1e9:.2f} GFLOP"
        )
        return visited, nqt, int(qp.shape[0]), m_bytes, m_flops, matcher_line
    else:
        # Model the PRODUCTION v2 visited-list kernel: 128-query tiles and
        # direct-difference VPU distances (~3 ops per feature + min/argmin
        # update per candidate) — not the retired q @ t^T matmul kernel.
        tile_t = knn.V2_TILE_T
        tile_q = knn.V2_TILE_Q
        d_feat = 3
        index = knn.build_target_index(target.points, tile_t=tile_t)
        qp = knn._pad_rows(knn._pad_features(q), tile_q, 0.0)
        nq_tiles = qp.shape[0] // tile_q
        qtiles = qp.reshape(nq_tiles, tile_q, knn.FEATURE_PAD)
        bound = jnp.float32(cfg.max_distance) * (1 + 1e-6) + 1e-30
        _, _, counts, _ = knn._visit_lists(
            jnp.min(qtiles, axis=1), jnp.max(qtiles, axis=1),
            index.bbox_min, index.bbox_max, bound,
        )
        visited = int(jax.device_get(jnp.sum(counts)))

        # Matching kernel: bytes = visited tile pages streamed from HBM;
        # flops = direct-difference distances over visited tiles (upper
        # bound: the running-best prune skips some of both).
        m_bytes = visited * 8 * tile_t * 4
        m_flops = visited * tile_t * tile_q * (3 * d_feat + 2)
        matcher_line = (
            f"  k-NN matcher: {visited} visited tiles/iter, "
            f"modeled {m_bytes / 1e6:.1f} MB, {m_flops / 1e9:.2f} GFLOP"
        )
        return (visited, nq_tiles, int(qp.shape[0]), m_bytes, m_flops,
                matcher_line)


def kernel_efficiency(
    cfg: ICPConfig,
    source: Cloud,
    target: Cloud,
    matching_time: float,
    solver_time: float,
    key=None,
    kd_index=None,
) -> str:
    """Achieved-FLOPs/bandwidth report for the two flagship kernels
    (BASELINE.json "kernel efficiency" row): the matcher (visited-list
    kernel, or the kd block search when ``kd_index`` is given) and the
    JTJ/normal-equation accumulation.

    Provenance, stated in the output: stage TIMES are measured (stop-after
    differencing of the real fused executable, :func:`profile_fused_stages`);
    byte/FLOP WORK is modeled from the real iteration-0 membership
    (:func:`matcher_work_model`) — this backend exposes no hardware
    performance counters, so achieved-% figures are modeled-work /
    measured-time, honest to the model's upper-bound slack.
    """
    from icp_variants_tpu.pipeline import icp as icp_mod

    if key is None:
        key = jax.random.PRNGKey(0)
    _, _, n, m_bytes, m_flops, matcher_line = matcher_work_model(
        cfg, source, target, key=key, kd_index=kd_index
    )

    # Solver (JTJ accumulation): ~4 residual rows per match, 6-wide.
    rows = 4 if cfg.metric != 0 else 3
    s_flops = n * rows * (2 * 36 + 2 * 6 + 30)
    s_bytes = n * rows * (6 + 1) * 4 * 2

    # Stage times come from run differencing; below ~10 us/iter the
    # difference is timing noise and any "achieved" rate is meaningless.
    resolution = 1e-5

    def achieved(nbytes, flops, t):
        if t < resolution:
            return (
                f"    stage time < {resolution * 1e6:.0f} us/iter — below "
                "differencing resolution (kernel fully hidden/fused)"
            )
        bw, fl = nbytes / t, flops / t
        line = (
            f"    achieved {bw / 1e9:7.1f} GB/s "
            f"({100 * bw / PEAK_HBM_BYTES:5.1f}% HBM peak), "
            f"{fl / 1e12:6.2f} TFLOP/s "
            f"({100 * fl / PEAK_F32_FLOPS:5.1f}% MXU f32 peak)"
        )
        if bw > PEAK_HBM_BYTES or fl > PEAK_F32_FLOPS:
            # The min-over-reps stage differencing can understate a stage's
            # time (mins of independent runs drop different noise), so
            # modeled-work / measured-time can exceed peak.
            line += " [>100%: min-estimator understated the stage time]"
        return line

    lines = [
        "Kernel efficiency — times MEASURED (stop-after differencing of the",
        "fused executable); byte/FLOP work MODELED from real iteration-0",
        "membership (no hardware counters over this backend; model is an",
        "upper bound — the kernels' running-best prunes skip part of both):",
        matcher_line,
        achieved(m_bytes, m_flops, matching_time),
        f"  JTJ accumulate: {n} matches x {rows} rows: "
        f"modeled {s_bytes / 1e6:.2f} MB, {s_flops / 1e9:.3f} GFLOP",
        achieved(s_bytes, s_flops, solver_time),
    ]
    return "\n".join(lines)


def fused_report(
    cfg, source, target, *, key=None, repetitions: int = 3, kd_index=None,
) -> str:
    """The ``--profile`` surface: fused per-stage breakdown + kernel
    efficiency, from the production executable."""
    times = profile_fused_stages(
        cfg, source, target, key=key, repetitions=repetitions,
        kd_index=kd_index,
    )
    eff = kernel_efficiency(
        cfg, source, target, times.matching, times.solver, key=key,
        kd_index=kd_index,
    )
    return times.report() + "\n" + eff
