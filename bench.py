"""Headline benchmark: ETH-Apartment-scale registration, pairs/sec/chip.

Workload mirrors the reference's alignETH configuration (main.cpp:343-429):
~365k-point clouds, symmetric linear ICP, random selection p=0.01, k-NN
matching at max squared distance 10, 50 iterations. Clouds are synthetic
(structured surface + noise) since the ETH dataset is an external download;
sizes, selection rate and iteration counts match the real benchmark.

Baseline proxy: the reference's hot path is FLANN kd-tree queries + an
Eigen solve on a multicore CPU (SURVEY §3.3); we time the equivalent scipy
cKDTree build + 50 query rounds + numpy normal-equation solves on this
host's CPU and report vs_baseline = ours / proxy.

The proxy runs on a SHARED host, so its time swings ~25% with load — which
made vs_baseline a lottery (r3: 6.68x vs 8.4x on identical device
throughput). The denominator of record is therefore PINNED: each config's
fastest-ever proxy seconds live in BASELINE.json["pinned_proxy"]
(scripts/pin_proxy_baseline.py, min-merged across runs — the fastest proxy
is the strongest baseline, hence the most conservative ratio). Each run
still measures a fresh proxy: it is reported for drift detection, and if
it beats the pin it becomes the denominator (min), so contention can never
INFLATE vs_baseline, only new evidence can tighten it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


N_POINTS = 365_000          # ETH Apartment scan size (SURVEY §2, hard part 1)
N_ITERATIONS = 50           # main.cpp:366
SELECTION_P = 0.01          # main.cpp:379
MAX_DISTANCE = 10.0         # main.cpp:361
N_TIMED_RUNS = 3
BATCH_PAIRS = 16            # data-parallel pairs per program (single chip)


def synth_cloud(n, seed):
    """Structured surface-ish cloud at ETH scale (~tens of meters)."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-20, 20, (n, 2)).astype(np.float32)
    z = (
        2.0 * np.sin(0.3 * xy[:, 0]) * np.cos(0.2 * xy[:, 1])
        + 0.1 * rng.standard_normal(n)
    ).astype(np.float32)
    pts = np.column_stack([xy, z])
    nrm = np.column_stack(
        [
            -0.6 * np.cos(0.3 * xy[:, 0]) * np.cos(0.2 * xy[:, 1]),
            0.4 * np.sin(0.3 * xy[:, 0]) * np.sin(0.2 * xy[:, 1]),
            np.ones(n, np.float32),
        ]
    ).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return pts, nrm


def synth_indoor_cloud(n, seed, sensor=(10.0, 7.5, 1.5), crop=None):
    """Indoor-like multi-surface scene at ETH-Apartment scale: floor + two
    walls + box 'furniture', range-dependent density falloff from a sensor
    origin, surface noise. Far harder for box pruning / certificates /
    overlap statistics than the single smooth sinusoid sheet: disjoint
    surfaces at right angles, occluder-scale boxes, anisotropic density.

    ``crop=(xlo, xhi)`` keeps only points whose x lies in the window
    before resampling — the source/target pair cropped to shifted windows
    yields the 20-40% non-overlap of real consecutive scans.
    Returns ``(points, normals)`` with exactly ``n`` rows (weighted
    resampling with replacement, so clouds share one capacity).
    """
    rng = np.random.default_rng(seed)
    # (kind, params, area): floor plane, two walls, box tops/sides.
    boxes = [
        (4.0, 3.0, 1.2, 2.0, 0.8),     # x, y, w, d, h
        (13.0, 9.0, 2.5, 1.0, 1.1),
        (8.0, 11.0, 1.0, 1.0, 0.5),
        (16.0, 4.0, 1.5, 2.2, 0.7),
    ]
    surfaces = [("floor", None, 20.0 * 15.0),
                ("wallx", None, 20.0 * 3.0),
                ("wally", None, 15.0 * 3.0)]
    for b in boxes:
        x, y, w, d, h = b
        surfaces.append(("boxtop", b, w * d))
        surfaces.append(("boxside", b, 2 * (w + d) * h))
    areas = np.array([s[2] for s in surfaces])
    m = 3 * n  # oversample, then density-weighted resample
    counts = rng.multinomial(m, areas / areas.sum())
    pts_l, nrm_l = [], []
    for (kind, b, _), c in zip(surfaces, counts):
        if c == 0:
            continue
        u, v = rng.random(c), rng.random(c)
        if kind == "floor":
            p = np.column_stack([20 * u, 15 * v, np.zeros(c)])
            nm = np.tile([0.0, 0.0, 1.0], (c, 1))
        elif kind == "wallx":
            p = np.column_stack([20 * u, np.zeros(c), 3 * v])
            nm = np.tile([0.0, 1.0, 0.0], (c, 1))
        elif kind == "wally":
            p = np.column_stack([np.zeros(c), 15 * u, 3 * v])
            nm = np.tile([1.0, 0.0, 0.0], (c, 1))
        elif kind == "boxtop":
            x, y, w, d, h = b
            p = np.column_stack([x + w * (u - 0.5), y + d * (v - 0.5),
                                 np.full(c, h)])
            nm = np.tile([0.0, 0.0, 1.0], (c, 1))
        else:  # boxside: four vertical faces by perimeter position
            x, y, w, d, h = b
            t = u * 2 * (w + d)
            px = np.where(t < w, x - w / 2 + t,
                  np.where(t < w + d, x + w / 2,
                  np.where(t < 2 * w + d, x + w / 2 - (t - w - d),
                           x - w / 2)))
            py = np.where(t < w, y - d / 2,
                  np.where(t < w + d, y - d / 2 + (t - w),
                  np.where(t < 2 * w + d, y + d / 2,
                           y + d / 2 - (t - 2 * w - d))))
            p = np.column_stack([px, py, h * v])
            nx = np.where(t < w, 0.0, np.where(t < w + d, 1.0,
                  np.where(t < 2 * w + d, 0.0, -1.0)))
            ny = np.where(t < w, -1.0, np.where(t < w + d, 0.0,
                  np.where(t < 2 * w + d, 1.0, 0.0)))
            nm = np.column_stack([nx, ny, np.zeros(c)])
        pts_l.append(p)
        nrm_l.append(nm)
    pts = np.concatenate(pts_l).astype(np.float32)
    nrm = np.concatenate(nrm_l).astype(np.float32)
    if crop is not None:
        keep = (pts[:, 0] >= crop[0]) & (pts[:, 0] <= crop[1])
        pts, nrm = pts[keep], nrm[keep]
    # Scanner density falloff ~ 1/r^2 from the sensor origin.
    r2 = np.sum((pts - np.asarray(sensor, np.float32)) ** 2, axis=1)
    w8 = 1.0 / np.maximum(r2, 1.0)
    rows = rng.choice(len(pts), size=n, replace=True, p=w8 / w8.sum())
    pts, nrm = pts[rows], nrm[rows]
    pts = pts + rng.normal(0, 0.008, pts.shape).astype(np.float32)
    return pts.astype(np.float32), nrm


def make_indoor_pairs():
    """BATCH_PAIRS (source, target) pairs from the indoor scene: the
    windows overlap ~70% in x (20-40% non-overlap like consecutive real
    scans), sources independently sampled and rigidly perturbed."""
    pairs = []
    for i in range(BATCH_PAIRS):
        tgt_pts, tgt_nrm = synth_indoor_cloud(
            N_POINTS, 3 * i + 1, crop=(0.0, 16.0))
        src_pts, src_nrm = synth_indoor_cloud(
            N_POINTS, 3 * i + 2, crop=(4.5, 20.0))
        ang = 0.04 + 0.008 * i
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0],
             [np.sin(ang), np.cos(ang), 0],
             [0, 0, 1]], np.float32)
        shift = np.array([0.4 - 0.06 * i, -0.25 + 0.04 * i, 0.05], np.float32)
        src_pts = (src_pts @ R.T + shift).astype(np.float32)
        src_nrm = (src_nrm @ R.T).astype(np.float32)
        pairs.append((src_pts, src_nrm, tgt_pts, tgt_nrm))
    return pairs


def headline_config(selection=None, **overrides):
    """THE benchmarked configuration — the same `ICPConfig` the production
    ETH sweep runs (workloads/eth.py CLI with --metric 2 --linear), so the
    headline number and the shipped defaults cannot drift apart (matcher
    knobs like kd_warm_start ride the config's defaults;
    tests/test_workloads.py pins this equality)."""
    from icp_variants_tpu.pipeline.config import (
        ICPConfig, Metric, Minimizer, Selection,
    )

    return ICPConfig(
        metric=Metric.SYMMETRIC,
        minimizer=Minimizer.LINEAR,
        selection=Selection.RANDOM if selection is None else selection,
        selection_proba=SELECTION_P,
        n_iterations=N_ITERATIONS,
        max_distance=MAX_DISTANCE,
    ).replace(**overrides)


def prepare_host_state(pairs, use_kd=True, block_target=None):
    """One-time host-side prep shared by every bench_tpu invocation:
    Morton-ordered stacked clouds and per-target k-d builds (the FLANN
    buildIndex analog, NearestNeighbor.h:122-141). Hoisted out of
    bench_tpu so the A/B rounds don't redo minutes of identical host
    sorts and scipy builds."""
    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import kdtree
    from icp_variants_tpu.pipeline import icp

    source_clouds = [
        cloud_lib.from_numpy(sp, normals=sn, morton_order=True)
        for (sp, sn, _, _) in pairs
    ]
    target_clouds = [
        cloud_lib.from_numpy(tp, normals=tn, morton_order=True)
        for (_, _, tp, tn) in pairs
    ]
    state = {
        "sources": icp.stack_clouds(source_clouds),
        "targets": icp.stack_clouds(target_clouds),
        "kd_indexes": None,
    }
    if use_kd:
        bt = block_target or kdtree.BLOCK_TARGET
        state["kd_indexes"] = kdtree.stack_kd_indexes([
            kdtree.build_kd_index(
                np.asarray(t.points), np.asarray(t.valid), block_target=bt)
            for t in target_clouds
        ])
    return state


def bench_tpu(pairs, selection, use_kd=True, state=None, **overrides):
    """Batched registration: BATCH_PAIRS DISTINCT scan pairs per program
    (the ETH sweep's data-parallel axis, run on one chip). Returns
    seconds/pair. ``selection`` picks the mode: RANDOM (reference-exact
    Bernoulli, headline) or RANDOM_FAST (the stratified extension).
    ``use_kd`` matches through the per-query k-d index (v3) instead of the
    tile visited-list kernel alone: 10.6 vs 8.3 pairs/s once the block
    gathers lower FLAT under the pair vmap and the exactness fallback
    hides behind a batch-global cond (scripts/evidence/bench_ab_kd_log.txt).
    ``overrides`` replace ICPConfig fields for A/B arms (kd_warm_start
    etc.). ``state`` (prepare_host_state) shares the host-side builds
    across calls; built on demand when omitted."""
    import jax

    from icp_variants_tpu.pipeline import icp

    cfg = headline_config(selection, **overrides)
    if state is None:
        state = prepare_host_state(pairs, use_kd=use_kd)
    sources, targets = state["sources"], state["targets"]
    kd_indexes = state["kd_indexes"] if use_kd else None

    def run(seed):
        res = icp.run_icp_batch(
            cfg, sources, targets, key=jax.random.PRNGKey(seed),
            kd_indexes=kd_indexes,
        )
        # device_get forces a real device->host transfer; plain
        # block_until_ready is unreliable over this environment's tunneled
        # backend (returns before execution completes).
        jax.device_get(res.pose)
        return res

    run(0)  # compile
    run(0)  # warm: the first post-compile dispatch can hit tunnel queueing
    # Best of two timed blocks: the tunneled backend occasionally stalls a
    # block by ~20% (queue variance); the faster block reflects device
    # throughput (measured spread in scripts/evidence/headline_variance_log.txt).
    best = float("inf")
    for block in range(2):
        t0 = time.perf_counter()
        for s in range(N_TIMED_RUNS):
            run(block * N_TIMED_RUNS + s + 1)
        best = min(
            best, (time.perf_counter() - t0) / (N_TIMED_RUNS * BATCH_PAIRS)
        )
    return best


def eth_true_pose(i):
    """The known rigid perturbation applied to pair i's source by
    make_pairs (the headline family's angle/shift schedule)."""
    ang = 0.05 + 0.01 * i
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0],
         [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    shift = np.array([0.5 - 0.1 * i, -0.3 + 0.05 * i, 0.1], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = shift
    return T


def rotation_geodesic_deg(R):
    """Geodesic rotation angle of a 3x3 rotation-ish matrix, degrees."""
    c = (float(np.trace(R)) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def measure_eth_accuracy(state, cfg):
    """Mean max-abs translation error AND mean geodesic rotation error of
    the registered poses against the known synthetic perturbations — the
    accuracy metrics the exact-vs-approximate arm comparison reports (ICP
    must invert eth_true_pose; the perturbations are rotation-dominated,
    so a rotation-degrading approximation must not pass a
    translation-only gate). Returns ``(t_err_m, r_err_deg)``."""
    import jax

    from icp_variants_tpu.pipeline import icp

    res = icp.run_icp_batch(
        cfg, state["sources"], state["targets"], key=jax.random.PRNGKey(1),
        kd_indexes=state["kd_indexes"],
    )
    poses = jax.device_get(res.pose)
    t_errs, r_errs = [], []
    for i in range(poses.shape[0]):
        resid = np.asarray(poses[i]) @ eth_true_pose(i)
        t_errs.append(float(np.abs((resid - np.eye(4))[:3, 3]).max()))
        r_errs.append(rotation_geodesic_deg(resid[:3, :3]))
    return float(np.mean(t_errs)), float(np.mean(r_errs))


def bench_cpu_proxy(src_pts, tgt_pts):
    """FLANN+Eigen proxy: kd-tree build + 50 rounds of (select, query, 6x6
    normal-equation solve) with scipy/numpy on all cores."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    tree = cKDTree(tgt_pts)  # FLANN buildIndex (once per pair)
    for _ in range(N_ITERATIONS):
        sel = rng.random(len(src_pts)) < SELECTION_P
        q = src_pts[sel]
        d, idx = tree.query(q, k=1, workers=-1)
        matched = tgt_pts[idx]
        ok = d * d <= MAX_DISTANCE
        A = np.concatenate([np.cross(q, matched), np.ones_like(q)], axis=1)
        A *= ok[:, None]
        ata = A.T @ A
        atb = A.T @ (np.sum((matched - q), axis=1) * ok)
        np.linalg.solve(ata + 1e-6 * np.eye(6), atb)
    return time.perf_counter() - t0


def make_pairs():
    """BATCH_PAIRS distinct (source, target) pairs: per-pair clouds and
    per-pair perturbations (the ETH driver's scaled GT pose,
    main.cpp:419-429). The perturbation applied to pair i is EXACTLY
    ``eth_true_pose(i)`` — one schedule function, so the accuracy gate's
    ground truth can never silently drift from the generator's."""
    pairs = []
    for i in range(BATCH_PAIRS):
        tgt_pts, tgt_nrm = synth_cloud(N_POINTS, 2 * i)
        T = eth_true_pose(i)
        R, shift = T[:3, :3], T[:3, 3]
        src_pts = (tgt_pts @ R.T + shift).astype(np.float32)
        src_nrm = (tgt_nrm @ R.T).astype(np.float32)
        pairs.append((src_pts, src_nrm, tgt_pts, tgt_nrm))
    return pairs


# ---------------------------------------------------------------------------
# TUM RGB-D sections: projective point-to-plane tracking (BASELINE.json
# config 2, main.cpp:183-341) and multires + color ICP (config 4).
# ---------------------------------------------------------------------------

TUM_W, TUM_H = 640, 480
TUM_FX = TUM_FY = 525.0                 # main.cpp:236 sensor calibration
TUM_CX, TUM_CY = 319.5, 239.5
TUM_ITERATIONS = 35                     # main.cpp:266
TUM_MAX_DISTANCE = 0.1                  # main.cpp:261
TUM_BATCH_FRAMES = 8                    # data-parallel frames per program
TUM_SHIFT = 0.01                        # camera x-shift per frame (m)


def synth_depth_frame(i):
    """Indoor-like 640x480 depth frame: wavy surface + raised boxes
    ('furniture' with sharp depth steps -> invalid normals at the edges,
    like real TUM frames), viewed from a camera at x = -TUM_SHIFT*i.
    Returns (depth f32 (H, W) in meters, color u8 (H, W, 4))."""
    vv, uu = np.meshgrid(np.arange(TUM_H), np.arange(TUM_W), indexing="ij")
    sx = TUM_SHIFT * i
    z = np.full((TUM_H, TUM_W), 2.0)
    boxes = [(-0.6, -0.3, 0.35, 0.25, 0.5), (0.4, 0.2, 0.3, 0.3, 0.35),
             (0.1, -0.5, 0.2, 0.2, 0.25)]
    for _ in range(8):  # fixed-point solve of the pixel-ray / surface hit
        xw = (uu - TUM_CX) / TUM_FX * z - sx
        yw = (vv - TUM_CY) / TUM_FY * z
        base = 2.0 + 0.12 * np.sin(3.0 * xw) * np.cos(3.0 * yw)
        for (bx, by, w, h, dz) in boxes:
            inside = (np.abs(xw - bx) < w) & (np.abs(yw - by) < h)
            base = np.where(inside, base - dz, base)
        z = base
    # Smooth structured colors from the world coordinates so the 6-dim
    # color features carry real matching signal.
    xw = (uu - TUM_CX) / TUM_FX * z - sx
    yw = (vv - TUM_CY) / TUM_FY * z
    color = np.stack([
        (127 + 120 * np.sin(5.0 * xw)).astype(np.uint8),
        (127 + 120 * np.cos(4.0 * yw)).astype(np.uint8),
        (127 + 120 * np.sin(3.0 * (xw + yw))).astype(np.uint8),
        np.full((TUM_H, TUM_W), 255, np.uint8),
    ], axis=-1)
    return z.astype(np.float32), color


def prepare_tum_state():
    """Shared host-side prep for both TUM sections: frame 0 as the
    tracking target (full-size image-shaped for projective, compacted for
    k-NN — room.py's shape contract, main.cpp:293-298) and
    TUM_BATCH_FRAMES source frames (stride-8 compacted for projective,
    full-size for multires)."""
    from icp_variants_tpu.data import rgbd
    from icp_variants_tpu.pipeline import icp

    K = np.array([[TUM_FX, 0, TUM_CX], [0, TUM_FY, TUM_CY], [0, 0, 1]],
                 np.float32)
    eye = np.eye(4, dtype=np.float32)
    cap = TUM_W * TUM_H

    depth0, color0 = synth_depth_frame(0)
    tgt_img = rgbd.cloud_from_depth(
        depth0, color0, K, eye, keep_original_size=True, capacity=cap)
    tgt_cmp = rgbd.cloud_from_depth(
        depth0, color0, K, eye, keep_original_size=False, capacity=cap)

    src_ds, src_full = [], []
    for i in range(1, TUM_BATCH_FRAMES + 1):
        depth, color = synth_depth_frame(i)
        src_ds.append(rgbd.cloud_from_depth(
            depth, color, K, eye, keep_original_size=False,
            downsample_factor=8, capacity=cap // 8, morton_order=True))
        # 6-dim Morton source order: same-kd-block queries cluster into
        # the resident color matcher's gates (+23% hardware-measured;
        # the multires stride then subsamples the Morton order — the
        # documented PARITY.md deviation class, accuracy-gated below).
        src_full.append(rgbd.cloud_from_depth(
            depth, color, K, eye, keep_original_size=True, capacity=cap,
            color_morton_order=True))
    return {
        "targets_img": icp.stack_clouds([tgt_img] * TUM_BATCH_FRAMES),
        "targets_cmp": icp.stack_clouds([tgt_cmp] * TUM_BATCH_FRAMES),
        "sources_ds": icp.stack_clouds(src_ds),
        "sources_full": icp.stack_clouds(src_full),
    }


def _tum_base_config(**overrides):
    from icp_variants_tpu.pipeline.config import (
        ICPConfig, Metric, Minimizer,
    )

    cfg = ICPConfig(
        metric=Metric.POINT_TO_PLANE,
        minimizer=Minimizer.LINEAR,
        n_iterations=TUM_ITERATIONS,
        max_distance=TUM_MAX_DISTANCE,
    ).with_camera(fx=TUM_FX, fy=TUM_FY, cx=TUM_CX, cy=TUM_CY,
                  width=TUM_W, height=TUM_H)
    return cfg.replace(**overrides)


def _time_batch(run, n_runs=2):
    """compile + warm dispatch + best-of-2 timed blocks (same discipline
    as bench_tpu; device_get because block_until_ready is unreliable over
    the tunneled backend)."""
    run(0)
    run(0)
    best = float("inf")
    for block in range(2):
        t0 = time.perf_counter()
        for s in range(n_runs):
            run(block * n_runs + s + 1)
        best = min(best, (time.perf_counter() - t0) / n_runs)
    return best


def bench_tum_projective(state):
    """Projective point-to-plane RGB-D tracking at 640x480 (the
    reconstructRoom configuration, main.cpp:183-341): TUM_BATCH_FRAMES
    distinct frames tracked against frame 0 in one program. Returns
    seconds/frame."""
    import jax

    from icp_variants_tpu.pipeline import icp
    from icp_variants_tpu.pipeline.config import Matching

    # Chunk sized so the 8-frame batch's live candidate tensor stays
    # ~0.9 GB (the single-frame default OOMed HBM at 7.2 GB).
    cfg = _tum_base_config(
        matching=Matching.PROJECTIVE, projective_chunk=4096)
    sources, targets = state["sources_ds"], state["targets_img"]

    def run(seed):
        res = icp.run_icp_batch(
            cfg, sources, targets, key=jax.random.PRNGKey(seed))
        jax.device_get(res.pose)
        return res

    return _time_batch(run) / TUM_BATCH_FRAMES


def bench_color_multires(state, **overrides):
    """Multi-resolution + color ICP (6-dim k-NN) on the TUM frames
    (BASELINE.json config 4): full-size sources, stride pyramid, colors in
    the matching metric. ``overrides`` replace ICPConfig fields (the
    approximate arm passes matching_checks). Returns seconds/frame."""
    import jax

    from icp_variants_tpu.pipeline import icp

    from icp_variants_tpu.ops import kdtree

    cfg = _tum_base_config(
        color_icp=True, multi_resolution=True, **overrides)
    sources, targets = state["sources_full"], state["targets_cmp"]
    # 6-dim color kd over the (shared) tracking target: dense SELECT_ALL
    # rides the resident kernel (production gate, icp.build_kd_for).
    tgt0 = jax.tree.map(lambda x: x[0], targets)
    kd0 = icp.build_kd_for(cfg, tgt0)
    kd_indexes = (
        kdtree.stack_kd_indexes([kd0] * TUM_BATCH_FRAMES)
        if kd0 is not None else None
    )

    def run(seed):
        # Segmented multires driver: coarse pyramid levels run at their
        # own sliced capacity instead of full-capacity masked (the
        # in-scan path paid ~33 ms/frame/iter for <2%-occupancy coarse
        # iterations — scripts/evidence/batched_stage_log.txt).
        res = icp.run_icp_batch_multires_segmented(
            cfg, sources, targets, key=jax.random.PRNGKey(seed),
            num_source_points=TUM_W * TUM_H, kd_indexes=kd_indexes)
        jax.device_get(res.pose)
        return res

    return _time_batch(run) / TUM_BATCH_FRAMES


def measure_color_accuracy(state, **overrides):
    """Mean max-abs translation error of the color-multires tracker
    against the synthetic camera's known x-shift (frame i's camera sits at
    x = -TUM_SHIFT*i, so the GT source->target transform is a pure
    translation of -TUM_SHIFT*i) — plus the mean geodesic rotation error
    (GT rotation is identity). Returns ``(t_err_m, r_err_deg)`` — the
    exact-vs-approximate accuracy metrics for bench config 4."""
    import jax

    from icp_variants_tpu.ops import kdtree
    from icp_variants_tpu.pipeline import icp

    cfg = _tum_base_config(
        color_icp=True, multi_resolution=True, **overrides)
    sources, targets = state["sources_full"], state["targets_cmp"]
    tgt0 = jax.tree.map(lambda x: x[0], targets)
    kd0 = icp.build_kd_for(cfg, tgt0)
    kd_indexes = (
        kdtree.stack_kd_indexes([kd0] * TUM_BATCH_FRAMES)
        if kd0 is not None else None
    )
    # The SEGMENTED driver — the exact executable family the throughput
    # section times — so the accuracy gate exercises the seeded
    # membership path it gates (run_icp_batch's in-scan multires never
    # receives a membership seed and would score the unseeded search).
    res = icp.run_icp_batch_multires_segmented(
        cfg, sources, targets, key=jax.random.PRNGKey(1),
        num_source_points=TUM_W * TUM_H, kd_indexes=kd_indexes)
    poses = jax.device_get(res.pose)
    t_errs, r_errs = [], []
    for b in range(poses.shape[0]):
        gt_t = np.array([-TUM_SHIFT * (b + 1), 0.0, 0.0], np.float32)
        t_errs.append(float(np.abs(
            np.asarray(poses[b])[:3, 3] - gt_t).max()))
        r_errs.append(rotation_geodesic_deg(np.asarray(poses[b])[:3, :3]))
    return float(np.mean(t_errs)), float(np.mean(r_errs))


def bench_cpu_proxy_projective(state):
    """Reference-shaped projective proxy: per iteration, project every
    stride-8 source point into the target image and scan the (2*12+1)^2
    pixel window for the closest target point (the omp-parallel loop of
    NearestNeighbor.h:368-407 — torch ops use all host cores), then a 6x6
    normal-equation solve. One frame, seconds/frame."""
    import torch

    src = state["sources_ds"]
    src_pts = np.asarray(src.points[0])
    src_ok = np.asarray(src.valid[0])
    q0 = torch.from_numpy(src_pts[src_ok])
    tgt = state["targets_img"]
    tpts = np.asarray(tgt.points[0])
    tok = np.asarray(tgt.valid[0])
    timg = torch.from_numpy(
        np.where(tok[:, None], tpts, 1.0e9).astype(np.float32))
    win = 12
    du = torch.arange(-win, win + 1)
    t0 = time.perf_counter()
    for _ in range(TUM_ITERATIONS):
        q = q0
        u = torch.round(q[:, 0] / q[:, 2] * TUM_FX + TUM_CX).long()
        v = torch.round(q[:, 1] / q[:, 2] * TUM_FY + TUM_CY).long()
        inb = (u >= 0) & (u < TUM_W) & (v >= 0) & (v < TUM_H) & (q[:, 2] > 0)
        base = (v.clamp(0, TUM_H - 1) * TUM_W + u.clamp(0, TUM_W - 1))
        best = torch.full((q.shape[0],), 1.0e18)
        arg = torch.zeros(q.shape[0], dtype=torch.long)
        for dv in range(-win, win + 1):
            rows = (base + dv * TUM_W)[:, None] + du[None, :]
            cand = timg[rows.clamp(0, TUM_H * TUM_W - 1)]   # (n, 25, 3)
            d2 = ((cand - q[:, None, :]) ** 2).sum(-1)
            m, a = d2.min(dim=1)
            better = m < best
            best = torch.where(better, m, best)
            arg = torch.where(better, rows.gather(1, a[:, None])[:, 0], arg)
        ok = inb & (best <= TUM_MAX_DISTANCE)
        matched = timg[arg.clamp(0, TUM_H * TUM_W - 1)]
        A = torch.cat([torch.cross(q, matched, dim=1),
                       torch.ones_like(q)], dim=1) * ok[:, None]
        ata = (A.T @ A).numpy()
        atb = (A.T @ ((matched - q).sum(1) * ok)).numpy()
        np.linalg.solve(ata + 1e-6 * np.eye(6), atb)
    return time.perf_counter() - t0


def bench_cpu_proxy_color_multires(state):
    """FLANN-analog proxy for config 4: one 6-dim cKDTree build over the
    color features (NearestNeighbor.h:209-303) + per-iteration strided
    multires queries (all cores) + 6x6 solves. One frame, seconds/frame."""
    from scipy.spatial import cKDTree

    from icp_variants_tpu.core import cloud as cloud_lib

    tgt = state["targets_cmp"]
    tok = np.asarray(tgt.valid[0])
    tfeat = np.concatenate([
        np.asarray(tgt.points[0])[tok],
        np.asarray(tgt.colors[0])[tok][:, :3] / 255.0,
    ], axis=1)
    src = state["sources_full"]
    sok = np.asarray(src.valid[0])
    sfeat = np.concatenate([
        np.asarray(src.points[0]),
        np.asarray(src.colors[0])[:, :3] / 255.0,
    ], axis=1)
    strides = np.asarray(cloud_lib.multires_stride_schedule(
        TUM_W * TUM_H, TUM_ITERATIONS, True, 100))
    t0 = time.perf_counter()
    tree = cKDTree(tfeat)
    for stride in strides:
        rows = np.arange(0, TUM_W * TUM_H, int(stride))
        q = sfeat[rows][sok[rows]]
        d, idx = tree.query(q, k=1, workers=-1)
        matched = tfeat[idx, :3]
        ok = d * d <= TUM_MAX_DISTANCE
        qp = q[:, :3]
        A = np.concatenate([np.cross(qp, matched), np.ones_like(qp)], axis=1)
        A *= ok[:, None]
        ata = A.T @ A
        atb = A.T @ (np.sum(matched - qp, axis=1) * ok)
        np.linalg.solve(ata + 1e-6 * np.eye(6), atb)
    return time.perf_counter() - t0


def load_pinned_proxy():
    """Pinned (fastest-ever) CPU-proxy seconds per config from
    BASELINE.json — the stable vs_baseline denominators (see module
    docstring). Missing file/key degrades to fresh-proxy-only."""
    import pathlib

    path = pathlib.Path(__file__).resolve().parent / "BASELINE.json"
    try:
        return json.loads(path.read_text()).get("pinned_proxy", {})
    except (OSError, ValueError):
        return {}


def proxy_denominator(pins, key, fresh, out, label):
    """Resolve the vs_baseline denominator for one config: the pinned
    proxy seconds unless the fresh measurement is even faster (min —
    host contention can only loosen a fresh proxy, never tighten it).
    Records both in the output dict for drift visibility."""
    pinned = pins.get(key)
    out[f"{label}_fresh_proxy_s"] = round(fresh, 4)
    if pinned is None:
        return fresh
    out[f"{label}_pinned_proxy_s"] = pinned
    return min(fresh, pinned)


def wait_for_backend(budget_s: float) -> bool:
    """The tunneled TPU backend periodically dies (relay ports closed) and a
    dead backend HANGS jax init forever — probe it in a subprocess under a
    timeout (same pattern as scripts/tpu_wait_and_run.py) and poll up to
    ``budget_s`` so the driver's end-of-round bench blocks boundedly. Skipped
    entirely on CPU-forced runs (tests)."""
    import os
    import subprocess

    probe = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((8, 128));"
        "print('PROBE_OK', float(jax.device_get((x @ x.T).sum())))"
    )
    deadline = time.time() + budget_s
    while True:
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True, text=True, timeout=420,
                env=os.environ,
            )
            if "PROBE_OK" in out.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print("bench: TPU backend down; retrying in 120 s", file=sys.stderr)
        time.sleep(120)


def main():
    import os

    if os.environ.get("BENCH_SKIP_BACKEND_PROBE") != "1" and not wait_for_backend(
        float(os.environ.get("BENCH_BACKEND_WAIT_S", "1800"))
    ):
        # Honest failure report instead of an unbounded hang: no number was
        # (or could be) measured this run.
        print(
            json.dumps(
                {
                    "metric": "eth_scale_scan_pairs_per_sec_chip",
                    "value": 0.0,
                    "unit": "pairs/s (NOT MEASURED: TPU tunnel down — "
                    "backend init probe failed for the whole wait budget)",
                    "vs_baseline": 0.0,
                    "error": "tpu_backend_unreachable",
                }
            )
        )
        return 1

    from icp_variants_tpu.pipeline.config import Selection

    sections = os.environ.get(
        "BENCH_SECTIONS",
        "eth,eth_indoor,eth_lm,tum_projective,color_multires",
    ).split(",")
    pairs = make_pairs()

    # HEADLINE = the reference-exact Bernoulli RANDOM mode under the
    # PRODUCTION config defaults (headline_config == the CLI eth sweep's
    # matcher config; tests pin the equality). Since the geometric-gap
    # selection rewrite RANDOM is as fast as the RANDOM_FAST stratified
    # extension, so the headline carries no selection-mode asterisk.
    # Warm start is regime-gated: OFF under sparse compacted selection
    # (every hardware A/B since r2 measured warm slower there — 9.9 vs
    # 12.35 pairs/s; the old bench ran both arms and reported the min),
    # ON for dense SELECT_ALL where it wins (TUM color tracker 3.29 vs
    # 3.52 s/frame). The production default IS the measured winner in
    # both regimes now (pipeline/icp._warm_applies), so the headline
    # measures the one production configuration; a forced-warm arm stays
    # measurable via scripts/warm_ab_sweep.py.
    state = prepare_host_state(pairs)
    # TWO matching arms (PARITY.md "Approximate matching arm"):
    # - exact: this framework's default contract (exact 1-NN within the
    #   threshold, certificate + fallback) — STRICTER than the reference;
    # - FLANN-parity: matching_checks=16, the reference's own
    #   SearchParams(16) approximate-search semantics
    #   (NearestNeighbor.h:134). The headline value is the FLANN-parity
    #   arm — like-for-like against the reference's matcher — with the
    #   exact arm and the accuracy delta reported alongside.
    dt_exact = bench_tpu(pairs, Selection.RANDOM, state=state)
    dt_apx = bench_tpu(
        pairs, Selection.RANDOM, state=state, matching_checks=16)
    dt_fast = bench_tpu(pairs, Selection.RANDOM_FAST, state=state)
    err_exact, rerr_exact = measure_eth_accuracy(
        state, headline_config(Selection.RANDOM))
    err_apx, rerr_apx = measure_eth_accuracy(
        state, headline_config(Selection.RANDOM, matching_checks=16))
    # Fresh best-of-2 CPU proxy (drift detection + possible pin tightening);
    # the denominator of record is the PIN (module docstring).
    src_pts, _, tgt_pts, _ = pairs[0]
    dt_cpu = min(bench_cpu_proxy(src_pts, tgt_pts) for _ in range(2))

    pins = load_pinned_proxy()
    out = {
        "metric": "eth_scale_scan_pairs_per_sec_chip",
        "value": round(1.0 / dt_apx, 4),
        "unit": "pairs/s (365k pts, 50-iter symmetric ICP, p=0.01, "
        "reference-exact Bernoulli selection, approximate matching arm: "
        "checks=16 rounded up to a top-1-block candidate budget, "
        "certificate skipped — FLANN-SearchParams(16)-class semantics, "
        "the reference's own approximation class; exact arm reported "
        "alongside)",
        "arm": "flann-parity-checks16",
        "exact_matching_pairs_per_sec": round(1.0 / dt_exact, 4),
        "fast_selection_pairs_per_sec": round(1.0 / dt_fast, 4),
        "accuracy_mean_t_err_m": {
            "exact": round(err_exact, 5), "checks16": round(err_apx, 5),
        },
        "accuracy_mean_r_err_deg": {
            "exact": round(rerr_exact, 5), "checks16": round(rerr_apx, 5),
        },
        "warm_start": "regime-gated: dense selection only "
        "(ICPConfig.kd_warm_start)",
        "distinct_pairs_per_batch": BATCH_PAIRS,
    }
    denom = proxy_denominator(
        pins, "eth_proxy_seconds_per_pair", dt_cpu, out, "eth")
    out["vs_baseline"] = round(denom / dt_apx, 3)
    out["exact_matching_vs_baseline"] = round(denom / dt_exact, 3)

    # Secondary sections are fault-contained: one section failing (e.g. a
    # first-time compile tripping a VMEM limit) must not cost the headline
    # JSON line the driver records.
    def section(name, fn):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — report, never crash
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:2000]

    def _eth_indoor():
        # The HARD synthetic family (multi-surface indoor scene, density
        # falloff, 20-40% non-overlap) under the headline config — same
        # capacities, so both arms reuse the headline's compiled
        # executables.
        ipairs = make_indoor_pairs()
        istate = prepare_host_state(ipairs)
        dt_ie = bench_tpu(ipairs, Selection.RANDOM, state=istate)
        dt_ia = bench_tpu(
            ipairs, Selection.RANDOM, state=istate, matching_checks=16
        )
        isrc, _, itgt, _ = ipairs[0]
        dt_icpu = min(bench_cpu_proxy(isrc, itgt) for _ in range(2))
        denom_i = proxy_denominator(
            pins, "eth_indoor_proxy_seconds_per_pair", dt_icpu, out,
            "eth_indoor")
        out["eth_indoor_pairs_per_sec"] = round(1.0 / dt_ia, 4)
        out["eth_indoor_vs_baseline"] = round(denom_i / dt_ia, 3)
        out["eth_indoor_exact_pairs_per_sec"] = round(1.0 / dt_ie, 4)
        out["eth_indoor_exact_vs_baseline"] = round(denom_i / dt_ie, 3)

    if "eth_indoor" in sections:
        section("eth_indoor", _eth_indoor)

    def _eth_lm():
        # The reference's ACTUAL ETH default is the Ceres nonlinear-LM
        # optimizer with point-to-point (main.cpp:22-41, USE_LINEAR_ICP
        # 0) — every other section runs Minimizer.LINEAR. One arm at
        # bench shapes so the parity claim for the reference's default
        # configuration carries a measured number (<=10 Marquardt-
        # Nielsen inner steps per iteration, solvers/gauss_newton.py —
        # the reference pays the same through Ceres).
        from icp_variants_tpu.pipeline.config import Metric, Minimizer

        dt_lm = bench_tpu(
            pairs, Selection.RANDOM, state=state,
            metric=Metric.POINT_TO_POINT,
            minimizer=Minimizer.NONLINEAR_LM, matching_checks=16,
        )
        out["eth_lm_point_pairs_per_sec"] = round(1.0 / dt_lm, 4)
        out["eth_lm_point_vs_baseline"] = round(denom / dt_lm, 3)

    if "eth_lm" in sections:
        section("eth_lm", _eth_lm)

    if "tum_projective" in sections or "color_multires" in sections:
        tum_state = prepare_tum_state()

        # Best-of-2 on these proxies too (same protocol as the ETH ones):
        # a contention spike on the shared host slows a single-run proxy
        # and inflates vs_baseline — the proxy's FASTEST run is the
        # conservative baseline.
        def _tum_projective():
            dt_p = bench_tum_projective(tum_state)
            dt_pc = min(bench_cpu_proxy_projective(tum_state) for _ in range(2))
            denom_p = proxy_denominator(
                pins, "tum_projective_proxy_seconds_per_frame", dt_pc, out,
                "tum_projective")
            out["tum_projective_frames_per_sec"] = round(1.0 / dt_p, 4)
            out["tum_projective_vs_baseline"] = round(denom_p / dt_p, 3)

        def _color_multires():
            dt_me = bench_color_multires(tum_state)
            dt_ma = bench_color_multires(tum_state, matching_checks=16)
            dt_mc = min(
                bench_cpu_proxy_color_multires(tum_state) for _ in range(2)
            )
            denom_m = proxy_denominator(
                pins, "color_multires_proxy_seconds_per_frame", dt_mc, out,
                "color_multires")
            out["color_multires_frames_per_sec"] = round(1.0 / dt_ma, 4)
            out["color_multires_vs_baseline"] = round(denom_m / dt_ma, 3)
            out["color_multires_exact_frames_per_sec"] = round(1.0 / dt_me, 4)
            out["color_multires_exact_vs_baseline"] = round(
                denom_m / dt_me, 3)
            terr_me, rerr_me = measure_color_accuracy(tum_state)
            terr_ma, rerr_ma = measure_color_accuracy(
                tum_state, matching_checks=16)
            out["color_multires_accuracy_mean_t_err_m"] = {
                "exact": round(terr_me, 6), "checks16": round(terr_ma, 6),
            }
            out["color_multires_accuracy_mean_r_err_deg"] = {
                "exact": round(rerr_me, 6), "checks16": round(rerr_ma, 6),
            }

        if "tum_projective" in sections:
            section("tum_projective", _tum_projective)
        if "color_multires" in sections:
            section("color_multires", _color_multires)

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
