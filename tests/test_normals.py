"""Depth back-projection + normal estimation tests (reference:
PointCloud.h:78-165 and 41-76)."""

import jax.numpy as jnp
import numpy as np

from icp_variants_tpu.ops import normals


def synthetic_plane_depth(h=32, w=40, z=2.0):
    return np.full((h, w), z, np.float32)


class TestBackprojection:
    def test_flat_plane(self):
        h, w = 32, 40
        depth = synthetic_plane_depth(h, w)
        K = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]], np.float32)
        pts, nrm, vp, vn = normals.backproject_depth(
            jnp.asarray(depth), jnp.asarray(K), jnp.eye(4), max_distance=0.1
        )
        pts, nrm = np.asarray(pts), np.asarray(nrm)
        vp, vn = np.asarray(vp), np.asarray(vn)
        assert vp.all()
        # All interior normals of a fronto-parallel plane point along -z?
        # normal = (-du, -dv, 1) = (0, 0, 1) normalized.
        interior = vn.reshape(h, w)[1:-1, 1:-1]
        assert interior.all()
        nz = nrm.reshape(h, w, 3)[1:-1, 1:-1, 2]
        np.testing.assert_allclose(nz, 1.0, atol=1e-6)
        # Depth z at the principal point back-projects to (0, 0, z).
        center = pts.reshape(h, w, 3)[h // 2, w // 2]
        np.testing.assert_allclose(center, [0.0, 0.0, 2.0], atol=1e-5)

    def test_invalid_depth_masked(self):
        depth = synthetic_plane_depth()
        depth[5, 7] = -np.inf
        K = np.array([[50.0, 0, 20], [0, 50.0, 16], [0, 0, 1]], np.float32)
        pts, nrm, vp, vn = normals.backproject_depth(
            jnp.asarray(depth), jnp.asarray(K), jnp.eye(4)
        )
        vp = np.asarray(vp).reshape(depth.shape)
        vn = np.asarray(vn).reshape(depth.shape)
        assert not vp[5, 7]
        # Neighbors using the bad pixel in their central difference die too.
        assert not vn[5, 6] and not vn[5, 8] and not vn[4, 7] and not vn[6, 7]

    def test_gradient_rejection(self):
        # A depth step larger than max_distance/2 invalidates the normal.
        depth = synthetic_plane_depth()
        depth[:, 20:] += 1.0
        K = np.array([[50.0, 0, 20], [0, 50.0, 16], [0, 0, 1]], np.float32)
        _, _, _, vn = normals.backproject_depth(
            jnp.asarray(depth), jnp.asarray(K), jnp.eye(4), max_distance=0.1
        )
        vn = np.asarray(vn).reshape(depth.shape)
        assert not vn[10, 19] and not vn[10, 20]
        assert vn[10, 10] and vn[10, 30]

    def test_borders_invalid(self):
        depth = synthetic_plane_depth()
        K = np.array([[50.0, 0, 20], [0, 50.0, 16], [0, 0, 1]], np.float32)
        _, _, _, vn = normals.backproject_depth(
            jnp.asarray(depth), jnp.asarray(K), jnp.eye(4)
        )
        vn = np.asarray(vn).reshape(depth.shape)
        assert not vn[0].any() and not vn[-1].any()
        assert not vn[:, 0].any() and not vn[:, -1].any()


class TestSmallestEigenvector:
    def test_matches_numpy_eigh(self):
        rng = np.random.default_rng(0)
        X = rng.standard_normal((50, 10, 3))
        covs = np.einsum("nki,nkj->nij", X, X) / 10
        v = np.asarray(normals.smallest_eigenvector_sym3(jnp.asarray(covs, jnp.float32)))
        for i in range(50):
            w_, V = np.linalg.eigh(covs[i])
            ref = V[:, 0]
            dot = abs(v[i] @ ref)
            assert dot > 0.999, (i, dot)


class TestKnnNormals:
    def test_plane_normals(self):
        rng = np.random.default_rng(1)
        pts = np.column_stack(
            [rng.uniform(-1, 1, 300), rng.uniform(-1, 1, 300), np.full(300, 2.0)]
        ).astype(np.float32)
        n = np.asarray(
            normals.estimate_normals_knn(
                jnp.asarray(pts), jnp.ones(300, bool), k=5
            )
        )
        # Plane z=2 normals: +-z, oriented toward viewpoint (origin) => -z.
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
        assert (n[:, 2] < 0).all()

    def test_invalid_rows_nan(self):
        pts = np.random.default_rng(2).standard_normal((64, 3)).astype(np.float32)
        valid = np.ones(64, bool)
        valid[3] = False
        n = np.asarray(
            normals.estimate_normals_knn(jnp.asarray(pts), jnp.asarray(valid), k=5)
        )
        assert np.isnan(n[3]).all()
        assert np.isfinite(n[valid]).all()


class TestFastKnnNormals:
    """estimate_normals_knn_fast: Morton-banded exact k-NN normals (the
    <1s ETH-scale replacement for the dense sweep, PointCloud.h:41-76)."""

    def test_matches_dense_path(self):
        rng = np.random.default_rng(7)
        xy = rng.uniform(-5, 5, (3000, 2)).astype(np.float32)
        z = (0.4 * np.sin(xy[:, 0]) * np.cos(xy[:, 1])).astype(np.float32)
        pts = np.column_stack([xy, z]).astype(np.float32)
        valid = np.ones(len(pts), bool)
        dense = np.asarray(
            normals.estimate_normals_knn(jnp.asarray(pts), jnp.asarray(valid), k=5)
        )
        fast = np.asarray(
            normals.estimate_normals_knn_fast(pts, valid, k=5)
        )
        # Same neighbor sets -> same normals up to fp; compare |dot| ~ 1.
        # Genuine f32 near-ties (k-th vs (k+1)-th neighbor distances within
        # ~1e-6, e.g. row 2121 of this fixture: 0.05356197 vs 0.05356246)
        # may flip between the two summation orders — allow a handful, but
        # hold every row to 0.999: before the duplicate-candidate fixes 12
        # rows had truly different neighbor sets and broke that floor.
        dots = np.abs(np.sum(dense * fast, axis=1))
        assert (dots > 0.999).all(), dots.min()
        assert (dots <= 0.9999).sum() <= 3, dots[dots <= 0.9999]

    def test_sentinel_rows_do_not_degrade_pruning(self):
        """A cloud whose sentinel count (invalid rows + tile pad) is below
        k used to give sentinels a ~1.2e13 'k-th distance' bound that
        marked every tile visited — silently degrading the fast path to a
        dense sweep. Sentinel bounds are now dropped; results must still
        match the dense path and stay correct for the invalid rows."""
        rng = np.random.default_rng(3)
        n = 12 * 256 - 1                      # pad = 1 < k
        xy = rng.uniform(-4, 4, (n, 2)).astype(np.float32)
        z = (0.3 * np.sin(xy[:, 0]) * np.cos(xy[:, 1])).astype(np.float32)
        pts = np.column_stack([xy, z]).astype(np.float32)
        valid = np.ones(n, bool)
        valid[[5, 1000]] = False              # 2 invalid => 3 sentinels < k
        dense = np.asarray(
            normals.estimate_normals_knn(
                jnp.asarray(pts), jnp.asarray(valid), k=5
            )
        )
        fast = np.asarray(normals.estimate_normals_knn_fast(pts, valid, k=5))
        assert np.isnan(fast[5]).all() and np.isnan(fast[1000]).all()
        ok = valid.copy()
        dots = np.abs(np.sum(dense[ok] * fast[ok], axis=1))
        assert (dots > 0.999).all(), dots.min()

    def test_band_ub_is_true_upper_bound(self):
        """_self_knn_band_ub must upper-bound every row's true k-th
        neighbor distance INCLUDING at the first/last Morton tiles, where
        edge-clamped (instead of wrap-around) candidate bands used to
        duplicate own-tile rows and under-estimate the bound."""
        from scipy.spatial import cKDTree

        from icp_variants_tpu.ops.knn import morton_codes_np

        rng = np.random.default_rng(7)
        xy = rng.uniform(-2, 2, (3000, 2)).astype(np.float32)
        z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        pts = np.column_stack([xy, z]).astype(np.float32)
        valid = np.ones(len(pts), bool)
        order = np.argsort(morton_codes_np(pts, valid), kind="stable")
        tile = 256
        pad = (-len(pts)) % tile
        sp = np.concatenate(
            [pts[order], np.full((pad, 3), 2.0e6, np.float32)]
        )
        ub = np.asarray(normals._self_knn_band_ub(jnp.asarray(sp), 5, tile))
        dref, _ = cKDTree(sp).query(sp[: len(pts)], k=5, workers=-1)
        assert (
            ub[: len(pts)] * (1 + 1e-6) >= dref[:, -1] ** 2 - 1e-9
        ).all()

    def test_exact_neighbors_vs_scipy(self):
        from scipy.spatial import cKDTree

        rng = np.random.default_rng(8)
        pts = rng.uniform(-3, 3, (2000, 3)).astype(np.float32)
        valid = np.ones(len(pts), bool)
        # Compare the k-th neighbor distance implied by the normals path:
        # run the internal machinery end to end by checking the fast
        # normals against dense-scipy-built covariance normals.
        tree = cKDTree(pts)
        _, idx = tree.query(pts, k=5, workers=-1)
        neigh = pts[idx]
        mean = neigh.mean(axis=1, keepdims=True)
        cov = np.einsum("nki,nkj->nij", neigh - mean, neigh - mean) / 5
        ref = np.linalg.eigh(cov)[1][:, :, 0]
        fast = np.asarray(normals.estimate_normals_knn_fast(pts, valid, k=5))
        dots = np.abs(np.sum(ref * fast, axis=1))
        assert (dots > 0.999).mean() > 0.995, dots.min()

    def test_invalid_rows_nan_and_not_neighbors(self):
        rng = np.random.default_rng(9)
        pts = rng.uniform(-2, 2, (1000, 3)).astype(np.float32)
        valid = np.ones(1000, bool)
        valid[::7] = False
        pts[::7] = np.nan  # non-finite invalid rows must not poison anything
        fast = np.asarray(normals.estimate_normals_knn_fast(pts, valid, k=5))
        assert np.isnan(fast[::7]).all()
        assert np.isfinite(fast[valid]).all()
