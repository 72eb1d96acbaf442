"""Projective correspondence search tests (reference:
NearestNeighborSearchProjective, NearestNeighbor.h:317-444)."""

import jax.numpy as jnp
import numpy as np

from icp_variants_tpu.ops import projective


def make_image_cloud(h=24, w=32, fx=40.0, fy=40.0):
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    depth = 2.0 + 0.01 * np.sin(uu * 0.5) * np.cos(vv * 0.3)
    pts = np.stack(
        [(uu - cx) / fx * depth, (vv - cy) / fy * depth, depth], axis=-1
    ).reshape(-1, 3).astype(np.float32)
    valid = np.ones(h * w, bool)
    return pts, valid, dict(fx=fx, fy=fy, cx=cx, cy=cy, width=w, height=h)


class TestProjectiveMatch:
    def test_self_match(self):
        pts, valid, cam = make_image_cloud()
        idx, d2, ok = projective.projective_match(
            jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(valid),
            **cam, max_distance=0.01,
        )
        idx, d2, ok = np.asarray(idx), np.asarray(d2), np.asarray(ok)
        assert ok.all()
        np.testing.assert_array_equal(idx, np.arange(len(pts)))
        np.testing.assert_allclose(d2, 0.0, atol=1e-10)

    def test_window_limits(self):
        # A query projecting far outside any valid window finds nothing.
        pts, valid, cam = make_image_cloud()
        far = jnp.asarray([[100.0, 100.0, 2.0]], jnp.float32)
        _, _, ok = projective.projective_match(
            far, jnp.asarray(pts), jnp.asarray(valid), **cam, max_distance=0.01,
        )
        assert not bool(ok[0])

    def test_invalid_targets_skipped(self):
        pts, valid, cam = make_image_cloud()
        valid2 = valid.copy()
        q_index = 13 * cam["width"] + 17
        valid2[q_index] = False  # knock out the exact-match pixel
        idx, d2, ok = projective.projective_match(
            jnp.asarray(pts[q_index : q_index + 1]), jnp.asarray(pts),
            jnp.asarray(valid2), **cam, max_distance=0.01,
        )
        assert bool(ok[0])
        assert int(idx[0]) != q_index  # picked a neighbor instead

    def test_threshold_squared(self):
        pts, valid, cam = make_image_cloud()
        q = jnp.asarray(pts[:1] + np.array([0.0, 0.0, 0.05], np.float32))
        # squared distance = 0.0025; threshold below -> reject, above -> accept.
        _, _, ok_lo = projective.projective_match(
            q, jnp.asarray(pts), jnp.asarray(valid), **cam, max_distance=0.002,
        )
        _, _, ok_hi = projective.projective_match(
            q, jnp.asarray(pts), jnp.asarray(valid), **cam, max_distance=0.003,
        )
        assert not bool(ok_lo[0]) and bool(ok_hi[0])

    def test_query_mask(self):
        pts, valid, cam = make_image_cloud()
        mask = jnp.zeros((len(pts),), bool)
        _, _, ok = projective.projective_match(
            jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(valid),
            **cam, max_distance=0.01, query_mask=mask,
        )
        assert not bool(jnp.any(ok))


class TestResidentProjective:
    def test_resident_matches_xla_window_scan(self):
        """projective_match_resident (interpret mode) must reproduce the
        XLA window scan: same candidate set, same distances; indices may
        differ only on exact f32 ties."""
        import numpy as np
        import jax.numpy as jnp

        from icp_variants_tpu.ops import projective

        W, H = 96, 64
        fx = fy = 80.0
        cx, cy = (W - 1) / 2, (H - 1) / 2
        rng = np.random.default_rng(5)
        vv, uu = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        z = 2.0 + 0.1 * np.sin(uu / 7.0) * np.cos(vv / 5.0)
        x = (uu - cx) / fx * z
        y = (vv - cy) / fy * z
        tgt = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
        tvalid = rng.random(W * H) > 0.1
        q = tgt[rng.integers(0, W * H, 700)] + rng.normal(
            0, 0.01, (700, 3)).astype(np.float32)
        q = q.astype(np.float32)
        qmask = rng.random(700) > 0.1
        kw = dict(fx=fx, fy=fy, cx=cx, cy=cy, width=W, height=H,
                  window=12, max_distance=0.1)
        i_x, d2_x, v_x = projective.projective_match(
            jnp.asarray(q), jnp.asarray(tgt), jnp.asarray(tvalid),
            query_mask=jnp.asarray(qmask), **kw)
        assert projective._resident_fits_projective(W, H, projective.BLOCK)
        i_r, d2_r, v_r = projective.projective_match_resident(
            jnp.asarray(q), jnp.asarray(tgt), jnp.asarray(tvalid),
            query_mask=jnp.asarray(qmask), interpret=True, **kw)
        i_x, d2_x, v_x = map(np.asarray, (i_x, d2_x, v_x))
        i_r, d2_r, v_r = map(np.asarray, (i_r, d2_r, v_r))
        np.testing.assert_array_equal(v_r, v_x)
        w = v_x
        assert w.mean() > 0.5
        np.testing.assert_allclose(d2_r[w], d2_x[w], rtol=1e-6, atol=1e-7)
        agree = (i_r[w] == i_x[w])
        assert agree.mean() > 0.99, agree.mean()
