"""Native IO runtime tests (native/icpio.cpp via ctypes)."""

import numpy as np
import pytest

from icp_variants_tpu.runtime import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native icpio library not built (no compiler?)")


class TestParseFloats:
    def test_basic(self, tmp_path):
        p = str(tmp_path / "f.txt")
        with open(p, "w") as f:
            f.write("1.5 2.5\n-3 4e2\n")
        out = native.parse_floats(p, 0, 10)
        np.testing.assert_allclose(out, [1.5, 2.5, -3.0, 400.0])

    def test_offset(self, tmp_path):
        p = str(tmp_path / "f.txt")
        with open(p, "w") as f:
            f.write("HEADER\n1 2 3\n")
        out = native.parse_floats(p, 7, 10)
        np.testing.assert_allclose(out, [1, 2, 3])

    def test_f32(self, tmp_path):
        p = str(tmp_path / "f.txt")
        with open(p, "w") as f:
            f.write("0.25 0.5 0.75\n")
        out = native.parse_floats(p, 0, 3, dtype=np.float32)
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, [0.25, 0.5, 0.75])

    def test_max_count_limit(self, tmp_path):
        p = str(tmp_path / "f.txt")
        with open(p, "w") as f:
            f.write(" ".join(str(i) for i in range(100)))
        out = native.parse_floats(p, 0, 10)
        np.testing.assert_allclose(out, np.arange(10))

    def test_matches_numpy_on_off_file(self):
        """The bunny file parses identically via native and numpy paths."""
        import os

        from icp_variants_tpu.data import off_io
        from icp_variants_tpu.data.loaders import ASSET_ROOT

        path = os.path.join(ASSET_ROOT, "bunny", "bunny_part1.off")
        m = off_io.read_off(path)  # native path (library is available)
        body = open(path).read().splitlines()
        n_vertices = int(body[1].split()[0])
        ref = np.loadtxt(
            "\n".join(body[2 : 2 + n_vertices]).splitlines(), dtype=np.float64
        )
        np.testing.assert_allclose(m.vertices, ref[:, :3].astype(np.float32))


class TestBatchParse:
    def test_batch_matches_single(self, tmp_path):
        rng = np.random.default_rng(0)
        specs = []
        singles = []
        for i in range(7):
            p = str(tmp_path / f"b{i}.txt")
            vals = rng.normal(0, 10, 50 + 13 * i).astype(np.float32)
            with open(p, "w") as f:
                f.write(" ".join(f"{v:.6g}" for v in vals))
            specs.append((p, 0, len(vals)))
            singles.append(native.parse_floats(p, 0, len(vals), dtype=np.float32))
        outs = native.parse_floats_f32_batch(specs, n_threads=3)
        assert outs is not None
        for got, ref in zip(outs, singles):
            np.testing.assert_array_equal(got, ref)

    def test_batch_offsets_and_limits(self, tmp_path):
        p1 = str(tmp_path / "h.txt")
        with open(p1, "w") as f:
            f.write("HEADER\n1 2 3 4 5\n")
        p2 = str(tmp_path / "l.txt")
        with open(p2, "w") as f:
            f.write(" ".join(str(i) for i in range(100)))
        outs = native.parse_floats_f32_batch([(p1, 7, 10), (p2, 0, 4)])
        np.testing.assert_allclose(outs[0], [1, 2, 3, 4, 5])
        np.testing.assert_allclose(outs[1], [0, 1, 2, 3])

    def test_batch_missing_file_raises(self, tmp_path):
        p = str(tmp_path / "ok.txt")
        with open(p, "w") as f:
            f.write("1 2")
        import pytest as _pytest
        with _pytest.raises(IOError):
            native.parse_floats_f32_batch(
                [(p, 0, 2), (str(tmp_path / "missing.txt"), 0, 2)]
            )

    def test_empty_batch(self):
        assert native.parse_floats_f32_batch([]) == []


class TestPcdBatch:
    def test_read_pcd_batch_matches_single(self, tmp_path):
        from icp_variants_tpu.data import pcd_io

        rng = np.random.default_rng(1)
        paths = []
        for i in range(4):
            p = str(tmp_path / f"c{i}.pcd")
            pts = rng.normal(0, 5, (200 + i * 37, 3)).astype(np.float32)
            pcd_io.write_pcd(p, pts, binary=(i % 2 == 0))
            paths.append(p)
        batch = pcd_io.read_pcd_batch(paths)
        for p, got in zip(paths, batch):
            np.testing.assert_array_equal(got, pcd_io.read_pcd(p))


class TestPrefetcher:
    def test_order_and_values(self):
        from icp_variants_tpu.runtime.prefetch import Prefetcher

        out = list(Prefetcher(range(10), lambda i: i * i, depth=2))
        assert out == [i * i for i in range(10)]

    def test_exhausted_iterator_raises_again(self):
        """next() after exhaustion must raise StopIteration every time —
        the sentinel used to be consumed once, deadlocking a second poll."""
        from icp_variants_tpu.runtime.prefetch import Prefetcher

        pf = Prefetcher(range(2), lambda i: i, depth=1)
        assert list(pf) == [0, 1]
        import pytest as _pytest
        with _pytest.raises(StopIteration):
            next(pf)
        with _pytest.raises(StopIteration):
            next(pf)

    def test_exception_propagates_in_order(self):
        from icp_variants_tpu.runtime.prefetch import Prefetcher

        def fn(i):
            if i == 2:
                raise ValueError("boom")
            return i

        pf = Prefetcher(range(4), fn, depth=1)
        assert next(pf) == 0
        assert next(pf) == 1
        import pytest as _pytest
        with _pytest.raises(ValueError):
            next(pf)
        assert next(pf) == 3

    def test_overlap_actually_happens(self):
        import time

        from icp_variants_tpu.runtime.prefetch import Prefetcher

        def slow(i):
            time.sleep(0.05)
            return i

        pf = Prefetcher(range(4), slow, depth=1)
        t0 = time.perf_counter()
        for x in pf:
            time.sleep(0.05)  # "device work"
        wall = time.perf_counter() - t0
        # Serial would be ~0.4 s; overlapped ~0.25 s.
        assert wall < 0.35


def test_native_kd_partition_matches_numpy_semantics():
    """icpio_kd_partition must produce a valid widest-axis median
    partition: a true permutation, exact floor/ceil half counts in tree
    order, and disjoint sibling extents along each split axis."""
    import numpy as np

    from icp_variants_tpu.ops import kdtree
    from icp_variants_tpu.runtime import native

    if not native.available() or native.kd_partition(
        np.zeros((4, 3), np.float32), 1
    ) is None:
        import pytest

        pytest.skip("native kd partition unavailable")
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 5, (10007, 3)).astype(np.float32)
    depth = 5
    perm, blocks = native.kd_partition(pts, depth)
    perm_np, blocks_np = kdtree.kd_partition_np(pts, depth)
    assert sorted(perm.tolist()) == list(range(len(pts)))
    # Same (start, count) structure as the numpy reference (counts depend
    # only on n and the split rule, not on tie order).
    assert [tuple(b) for b in blocks] == [tuple(b) for b in blocks_np]
    # Blocks' boxes must be pairwise disjoint up to boundary planes.
    lo = np.array([pts[perm[s:s + c]].min(0) for s, c in blocks])
    hi = np.array([pts[perm[s:s + c]].max(0) for s, c in blocks])
    inter = 0.0
    vol = np.prod(np.maximum(hi - lo, 0), axis=1).sum()
    for i in range(len(lo)):
        l = np.maximum(lo[i], lo[i + 1:])
        h = np.minimum(hi[i], hi[i + 1:])
        inter += np.prod(np.maximum(h - l, 0), axis=1).sum()
    assert inter < 1e-3 * vol
