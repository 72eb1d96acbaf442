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
