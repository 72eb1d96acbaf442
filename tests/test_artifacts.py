"""Artifact/io parity tests: PLY, binary clouds, bunny + room output files
(references: PointCloud.h:167-247, main.cpp:144-176, utils.h:179-193)."""

import os

import numpy as np
import pytest

from icp_variants_tpu.data import binary_io, ply_io


class TestPlyIO:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, tmp_path, binary):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((50, 3)).astype(np.float32)
        nrm = rng.standard_normal((50, 3)).astype(np.float32)
        inten = np.ones(50, np.float32)
        p = str(tmp_path / "c.ply")
        ply_io.write_ply(p, pts, normals=nrm, intensity=inten, binary=binary)
        out = ply_io.read_ply(p)
        np.testing.assert_allclose(out["points"], pts, rtol=1e-5)
        np.testing.assert_allclose(out["normals"], nrm, rtol=1e-5)
        np.testing.assert_allclose(out["intensity"], inten)

    def test_colors(self, tmp_path):
        pts = np.zeros((10, 3), np.float32)
        cols = np.arange(30, dtype=np.uint8).reshape(10, 3)
        p = str(tmp_path / "c.ply")
        ply_io.write_ply(p, pts, colors=cols)
        out = ply_io.read_ply(p)
        np.testing.assert_array_equal(out["colors"], cols)


class TestBinaryCloud:
    @pytest.mark.parametrize("double", [False, True])
    def test_roundtrip(self, tmp_path, double):
        rng = np.random.default_rng(1)
        pts = rng.standard_normal((30, 3)).astype(np.float32)
        nrm = rng.standard_normal((30, 3)).astype(np.float32)
        p = str(tmp_path / "c.bin")
        binary_io.write_binary_cloud(p, pts, nrm, double=double)
        p2, n2 = binary_io.read_binary_cloud(p)
        np.testing.assert_allclose(p2, pts, rtol=1e-6)
        np.testing.assert_allclose(n2, nrm, rtol=1e-6)


class TestBunnyArtifacts:
    def test_writes_reference_outputs(self, tmp_path):
        from icp_variants_tpu.pipeline.config import Metric, Minimizer
        from icp_variants_tpu.workloads import bunny

        cfg = bunny.default_config(minimizer=Minimizer.LINEAR, n_iterations=3)
        bunny.align_bunny(cfg, artifacts_dir=str(tmp_path))
        for name in (
            "bunny_source.ply", "bunny_target.ply", "bunny_final_source.ply",
            "RMSE.txt", "bunny_icp.off",
        ):
            assert os.path.getsize(tmp_path / name) > 0, name
        cloud = ply_io.read_ply(str(tmp_path / "bunny_final_source.ply"))
        assert cloud["points"].shape == (1054, 3)
        from icp_variants_tpu.data import off_io

        mesh = off_io.read_off(str(tmp_path / "bunny_icp.off"))
        assert len(mesh.vertices) > 2400  # both bunnies + 8 GT spheres


class TestRoomArtifacts:
    def test_mesh_dumps(self, tmp_path, monkeypatch):
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from test_workloads import H, W, make_wavy_tum_dataset

        from icp_variants_tpu.data import tum as tum_mod
        from icp_variants_tpu.pipeline.config import Metric, Minimizer
        from icp_variants_tpu.workloads import room

        data_dir = tmp_path / "tum"
        data_dir.mkdir()
        make_wavy_tum_dataset(str(data_dir))
        old_init = tum_mod.VirtualSensor.__init__

        def patched(self, dataset_dir, increment=1, width=640, height=480):
            old_init(self, dataset_dir, increment=increment, width=W, height=H)

        monkeypatch.setattr(tum_mod.VirtualSensor, "__init__", patched)
        out_dir = tmp_path / "out"
        cfg = room.default_config(
            metric=Metric.POINT_TO_PLANE, minimizer=Minimizer.LINEAR,
            n_iterations=3,
        )
        room.reconstruct_room(
            str(data_dir), cfg, frame_step=1, max_frames=1,
            artifacts_dir=str(out_dir),
        )
        assert os.path.getsize(out_dir / "mesh_0.off") > 0
        assert os.path.getsize(out_dir / "mesh_1.off") > 0
