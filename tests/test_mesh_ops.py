"""Tests for the host-side mesh operations (ml::MeshData parity:
merge, degenerate/isolated removal, plane clipping) and the data-source
selection layer."""

import numpy as np
import pytest

from tsdfjax import mesh as M


def _unit_quad():
    # two triangles covering [0,1]^2 in z=0
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return M.Mesh(v, f, colors=np.tile([10.0, 20.0, 30.0], (4, 1)))


class TestMeshOps:
    def test_merge(self):
        a = _unit_quad()
        b = _unit_quad().apply_transform(
            np.array([[1, 0, 0, 5], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
        )
        m = M.merge_meshes(a, b)
        assert m.num_vertices == 8 and m.num_faces == 4
        assert m.faces.max() == 7
        # b's faces index into b's shifted vertices (all x >= 5)
        assert np.allclose(m.vertices[m.faces[2:]][..., 0].min(), 5.0, atol=1e-6)
        assert m.vertices[4:, 0].min() == 5.0

    def test_remove_degenerate(self):
        a = _unit_quad()
        a.faces = np.concatenate([a.faces, [[1, 1, 2]]]).astype(np.int64)
        out = M.remove_degenerate_faces(a)
        assert out.num_faces == 2

    def test_remove_isolated(self):
        a = _unit_quad()
        a.faces = a.faces[:1]  # vertex 3 now isolated
        out = M.remove_isolated_vertices(a)
        assert out.num_vertices == 3
        assert out.num_faces == 1
        np.testing.assert_allclose(
            out.vertices[out.faces[0]], a.vertices[[0, 1, 2]]
        )
        assert out.colors.shape == (3, 3)

    def test_plane_signed_distance(self):
        p = M.Plane([0, 0, 1], 0.5)
        sd = p.signed_distance(np.array([[0, 0, 0.0], [0, 0, 1.0]]))
        np.testing.assert_allclose(sd, [-0.5, 0.5], atol=1e-6)
        p3 = M.Plane.from_points([0, 0, 0.5], [1, 0, 0.5], [0, 1, 0.5])
        np.testing.assert_allclose(p3.normal, [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(p3.dist, 0.5, atol=1e-6)

    def test_clip_keeps_half(self):
        a = _unit_quad()
        # clip at x = 0.5, keep x >= 0.5
        clipped = M.clip_mesh(a, M.Plane([1, 0, 0], 0.5), keep_positive=True)
        assert clipped.num_faces >= 2
        assert clipped.vertices[:, 0].min() >= 0.5 - 1e-6
        assert clipped.vertices[:, 0].max() <= 1.0 + 1e-6
        # total clipped area == half the quad
        v, f = clipped.vertices, clipped.faces
        area = 0.5 * np.linalg.norm(
            np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]]), axis=1
        ).sum()
        np.testing.assert_allclose(area, 0.5, atol=1e-5)
        # colors interpolate (all vertices share one color here)
        np.testing.assert_allclose(
            clipped.colors, np.tile(clipped.colors[0], (len(clipped.colors), 1)),
            atol=1e-4,
        )

    def test_clip_no_cross(self):
        a = _unit_quad()
        kept = M.clip_mesh(a, M.Plane([0, 0, 1], -1.0), keep_positive=True)
        assert kept.num_faces == 2
        gone = M.clip_mesh(a, M.Plane([0, 0, 1], 1.0), keep_positive=True)
        assert gone.num_faces == 0


class TestSources:
    def test_synthetic_source(self):
        from tsdfjax.config import AppConfig, SwitchConfig, VolumeConfig
        from tsdfjax.geometry import CameraIntrinsics
        from tsdfjax.io.sources import SyntheticSource, make_data_source

        cam = CameraIntrinsics(width=32, height=32, fx=32.0, fy=32.0, cx=15.5, cy=15.5)
        cfg = AppConfig(
            depth_camera=cam, rgb_camera=cam,
            volume=VolumeConfig(resolution=32, size_m=2.0),
            switches=SwitchConfig(use_color=True),
        )
        src = make_data_source(cfg, synthetic_frames=3)
        assert isinstance(src, SyntheticSource)
        frames = list(src)
        assert len(frames) == 3
        assert frames[0].depth_m.shape == (32, 32)
        assert frames[0].rgb.shape == (32, 32, 3)
        assert len(src.poses()) == 3

    def test_openni_source_gated(self):
        from tsdfjax.config import AppConfig
        from tsdfjax.io.sources import make_data_source

        try:
            import primesense  # noqa: F401

            pytest.skip("primesense installed; gate test not applicable")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="primesense"):
            make_data_source(AppConfig())

    def test_dataset_source(self, tmp_path):
        import os
        from PIL import Image
        from tsdfjax.config import AppConfig, SwitchConfig
        from tsdfjax.io.sources import make_data_source
        from tsdfjax.io.tum import TumDataset

        root = str(tmp_path)
        os.makedirs(os.path.join(root, "depth"))
        with open(os.path.join(root, "depth.txt"), "w") as f:
            f.write("# depth maps\n# file\n# timestamp filename\n")
            for i in range(2):
                d = np.full((480, 640), 5000, np.uint16)
                Image.fromarray(d).save(os.path.join(root, f"depth/{i}.png"))
                f.write(f"{i}.0 depth/{i}.png\n")
        cfg = AppConfig(switches=SwitchConfig(use_color=False, use_dataset_rgbd=True))
        src = make_data_source(cfg, dataset_dir=root)
        assert isinstance(src, TumDataset)
        fr = next(iter(src))
        assert fr.depth_m.shape == (480, 640)
        np.testing.assert_allclose(fr.depth_m, 1.0)


class TestVectorMapDump:
    def test_save_vector_map(self, tmp_path):
        from tsdfjax import viewer

        arr = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
        p = str(tmp_path / "map.txt")
        viewer.save_vector_map(arr, p)
        lines = open(p).read().strip().splitlines()
        assert lines[0].startswith("#")
        assert len(lines) == 1 + 6
        first = lines[1].split()
        assert first[:2] == ["0", "0"]
        np.testing.assert_allclose([float(x) for x in first[2:]], [0, 1, 2, 3])
