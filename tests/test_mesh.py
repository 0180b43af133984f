"""Marching cubes + mesh post + IO tests on analytic SDFs (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tsdfjax import mesh as M
from tsdfjax.config import VolumeConfig
from tsdfjax.volume import TsdfVolume

VCFG = VolumeConfig(resolution=48, size_m=2.0, max_weight=128.0)


def sphere_volume(center=(1.0, 1.0, 1.0), radius=0.5, trunc=0.1, cfg=VCFG):
    r = cfg.resolution
    ii = np.arange(r)
    gx, gy, gz = np.meshgrid(ii, ii, ii, indexing="ij")
    cell = cfg.voxel_size_m
    px = (gx + 0.5) * cell
    py = (gy + 0.5) * cell
    pz = (gz + 0.5) * cell
    d = np.sqrt(
        (px - center[0]) ** 2 + (py - center[1]) ** 2 + (pz - center[2]) ** 2
    ) - radius
    tsdf = np.clip(d / trunc, -1, 1).astype(np.float32)
    return TsdfVolume(
        tsdf=jnp.array(tsdf),
        weight=jnp.ones((r, r, r), jnp.float32),
        color=jnp.full((r, r, r, 3), 128.0, jnp.float32),
    )


class TestMarchingCubes:
    def test_sphere_surface_accuracy(self):
        vol = sphere_volume()
        mesh = M.extract_mesh(vol, VCFG, max_triangles=100_000)
        assert mesh.num_faces > 500
        d = np.linalg.norm(mesh.vertices - np.array([1.0, 1.0, 1.0]), axis=1)
        err = np.abs(d - 0.5)
        assert np.median(err) < VCFG.voxel_size_m * 0.2
        assert err.max() < VCFG.voxel_size_m

    def test_sphere_watertight(self):
        vol = sphere_volume()
        mesh = M.extract_mesh(vol, VCFG, max_triangles=100_000)
        f = mesh.faces
        edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        # closed 2-manifold: every edge shared by exactly 2 faces
        assert (counts == 2).all(), np.bincount(counts)
        v, e, fc = mesh.num_vertices, len(np.unique(edges, axis=0)), mesh.num_faces
        assert v - e + fc == 2  # Euler characteristic of a sphere

    def test_normals_point_outward(self):
        vol = sphere_volume()
        mesh = M.extract_mesh(vol, VCFG, max_triangles=100_000)
        # face winding: triangle normal should align with radial direction
        v = mesh.vertices
        f = mesh.faces
        fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        centroid = v[f].mean(axis=1) - np.array([1.0, 1.0, 1.0])
        dots = (fn * centroid).sum(axis=1)
        assert (dots > 0).mean() > 0.99
        # vertex normals too
        vn_dots = (mesh.normals * (v - np.array([1.0, 1.0, 1.0]))).sum(axis=1)
        assert (vn_dots > 0).mean() > 0.99

    def test_unobserved_cells_skipped(self):
        vol = sphere_volume()
        vol = vol._replace(weight=jnp.zeros_like(vol.weight))
        buffers = M.marching_cubes(vol, VCFG, max_triangles=1000)
        assert int(buffers.count) == 0

    def test_overflow_capped(self):
        vol = sphere_volume()
        buffers = M.marching_cubes(vol, VCFG, max_triangles=100)
        assert int(buffers.count) == 100
        assert int(buffers.overflow) > 0

    def test_color_interpolated(self):
        vol = sphere_volume()
        buffers = M.marching_cubes(vol, VCFG, max_triangles=100_000, with_color=True)
        n = int(buffers.count)
        cols = np.asarray(buffers.colors[:n])
        np.testing.assert_allclose(cols, 128.0, atol=1e-3)


class TestMeshOps:
    def test_weld_merges_shared_vertices(self):
        vol = sphere_volume()
        buffers = M.marching_cubes(vol, VCFG, max_triangles=100_000)
        n = int(buffers.count)
        soup = np.asarray(buffers.vertices[:n]).reshape(-1, 3)
        mesh = M.mesh_from_buffers(buffers)
        # welding must reduce vertex count by ~6x (each vertex shared)
        assert mesh.num_vertices < len(soup) / 3

    def test_device_weld_matches_host_weld(self):
        vol = sphere_volume()
        buffers = M.marching_cubes(vol, VCFG, max_triangles=100_000, with_color=True)
        host = M.mesh_from_buffers(buffers)
        dev = M.mesh_from_buffers_device(buffers)
        assert dev.num_vertices == host.num_vertices
        assert dev.num_faces == host.num_faces
        # same quantized vertex set (ordering differs: sorted vs first-seen)
        qh = np.sort(np.round(host.vertices / 1e-4).astype(np.int64).view("i8,i8,i8"), axis=0)
        qd = np.sort(np.round(dev.vertices / 1e-4).astype(np.int64).view("i8,i8,i8"), axis=0)
        assert np.array_equal(qh, qd)
        # same face set when faces are mapped through quantized keys
        def face_keys(m):
            q = np.round(m.vertices / 1e-4).astype(np.int64)
            packed = (q[:, 0] << 42) ^ (q[:, 1] << 21) ^ q[:, 2]
            fk = np.sort(packed[m.faces], axis=1)
            return set(map(tuple, fk))
        assert face_keys(host) == face_keys(dev)
        # colors ride along with their vertices
        assert dev.colors is not None and len(dev.colors) == dev.num_vertices

    def test_device_weld_empty(self):
        vol = sphere_volume()
        buffers = M.marching_cubes(vol, VCFG, max_triangles=100_000)
        empty = buffers._replace(count=jnp.zeros((), jnp.int32))
        mesh = M.mesh_from_buffers_device(empty)
        assert mesh.num_vertices == 0 and mesh.num_faces == 0

    def test_apply_transform(self):
        m = M.Mesh(np.eye(3, dtype=np.float32), np.array([[0, 1, 2]]))
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = [1, 2, 3]
        m2 = m.apply_transform(t)
        np.testing.assert_allclose(m2.vertices[0], [2, 2, 3])


class TestMeshIO:
    @pytest.fixture
    def mesh(self):
        vol = sphere_volume(cfg=VolumeConfig(resolution=24, size_m=2.0, max_weight=1.0))
        m = M.extract_mesh(
            vol, VolumeConfig(resolution=24, size_m=2.0, max_weight=1.0),
            max_triangles=20_000, with_color=True,
        )
        return m

    def test_big_endian_ply_load(self, mesh, tmp_path):
        """binary_big_endian PLY input (MeshIO.cpp/plyHeader.h parse any
        header-declared layout; we support both endiannesses)."""
        path = str(tmp_path / "be.ply")
        n_v, n_f = mesh.num_vertices, mesh.num_faces
        with open(path, "wb") as f:
            hdr = ["ply", "format binary_big_endian 1.0",
                   f"element vertex {n_v}",
                   "property float x", "property float y", "property float z",
                   "property uchar red", "property uchar green",
                   "property uchar blue",
                   f"element face {n_f}",
                   "property list uchar int vertex_indices", "end_header"]
            f.write(("\n".join(hdr) + "\n").encode())
            vrec = np.empty(
                n_v, dtype=[("x", ">f4"), ("y", ">f4"), ("z", ">f4"),
                            ("red", "u1"), ("green", "u1"), ("blue", "u1")]
            )
            for k, name in enumerate("xyz"):
                vrec[name] = mesh.vertices[:, k]
            for k, name in enumerate(("red", "green", "blue")):
                vrec[name] = np.clip(mesh.colors[:, k], 0, 255).astype(np.uint8)
            f.write(vrec.tobytes())
            frec = np.empty(n_f, dtype=[("n", "u1"), ("idx", ">i4", 3)])
            frec["n"] = 3
            frec["idx"] = mesh.faces
            f.write(frec.tobytes())
        back = M.load_mesh(path)
        assert back.num_vertices == n_v and back.num_faces == n_f
        np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-6)
        np.testing.assert_array_equal(back.faces, mesh.faces)
        np.testing.assert_allclose(back.colors, mesh.colors, atol=1.0)

    def test_exotic_ply_format_rejected_with_message(self, tmp_path):
        path = str(tmp_path / "bad.ply")
        with open(path, "wb") as f:
            f.write(b"ply\nformat binary_vax 1.0\nelement vertex 0\n"
                    b"element face 0\nend_header\n")
        with pytest.raises(ValueError, match="binary_big_endian"):
            M.load_mesh(path)

    @pytest.mark.parametrize("ext", ["obj", "ply", "off"])
    def test_roundtrip(self, mesh, tmp_path, ext):
        path = str(tmp_path / f"m.{ext}")
        M.save_mesh(mesh, path)
        back = M.load_mesh(path)
        assert back.num_vertices == mesh.num_vertices
        assert back.num_faces == mesh.num_faces
        np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-4)
        np.testing.assert_array_equal(back.faces, mesh.faces)
        if ext == "ply":
            np.testing.assert_allclose(back.colors, mesh.colors, atol=1.0)


class TestNativeMeshOps:
    def test_native_matches_numpy(self):
        """Native C++ weld/normals must agree with the NumPy fallback."""
        import tsdfjax.native as native
        from tsdfjax import mesh as MM

        if native.get_lib() is None:
            pytest.skip("no native toolchain")
        vol = sphere_volume()
        buffers = MM.marching_cubes(vol, VCFG, max_triangles=100_000)
        n = int(buffers.count)
        soup = np.asarray(buffers.vertices[:n]).reshape(-1, 3)
        m_nat = MM.weld_mesh(soup, None, 1e-4)
        # force fallback
        lib, tried = native._LIB, native._TRIED
        try:
            native._LIB, native._TRIED = None, True
            m_np = MM.weld_mesh(soup, None, 1e-4)
        finally:
            native._LIB, native._TRIED = lib, tried
        assert m_nat.num_vertices == m_np.num_vertices
        assert m_nat.num_faces == m_np.num_faces
        # normals parity
        MM.compute_vertex_normals(m_nat)
        nat_normals = m_nat.normals.copy()
        try:
            native._LIB, native._TRIED = None, True
            MM.compute_vertex_normals(m_nat)
        finally:
            native._LIB, native._TRIED = lib, tried
        # same vertex order is not guaranteed between weld impls, but we
        # computed both on the SAME mesh here
        np.testing.assert_allclose(nat_normals, m_nat.normals, atol=1e-4)

    def test_exact_weld_merges_across_cell_boundary(self):
        """mergeCloseVertices approx=false parity (meshData.cpp:239-262):
        a vertex pair within eps that STRADDLES a quantization-cell
        boundary merges in exact mode but not in approx mode; native and
        NumPy-fallback exact welds agree."""
        import tsdfjax.native as native
        from tsdfjax import mesh as MM

        eps = 1e-3
        # two triangles sharing an edge, but the shared corners are
        # perturbed by 0.6*eps across a cell boundary (cells quantize by
        # round(p/eps): 0.0005+delta and 0.0005-delta round apart)
        a0 = np.array([0.0005 + 0.0001, 0.0, 0.0])
        a1 = np.array([0.0005 - 0.0001, 0.0, 0.0])
        b0 = np.array([0.0005 + 0.0001, 1.0, 0.0])
        b1 = np.array([0.0005 - 0.0001, 1.0, 0.0])
        c = np.array([1.0, 0.5, 0.0])
        d = np.array([-1.0, 0.5, 0.0])
        soup = np.stack([a0, b0, c, a1, b1, d]).astype(np.float32)
        m_approx = MM.weld_mesh(soup, None, eps, mode="approx")
        m_exact = MM.weld_mesh(soup, None, eps, mode="exact")
        assert m_approx.num_vertices == 6  # straddling pairs NOT merged
        assert m_exact.num_vertices == 4  # a0/a1 and b0/b1 merged
        assert m_exact.num_faces == 2
        # exact mode keeps the FIRST occurrence as representative
        np.testing.assert_allclose(m_exact.vertices[0], a0, atol=1e-7)
        if native.get_lib() is not None:
            lib, tried = native._LIB, native._TRIED
            try:
                native._LIB, native._TRIED = None, True
                m_py = MM.weld_mesh(soup, None, eps, mode="exact")
            finally:
                native._LIB, native._TRIED = lib, tried
            assert m_py.num_vertices == m_exact.num_vertices
            assert m_py.num_faces == m_exact.num_faces
            np.testing.assert_allclose(
                np.sort(m_py.vertices, axis=0),
                np.sort(m_exact.vertices, axis=0), atol=1e-7,
            )

    def test_native_obj_roundtrip(self, tmp_path):
        import tsdfjax.native as native
        from tsdfjax import mesh as MM

        if native.get_lib() is None:
            pytest.skip("no native toolchain")
        vol = sphere_volume()
        m = MM.extract_mesh(vol, VCFG, max_triangles=50_000, with_color=True)
        path = str(tmp_path / "nat.obj")
        MM.save_mesh(m, path)  # uses the native writer
        back = MM.load_mesh(path)
        assert back.num_vertices == m.num_vertices
        assert back.num_faces == m.num_faces
        np.testing.assert_allclose(back.vertices, m.vertices, atol=1e-4)


class TestAsciiPly:
    def test_load_ascii_ply(self, tmp_path):
        """MeshIO.cpp parses ascii PLY too (MeshIO.cpp:7-660); property
        order is taken from the header, not assumed."""
        path = tmp_path / "a.ply"
        path.write_text(
            "ply\n"
            "format ascii 1.0\n"
            "comment made by hand\n"
            "element vertex 4\n"
            "property float x\n"
            "property float y\n"
            "property float z\n"
            "property uchar red\n"
            "property uchar green\n"
            "property uchar blue\n"
            "element face 2\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
            "0 0 0 255 0 0\n"
            "1 0 0 0 255 0\n"
            "1 1 0 0 0 255\n"
            "0 1 0 128 128 128\n"
            "3 0 1 2\n"
            "3 0 2 3\n"
        )
        m = M.load_mesh(str(path))
        assert m.num_vertices == 4 and m.num_faces == 2
        np.testing.assert_allclose(m.vertices[2], [1, 1, 0])
        np.testing.assert_allclose(m.colors[0], [255, 0, 0])
        np.testing.assert_array_equal(m.faces[1], [0, 2, 3])

    def test_binary_with_normals_first(self, tmp_path):
        """Binary PLY with a non-x/y/z-leading property layout."""
        path = tmp_path / "b.ply"
        hdr = (
            "ply\nformat binary_little_endian 1.0\n"
            "element vertex 3\n"
            "property float nx\nproperty float ny\nproperty float nz\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        v = np.array(
            [[0, 0, 1, 0, 0, 0], [0, 0, 1, 1, 0, 0], [0, 0, 1, 0, 1, 0]],
            "<f4",
        )
        face = np.empty(1, dtype=[("n", "u1"), ("idx", "<i4", 3)])
        face["n"] = 3
        face["idx"] = [[0, 1, 2]]
        with open(path, "wb") as f:
            f.write(hdr.encode())
            f.write(v.tobytes())
            f.write(face.tobytes())
        m = M.load_mesh(str(path))
        np.testing.assert_allclose(m.vertices[1], [1, 0, 0])
        np.testing.assert_allclose(m.normals[0], [0, 0, 1])
