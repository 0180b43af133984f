import jax.numpy as jnp
import numpy as np

from tsdfjax import frames
from tsdfjax.geometry import CameraIntrinsics

CAM = CameraIntrinsics(width=32, height=24, fx=30.0, fy=30.0, cx=15.5, cy=11.5)


class TestTruncate:
    def test_band(self):
        d = jnp.array([[0.0, 0.1, 0.3, 0.31, 2.0, 3.99, 4.0, 5.0]])
        out = frames.truncate_depth(d, 0.3, 4.0)
        np.testing.assert_allclose(out[0], [0, 0, 0, 0.31, 2.0, 3.99, 0, 0])


class TestBilateral:
    def test_constant_image_unchanged(self):
        d = jnp.full((24, 32), 1.5, jnp.float32)
        out = frames.bilateral_filter(d, 2.0, 0.02)
        np.testing.assert_allclose(out, d, atol=1e-6)

    def test_zero_stays_zero(self):
        d = jnp.full((24, 32), 1.5, jnp.float32).at[5, 5].set(0.0)
        out = frames.bilateral_filter(d, 2.0, 0.02)
        assert out[5, 5] == 0.0

    def test_outlier_bailout_keeps_raw(self):
        # a neighbor deviating > 5*sigma from the center must make the
        # center keep its raw value (DataPreprocesser.cu:66-69)
        d = jnp.full((24, 32), 1.0, jnp.float32).at[10, 10].set(2.0)
        out = frames.bilateral_filter(d, 2.0, 0.02)
        # every pixel within the radius-4 window of (10,10) bails out
        assert out[10, 11] == 1.0
        assert out[10, 10] == 2.0
        # far away pixels are smoothed normally (constant -> unchanged)
        np.testing.assert_allclose(out[20, 25], 1.0, atol=1e-6)

    def test_smooths_small_noise(self):
        rng = np.random.default_rng(1)
        base = np.full((24, 32), 1.0, np.float32)
        noise = rng.normal(0, 0.005, base.shape).astype(np.float32)
        d = jnp.array(base + noise)
        out = frames.bilateral_filter(d, 2.0, 0.02)
        inner = np.s_[6:-6, 6:-6]
        assert np.std(np.asarray(out)[inner]) < np.std(np.asarray(d)[inner]) * 0.7


class TestVertices:
    def test_unproject_validity(self):
        d = jnp.full((24, 32), 2.0, jnp.float32).at[3, 4].set(0.0)
        v = frames.depth_to_vertices(d, CAM)
        assert v.shape == (24, 32, 3)
        np.testing.assert_allclose(v[3, 4], 0.0)
        np.testing.assert_allclose(v[11, 15], [2.0 * (15 - 15.5) / 30.0, 2.0 * (11 - 11.5) / 30.0, 2.0], atol=1e-6)

    def test_normals_of_fronto_plane(self):
        # plane z = const -> normal (0, 0, -1) with the reference's
        # cross(v_up - v_down, v_right - v_left) convention
        d = jnp.full((24, 32), 2.0, jnp.float32)
        v = frames.depth_to_vertices(d, CAM)
        n = frames.vertices_to_normals(v)
        np.testing.assert_allclose(n[12, 16], [0, 0, -1], atol=1e-5)
        # borders invalid
        np.testing.assert_allclose(n[0, 5], 0.0)
        np.testing.assert_allclose(n[5, 0], 0.0)

    def test_normals_invalid_neighbor(self):
        d = jnp.full((24, 32), 2.0, jnp.float32).at[10, 10].set(0.0)
        v = frames.depth_to_vertices(d, CAM)
        n = frames.vertices_to_normals(v)
        for (r, c) in [(10, 10), (10, 9), (10, 11), (9, 10), (11, 10)]:
            np.testing.assert_allclose(n[r, c], 0.0)
        np.testing.assert_allclose(n[12, 16], [0, 0, -1], atol=1e-5)


class TestDownsample:
    def test_vertices_mean_and_validity(self):
        v = jnp.zeros((4, 4, 3), jnp.float32)
        v = v.at[0:2, 0:2].set(jnp.array([1.0, 2.0, 3.0]))
        v = v.at[0, 2].set(jnp.array([1.0, 1.0, 1.0]))  # block (0,1) partially valid
        out = frames.downsample_vertices(v)
        assert out.shape == (2, 2, 3)
        np.testing.assert_allclose(out[0, 0], [1, 2, 3])
        np.testing.assert_allclose(out[0, 1], 0.0)  # any-invalid -> invalid

    def test_normals_renormalized(self):
        n = jnp.zeros((2, 2, 3), jnp.float32)
        n = n.at[:, :].set(jnp.array([0.6, 0.8, 0.0]))
        n = n.at[0, 0].set(jnp.array([1.0, 0.0, 0.0]))
        out = frames.downsample_normals(n)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out[0, 0])), 1.0, atol=1e-6)


class TestPreprocessChain:
    def test_shapes_and_jit(self):
        d = jnp.full((24, 32), 1.0, jnp.float32)
        trunced, filtered, v, n = frames.preprocess_depth(d, CAM, 0.3, 4.0, 2.0, 0.02)
        assert trunced.shape == (24, 32)
        assert v.shape == (24, 32, 3)
        assert n.shape == (24, 32, 3)
