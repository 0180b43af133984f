import jax.numpy as jnp
import numpy as np
import pytest

from tsdfjax import geometry as geo


CAM = geo.CameraIntrinsics(width=640, height=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5)


class TestCamera:
    def test_unproject_project_roundtrip(self, rng):
        u = jnp.array(rng.uniform(0, 639, 100), jnp.float32)
        v = jnp.array(rng.uniform(0, 479, 100), jnp.float32)
        d = jnp.array(rng.uniform(0.3, 4.0, 100), jnp.float32)
        p = geo.unproject(u, v, d, CAM)
        uu, vv = geo.project_float(p, CAM)
        np.testing.assert_allclose(uu, u, atol=1e-3)
        np.testing.assert_allclose(vv, v, atol=1e-3)
        np.testing.assert_allclose(p[..., 2], d)

    def test_project_nearest_rounds_half_up(self):
        # pixel coords x.5 -> x+1 like the reference's (int)(x+0.5)
        p = geo.unproject(jnp.array(10.49), jnp.array(10.51), jnp.array(1.0), CAM)
        ui, vi = geo.project_nearest(p, CAM)
        assert int(ui) == 10 and int(vi) == 11

    def test_pyramid_halving(self):
        c1 = CAM.half()
        assert c1.width == 320 and c1.height == 240
        assert c1.fx == pytest.approx(262.5)
        assert c1.cx == pytest.approx(159.75)


class TestSE3:
    def test_inverse(self, rng):
        t = geo.exp_se3(jnp.array(rng.normal(0, 0.3, 6), jnp.float32))
        ti = geo.se3_inverse(t)
        np.testing.assert_allclose(t @ ti, np.eye(4), atol=1e-5)

    def test_exp_zero_is_identity(self):
        np.testing.assert_allclose(geo.exp_se3(jnp.zeros(6)), np.eye(4), atol=1e-7)

    def test_exp_small_angle_guards(self):
        # below the sinc cutoff the rotation must stay finite and ~identity
        t = geo.exp_se3(jnp.array([1e-10, 0, 0, 0.1, 0.2, 0.3], jnp.float32))
        assert np.all(np.isfinite(t))
        np.testing.assert_allclose(t[:3, :3], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(t[:3, 3], [0.1, 0.2, 0.3], atol=1e-6)

    def test_exp_pure_rotation_angle(self):
        angle = 0.3
        t = geo.exp_se3(jnp.array([0, 0, angle, 0, 0, 0], jnp.float32))
        assert float(geo.rotation_angle(t[:3, :3])) == pytest.approx(angle, abs=1e-5)

    def test_exp_translation_coupling(self):
        # 90 deg about z with unit x velocity: the ViSP/SE(3) exp map gives
        # t = V @ v with V the left Jacobian -> known closed form
        th = np.pi / 2
        t = geo.exp_se3(jnp.array([0, 0, th, 1, 0, 0], jnp.float32))
        # V = [[sin th/th, -(1-cos th)/th, 0], [(1-cos th)/th, sin th/th, 0], [0,0,1]]
        expected = np.array([np.sin(th) / th, (1 - np.cos(th)) / th, 0.0])
        np.testing.assert_allclose(t[:3, 3], expected, atol=1e-5)

    def test_euler_xyz_order(self):
        # must equal Rx @ Ry @ Rz (CameraPoseFinderICP.cpp:97-99)
        a = jnp.array([0.1, -0.2, 0.3], jnp.float32)
        r = geo.euler_xyz_to_rotation(a)
        rx = geo.axis_angle_to_rotation(jnp.array([0.1, 0, 0], jnp.float32))
        ry = geo.axis_angle_to_rotation(jnp.array([0, -0.2, 0], jnp.float32))
        rz = geo.axis_angle_to_rotation(jnp.array([0, 0, 0.3], jnp.float32))
        np.testing.assert_allclose(r, rx @ ry @ rz, atol=1e-5)

    def test_transform_points(self, rng):
        t = geo.exp_se3(jnp.array(rng.normal(0, 0.5, 6), jnp.float32))
        p = jnp.array(rng.normal(0, 1, (17, 3)), jnp.float32)
        got = geo.transform_points(t, p)
        want = (np.asarray(t[:3, :3]) @ np.asarray(p).T).T + np.asarray(t[:3, 3])
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestQuaternion:
    @pytest.mark.parametrize("seed", range(5))
    def test_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        q = rng.normal(0, 1, 4)
        q /= np.linalg.norm(q)
        r = geo.quaternion_to_rotation(jnp.array(q, jnp.float32))
        # rotation matrix must be orthonormal
        np.testing.assert_allclose(np.asarray(r) @ np.asarray(r).T, np.eye(3), atol=1e-5)
        q2 = np.asarray(geo.rotation_to_quaternion(r))
        if np.dot(q2, q) < 0:
            q2 = -q2
        np.testing.assert_allclose(q2, q, atol=1e-4)

    def test_identity(self):
        r = geo.quaternion_to_rotation(jnp.array([0.0, 0, 0, 1]))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-7)
