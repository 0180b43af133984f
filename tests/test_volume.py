import jax.numpy as jnp
import numpy as np
import pytest

from tsdfjax import volume as vol
from tsdfjax.config import IntegrateConfig, VolumeConfig
from tsdfjax.geometry import CameraIntrinsics, se3_identity

VCFG = VolumeConfig(resolution=32, size_m=2.0, max_weight=128.0)
ICFG = IntegrateConfig(sdf_trunc_m=0.1, max_integrate_dist_m=2.0)
CAM = CameraIntrinsics(width=64, height=48, fx=60.0, fy=60.0, cx=31.5, cy=23.5)


def make_volume():
    return vol.allocate(VCFG)


class TestCoords:
    def test_voxel_center_roundtrip(self):
        idx = jnp.array([[0, 0, 0], [5, 10, 31]], jnp.int32)
        world = vol.voxel_center_world(idx, VCFG)
        cell = VCFG.voxel_size_m
        np.testing.assert_allclose(world[0], [cell / 2] * 3, atol=1e-6)
        back = vol.world_to_voxel(world, VCFG)
        np.testing.assert_array_equal(back, idx)


class TestTrilinear:
    def test_matches_linear_field(self):
        # fill tsdf with a linear function of world position; trilinear
        # interpolation must reproduce it exactly away from borders
        r = VCFG.resolution
        ii = np.arange(r)
        cx, cy, cz = np.meshgrid(ii, ii, ii, indexing="ij")
        cell = VCFG.voxel_size_m
        wx, wy, wz = (cx + 0.5) * cell, (cy + 0.5) * cell, (cz + 0.5) * cell
        field = (0.3 * wx - 0.2 * wy + 0.5 * wz).astype(np.float32)
        v = vol.TsdfVolume(
            tsdf=jnp.array(field),
            weight=jnp.ones((r, r, r), jnp.float32),
            color=jnp.zeros((r, r, r, 3), jnp.float32),
        )
        rng = np.random.default_rng(0)
        pos = jnp.array(rng.uniform(0.3, 1.7, (50, 3)), jnp.float32)
        got, valid = vol.sample_tsdf_trilinear(v, pos, VCFG)
        want = 0.3 * pos[:, 0] - 0.2 * pos[:, 1] + 0.5 * pos[:, 2]
        assert bool(jnp.all(valid))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_invalid_on_zero_weight_corner(self):
        r = VCFG.resolution
        weight = jnp.ones((r, r, r), jnp.float32).at[16, 16, 16].set(0.0)
        v = vol.TsdfVolume(
            tsdf=jnp.zeros((r, r, r), jnp.float32),
            weight=weight,
            color=jnp.zeros((r, r, r, 3), jnp.float32),
        )
        # position whose 8-corner cube includes voxel (16,16,16)
        pos = vol.voxel_center_world(jnp.array([[16, 16, 16]]), VCFG) + 0.01
        _, valid = vol.sample_tsdf_trilinear(v, pos, VCFG)
        assert not bool(valid[0])
        # far away still valid
        pos2 = vol.voxel_center_world(jnp.array([[5, 5, 5]]), VCFG)
        _, valid2 = vol.sample_tsdf_trilinear(v, pos2, VCFG)
        assert bool(valid2[0])

    def test_invalid_at_border(self):
        r = VCFG.resolution
        v = vol.TsdfVolume(
            tsdf=jnp.zeros((r, r, r), jnp.float32),
            weight=jnp.ones((r, r, r), jnp.float32),
            color=jnp.zeros((r, r, r, 3), jnp.float32),
        )
        pos = jnp.array([[0.01, 1.0, 1.0]], jnp.float32)  # voxel x = 0
        _, valid = vol.sample_tsdf_trilinear(v, pos, VCFG)
        assert not bool(valid[0])


class TestIntegrate:
    def test_fronto_parallel_plane(self):
        # camera at volume center front, looking +z at a wall z_world = 1.5
        pose = jnp.array(se3_identity()).at[0, 3].set(1.0).at[1, 3].set(1.0)
        wall_z_cam = 1.5
        depth = jnp.full((48, 64), wall_z_cam, jnp.float32)
        v0 = make_volume()
        v1, count = vol.integrate(
            v0, depth, jnp.zeros((48, 64, 3)), None, pose, CAM, CAM, VCFG, ICFG
        )
        assert int(count) > 0
        tsdf = np.asarray(v1.tsdf)
        weight = np.asarray(v1.weight)
        cell = VCFG.voxel_size_m
        # voxel column through the optical axis: world x=y=1 -> ix=iy=16
        zs = (np.arange(VCFG.resolution) + 0.5) * cell
        col_t = tsdf[16, 16, :]
        col_w = weight[16, 16, :]
        for iz in range(VCFG.resolution):
            sdf = wall_z_cam - zs[iz]
            if sdf > 1e-6 + ICFG.sdf_trunc_m:
                # far in front of surface: truncated to +1 if updated
                if col_w[iz] > 0:
                    assert col_t[iz] == pytest.approx(1.0, abs=1e-5)
            elif -ICFG.sdf_trunc_m < sdf < ICFG.sdf_trunc_m:
                assert col_w[iz] > 0
                assert col_t[iz] == pytest.approx(sdf / ICFG.sdf_trunc_m, abs=0.05)
            elif sdf <= -ICFG.sdf_trunc_m - 1e-6:
                # behind the surface beyond truncation: never updated
                assert col_w[iz] == 0

    def test_weight_accumulates_and_caps(self):
        pose = jnp.array(se3_identity()).at[0, 3].set(1.0).at[1, 3].set(1.0)
        depth = jnp.full((48, 64), 1.5, jnp.float32)
        v = make_volume()
        small_cfg = VolumeConfig(resolution=32, size_m=2.0, max_weight=3.0)
        for _ in range(5):
            v, _ = vol.integrate(
                v, depth, jnp.zeros((48, 64, 3)), None, pose, CAM, CAM, small_cfg, ICFG
            )
        assert float(jnp.max(v.weight)) == pytest.approx(3.0)

    def test_behind_camera_not_updated(self):
        # camera looking +z from in front of the volume: z<=0 voxels are
        # behind it -> nothing updated when depth is all invalid
        pose = jnp.array(se3_identity()).at[0, 3].set(1.0).at[1, 3].set(1.0)
        depth = jnp.zeros((48, 64), jnp.float32)
        v0 = make_volume()
        v1, count = vol.integrate(
            v0, depth, jnp.zeros((48, 64, 3)), None, pose, CAM, CAM, VCFG, ICFG
        )
        assert int(count) == 0
        np.testing.assert_array_equal(np.asarray(v1.weight), 0.0)

    def test_color_fusion(self):
        pose = jnp.array(se3_identity()).at[0, 3].set(1.0).at[1, 3].set(1.0)
        depth = jnp.full((48, 64), 1.5, jnp.float32)
        rgb = jnp.full((48, 64, 3), 200.0, jnp.float32)
        normals = jnp.zeros((48, 64, 3), jnp.float32).at[..., 2].set(-1.0)
        v0 = make_volume()
        v1, count = vol.integrate(
            v0, depth, normals, rgb, pose, CAM, CAM, VCFG, ICFG, color_angle_weight=True
        )
        assert int(count) > 0
        updated = np.asarray(v1.weight) > 0
        cols = np.asarray(v1.color)
        # first observation: old weight 0 -> color = incoming color
        np.testing.assert_allclose(cols[updated], 200.0, atol=1e-3)
