"""Distributed tests without a pod (SURVEY.md §4.4): the sharded step on
the 8-virtual-CPU-device mesh must match the dense single-device run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsdfjax.config import (
    AppConfig,
    DepthPreprocessConfig,
    IcpConfig,
    IntegrateConfig,
    SwitchConfig,
    VolumeConfig,
)
from tsdfjax.geometry import CameraIntrinsics
from tsdfjax.pipeline import FusionEngine
from tsdfjax.parallel import ShardedFusion, make_space_mesh, required_halo
from tsdfjax import synthetic as syn

from test_pipeline import fly_through


def par_config(**overrides) -> AppConfig:
    cam = CameraIntrinsics(width=160, height=120, fx=150.0, fy=150.0, cx=79.5, cy=59.5)
    base = dict(
        depth_camera=cam,
        rgb_camera=cam,
        volume=VolumeConfig(resolution=64, size_m=2.0, max_weight=128.0),
        integrate=IntegrateConfig(sdf_trunc_m=0.06, max_integrate_dist_m=2.5),
        preprocess=DepthPreprocessConfig(
            max_trunc_m=4.0, min_trunc_m=0.3, sigma_depth=0.02, sigma_pixel=1.0
        ),
        switches=SwitchConfig(use_color=False),
        # exact ops by default; TestShardedFast* override to the sweep ops
        fast_ops=False,
    )
    base.update(overrides)
    return AppConfig(**base)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_space_mesh(8)


def run_both(cfg, mode, mesh, n_frames=4, with_rgb=False):
    scene = syn.default_scene(cfg.volume.size_m)
    poses = fly_through(cfg, n_frames, arc=0.1)
    dense = FusionEngine(cfg, mode=mode)
    shard = ShardedFusion(cfg, mesh=mesh, mode=mode)
    d_diags, s_diags = [], []
    for pose in poses:
        depth = syn.render_depth(pose, cfg.depth_camera, scene)
        rgb = syn.render_rgb(pose, cfg.depth_camera, scene) if with_rgb else None
        d_diags.append(dense.step(depth, rgb=rgb, ext_pose=pose))
        s_diags.append(shard.step(depth, rgb=rgb, ext_pose=pose))
    return dense, shard, d_diags, s_diags


class TestShardedMatchesDense:
    def test_file_mode_volume_and_maps(self, mesh8):
        cfg = par_config()
        dense, shard, dd, sd = run_both(cfg, "file", mesh8)
        np.testing.assert_allclose(
            np.asarray(shard.state.volume.tsdf), np.asarray(dense.state.volume.tsdf),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(shard.state.volume.weight), np.asarray(dense.state.volume.weight),
            atol=1e-5,
        )
        for d, s in zip(dd, sd):
            assert int(d.integrated_voxels) == int(s.integrated_voxels)
        mv_d = np.asarray(dense.state.model_vertices)
        mv_s = np.asarray(shard.state.model_vertices)
        # hit masks must agree and vertices match where hit
        hit_d = np.any(mv_d != 0, axis=-1)
        hit_s = np.any(mv_s != 0, axis=-1)
        assert (hit_d == hit_s).mean() > 0.999
        both = hit_d & hit_s
        np.testing.assert_allclose(mv_s[both], mv_d[both], atol=1e-4)
        nn_d = np.asarray(dense.state.model_normals)[both]
        nn_s = np.asarray(shard.state.model_normals)[both]
        np.testing.assert_allclose(nn_s, nn_d, atol=1e-3)

    def test_icp_mode_poses_match(self, mesh8):
        cfg = par_config(icp=IcpConfig(pyramid_levels=3))
        dense, shard, dd, sd = run_both(cfg, "icp", mesh8, n_frames=4)
        for k, (d, s) in enumerate(zip(dd, sd)):
            assert bool(d.tracking_ok) and bool(s.tracking_ok), f"frame {k}"
            pd, ps = np.asarray(d.pose), np.asarray(s.pose)
            np.testing.assert_allclose(ps[:3, 3], pd[:3, 3], atol=2e-3)
            np.testing.assert_allclose(ps[:3, :3], pd[:3, :3], atol=2e-3)

    def test_sdf_mode_poses_match(self, mesh8):
        cfg = par_config()
        dense, shard, dd, sd = run_both(cfg, "sdf", mesh8, n_frames=4)
        for k, (d, s) in enumerate(zip(dd, sd)):
            assert bool(d.tracking_ok) and bool(s.tracking_ok), f"frame {k}"
            pd, ps = np.asarray(d.pose), np.asarray(s.pose)
            np.testing.assert_allclose(ps[:3, 3], pd[:3, 3], atol=2e-3)

    def test_color_fusion_matches(self, mesh8):
        cfg = par_config(switches=SwitchConfig(use_color=True))
        dense, shard, dd, sd = run_both(cfg, "file", mesh8, n_frames=3, with_rgb=True)
        np.testing.assert_allclose(
            np.asarray(shard.state.volume.color), np.asarray(dense.state.volume.color),
            atol=1e-2,
        )

    def test_required_halo_covers_step(self):
        cfg = par_config()
        h = required_halo(cfg)
        step_vox = cfg.raycast.ray_increment_m / cfg.volume.voxel_size_m
        assert h >= step_vox + 3


class TestShardedFastMatchesDenseFast:
    """The MXU shear-warp ops under shard_map (ops/sweep.py
    fast_integrate_sharded / fast_raycast_sharded) vs the dense fast path.
    The per-shard windows run the same global-q-grid matmuls as the dense
    sweep (<= 2 nonzeros per interpolation row, so accumulation order
    cannot differ), making the comparison essentially bitwise."""

    def test_file_mode_volume_and_maps(self, mesh8):
        cfg = par_config(fast_ops=True)
        dense, shard, dd, sd = run_both(cfg, "file", mesh8)
        np.testing.assert_allclose(
            np.asarray(shard.state.volume.tsdf), np.asarray(dense.state.volume.tsdf),
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(shard.state.volume.weight), np.asarray(dense.state.volume.weight)
        )
        for d, s in zip(dd, sd):
            assert int(d.integrated_voxels) == int(s.integrated_voxels)
        mv_d = np.asarray(dense.state.model_vertices)
        mv_s = np.asarray(shard.state.model_vertices)
        hit_d = np.any(mv_d != 0, axis=-1)
        hit_s = np.any(mv_s != 0, axis=-1)
        assert (hit_d == hit_s).mean() > 0.9999
        both = hit_d & hit_s
        np.testing.assert_allclose(mv_s[both], mv_d[both], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(shard.state.model_normals)[both],
            np.asarray(dense.state.model_normals)[both],
            atol=1e-4,
        )

    @pytest.mark.parametrize("view_axis", [0, 1, 2])
    def test_all_sweep_axes(self, mesh8, view_axis):
        """Views along volume x exercise the local k-band branch; views
        along y/z exercise the all_to_all re-shard branch."""
        cfg = par_config(fast_ops=True)
        c = cfg.volume.size_m / 2.0
        radius = c + cfg.preprocess.min_trunc_m
        eye = np.array([c, c, c])
        eye[view_axis] -= radius
        hint = (0.0, 1.0, 0.0) if view_axis != 1 else (0.0, 0.0, 1.0)
        pose = syn.look_at(eye, np.array([c, c, c]), down_hint=hint)
        scene = syn.default_scene(cfg.volume.size_m)
        dense = FusionEngine(cfg, mode="file")
        shard = ShardedFusion(cfg, mesh=mesh8, mode="file")
        depth = syn.render_depth(pose, cfg.depth_camera, scene)
        for _ in range(2):  # frame 2 raycasts a populated volume
            dd = dense.step(depth, ext_pose=pose)
            sd = shard.step(depth, ext_pose=pose)
            assert int(dd.integrated_voxels) == int(sd.integrated_voxels)
        np.testing.assert_allclose(
            np.asarray(shard.state.volume.tsdf), np.asarray(dense.state.volume.tsdf),
            atol=1e-6,
        )
        mv_d = np.asarray(dense.state.model_vertices)
        mv_s = np.asarray(shard.state.model_vertices)
        hit_d = np.any(mv_d != 0, axis=-1)
        hit_s = np.any(mv_s != 0, axis=-1)
        assert hit_d.sum() > 500, "scene not visible — test misconfigured"
        assert (hit_d == hit_s).mean() > 0.9999
        both = hit_d & hit_s
        np.testing.assert_allclose(mv_s[both], mv_d[both], atol=1e-5)

    def test_icp_mode_poses_match(self, mesh8):
        cfg = par_config(fast_ops=True, icp=IcpConfig(pyramid_levels=3))
        dense, shard, dd, sd = run_both(cfg, "icp", mesh8, n_frames=4)
        for k, (d, s) in enumerate(zip(dd, sd)):
            assert bool(d.tracking_ok) and bool(s.tracking_ok), f"frame {k}"
            pd, ps = np.asarray(d.pose), np.asarray(s.pose)
            np.testing.assert_allclose(ps[:3, 3], pd[:3, 3], atol=2e-3)
            np.testing.assert_allclose(ps[:3, :3], pd[:3, :3], atol=2e-3)

    def test_color_fusion_matches(self, mesh8):
        cfg = par_config(fast_ops=True, switches=SwitchConfig(use_color=True))
        dense, shard, dd, sd = run_both(cfg, "file", mesh8, n_frames=3, with_rgb=True)
        np.testing.assert_allclose(
            np.asarray(shard.state.volume.color), np.asarray(dense.state.volume.color),
            atol=1e-2,
        )
        mc_d = np.asarray(dense.state.model_color)
        mc_s = np.asarray(shard.state.model_color)
        np.testing.assert_allclose(mc_s, mc_d, atol=1.0)

    def test_reintegrate_matches_dense(self, mesh8):
        """engine.reintegrate (map re-fusion after a loop-closure
        correction) on the sharded engine must rebuild the same volume
        as the dense engine given the same keyframes."""
        from tsdfjax.keyframes import Keyframe

        cfg = par_config(fast_ops=True)
        dense, shard, _, _ = run_both(cfg, "file", mesh8, n_frames=3)
        scene = syn.default_scene(cfg.volume.size_m)
        poses = fly_through(cfg, 3, arc=0.1)
        kfs = [
            Keyframe(frame_id=i, timestamp=i / 30.0,
                     pose=np.asarray(p, np.float32),
                     depth_m=np.asarray(
                         syn.render_depth(p, cfg.depth_camera, scene)),
                     rgb=None)
            for i, p in enumerate(poses)
        ]
        nd = dense.reintegrate(kfs)
        ns = shard.reintegrate(kfs)
        assert nd == ns == 3
        np.testing.assert_allclose(
            np.asarray(shard.state.volume.tsdf),
            np.asarray(dense.state.volume.tsdf), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(shard.state.pose), np.asarray(dense.state.pose),
            atol=1e-6,
        )
        # model maps refresh from the last keyframe's pose on both
        mv_d = np.asarray(dense.state.model_vertices)
        mv_s = np.asarray(shard.state.model_vertices)
        hit_d = np.any(mv_d != 0, axis=-1)
        hit_s = np.any(mv_s != 0, axis=-1)
        assert (hit_d == hit_s).mean() > 0.999

    def test_sdf_sweep_mode_poses_match(self, mesh8):
        """Sharded gather-free sweep SDF tracker (sdf_track_sweep_sharded,
        k-band decomposition + psum'd normal equations) vs the dense
        sweep tracker — the sharded engine previously silently fell back
        to the exact gather SDF kernel under fast_ops (VERDICT r3 #7)."""
        cfg = par_config(fast_ops=True)
        dense, shard, dd, sd = run_both(cfg, "sdf", mesh8, n_frames=4)
        for k, (d, s) in enumerate(zip(dd, sd)):
            assert bool(d.tracking_ok) and bool(s.tracking_ok), f"frame {k}"
            pd, ps = np.asarray(d.pose), np.asarray(s.pose)
            np.testing.assert_allclose(ps[:3, 3], pd[:3, 3], atol=2e-3)
            np.testing.assert_allclose(ps[:3, :3], pd[:3, :3], atol=2e-3)


class TestShardedMeshExtraction:
    """Distributed marching cubes (SURVEY §7 step 8): per-shard extraction
    on the 1-voxel-halo slab + host concat + weld must equal the dense
    extraction EXACTLY (same soup order -> same welded mesh)."""

    def test_equals_dense(self, mesh8):
        from tsdfjax import mesh as M

        cfg = par_config(fast_ops=True, switches=SwitchConfig(use_color=True))
        scene = syn.default_scene(cfg.volume.size_m)
        poses = fly_through(cfg, 3, arc=0.1)
        dense = FusionEngine(cfg, mode="file")
        shard = ShardedFusion(cfg, mesh=mesh8, mode="file")
        for pose in poses:
            d = syn.render_depth(pose, cfg.depth_camera, scene)
            r = syn.render_rgb(pose, cfg.depth_camera, scene)
            dense.step(d, rgb=r, ext_pose=pose)
            shard.step(d, rgb=r, ext_pose=pose)
        m_d = M.extract_mesh(dense.state.volume, cfg.volume, with_color=True)
        m_s = shard.extract_mesh(with_color=True)
        assert m_d.num_faces > 1000
        np.testing.assert_array_equal(m_s.vertices, m_d.vertices)
        np.testing.assert_array_equal(m_s.faces, m_d.faces)
        np.testing.assert_allclose(m_s.colors, m_d.colors, atol=1e-4)

    def test_overflow_reported(self, mesh8):
        from tsdfjax.parallel import marching_cubes_sharded

        cfg = par_config(fast_ops=True)
        scene = syn.default_scene(cfg.volume.size_m)
        pose = fly_through(cfg, 1)[0]
        shard = ShardedFusion(cfg, mesh=mesh8, mode="file")
        shard.step(syn.render_depth(pose, cfg.depth_camera, scene), ext_pose=pose)
        v, c, overflow = marching_cubes_sharded(
            shard.state.volume, cfg.volume, mesh8, max_triangles_per_shard=10
        )
        assert overflow > 0
        assert v.shape[0] <= 8 * 10


class TestHaloExchange:
    def test_extended_slab_reconstructs_neighbors(self, mesh8):
        from functools import partial
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map
        from tsdfjax.parallel.sharded import _halo_exchange

        full = jnp.arange(64 * 4 * 4, dtype=jnp.float32).reshape(64, 4, 4)
        halo = 3

        def body(local):
            return _halo_exchange(local, halo)

        ext = jax.jit(
            shard_map(
                body, mesh=make_space_mesh(8), in_specs=(P("space"),),
                out_specs=P("space"),
            )
        )(full)
        # shard i's extended block (with halo) sits at rows i*(8+2h)
        ext = np.asarray(ext).reshape(8, 8 + 2 * halo, 4, 4)
        fullnp = np.asarray(full)
        for i in range(8):
            lo = i * 8
            want_core = fullnp[lo : lo + 8]
            np.testing.assert_array_equal(ext[i, halo : halo + 8], want_core)
            if i > 0:
                np.testing.assert_array_equal(ext[i, :halo], fullnp[lo - halo : lo])
            else:
                np.testing.assert_array_equal(ext[i, :halo], 0.0)
            if i < 7:
                np.testing.assert_array_equal(ext[i, halo + 8 :], fullnp[lo + 8 : lo + 8 + halo])
            else:
                np.testing.assert_array_equal(ext[i, halo + 8 :], 0.0)


class TestShardedCheckpoint:
    def test_roundtrip_per_shard_files(self, mesh8, tmp_path):
        import os

        cfg = par_config(fast_ops=True)
        scene = syn.default_scene(cfg.volume.size_m)
        poses = fly_through(cfg, 3, arc=0.1)
        shard = ShardedFusion(cfg, mesh=mesh8, mode="file")
        for pose in poses:
            shard.step(syn.render_depth(pose, cfg.depth_camera, scene), ext_pose=pose)
        ckpt = str(tmp_path / "ckpt")
        shard.save_checkpoint(ckpt)
        # one slab file per shard per volume leaf
        assert len([f for f in os.listdir(ckpt) if f.startswith("tsdf_x")]) == 8

        fresh = ShardedFusion(cfg, mesh=mesh8, mode="file")
        fresh.load_checkpoint(ckpt)
        np.testing.assert_array_equal(
            np.asarray(fresh.state.volume.tsdf), np.asarray(shard.state.volume.tsdf)
        )
        np.testing.assert_array_equal(
            np.asarray(fresh.state.pose), np.asarray(shard.state.pose)
        )
        assert int(fresh.state.frame_id) == 3
        # the restored engine keeps fusing identically to the original
        d = syn.render_depth(poses[-1], cfg.depth_camera, scene)
        da = shard.step(d, ext_pose=poses[-1])
        db = fresh.step(d, ext_pose=poses[-1])
        np.testing.assert_array_equal(
            np.asarray(fresh.state.volume.tsdf), np.asarray(shard.state.volume.tsdf)
        )

    def test_mismatched_config_rejected(self, mesh8, tmp_path):
        cfg = par_config(fast_ops=True)
        shard = ShardedFusion(cfg, mesh=mesh8, mode="file")
        ckpt = str(tmp_path / "ckpt")
        shard.save_checkpoint(ckpt)
        other = ShardedFusion(
            par_config(fast_ops=True, volume=VolumeConfig(resolution=32, size_m=2.0)),
            mesh=mesh8, mode="file",
        )
        with pytest.raises(ValueError):
            other.load_checkpoint(ckpt)


class TestClippedExactRaycast:
    def test_clip_reduces_steps_same_claims(self):
        """The exact raycast with own_x_range clips each ray's march to
        the shard slab's t-interval (generalized slab test,
        raycastingVolume.cu:45-63): same claims, fewer executed steps."""
        import math

        from tsdfjax import raycast as R
        from tsdfjax import volume as V
        from tsdfjax import frames as F

        cfg = par_config()
        scene = syn.default_scene(cfg.volume.size_m)
        c = cfg.volume.size_m / 2.0
        # side view along +x so the x-slab clip actually bites
        pose = syn.look_at(
            np.array([c - (c + 0.3), c, c]), np.array([c, c, c])
        )
        depth = syn.render_depth(pose, cfg.depth_camera, scene)
        vol = V.allocate(cfg.volume)
        _, _, verts, normals = F.preprocess_depth(
            depth, cfg.depth_camera, 0.3, 4.0, 1.0, 0.02
        )
        vol, _ = V.integrate(
            vol, depth, normals, None, jnp.asarray(pose), cfg.depth_camera,
            cfg.rgb_camera, cfg.volume, cfg.integrate,
        )
        args = (vol, jnp.asarray(pose), cfg.depth_camera, cfg.volume,
                cfg.raycast.ray_increment_m, 0.3, 4.0)
        full, steps_full = R.raycast(*args, return_steps=True)
        own = (0.9, 1.4)
        clip, steps_clip = R.raycast(*args, own_x_range=own, return_steps=True)
        n_bound = int(math.ceil(math.sqrt(3.0) * cfg.volume.size_m
                                / cfg.raycast.ray_increment_m)) + 1
        assert int(steps_clip) < int(steps_full) * 0.7, (
            int(steps_clip), int(steps_full), n_bound)
        # claims agree wherever the dense hit's SAMPLE position (the claim
        # gate's own metric) lies inside the owned range, with a one-step
        # margin to stay off the boundary-tie cases
        from tsdfjax.raycast import _ray_directions

        wd, _ = _ray_directions(jnp.asarray(pose), cfg.depth_camera)
        step = cfg.raycast.ray_increment_m
        f_hit = np.asarray(full.found)
        f_t = np.asarray(full.hit_t)
        px = pose[0, 3] + np.asarray(wd)[..., 0] * f_t
        in_own = f_hit & (px >= own[0] + step) & (px < own[1] - step)
        assert in_own.sum() > 100, "scene must have hits inside the slab"
        c_hit = np.asarray(clip.found)
        c_t = np.asarray(clip.hit_t)
        assert c_hit[in_own].all()
        np.testing.assert_allclose(c_t[in_own], f_t[in_own], atol=1e-6)


class TestFrameBatching:
    """step_batch (k frames per dispatch, lax.scan inside shard_map) must
    be semantically identical to k sequential step() calls — it exists
    purely to amortize per-dispatch overhead (SCALING.md mitigation 1)."""

    def test_batched_matches_sequential(self, mesh8):
        cfg = par_config(fast_ops=True)
        scene = syn.default_scene(cfg.volume.size_m)
        poses = fly_through(cfg, 4, arc=0.1)
        depths = [syn.render_depth(p, cfg.depth_camera, scene) for p in poses]

        seq = ShardedFusion(cfg, mesh=mesh8, mode="file")
        for p, d in zip(poses, depths):
            seq.step(d, ext_pose=p)

        bat = ShardedFusion(cfg, mesh=mesh8, mode="file")
        diags = bat.step_batch(depths, ext_poses=[jnp.asarray(p) for p in poses])
        assert diags.pose.shape[0] == 4

        np.testing.assert_array_equal(
            np.asarray(seq.state.volume.tsdf), np.asarray(bat.state.volume.tsdf)
        )
        np.testing.assert_array_equal(
            np.asarray(seq.state.model_vertices),
            np.asarray(bat.state.model_vertices),
        )
        assert int(bat.state.frame_id) == 4

    def test_batched_icp_tracks(self, mesh8):
        cfg = par_config(
            fast_ops=True,
            icp=IcpConfig(pyramid_levels=2, source_subsample=2,
                          converge_eps=1e-4),
        )
        scene = syn.default_scene(cfg.volume.size_m)
        poses = fly_through(cfg, 4, arc=0.05)
        depths = [syn.render_depth(p, cfg.depth_camera, scene) for p in poses]
        seq = ShardedFusion(cfg, mesh=mesh8, mode="icp")
        for d in depths:
            last = seq.step(d)
        bat = ShardedFusion(cfg, mesh=mesh8, mode="icp")
        diags = bat.step_batch(depths)
        assert bool(diags.tracking_ok[-1])
        np.testing.assert_allclose(
            np.asarray(diags.pose[-1]), np.asarray(last.pose), atol=1e-6
        )
