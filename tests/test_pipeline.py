"""Golden-pipeline integration tests (SURVEY.md §4.2): fuse synthetic
frames with known poses, assert the raycast model maps reproduce the
rendered depth. This is BASELINE.json config 1 in miniature."""

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
from tsdfjax.pipeline import FusionEngine, initial_pose
from tsdfjax import synthetic as syn


def small_config(**overrides) -> AppConfig:
    # big enough that the coarsest ICP level (/4) still has ~1200 pixels;
    # smaller cameras leave the coarse 6x6 system rank-deficient
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
    )
    base.update(overrides)
    return AppConfig(**base)


def fly_through(cfg, n_frames, arc=0.25):
    """Trajectory starting exactly at the engine's initial pose."""
    c = cfg.volume.size_m / 2.0
    start = initial_pose(cfg)
    radius = c + cfg.preprocess.min_trunc_m  # distance from volume center
    target = np.array([c, c, c])
    poses = [start]
    for i in range(1, n_frames):
        ang = arc * i / max(n_frames - 1, 1)
        eye = np.array([c + radius * np.sin(ang), c, c - radius * np.cos(ang)])
        poses.append(syn.look_at(eye, target))
    return poses


class TestGroundTruthFusion:
    def test_raycast_matches_rendered_depth(self):
        cfg = small_config()
        scene = syn.default_scene(cfg.volume.size_m)
        poses = fly_through(cfg, 8)
        engine = FusionEngine(cfg, mode="file")
        for pose in poses:
            depth = syn.render_depth(pose, cfg.depth_camera, scene)
            diag = engine.step(depth, ext_pose=pose)
            assert bool(diag.tracking_ok)
        assert int(engine.state.lost_count) == 0

        # raycast from the final pose vs the analytic render
        last = poses[-1]
        depth_true = np.asarray(syn.render_depth(last, cfg.depth_camera, scene))
        mv = np.asarray(engine.state.model_vertices)
        hit = mv[..., 2] != 0
        assert hit.mean() > 0.5
        pose_np = np.asarray(last)
        v_cam = (mv - pose_np[:3, 3]) @ pose_np[:3, :3]
        valid = hit & (depth_true > 0)
        err = np.abs(v_cam[..., 2] - depth_true)[valid]
        # tolerance ~ voxel size (31 mm at 64^3 over 2 m)
        assert np.median(err) < cfg.volume.voxel_size_m
        assert np.percentile(err, 90) < 2 * cfg.volume.voxel_size_m

    def test_model_normals_unit_on_hits(self):
        cfg = small_config()
        scene = syn.default_scene(cfg.volume.size_m)
        engine = FusionEngine(cfg, mode="file")
        pose = initial_pose(cfg)
        for _ in range(3):
            depth = syn.render_depth(pose, cfg.depth_camera, scene)
            engine.step(depth, ext_pose=pose)
        n = np.asarray(engine.state.model_normals)
        hits = np.asarray(engine.state.model_vertices)[..., 2] != 0
        norms = np.linalg.norm(n[hits], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)


class TestIcpTracking:
    def test_recovers_orbit_poses(self):
        cfg = small_config(icp=IcpConfig(pyramid_levels=3))
        scene = syn.default_scene(cfg.volume.size_m)
        poses = fly_through(cfg, 10, arc=0.2)
        engine = FusionEngine(cfg, mode="icp")
        errs = []
        for pose in poses:
            depth = syn.render_depth(pose, cfg.depth_camera, scene)
            diag = engine.step(depth)
            assert bool(diag.tracking_ok), f"lost at frame {int(engine.state.frame_id)}"
            est = np.asarray(diag.pose)
            errs.append(np.linalg.norm(est[:3, 3] - pose[:3, 3]))
        # trajectory error bounded by ~1 voxel
        assert max(errs) < 2 * cfg.volume.voxel_size_m, errs

    def test_shake_rejection_thresholds(self):
        # Deterministic pin of the reference's shake rejection
        # (CameraPoseFinderICP.cpp:104-107): a GN step whose 6-DoF update
        # exceeds camera_shake_dist / camera_shake_angle (0.4/0.4) must be
        # rejected; one just below must be accepted. ATA = I makes the
        # solved update exactly equal to ATb.
        import jax.numpy as jnp

        from tsdfjax.trackers.icp import solve_gn_step

        def a7_for(x6):
            a7 = np.zeros((7, 7), np.float32)
            a7[:6, :6] = np.eye(6, dtype=np.float32)
            a7[:6, 6] = x6
            return jnp.asarray(a7)

        # pure translation straddling the 0.4 m threshold
        _, ok, _ = solve_gn_step(a7_for([0, 0, 0, 0.41, 0, 0]), 0.4, 0.4)
        assert not bool(ok)
        _, ok, _ = solve_gn_step(a7_for([0, 0, 0, 0.39, 0, 0]), 0.4, 0.4)
        assert bool(ok)
        # pure rotation straddling the 0.4 rad threshold
        _, ok, _ = solve_gn_step(a7_for([0.41, 0, 0, 0, 0, 0]), 0.4, 0.4)
        assert not bool(ok)
        _, ok, _ = solve_gn_step(a7_for([0.39, 0, 0, 0, 0, 0]), 0.4, 0.4)
        assert bool(ok)
        # singular system (det < 1e-10) is rejected regardless of size
        _, ok, _ = solve_gn_step(jnp.zeros((7, 7), jnp.float32), 0.4, 0.4)
        assert not bool(ok)

    def test_fails_on_teleport(self):
        # jump the camera far away: ICP must reject (shake / no overlap)
        # and the engine must report the loss + keep the old pose
        cfg = small_config(icp=IcpConfig(pyramid_levels=3))
        scene = syn.default_scene(cfg.volume.size_m)
        engine = FusionEngine(cfg, mode="icp")
        p0 = initial_pose(cfg)
        depth = syn.render_depth(p0, cfg.depth_camera, scene)
        engine.step(depth)
        engine.step(depth)
        # a frame rendered from behind/above the volume shares no surface
        # overlap with the model maps: every GN level either finds no
        # correspondences (singular ATA) or a >0.4 jump — tracking fails
        far = syn.look_at(np.array([3.5, 3.5, -1.0]), np.array([1.0, 1.0, 1.0]))
        depth_far = syn.render_depth(far, cfg.depth_camera, scene)
        diag = engine.step(depth_far)
        assert not bool(diag.tracking_ok)
        assert int(engine.state.lost_count) == 1
        # the pose must have stayed at the last good estimate
        est = np.asarray(diag.pose)
        assert np.linalg.norm(est[:3, 3] - np.asarray(p0)[:3, 3]) < 0.5


class TestSdfTracking:
    def test_recovers_orbit_poses(self):
        cfg = small_config()
        scene = syn.default_scene(cfg.volume.size_m)
        poses = fly_through(cfg, 10, arc=0.15)
        engine = FusionEngine(cfg, mode="sdf")
        errs = []
        for pose in poses:
            depth = syn.render_depth(pose, cfg.depth_camera, scene)
            diag = engine.step(depth)
            assert bool(diag.tracking_ok), f"lost at frame {int(engine.state.frame_id)}"
            est = np.asarray(diag.pose)
            errs.append(np.linalg.norm(est[:3, 3] - pose[:3, 3]))
        assert max(errs) < 2 * cfg.volume.voxel_size_m, errs

    def test_hole_aware_gradient_tracks(self):
        # opt-in validity-aware one-sided gradients (map-hole robustness)
        # must still track the clean orbit to the same tolerance
        import dataclasses

        from tsdfjax.config import SdfTrackerConfig

        cfg = small_config()
        cfg = dataclasses.replace(
            cfg, sdf_tracker=SdfTrackerConfig(hole_aware_gradient=True)
        )
        scene = syn.default_scene(cfg.volume.size_m)
        poses = fly_through(cfg, 8, arc=0.15)
        engine = FusionEngine(cfg, mode="sdf")
        errs = []
        for pose in poses:
            depth = syn.render_depth(pose, cfg.depth_camera, scene)
            diag = engine.step(depth)
            assert bool(diag.tracking_ok)
            errs.append(
                np.linalg.norm(np.asarray(diag.pose)[:3, 3] - pose[:3, 3])
            )
        assert max(errs) < 2 * cfg.volume.voxel_size_m, errs


class TestColorPipeline:
    def test_color_fuses_and_raycasts(self):
        cfg = small_config(switches=SwitchConfig(use_color=True, color_angle_weight=True))
        scene = syn.default_scene(cfg.volume.size_m)
        engine = FusionEngine(cfg, mode="file")
        pose = initial_pose(cfg)
        for _ in range(3):
            depth = syn.render_depth(pose, cfg.depth_camera, scene)
            rgb = syn.render_rgb(pose, cfg.depth_camera, scene)
            engine.step(depth, rgb=rgb, ext_pose=pose)
        col = np.asarray(engine.state.model_color)
        hits = np.asarray(engine.state.model_vertices)[..., 2] != 0
        assert col[hits].max() > 10.0  # some real color came through
        assert col.min() >= 0.0 and col.max() <= 255.0
