"""Fast (shear-warp MXU) ops vs exact gather-based reference-semantics
paths: tolerance comparisons on synthetic scenes, including the sweep-axis
switch for sideways-looking cameras."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsdfjax.config import (
    AppConfig,
    DepthPreprocessConfig,
    IntegrateConfig,
    VolumeConfig,
)
from tsdfjax.geometry import CameraIntrinsics
from tsdfjax.pipeline import init_state, initial_pose
from tsdfjax import frames as F, raycast as R, synthetic as syn, volume as V
from tsdfjax.ops.sweep import fast_integrate, fast_raycast, project_image_to_volume

CAM = CameraIntrinsics(width=160, height=120, fx=150.0, fy=150.0, cx=79.5, cy=59.5)
VCFG = VolumeConfig(resolution=64, size_m=2.0, max_weight=128.0)
ICFG = IntegrateConfig(sdf_trunc_m=0.06, max_integrate_dist_m=2.5)
PRE = DepthPreprocessConfig(max_trunc_m=4.0, min_trunc_m=0.3, sigma_depth=0.02, sigma_pixel=1.0)


def cfg_for():
    return AppConfig(depth_camera=CAM, rgb_camera=CAM, volume=VCFG, integrate=ICFG)


def poses_various():
    c = 1.0
    out = [np.asarray(initial_pose(cfg_for()))]
    out.append(syn.look_at(np.array([c + 1.3 * np.sin(0.3), c, c - 1.3 * np.cos(0.3)]),
                           np.array([c, c, c])))
    # looking along volume x (exercises the sweep-axis switch)
    out.append(syn.look_at(np.array([-0.3, c, c]), np.array([c, c, c])))
    # looking along volume y
    out.append(syn.look_at(np.array([c, -0.3, c + 0.01]), np.array([c, c, c])))
    return out


def fuse(poses, fast):
    scene = syn.default_scene(2.0)
    vol = init_state(cfg_for()).volume
    counts = []
    for p in poses:
        pj = jnp.asarray(p, jnp.float32)
        d = syn.render_depth(pj, CAM, scene)
        tr, _f, _v, no = F.preprocess_depth(
            d, CAM, PRE.min_trunc_m, PRE.max_trunc_m, PRE.sigma_pixel, PRE.sigma_depth
        )
        if fast:
            vol, cnt = fast_integrate(vol, tr, no, None, pj, CAM, CAM, VCFG, ICFG)
        else:
            vol, cnt = V.integrate(vol, tr, no, None, pj, CAM, CAM, VCFG, ICFG)
        counts.append(int(cnt))
    return vol, counts


class TestFastIntegrate:
    def test_matches_exact(self):
        poses = poses_various()
        vol_e, ce = fuse(poses, fast=False)
        vol_f, cf = fuse(poses, fast=True)
        for a, b in zip(ce, cf):
            assert abs(a - b) / max(a, 1) < 0.02, (a, b)
        we = np.asarray(vol_e.weight) > 0
        wf = np.asarray(vol_f.weight) > 0
        assert (we == wf).mean() > 0.99
        both = we & wf
        diff = np.abs(np.asarray(vol_e.tsdf) - np.asarray(vol_f.tsdf))[both]
        assert np.median(diff) < 1e-3
        assert diff.mean() < 0.01

    def test_project_image_identity_channel(self):
        # a constant-1 channel must land as ~1 on voxels that project into
        # the image interior, 0 outside
        pose = jnp.asarray(initial_pose(cfg_for()), jnp.float32)
        ones = jnp.ones((1, CAM.height, CAM.width), jnp.float32)
        volch = project_image_to_volume(ones, pose, CAM, VCFG, axis=2)
        vals = np.asarray(volch[0])
        assert set(np.unique(vals)).issubset({0.0, 1.0})
        assert 0.05 < (vals == 1.0).mean() < 0.9


class TestFastRaycast:
    def test_accuracy_vs_truth(self):
        scene = syn.default_scene(2.0)
        poses = poses_various()
        vol, _ = fuse(poses[:2], fast=False)
        p = jnp.asarray(poses[1], jnp.float32)
        rc = fast_raycast(vol, p, CAM, VCFG, PRE.min_trunc_m, PRE.max_trunc_m)
        d_true = np.asarray(syn.render_depth(p, CAM, scene))
        v = np.asarray(rc.vertices)
        hit = np.asarray(rc.found) & (v[..., 2] != 0)
        assert hit.mean() > 0.5
        pn = np.asarray(p)
        z = ((v - pn[:3, 3]) @ pn[:3, :3])[..., 2]
        m = hit & (d_true > 0)
        err = np.abs(z - d_true)[m]
        assert np.median(err) < VCFG.voxel_size_m / 4
        assert np.percentile(err, 95) < VCFG.voxel_size_m

    def test_normals_unit_and_outwardish(self):
        poses = poses_various()
        vol, _ = fuse(poses[:2], fast=False)
        p = jnp.asarray(poses[1], jnp.float32)
        rc = fast_raycast(vol, p, CAM, VCFG, PRE.min_trunc_m, PRE.max_trunc_m)
        hit = np.asarray(rc.found) & (np.asarray(rc.vertices)[..., 2] != 0)
        n = np.asarray(rc.normals)[hit]
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)
        # normals should face the camera (positive dot with -view ray)
        view = np.asarray(p)[:3, 2]
        assert (n @ view < 0).mean() > 0.95

    def test_sideways_camera_axis_switch(self):
        scene = syn.default_scene(2.0)
        poses = poses_various()
        vol, _ = fuse(poses, fast=False)
        for p_np in (poses[2], poses[3]):
            p = jnp.asarray(p_np, jnp.float32)
            rc = fast_raycast(vol, p, CAM, VCFG, PRE.min_trunc_m, PRE.max_trunc_m)
            d_true = np.asarray(syn.render_depth(p, CAM, scene))
            v = np.asarray(rc.vertices)
            hit = np.asarray(rc.found) & (np.linalg.norm(v, axis=-1) != 0)
            assert hit.mean() > 0.3
            pn = np.asarray(p)
            z = ((v - pn[:3, 3]) @ pn[:3, :3])[..., 2]
            m = hit & (d_true > 0)
            err = np.abs(z - d_true)[m]
            assert np.median(err) < VCFG.voxel_size_m / 2

    def test_empty_volume_no_hits(self):
        vol = init_state(cfg_for()).volume
        p = jnp.asarray(initial_pose(cfg_for()), jnp.float32)
        rc = fast_raycast(vol, p, CAM, VCFG, PRE.min_trunc_m, PRE.max_trunc_m)
        assert int(np.asarray(rc.found).sum()) == 0
        assert np.isfinite(np.asarray(rc.vertices)).all()
