"""Pose graph + texturing tests (drift correction & config-4 surface)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tsdfjax.geometry import exp_se3, log_se3, se3_inverse
from tsdfjax.posegraph import PoseGraph, build_keyframe_graph, icp_relative_pose
from tsdfjax import synthetic as syn


class TestLogExp:
    @pytest.mark.parametrize("seed", range(4))
    def test_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        tw = jnp.asarray(rng.normal(0, 0.4, 6), jnp.float32)
        t = exp_se3(tw)
        back = log_se3(t)
        np.testing.assert_allclose(back, tw, atol=1e-4)

    def test_identity(self):
        np.testing.assert_allclose(log_se3(jnp.eye(4)), 0.0, atol=1e-6)


def noisy_circle_graph(n=8, drift=0.05, seed=0):
    """Ground-truth poses on a circle; odometry edges perturbed so the
    chain drifts; a loop-closure edge (0, n-1) with the TRUE relative
    pose anchors it."""
    rng = np.random.default_rng(seed)
    gt = []
    for k in range(n):
        ang = 2 * np.pi * k / n * 0.5
        eye = np.array([np.sin(ang), 0.0, 1.0 - np.cos(ang)])
        gt.append(syn.look_at(eye, eye + np.array([np.sin(ang), 0, np.cos(ang)])))
    # integrate noisy odometry
    est = [gt[0]]
    for k in range(1, n):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        noise = np.asarray(exp_se3(jnp.asarray(rng.normal(0, drift, 6), jnp.float32)))
        est.append(est[-1] @ rel @ noise)
    g = PoseGraph()
    for p in est:
        g.add_node(p)
    for k in range(n - 1):
        # odometry measurement = the (noisy) relative pose actually used
        g.add_edge(k, k + 1, np.linalg.inv(est[k]) @ est[k + 1], weight=1.0)
    # loop closure with the true relative pose, strongly weighted
    g.add_edge(0, n - 1, np.linalg.inv(gt[0]) @ gt[n - 1], weight=20.0)
    return g, gt, est


class TestPoseGraph:
    def test_loop_closure_reduces_drift(self):
        g, gt, est = noisy_circle_graph()
        before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
        opt = g.optimize(iters=10)
        after = np.linalg.norm(opt[-1][:3, 3] - gt[-1][:3, 3])
        assert after < before * 0.3, (before, after)

    def test_consistent_graph_unchanged(self):
        # edges exactly consistent with the poses -> optimization is a no-op
        g = PoseGraph()
        rng = np.random.default_rng(1)
        poses = [np.asarray(exp_se3(jnp.asarray(rng.normal(0, 0.3, 6), jnp.float32)))
                 for _ in range(5)]
        for p in poses:
            g.add_node(p)
        for k in range(4):
            g.add_odometry_edge(k, k + 1)
        g.add_odometry_edge(0, 4)
        opt = g.optimize(iters=5)
        for p, q in zip(poses, opt):
            np.testing.assert_allclose(q, p, atol=1e-3)

    def test_gauge_fixed(self):
        g, _, est = noisy_circle_graph()
        opt = g.optimize(iters=5)
        np.testing.assert_allclose(opt[0], est[0], atol=1e-5)


class TestKeyframeIcpEdges:
    def test_icp_recovers_relative_pose(self):
        from tsdfjax.config import DepthPreprocessConfig, IcpConfig
        from tsdfjax.geometry import CameraIntrinsics
        from tsdfjax.keyframes import Keyframe

        cam = CameraIntrinsics(160, 120, 150.0, 150.0, 79.5, 59.5)
        scene = syn.default_scene(2.0)
        c = 1.0
        pa = syn.look_at(np.array([c, c, -0.3]), np.array([c, c, c]))
        pb = syn.look_at(np.array([c + 0.12, c, -0.29]), np.array([c, c, c]))
        da = np.asarray(syn.render_depth(jnp.asarray(pa), cam, scene))
        db = np.asarray(syn.render_depth(jnp.asarray(pb), cam, scene))
        kfa = Keyframe(0, 0.0, pa, da, None)
        # give B a PERTURBED initial pose; ICP should pull it back
        pb_bad = pb.copy()
        pb_bad[:3, 3] += np.array([0.02, -0.015, 0.01], np.float32)
        kfb = Keyframe(1, 1.0, pb_bad, db, None)
        t_ab, ok, n_corr, resid = icp_relative_pose(
            kfa, kfb, cam, IcpConfig(pyramid_levels=2),
            DepthPreprocessConfig(sigma_pixel=1.0),
        )
        assert ok
        assert n_corr > 0.15 * cam.width * cam.height
        assert resid < 0.02
        t_ab_true = np.linalg.inv(pa) @ pb
        np.testing.assert_allclose(t_ab[:3, 3], t_ab_true[:3, 3], atol=0.01)

    def test_icp_associates_through_model_camera(self):
        """Regression: pairwise ICP must project into keyframe A's camera
        grid (model_pose), not B's. With the old inv(pose_b) association
        the correspondence count collapses once the keyframes are far
        apart — on smooth scenes the bug hid behind the 0.1 m dist gate,
        on the drift-loop eval it silently produced 0 loop closures."""
        from tsdfjax.config import DepthPreprocessConfig, IcpConfig
        from tsdfjax.geometry import CameraIntrinsics
        from tsdfjax.keyframes import Keyframe

        cam = CameraIntrinsics(160, 120, 150.0, 150.0, 79.5, 59.5)
        scene = syn.default_scene(2.0)
        c = 1.0
        # widely separated viewpoints looking at the same scene center
        pa = syn.look_at(np.array([c - 0.35, c + 0.1, -0.25]), np.array([c, c, c]))
        pb = syn.look_at(np.array([c + 0.35, c - 0.1, -0.20]), np.array([c, c, c]))
        da = np.asarray(syn.render_depth(jnp.asarray(pa), cam, scene))
        db = np.asarray(syn.render_depth(jnp.asarray(pb), cam, scene))
        kfa = Keyframe(0, 0.0, pa, da, None)
        pb_bad = pb.copy()
        pb_bad[:3, 3] += np.array([-0.015, 0.02, 0.01], np.float32)
        kfb = Keyframe(1, 1.0, pb_bad, db, None)
        t_ab, ok, n_corr, resid = icp_relative_pose(
            kfa, kfb, cam, IcpConfig(pyramid_levels=2),
            DepthPreprocessConfig(sigma_pixel=1.0),
        )
        assert ok
        # the buggy association leaves only a sliver of correspondences
        # at this separation; the correct camera keeps a solid fraction
        assert n_corr > 0.10 * cam.width * cam.height
        t_ab_true = np.linalg.inv(pa) @ pb
        np.testing.assert_allclose(t_ab[:3, 3], t_ab_true[:3, 3], atol=0.012)

    def test_closure_icp_recovers_large_offset(self):
        """Pairwise closure ICP RELAXES the per-frame shake gate (advisor
        r3): keyframes seconds apart can legitimately be far from the
        odometry guess, and long-gap closures with large genuine drift
        are exactly the edges the graph needs. A ~0.5 m initialization
        error (beyond the 0.4 m tracking shake budget) must converge to
        the true relative pose; outlier rejection is the graph's
        odometry-deviation gate's job."""
        from tsdfjax.config import DepthPreprocessConfig, IcpConfig
        from tsdfjax.geometry import CameraIntrinsics
        from tsdfjax.keyframes import Keyframe

        cam = CameraIntrinsics(160, 120, 150.0, 150.0, 79.5, 59.5)
        scene = syn.default_scene(2.0)
        c = 1.0
        pa = syn.look_at(np.array([c, c, -0.3]), np.array([c, c, c]))
        pb = syn.look_at(np.array([c + 0.45, c + 0.15, -0.25]), np.array([c, c, c]))
        da = np.asarray(syn.render_depth(jnp.asarray(pa), cam, scene))
        db = np.asarray(syn.render_depth(jnp.asarray(pb), cam, scene))
        kfa = Keyframe(0, 0.0, pa, da, None)
        # init B at A's pose: the correct alignment travels ~0.5 m
        kfb = Keyframe(1, 1.0, pa.copy(), db, None)
        t_ab, ok, _n, _r = icp_relative_pose(
            kfa, kfb, cam, IcpConfig(pyramid_levels=2),
            DepthPreprocessConfig(sigma_pixel=1.0),
        )
        assert ok
        t_ab_true = np.linalg.inv(pa) @ pb
        np.testing.assert_allclose(t_ab[:3, 3], t_ab_true[:3, 3], atol=0.03)

    def test_cumulative_shake_gate_guards_tracking(self):
        """Frame-to-model TRACKING keeps the cumulative shake gate: a
        converged alignment whose total motion exceeds dist_shake_m is
        rejected even though every individual GN step was small
        (observed: 46 cm 'converged' jump on a weight-1 noisy model). A
        camera at 30 fps cannot teleport — but keyframe pairs can (see
        test above)."""
        from tsdfjax import frames as F
        from tsdfjax.config import IcpConfig
        from tsdfjax.geometry import CameraIntrinsics, transform_points, rotate_vectors
        from tsdfjax.trackers.icp import icp_track

        cam = CameraIntrinsics(160, 120, 150.0, 150.0, 79.5, 59.5)
        scene = syn.default_scene(2.0)
        c = 1.0
        pa = syn.look_at(np.array([c, c, -0.3]), np.array([c, c, c]))
        pb = syn.look_at(np.array([c + 0.45, c + 0.15, -0.25]), np.array([c, c, c]))
        da = np.asarray(syn.render_depth(jnp.asarray(pa), cam, scene))
        db = np.asarray(syn.render_depth(jnp.asarray(pb), cam, scene))

        def maps_of(d):
            v = F.depth_to_vertices(jnp.asarray(d), cam)
            return v, F.vertices_to_normals(v)

        va, na = maps_of(da)
        vb, nb = maps_of(db)
        mv = transform_points(jnp.asarray(pa), va)
        mv = jnp.where(jnp.any(va != 0, axis=-1, keepdims=True), mv, 0.0)
        mn = rotate_vectors(jnp.asarray(pa), na)
        icp_cfg = IcpConfig(pyramid_levels=2)
        levels = icp_cfg.pyramid_levels
        res = icp_track(
            F.build_pyramid(vb, levels, F.downsample_vertices),
            F.build_pyramid(nb, levels, F.downsample_normals),
            F.build_pyramid(mv, levels, F.downsample_vertices),
            F.build_pyramid(mn, levels, F.downsample_normals),
            jnp.asarray(pa), cam, icp_cfg, model_pose=jnp.asarray(pa),
        )
        assert not bool(res.ok)


class TestTexturing:
    def test_textured_obj_mtl_written(self, tmp_path):
        from tsdfjax.config import VolumeConfig
        from tsdfjax.geometry import CameraIntrinsics
        from tsdfjax.keyframes import Keyframe
        from tsdfjax import mesh as M
        from tsdfjax.texturing import save_textured_mesh

        # reuse the sphere fixture from test_mesh
        import test_mesh as tm

        vol = tm.sphere_volume()
        mesh = M.extract_mesh(vol, tm.VCFG, max_triangles=50_000)
        cam = CameraIntrinsics(80, 60, 75.0, 75.0, 39.5, 29.5)
        pose = syn.look_at(np.array([1.0, 1.0, -0.2]), np.array([1.0, 1.0, 1.0]))
        depth = np.asarray(
            syn.render_depth(jnp.asarray(pose), cam,
                             syn.Scene(spheres=(syn.Sphere((1.0, 1.0, 1.0), 0.5),)))
        )
        rgb = np.full((60, 80, 3), 180.0, np.float32)
        kf = Keyframe(0, 0.0, pose, depth, rgb)
        obj = str(tmp_path / "textured_mesh.obj")
        save_textured_mesh(mesh, [kf], cam, obj)
        content = open(obj).read()
        assert "mtllib textured_mesh.mtl" in content
        assert "usemtl kf0" in content
        assert "vt " in content
        mtl = open(str(tmp_path / "textured_mesh.mtl")).read()
        assert "map_Kd textured_mesh_tex0.png" in mtl
        import os

        assert os.path.exists(str(tmp_path / "textured_mesh_tex0.png"))
        # a healthy fraction of faces should be textured by the keyframe
        tex_faces = content.count("/")
        assert tex_faces > 100


class TestCorrectionFor:
    def test_matches_injected_drift(self):
        g, gt, est = noisy_circle_graph()
        g.optimize(iters=10)
        corr = g.correction_for(len(gt) - 1)
        fixed = corr @ est[-1]
        before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
        after = np.linalg.norm(fixed[:3, 3] - gt[-1][:3, 3])
        assert after < before * 0.3, (before, after)

    def test_requires_optimize(self):
        from tsdfjax.posegraph import PoseGraph

        g = PoseGraph()
        g.add_node(np.eye(4, dtype=np.float32))
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            g.correction_for(0)
