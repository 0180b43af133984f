"""TUM dataset/trajectory I/O + ATE evaluation tests against generated
files (no network; SURVEY.md §4.5)."""

import os

import numpy as np
import pytest

from tsdfjax.io import tum
from tsdfjax import synthetic as syn


def write_fake_tum(root, n=5, w=32, h=24):
    from PIL import Image

    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    depth_lines = ["# depth maps", "# file: fake", "# timestamp filename"]
    rgb_lines = ["# color images", "# file: fake", "# timestamp filename"]
    rng = np.random.default_rng(0)
    for i in range(n):
        t = 1000.0 + i * 0.033
        d = (rng.uniform(0.5, 3.0, (h, w)) * 5000).astype(np.uint16)
        Image.fromarray(d, mode="I;16").save(os.path.join(root, f"depth/{i}.png"))
        depth_lines.append(f"{t:.6f} depth/{i}.png")
        c = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(c).save(os.path.join(root, f"rgb/{i}.png"))
        # rgb timestamps slightly offset, like real TUM data
        rgb_lines.append(f"{t + 0.012:.6f} rgb/{i}.png")
    with open(os.path.join(root, "depth.txt"), "w") as f:
        f.write("\n".join(depth_lines) + "\n")
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("\n".join(rgb_lines) + "\n")


class TestDataset:
    def test_reads_frames_and_associates(self, tmp_path):
        write_fake_tum(str(tmp_path))
        ds = tum.TumDataset(str(tmp_path))
        assert len(ds) == 5
        fr = ds[2]
        assert fr.depth_m.shape == (24, 32)
        assert fr.depth_m.max() <= 3.01 and fr.depth_m.min() >= 0.49
        assert fr.rgb.shape == (24, 32, 3)
        assert abs(fr.rgb_timestamp - fr.timestamp - 0.012) < 1e-6

    def test_depth_factor(self, tmp_path):
        write_fake_tum(str(tmp_path))
        ds = tum.TumDataset(str(tmp_path), depth_factor=1000.0)
        assert ds[0].depth_m.max() > 2.0  # 5x larger than with 5000

    def test_resize_halves(self, tmp_path):
        write_fake_tum(str(tmp_path))
        ds = tum.TumDataset(str(tmp_path), target_size=(16, 12))
        fr = ds[0]
        assert fr.depth_m.shape == (12, 16)
        assert fr.rgb.shape == (12, 16, 3)


class TestTrajectory:
    def test_write_read_roundtrip(self, tmp_path):
        path = str(tmp_path / "traj.txt")
        poses = syn.orbit_trajectory(6)
        with tum.TrajectoryWriter(path) as wtr:
            for i, p in enumerate(poses):
                wtr.record(p, 1000.0 + i * 0.033)
        back = tum.read_trajectory(path)
        assert len(back) == 6
        for (t, p), orig in zip(back, poses):
            np.testing.assert_allclose(p[:3, 3], orig[:3, 3], atol=1e-5)
            np.testing.assert_allclose(p[:3, :3], orig[:3, :3], atol=1e-4)

    def test_groundtruth_provider_anchoring(self):
        poses = syn.orbit_trajectory(5)
        traj = [(1000.0 + 0.033 * i, p) for i, p in enumerate(poses)]
        init = np.eye(4, dtype=np.float32)
        init[:3, 3] = [1.0, 1.0, -0.3]
        prov = tum.GroundTruthPoseProvider(traj, init)
        p0 = prov.pose_at(1000.0, 0)
        np.testing.assert_allclose(p0, init, atol=1e-6)
        # relative motion must be preserved: refer @ file_k
        p2 = prov.pose_at(1000.066, 2)
        rel_gt = np.linalg.inv(poses[0]) @ poses[2]
        rel_est = np.linalg.inv(p0) @ p2
        np.testing.assert_allclose(rel_est, rel_gt, atol=1e-4)

    def test_nearest_timestamp(self):
        poses = syn.orbit_trajectory(5)
        traj = [(1000.0 + 0.1 * i, p) for i, p in enumerate(poses)]
        prov = tum.GroundTruthPoseProvider(traj, poses[0])
        prov.pose_at(1000.0, 0)
        # 1000.26 is nearest to 1000.3 entry
        p = prov.pose_at(1000.26, 3)
        refer = poses[0] @ np.linalg.inv(poses[0])
        np.testing.assert_allclose(p, refer @ poses[3], atol=1e-5)


class TestAte:
    def test_zero_for_identical(self):
        poses = syn.orbit_trajectory(10)
        traj = [(float(i), p) for i, p in enumerate(poses)]
        assert tum.ate_rmse(traj, traj) < 1e-6

    def test_invariant_to_rigid_offset(self):
        poses = syn.orbit_trajectory(10)
        gt = [(float(i), p) for i, p in enumerate(poses)]
        offset = syn.look_at(np.array([0.3, -0.2, 0.5]), np.array([1.0, 2.0, 3.0]))
        est = [(float(i), offset @ p) for i, p in enumerate(poses)]
        assert tum.ate_rmse(est, gt) < 1e-5

    def test_detects_error(self):
        poses = syn.orbit_trajectory(10)
        gt = [(float(i), p) for i, p in enumerate(poses)]
        est = []
        rng = np.random.default_rng(0)
        for i, p in enumerate(poses):
            q = p.copy()
            q[:3, 3] += rng.normal(0, 0.05, 3)
            est.append((float(i), q))
        rmse = tum.ate_rmse(est, gt)
        assert 0.01 < rmse < 0.2


class TestPyrDown:
    def test_gaussian_kernel_semantics(self):
        """The resize filter is cv::pyrDown's 5-tap Gaussian, not a strided
        pick: a delta spreads into the binomial stencil."""
        img = np.zeros((16, 16), np.float32)
        img[8, 8] = 16.0
        out = tum.TumDataset._pyr_down(img)
        assert out.shape == (8, 8)
        # delta at (8,8) -> even output (4,4) gets k[2]^2 * 16 = (6/16)^2*16
        np.testing.assert_allclose(out[4, 4], (6 / 16) ** 2 * 16, rtol=1e-6)
        np.testing.assert_allclose(out[4, 3], (6 / 16) * (1 / 16) * 16, rtol=1e-6)
        np.testing.assert_allclose(out.sum(), 16.0 * 0.25, rtol=1e-2)

    def test_constant_preserved(self, tmp_path):
        write_fake_tum(str(tmp_path))
        ds = tum.TumDataset(str(tmp_path), target_size=(16, 12))
        fr = ds[0]
        assert fr.depth_m.shape == (12, 16)
        assert fr.rgb.shape == (12, 16, 3)
