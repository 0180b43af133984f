"""TUM RGB-D dataset + trajectory I/O and ATE evaluation.

Replaces the reference's dataset reader, trajectory recorder and
ground-truth tracker file plumbing with plain-Python equivalents:

  - dataset reading (depth.txt/rgb.txt, 3 header lines skipped,
    16-bit depth PNG / depth_factor -> meters, nearest-timestamp rgb
    association): DataSourceProducerRGBDDataset.cpp:10-120
  - trajectory recording ("timestamp tx ty tz qx qy qz qw", 3 '#'
    header lines): TrajectoryRecorder.cpp:10-43
  - ground-truth pose playback with nearest-timestamp lookup and
    frame-0 anchoring refer = pose0 @ file0^-1:
    CameraPoseFinderFromFile.cpp:21-89
  - ATE evaluation: the TUM benchmark's absolute trajectory error via
    Horn/Umeyama alignment (the reference relied on the external TUM
    tools; we bundle it, SURVEY.md §4.5).

The reference divides depth PNGs by its `_depth_factor = 5` after
OpenCV's 16-bit load — i.e. the TUM 5000-per-meter convention combined
with its mm->m copy (HybKinectfu.cpp:73). Here depth_factor is per the
TUM standard: meters = png_value / 5000.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


# ---------------------------------------------------------------------------
# Dataset reading
# ---------------------------------------------------------------------------


def _parse_assoc_file(path: str) -> list[tuple[float, str]]:
    """Parse a TUM index file (`timestamp filename` lines, '#' comments)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            out.append((float(parts[0]), parts[1]))
    return out


def _associate(
    depth: list[tuple[float, str]], rgb: list[tuple[float, str]]
) -> list[tuple[float, str, float, str]]:
    """For each depth frame, the nearest-timestamp rgb frame (the
    reference's seek-back two-pointer scan,
    DataSourceProducerRGBDDataset.cpp:66-101)."""
    out = []
    j = 0
    for t_d, f_d in depth:
        while j + 1 < len(rgb) and abs(rgb[j + 1][0] - t_d) <= abs(rgb[j][0] - t_d):
            j += 1
        out.append((t_d, f_d, rgb[j][0], rgb[j][1]))
    return out


def load_depth_png(path: str, depth_factor: float = 5000.0) -> np.ndarray:
    """16-bit depth PNG -> float32 meters, 0 = invalid."""
    from PIL import Image

    img = np.asarray(Image.open(path), dtype=np.float32)
    return img / depth_factor


def load_rgb_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)


@dataclass
class TumFrame:
    index: int
    timestamp: float
    depth_m: np.ndarray  # (H, W) float32 meters
    rgb: np.ndarray | None  # (H, W, 3) float32 0..255
    rgb_timestamp: float | None


class TumDataset:
    """Iterates a TUM RGB-D sequence directory (depth/, rgb/, depth.txt,
    rgb.txt, groundtruth.txt)."""

    def __init__(
        self,
        root: str,
        with_rgb: bool = True,
        depth_factor: float = 5000.0,
        target_size: tuple[int, int] | None = None,
    ):
        self.root = root
        self.depth_factor = depth_factor
        self.with_rgb = with_rgb
        self.target_size = target_size  # (width, height) or None
        depth_list = _parse_assoc_file(os.path.join(root, "depth.txt"))
        if with_rgb and os.path.exists(os.path.join(root, "rgb.txt")):
            rgb_list = _parse_assoc_file(os.path.join(root, "rgb.txt"))
            self.assoc = _associate(depth_list, rgb_list)
        else:
            self.assoc = [(t, f, None, None) for t, f in depth_list]

    def __len__(self) -> int:
        return len(self.assoc)

    @staticmethod
    def _pyr_down(img: np.ndarray, is_depth: bool = False) -> np.ndarray:
        """One cv::pyrDown step: separable 5-tap Gaussian [1,4,6,4,1]/16
        with edge-reflect borders, then decimate by 2 — the reference's
        resize filter (DataSourceProducerRGBDDataset.cpp:112-120 calls
        cv::pyrDown on both depth and rgb mats).

        DELIBERATE deviation for depth: the reference blurs invalid
        (0-depth) holes into their neighbors, creating phantom depths
        around discontinuities; here the Gaussian is validity-
        renormalized (zeros excluded from the average) and a pixel stays
        invalid when its decimation-grid source pixel is invalid."""
        k = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
        squeeze = img.ndim == 2
        x = img[..., None] if squeeze else img

        def blur(a):
            pad = np.pad(a, ((2, 2), (2, 2), (0, 0)), mode="reflect").astype(np.float64)
            rows = sum(k[i] * pad[i : i + a.shape[0], :, :] for i in range(5))
            return sum(k[i] * rows[:, i : i + a.shape[1], :] for i in range(5))

        if is_depth:
            valid = (x > 0).astype(np.float64)
            num = blur(x * valid)[::2, ::2]
            den = blur(valid)[::2, ::2]
            center_valid = x[::2, ::2] > 0
            out = np.where(center_valid & (den > 1e-9), num / np.maximum(den, 1e-9), 0.0)
        else:
            out = blur(x)[::2, ::2]
        return out[..., 0] if squeeze else out

    def _maybe_resize(self, img: np.ndarray, is_depth: bool) -> np.ndarray:
        """Gaussian pyrDown to the config resolution when it differs from
        the file resolution, like the reference
        (DataSourceProducerRGBDDataset.cpp:112-120)."""
        if self.target_size is None:
            return img
        tw, th = self.target_size
        h, w = img.shape[:2]
        if (w, h) == (tw, th):
            return img
        while h > th and w > tw and h % 2 == 0 and w % 2 == 0:
            img = self._pyr_down(img, is_depth=is_depth)
            h, w = img.shape[:2]
        if (w, h) != (tw, th):
            raise ValueError(f"cannot resize {(w, h)} -> {(tw, th)}")
        return img.astype(np.float32)

    def __getitem__(self, i: int) -> TumFrame:
        t_d, f_d, t_r, f_r = self.assoc[i]
        depth = load_depth_png(os.path.join(self.root, f_d), self.depth_factor)
        depth = self._maybe_resize(depth, is_depth=True)
        rgb = None
        if f_r is not None:
            rgb = self._maybe_resize(load_rgb_png(os.path.join(self.root, f_r)), False)
        return TumFrame(index=i, timestamp=t_d, depth_m=depth, rgb=rgb, rgb_timestamp=t_r)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


# ---------------------------------------------------------------------------
# Trajectory files
# ---------------------------------------------------------------------------


def read_trajectory(path: str) -> list[tuple[float, np.ndarray]]:
    """TUM trajectory file -> [(timestamp, 4x4 pose)]; quaternions are
    (qx, qy, qz, qw)."""
    from tsdfjax.geometry import quaternion_to_rotation

    import jax.numpy as jnp

    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(x) for x in line.split()]
            if len(vals) < 8:
                continue
            t, tx, ty, tz, qx, qy, qz, qw = vals[:8]
            r = np.asarray(quaternion_to_rotation(jnp.array([qx, qy, qz, qw], jnp.float32)))
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = r
            pose[:3, 3] = [tx, ty, tz]
            out.append((t, pose))
    return out


class TrajectoryWriter:
    """TUM-format writer with the reference's 3 '#' header lines
    (TrajectoryRecorder.cpp:14-16)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "w")
        self._f.write("# estimated trajectory (tsdfjax)\n")
        self._f.write("# format: TUM — timestamp tx ty tz qx qy qz qw\n")
        self._f.write("#\n")

    def record(self, pose: np.ndarray, timestamp: float) -> None:
        from tsdfjax.geometry import rotation_to_quaternion

        import jax.numpy as jnp

        q = np.asarray(rotation_to_quaternion(jnp.array(pose[:3, :3], jnp.float32)))
        t = pose[:3, 3]
        self._f.write(
            f"{timestamp:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
        )

    def close(self) -> None:
        self._f.close()

    def __enter__(self) -> "TrajectoryWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class GroundTruthPoseProvider:
    """The FromFile tracker's host side: nearest-timestamp ground-truth
    pose with frame-0 anchoring (CameraPoseFinderFromFile.cpp:32-88):
    refer = pose0 @ file0^-1; pose_k = refer @ file_k."""

    def __init__(self, path_or_list, initial_pose: np.ndarray):
        if isinstance(path_or_list, str):
            self._traj = read_trajectory(path_or_list)
        else:
            self._traj = list(path_or_list)
        if not self._traj:
            raise ValueError("empty ground-truth trajectory")
        self._times = np.array([t for t, _ in self._traj])
        self._initial = np.asarray(initial_pose, np.float32)
        self._refer: np.ndarray | None = None

    def pose_at(self, timestamp: float, frame_index: int) -> np.ndarray:
        i = int(np.argmin(np.abs(self._times - timestamp)))
        file_pose = self._traj[i][1]
        if frame_index == 0 or self._refer is None:
            self._refer = self._initial @ np.linalg.inv(file_pose)
            return self._initial
        return (self._refer @ file_pose).astype(np.float32)


# ---------------------------------------------------------------------------
# ATE evaluation (bundled replacement for the external TUM tools)
# ---------------------------------------------------------------------------


def align_horn(model: np.ndarray, data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Rigid alignment (rotation + translation, no scale) minimizing
    ||R @ model + t - data||² — Horn's closed-form method as used by the
    TUM benchmark's evaluate_ate.py. model/data: (N, 3)."""
    mu_m = model.mean(axis=0)
    mu_d = data.mean(axis=0)
    mc = model - mu_m
    dc = data - mu_d
    w = mc.T @ dc
    u, _, vt = np.linalg.svd(w)
    s = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s[2, 2] = -1
    r = vt.T @ s @ u.T
    t = mu_d - r @ mu_m
    return r, t


def ate_rmse(
    estimated: list[tuple[float, np.ndarray]],
    ground_truth: list[tuple[float, np.ndarray]],
    max_dt: float = 0.02,
) -> float:
    """Absolute trajectory error RMSE after timestamp association
    (closest within max_dt) and Horn alignment."""
    gt_times = np.array([t for t, _ in ground_truth])
    est_pts, gt_pts = [], []
    for t, pose in estimated:
        i = int(np.argmin(np.abs(gt_times - t)))
        if abs(gt_times[i] - t) > max_dt:
            continue
        est_pts.append(pose[:3, 3])
        gt_pts.append(ground_truth[i][1][:3, 3])
    if len(est_pts) < 2:
        raise ValueError("not enough associated poses for ATE")
    est = np.array(est_pts)
    gt = np.array(gt_pts)
    r, t = align_horn(est, gt)
    aligned = est @ r.T + t
    err = aligned - gt
    return float(np.sqrt((err**2).sum(axis=1).mean()))
