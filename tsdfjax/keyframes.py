"""Keyframe manager: bounded store of (rgb, depth, pose) snapshots.

Replaces the reference's KeyframeMan singleton (keyframeMan.h:27-78):
a keyframe every `interval` frames (the reference hardcodes every 100th,
HybKinectfu.cpp:125-128), bounded deque of `max_keyframes` (=50,
keyframeMan.h:74), dumped as keyframe_rgb%d.png / keyframe_depth%d.png
plus an index file of poses (keyframeMan.h:45-70). Poses are written in
TUM quaternion form rather than raw 4x4 rows for interoperability.
"""

from __future__ import annotations

import os
from collections import deque
from dataclasses import dataclass

import numpy as np


@dataclass
class Keyframe:
    frame_id: int
    timestamp: float
    pose: np.ndarray  # (4,4) camera-to-world
    depth_m: np.ndarray | None
    rgb: np.ndarray | None  # (H,W,3) float 0..255


class KeyframeManager:
    def __init__(self, max_keyframes: int = 50, interval: int = 100):
        self.max_keyframes = max_keyframes
        self.interval = interval
        self._frames: deque[Keyframe] = deque(maxlen=max_keyframes)

    def __len__(self) -> int:
        return len(self._frames)

    def __iter__(self):
        return iter(self._frames)

    def maybe_add(self, frame_id: int, timestamp: float, pose, depth_m=None, rgb=None) -> bool:
        """Add if frame_id hits the keyframe interval (frame 0 included,
        like the reference's frameId % 100 == 0)."""
        if frame_id % self.interval != 0:
            return False
        self.add(frame_id, timestamp, pose, depth_m, rgb)
        return True

    def add(self, frame_id: int, timestamp: float, pose, depth_m=None, rgb=None) -> None:
        self._frames.append(
            Keyframe(
                frame_id=frame_id,
                timestamp=timestamp,
                pose=np.asarray(pose, np.float32).copy(),
                depth_m=None if depth_m is None else np.asarray(depth_m, np.float32).copy(),
                rgb=None if rgb is None else np.asarray(rgb, np.float32).copy(),
            )
        )

    @property
    def last(self) -> Keyframe | None:
        return self._frames[-1] if self._frames else None

    def write_to_dir(self, out_dir: str) -> str:
        """PNG + pose-index dump (keyframeMan.h:45-70). Returns the index
        file path."""
        from PIL import Image

        from tsdfjax.geometry import rotation_to_quaternion
        import jax.numpy as jnp

        os.makedirs(out_dir, exist_ok=True)
        index_path = os.path.join(out_dir, "idx.txt")
        with open(index_path, "w") as idx:
            idx.write("# keyframes: frame_id timestamp tx ty tz qx qy qz qw\n")
            for kf in self._frames:
                if kf.rgb is not None:
                    Image.fromarray(np.clip(kf.rgb, 0, 255).astype(np.uint8)).save(
                        os.path.join(out_dir, f"keyframe_rgb{kf.frame_id}.png")
                    )
                if kf.depth_m is not None:
                    d16 = np.clip(kf.depth_m * 5000.0, 0, 65535).astype(np.uint16)
                    Image.fromarray(d16, mode="I;16").save(
                        os.path.join(out_dir, f"keyframe_depth{kf.frame_id}.png")
                    )
                q = np.asarray(rotation_to_quaternion(jnp.array(kf.pose[:3, :3])))
                t = kf.pose[:3, 3]
                idx.write(
                    f"{kf.frame_id} {kf.timestamp:.6f} "
                    f"{t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                    f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
                )
        return index_path
