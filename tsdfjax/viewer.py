"""Debug visualization: file-based equivalents of the reference's
DataViewer cv::imshow windows (DataViewer.cpp:13-58) — headless TPU hosts
have no display, so normals/depth/color render to PNG instead.
"""

from __future__ import annotations

import os

import numpy as np


def normal_to_rgb(normals: np.ndarray) -> np.ndarray:
    """[-1,1] normals -> RGB (DataViewer::viewNormal semantics); invalid
    (zero) normals -> black."""
    n = np.asarray(normals, np.float32)
    rgb = ((n + 1.0) * 0.5 * 255.0).astype(np.uint8)
    invalid = np.all(n == 0.0, axis=-1)
    rgb[invalid] = 0
    return rgb


def depth_to_gray(depth: np.ndarray) -> np.ndarray:
    """depth normalized to its max -> grayscale (DataViewer::viewDepths)."""
    d = np.asarray(depth, np.float32)
    m = d.max()
    if m <= 0:
        return np.zeros(d.shape, np.uint8)
    return (d / m * 255.0).astype(np.uint8)


def save_image(arr: np.ndarray, path: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)


def dump_frame_debug(out_dir: str, frame_id: int, depth=None, normals=None, color=None,
                     model_normals=None, model_color=None) -> None:
    """Dump the same views the reference opens as windows
    (HybKinectfu.cpp:104-158)."""
    if depth is not None:
        save_image(depth_to_gray(depth), f"{out_dir}/depth_{frame_id:05d}.png")
    if normals is not None:
        save_image(normal_to_rgb(normals), f"{out_dir}/normals_{frame_id:05d}.png")
    if color is not None:
        save_image(np.clip(color, 0, 255).astype(np.uint8), f"{out_dir}/rgb_{frame_id:05d}.png")
    if model_normals is not None:
        save_image(normal_to_rgb(model_normals), f"{out_dir}/model_normals_{frame_id:05d}.png")
    if model_color is not None:
        save_image(
            np.clip(model_color, 0, 255).astype(np.uint8),
            f"{out_dir}/raycast_rgb_{frame_id:05d}.png",
        )


def save_vector_map(arr: np.ndarray, path: str) -> None:
    """Text dump of an (H, W, C) vector map, one 'row col v0 v1 ...' line
    per pixel — the debugging dump of DataIO::saveVector4fMap2D
    (DataIO.cpp:10-34)."""
    arr = np.asarray(arr)
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w, -1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(f"# rows {h} cols {w} channels {flat.shape[2]}\n")
        for r in range(h):
            for c in range(w):
                vals = " ".join(f"{v:.6f}" for v in flat[r, c])
                f.write(f"{r} {c} {vals}\n")
