"""Per-frame depth/vertex/normal map ops, fully vectorized for XLA.

TPU-first re-expression of the reference's image kernels (SURVEY.md §2.4):
  - depth truncation:       DataPreprocesser.cu:17-36
  - bilateral filter:       DataPreprocesser.cu:37-79 (keeps the 5σ
                            outlier bail-out at cu:66-69)
  - depth -> vertex map:    VerticesNormalsCalculater.cu:15-32
  - vertex -> normal map:   VerticesNormalsCalculater.cu:35-66
  - 2x2 pyramid downsample: sample.cu:16-60 (the reference's swapped
                            <<<block,grid>>> launch bug is fixed by
                            construction here)

Conventions: depth maps are (H, W) float32 meters with 0 = invalid;
vertex maps are (H, W, 3) with z == 0 marking invalid; normal maps are
(H, W, 3) with the zero vector marking invalid. The reference carries a
w component on GPU (float4) purely for validity — here validity is
encoded in z / zero-ness, which is equivalent for every consumer.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from tsdfjax.geometry import CameraIntrinsics, pixel_grid, unproject

Array = jnp.ndarray


def truncate_depth(depth: Array, min_trunc: float, max_trunc: float) -> Array:
    """Zero out depth outside the open interval (min, max)."""
    keep = (depth > min_trunc) & (depth < max_trunc)
    return jnp.where(keep, depth, 0.0)


def bilateral_filter(depth: Array, sigma_pixel: float, sigma_depth: float) -> Array:
    """Edge-preserving depth smoothing with reference semantics:

    - window radius = ceil(2 * sigma_pixel)
    - zero-depth neighbors are skipped
    - if ANY in-window nonzero neighbor deviates more than 5*sigma_depth
      from the center value, the center keeps its raw value (the
      reference's early return, DataPreprocesser.cu:66-69)
    - zero centers stay zero

    Implemented as a static unrolled stencil over the (2r+1)^2 window;
    XLA fuses the shifts into a single pass. No gathers.
    """
    radius = int(math.ceil(2.0 * sigma_pixel))
    inv_sigma_space2_half = 0.5 / (sigma_pixel * sigma_pixel)
    inv_sigma_depth2_half = 0.5 / (sigma_depth * sigma_depth)
    h, w = depth.shape

    # Pad with zeros: out-of-image neighbors behave like invalid (skipped),
    # which matches the reference's window clamping (zero contributions).
    padded = jnp.pad(depth, radius)

    sum_w = jnp.zeros_like(depth)
    sum_wv = jnp.zeros_like(depth)
    outlier = jnp.zeros(depth.shape, dtype=bool)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            nb = jax.lax.dynamic_slice(padded, (dy + radius, dx + radius), (h, w))
            valid = nb != 0.0
            diff = nb - depth
            outlier = outlier | (valid & (jnp.abs(diff) > 5.0 * sigma_depth))
            space2 = float(dx * dx + dy * dy)
            weight = jnp.exp(
                -(space2 * inv_sigma_space2_half + diff * diff * inv_sigma_depth2_half)
            )
            weight = jnp.where(valid, weight, 0.0)
            sum_w = sum_w + weight
            sum_wv = sum_wv + weight * nb

    filtered = jnp.where(sum_w > 0, sum_wv / jnp.maximum(sum_w, 1e-30), depth)
    keep_raw = (depth == 0.0) | outlier
    return jnp.where(keep_raw, depth, filtered)


def depth_to_vertices(depth: Array, cam: CameraIntrinsics) -> Array:
    """Unproject a depth map into a camera-space vertex map (H, W, 3);
    invalid (zero-depth) pixels map to the zero vertex."""
    u, v = pixel_grid(cam)
    verts = unproject(u, v, depth, cam)
    return jnp.where(depth[..., None] > 0, verts, 0.0)


def vertices_to_normals(vertices: Array) -> Array:
    """Central-difference normals n = normalize(cross(v_up - v_down,
    v_right - v_left)); border pixels and pixels with any invalid
    neighbor (or invalid center) get the zero normal.

    "up" is row+1 and "down" is row-1, matching the reference's indexing
    (VerticesNormalsCalculater.cu:44-62).
    """
    v_r = jnp.roll(vertices, -1, axis=1)
    v_l = jnp.roll(vertices, 1, axis=1)
    v_u = jnp.roll(vertices, -1, axis=0)
    v_d = jnp.roll(vertices, 1, axis=0)
    n = jnp.cross(v_u - v_d, v_r - v_l)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-30)

    h, w = vertices.shape[:2]
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = (row > 0) & (row < h - 1) & (col > 0) & (col < w - 1)
    valid = (
        (vertices[..., 2] != 0)
        & (v_r[..., 2] != 0)
        & (v_l[..., 2] != 0)
        & (v_u[..., 2] != 0)
        & (v_d[..., 2] != 0)
        & interior
        & (norm[..., 0] > 0)
    )
    return jnp.where(valid[..., None], n, 0.0)


def _sum2x2(x: Array) -> Array:
    """2x2/stride-2 window sum. reduce_window hits the TPU's optimized
    pooling path; the naive four stride-2 slices cost ~14x more HBM time
    (strided slicing defeats the (8,128) tiling)."""
    win = (2, 2) + (1,) * (x.ndim - 2)
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, win, win, "VALID")


def _all2x2(valid: Array) -> Array:
    """True where all 4 source pixels of the 2x2 block are True."""
    f = jax.lax.reduce_window(
        valid.astype(jnp.float32), 1.0, jax.lax.min, (2, 2), (2, 2), "VALID"
    )
    return f > 0.0


def subsample_pick(x: Array, s: int) -> Array:
    """x[::s, ::s] without strided slicing: reshape into s-blocks and pick
    the (0,0) element (fast path for the ICP source subsample)."""
    if s == 1:
        return x
    h, w = x.shape[:2]
    r = x.reshape((h // s, s, w // s, s) + x.shape[2:])
    return r[:, 0, :, 0]


def downsample_vertices(vertices: Array) -> Array:
    """2x2 average; invalid if any of the 4 source vertices invalid
    (sample.cu:37-60)."""
    mean = _sum2x2(vertices) * 0.25
    valid = _all2x2(vertices[..., 2] != 0)
    return jnp.where(valid[..., None], mean, 0.0)


def downsample_normals(normals: Array) -> Array:
    """2x2 average then renormalize; invalid if any source normal is the
    zero vector (sample.cu:16-35)."""
    mean = _sum2x2(normals) * 0.25
    norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
    unit = mean / jnp.maximum(norm, 1e-30)
    valid = _all2x2(jnp.any(normals != 0.0, axis=-1)) & (norm[..., 0] > 0)
    return jnp.where(valid[..., None], unit, 0.0)


def build_pyramid(x: Array, levels: int, downsample_fn) -> list[Array]:
    """[level0, level1, ...] with level0 = x."""
    out = [x]
    for _ in range(levels - 1):
        out.append(downsample_fn(out[-1]))
    return out


@partial(jax.jit, static_argnames=("cam", "min_trunc", "max_trunc", "sigma_pixel", "sigma_depth"))
def preprocess_depth(
    depth_m: Array,
    cam: CameraIntrinsics,
    min_trunc: float,
    max_trunc: float,
    sigma_pixel: float,
    sigma_depth: float,
) -> tuple[Array, Array, Array, Array]:
    """Full preprocessing chain of the reference
    (HybKinectfu.cpp:106-110): truncate -> bilateral filter -> vertex map
    -> normal map. Returns (trunced, filtered, vertices, normals).

    The vertex map comes from the FILTERED depth while integration later
    uses the TRUNCED depth, exactly as in the reference
    (VerticesNormalsCalculater.cu:69, integrateVolume.cu:80).
    """
    trunced = truncate_depth(depth_m, min_trunc, max_trunc)
    filtered = bilateral_filter(trunced, sigma_pixel, sigma_depth)
    vertices = depth_to_vertices(filtered, cam)
    normals = vertices_to_normals(vertices)
    return trunced, filtered, vertices, normals
