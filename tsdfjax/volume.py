"""Dense TSDF voxel volume: struct-of-arrays pytree + sampling + fusion.

TPU-first redesign of the reference's tsdfvolume + integrate kernel
(SURVEY.md §2.4): instead of a ref-counted CudaMap2D of 16-byte Voxel
structs (tsdfVolume.h:14-19,34), the volume is a pytree of three dense
arrays — tsdf (R,R,R) f32, weight (R,R,R) f32, color (R,R,R,3) f32 —
indexed [x, y, z] with z innermost (contiguous lanes). All ops are pure
functions of (volume, ...) -> volume / samples; no singleton device state.

Semantics matched to the reference:
  - voxel center world pos = (i + 0.5) * voxel_size   (tsdfVolume.h:38-49)
  - world -> voxel = trunc toward zero                (tsdfVolume.h:50-56)
  - clamped nearest lookup                            (tsdfVolume.h:81-97)
  - trilinear interpolation from center-relative base voxel, *invalid if
    base is on the border or any of the 8 corners has weight 0*
    (tsdfVolume.h:98-120, 151-174)
  - weighted-average fusion with weight cap; color averaged against the
    tsdf weight exactly like updateVoxel (tsdfVolume.h:57-74)
  - integrate kernel semantics from integrateVolume.cu:29-76, except the
    reference's hardcoded 525/320/240 color intrinsics bug (cu:56-57) is
    fixed: the configured rgb camera is used.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tsdfjax.config import IntegrateConfig, VolumeConfig
from tsdfjax.geometry import (
    CameraIntrinsics,
    se3_inverse,
    transform_points,
)

Array = jnp.ndarray


class TsdfVolume(NamedTuple):
    """Volume state pytree. Static params (resolution/size) live in
    VolumeConfig, passed alongside."""

    tsdf: Array  # (R, R, R) float32, truncated signed distance in [-1, 1]
    weight: Array  # (R, R, R) float32, 0 = never observed
    color: Array  # (R, R, R, 3) float32 in [0, 255]


def allocate(cfg: VolumeConfig) -> TsdfVolume:
    r = cfg.resolution
    return TsdfVolume(
        tsdf=jnp.zeros((r, r, r), jnp.float32),
        weight=jnp.zeros((r, r, r), jnp.float32),
        color=jnp.zeros((r, r, r, 3), jnp.float32),
    )


# ---------------------------------------------------------------------------
# Coordinate transforms
# ---------------------------------------------------------------------------


def voxel_center_world(idx: Array, cfg: VolumeConfig) -> Array:
    """Integer voxel index (...,3) -> world position of the voxel center."""
    return (idx.astype(jnp.float32) + 0.5) * (cfg.size_m / cfg.resolution)


def world_to_voxel(pos: Array, cfg: VolumeConfig) -> Array:
    """World position (...,3) -> integer voxel index, truncation toward
    zero like the reference's (int) cast (tsdfVolume.h:50-56)."""
    scaled = pos * (cfg.resolution / cfg.size_m)
    return jnp.trunc(scaled).astype(jnp.int32)


def _gather(field: Array, ix: Array, iy: Array, iz: Array, x0=None) -> Array:
    """Clamped gather from a (X,Y,Z[,C]) field of GLOBAL voxel indices.

    `x0` (traced or static scalar) is the global voxel index of the local
    block's x=0 plane — used by the sharded path, where each device holds
    an x-slab (+halo) of the global volume. Indices are clamped to the
    local extent; callers mask out-of-slab reads via validity instead.
    """
    if x0 is not None:
        ix = ix - x0
    nx, ny, nz = field.shape[0], field.shape[1], field.shape[2]
    ix = jnp.clip(ix, 0, nx - 1)
    iy = jnp.clip(iy, 0, ny - 1)
    iz = jnp.clip(iz, 0, nz - 1)
    flat = (ix * ny + iy) * nz + iz
    if field.ndim == 3:
        return field.reshape(-1)[flat]
    return field.reshape(-1, field.shape[-1])[flat]


def sample_nearest(
    volume: TsdfVolume, pos: Array, cfg: VolumeConfig, x0=None
) -> tuple[Array, Array]:
    """Clamped nearest-voxel (tsdf, weight) at world positions (...,3)
    (tsdfVolume.h:81-97)."""
    idx = world_to_voxel(pos, cfg)
    ix, iy, iz = idx[..., 0], idx[..., 1], idx[..., 2]
    t = _gather(volume.tsdf, ix, iy, iz, x0)
    w = _gather(volume.weight, ix, iy, iz, x0)
    return t, w


def _interp_setup(pos: Array, cfg: VolumeConfig) -> tuple[Array, Array, Array]:
    """Base voxel + fractional coords for trilinear interpolation,
    matching getInterpolateParams (tsdfVolume.h:151-174).

    Returns (base (...,3) int32, frac (...,3) f32, in_bounds (...) bool).
    The base is shifted down by one when the position lies below the
    voxel's center, and in_bounds replicates the reference's border
    rejection evaluated on the PRE-shift voxel index.
    """
    res = cfg.resolution
    cell = cfg.size_m / res
    g = world_to_voxel(pos, cfg)
    in_bounds = jnp.all((g >= 1) & (g <= res - 2), axis=-1)
    center = (g.astype(jnp.float32) + 0.5) * cell
    base = jnp.where(pos < center, g - 1, g)
    frac = (pos - (base.astype(jnp.float32) + 0.5) * cell) / cell
    return base, frac, in_bounds


def _trilinear_field(
    field: Array, weight: Array, pos: Array, cfg: VolumeConfig, x0=None
) -> tuple[Array, Array]:
    """Shared trilinear core for tsdf (R,R,R) or color (R,R,R,3); the
    field may be a local x-slab with global-x origin `x0` (sharded path).

    valid = in-border AND all 8 corner weights > 0 (tsdfVolume.h:103-110).
    """
    base, frac, in_bounds = _interp_setup(pos, cfg)
    bx, by, bz = base[..., 0], base[..., 1], base[..., 2]
    a, b, c = frac[..., 0], frac[..., 1], frac[..., 2]

    value = None
    min_w = None
    for dx in (0, 1):
        wx = (1.0 - a) if dx == 0 else a
        for dy in (0, 1):
            wy = (1.0 - b) if dy == 0 else b
            for dz in (0, 1):
                wz = (1.0 - c) if dz == 0 else c
                f = _gather(field, bx + dx, by + dy, bz + dz, x0)
                w = _gather(weight, bx + dx, by + dy, bz + dz, x0)
                coeff = wx * wy * wz
                term = f * coeff[..., None] if field.ndim == 4 else f * coeff
                value = term if value is None else value + term
                min_w = w if min_w is None else jnp.minimum(min_w, w)

    valid = in_bounds & (min_w > 0)
    return value, valid


def sample_tsdf_trilinear(
    volume: TsdfVolume, pos: Array, cfg: VolumeConfig, x0=None
) -> tuple[Array, Array]:
    """Trilinear TSDF at world positions (...,3) -> (value, valid)."""
    return _trilinear_field(volume.tsdf, volume.weight, pos, cfg, x0)


def sample_color_trilinear(
    volume: TsdfVolume, pos: Array, cfg: VolumeConfig, x0=None
) -> tuple[Array, Array]:
    """Trilinear color at world positions (...,3) -> ((...,3), valid)."""
    return _trilinear_field(volume.color, volume.weight, pos, cfg, x0)


# ---------------------------------------------------------------------------
# TSDF fusion (the integrate op)
# ---------------------------------------------------------------------------


def integrate(
    volume: TsdfVolume,
    depth: Array,
    normals: Array,
    rgb: Array | None,
    pose: Array,
    depth_cam: CameraIntrinsics,
    rgb_cam: CameraIntrinsics,
    vol_cfg: VolumeConfig,
    integ_cfg: IntegrateConfig,
    color_angle_weight: bool = True,
    x0=None,
) -> tuple[TsdfVolume, Array]:
    """Fuse one depth (+color) frame into the volume. Returns
    (new_volume, updated_voxel_count).

    Fully data-parallel over all R³ voxels: project each voxel center into
    the camera, read the depth (one image gather), compute the projective
    SDF, and blend. Per integrateKernel (integrateVolume.cu:29-76):

      - voxel behind camera (z <= 0) -> skip
      - nearest pixel outside [1, cols-2]x[1, rows-2] -> skip
      - depth == 0 or depth >= max_integrate_dist -> skip
      - sdf = depth - z_cam; skip unless sdf > -trunc
      - tsdf_new = min(1, sdf / trunc), fused with weight 1, weight capped
      - color fused with weight 2 * (angle ? min(1, |n_z|/0.75) : 1)
        against the OLD tsdf weight in the blend denominator, exactly like
        updateVoxel (tsdfVolume.h:64-70)
    """
    res = vol_cfg.resolution
    t_inv = se3_inverse(pose)

    shape = volume.tsdf.shape  # (R,R,R) dense, or a local x-slab when sharded
    ix = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + (0 if x0 is None else x0)
    iy = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    cell = vol_cfg.size_m / res
    # voxel centers in camera frame (expanded transform to avoid a (R^3,3) stack)
    cx = (ix.astype(jnp.float32) + 0.5) * cell
    cy = (iy.astype(jnp.float32) + 0.5) * cell
    cz = (iz.astype(jnp.float32) + 0.5) * cell
    r00, r01, r02 = t_inv[0, 0], t_inv[0, 1], t_inv[0, 2]
    r10, r11, r12 = t_inv[1, 0], t_inv[1, 1], t_inv[1, 2]
    r20, r21, r22 = t_inv[2, 0], t_inv[2, 1], t_inv[2, 2]
    px = r00 * cx + r01 * cy + r02 * cz + t_inv[0, 3]
    py = r10 * cx + r11 * cy + r12 * cz + t_inv[1, 3]
    pz = r20 * cx + r21 * cy + r22 * cz + t_inv[2, 3]

    in_front = pz > 0
    zsafe = jnp.where(in_front, pz, 1.0)
    u = jnp.floor(px * depth_cam.fx / zsafe + depth_cam.cx + 0.5).astype(jnp.int32)
    v = jnp.floor(py * depth_cam.fy / zsafe + depth_cam.cy + 0.5).astype(jnp.int32)
    in_img = (u >= 1) & (u < depth_cam.width - 1) & (v >= 1) & (v < depth_cam.height - 1)

    uc = jnp.clip(u, 0, depth_cam.width - 1)
    vc = jnp.clip(v, 0, depth_cam.height - 1)
    flat = vc * depth_cam.width + uc
    d = depth.reshape(-1)[flat]

    trunc = integ_cfg.sdf_trunc_m
    sdf = d - pz
    update = (
        in_front
        & in_img
        & (d != 0)
        & (d < integ_cfg.max_integrate_dist_m)
        & (sdf > -trunc)
    )

    tsdf_new = jnp.minimum(1.0, sdf / trunc)
    w_old = volume.weight
    w_new = jnp.where(update, jnp.minimum(w_old + 1.0, vol_cfg.max_weight), w_old)
    denom = jnp.maximum(w_old + 1.0, 1e-30)
    tsdf_fused = (volume.tsdf * w_old + tsdf_new) / denom
    tsdf_out = jnp.where(update, tsdf_fused, volume.tsdf)

    if rgb is not None:
        # color pixel through the CONFIGURED rgb intrinsics (fixing the
        # reference's hardcoded 525/320/240 at integrateVolume.cu:56-57)
        cu = jnp.trunc(px * rgb_cam.fx / zsafe + rgb_cam.cx).astype(jnp.int32)
        cvv = jnp.trunc(py * rgb_cam.fy / zsafe + rgb_cam.cy).astype(jnp.int32)
        color_in_img = (
            (cu >= 1) & (cu < rgb_cam.width - 1) & (cvv >= 1) & (cvv < rgb_cam.height - 1)
        )
        cuc = jnp.clip(cu, 0, rgb_cam.width - 1)
        cvc = jnp.clip(cvv, 0, rgb_cam.height - 1)
        cflat = cvc * rgb_cam.width + cuc
        pix_color = rgb.reshape(-1, 3)[cflat].astype(jnp.float32)

        # normal z looked up at the DEPTH pixel (integrateVolume.cu:51)
        nz = normals[..., 2].reshape(-1)[flat]
        if color_angle_weight:
            w_color = jnp.minimum(1.0, jnp.abs(nz) / 0.75) * 2.0
        else:
            w_color = jnp.full_like(nz, 2.0)
        c_update = update & color_in_img
        cdenom = jnp.maximum(w_old + w_color, 1e-30)
        color_fused = jnp.minimum(
            255.0,
            (volume.color * w_old[..., None] + pix_color * w_color[..., None])
            / cdenom[..., None],
        )
        color_out = jnp.where(c_update[..., None], color_fused, volume.color)
        # reference skips the whole voxel update if the color pixel is out
        # of the rgb image when color is on (integrateVolume.cu:59-62)
        tsdf_out = jnp.where(color_in_img, tsdf_out, volume.tsdf)
        w_new = jnp.where(color_in_img, w_new, volume.weight)
        update = c_update
    else:
        color_out = volume.color

    count = jnp.sum(update.astype(jnp.int32))
    return TsdfVolume(tsdf=tsdf_out, weight=w_new, color=color_out), count
