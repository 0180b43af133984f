"""Perspective shear-warp sweeps: gather-free integrate & raycast on the MXU.

Why: XLA TPU gathers cost ~8.5 ns/element, making the direct ports of the
reference's per-voxel/per-ray CUDA kernels gather-bound (integrate 174 ms,
raycast 593 ms at 640x480/256^3 on one v5e chip). This module removes the
gathers with the perspective shear-warp factorization (Lacroute-Levoy):

For a pinhole camera and a voxel slice k along a volume axis a, the
homogeneous projection of in-slice coords (i, j) is

    p~ = i*A + j*B + k*D + C0,   A = c*K*Rin*u_b, B = c*K*Rin*u_c,
                                 D = c*K*Rin*u_a, C0 = K*(Rin*(c/2*1) + tin)

Choosing the basis W = [A | B | D] and g0 = W^-1 C0 gives EXACTLY

    p~ = W * (i + alpha, j + beta, k + kappa),   (alpha,beta,kappa) = g0

so with gamma_k = k + kappa (gamma_k = 0 on the slice through the camera
center), the pixel of voxel (k,i,j) is pi(W * q~) with
q = ((i+alpha)/gamma_k, (j+beta)/gamma_k): a per-slice UNIFORM SCALE +
TRANSLATION of a regular grid, composed with ONE k-independent 2D
homography W. Therefore:

  - integrate: warp the image channels ONCE by W into "q-space"
    (one per-pixel gather), then resample the warped image onto every
    volume slice with two small matmuls whose interpolation matrices are
    built on the fly from iota (box = nearest / hat = bilinear). The
    projective SDF update is then fully elementwise.
  - raycast: resample each volume slice onto the fixed q grid with two
    matmuls (each q point IS one camera ray), run first-crossing
    compositing elementwise over slices (z_cam = gamma_k * w2(q) is
    monotonic in k per ray), and produce model maps with one final
    per-pixel nearest lookup of the packed intermediate fields.

The sweep axis is the volume axis most parallel to the view direction
(|cos| >= 1/sqrt(3)), selected at trace time via lax.switch over the
three transposes; ray sample spacing is <= sqrt(3) voxels — FINER than
the reference's 0.8*sdf_trunc march step.

Semantics deltas vs the exact path (tsdfjax.volume.integrate /
tsdfjax.raycast.raycast), all tested at tolerance:
  - integrate depth lookup is nearest-of-nearest (two-stage) instead of
    single-stage nearest: <= 1 px association difference at silhouettes;
  - voxels within one slice of the camera-center plane are skipped
    (free-space-only updates there);
  - raycast marches bilinear in-plane samples at slice crossings rather
    than nearest samples at fixed t steps (finer + smoother);
  - normals interpolate a precomputed central-difference gradient volume
    instead of differentiating the trilinear interpolant;
  - trilinear validity (all-8-corners-observed) is enforced via a swept
    validity channel with a 0.999 threshold.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tsdfjax.config import IntegrateConfig, VolumeConfig
from tsdfjax.geometry import CameraIntrinsics, se3_inverse
from tsdfjax.volume import TsdfVolume

Array = jnp.ndarray

# slices per compositing / projection scan step (tuned on v5e round 5:
# 8 beats 4 by ~15-20% on both ops at 256^3 with the fori-loop band
# clip; 16 regresses — VMEM pressure. Env overrides are a perf-tuning
# escape hatch for other volume scales)
RAYCAST_BSZ = int(os.environ.get("TSDFJAX_RAYCAST_BSZ", "8"))
INTEGRATE_BSZ = int(os.environ.get("TSDFJAX_INTEGRATE_BSZ", "8"))
# Max k-sweep sample spacing in voxels. A stride-S sweep can only step
# over a +/- crossing if the TSDF truncation band is narrower than S
# voxels, so the actual stride is derived per config at trace time by
# _raycast_stride below (e.g. the default config's band is 5.1 voxels ->
# stride 2, which is still 2x finer than the reference's 0.8*sdf_trunc
# (~4 voxel) march step, raycastingVolume.cu; 512^3 at the same 2 m /
# 0.04 m truncation has a 10.2-voxel band -> stride 4).
RAYCAST_STRIDE = 4


def _raycast_stride(vol_cfg: VolumeConfig, sdf_trunc_m: float | None) -> int:
    """Largest safe sweep stride for this STATIC config: the truncation
    band (sdf_trunc / voxel) must span >= 2*stride voxels so two adjacent
    sweep samples (<= stride*sqrt(3) voxels apart along the ray) cannot
    both miss the band around a crossing, and the resolution must tile
    evenly. Falls back to 1 (every slice) when the caller does not know
    the integration truncation."""
    if sdf_trunc_m is None:
        return 1
    band_vox = sdf_trunc_m / vol_cfg.voxel_size_m
    stride = RAYCAST_STRIDE
    while stride > 1 and not (
        band_vox >= 2 * stride and vol_cfg.resolution % stride == 0
    ):
        stride //= 2
    return stride


# ---------------------------------------------------------------------------
# factorization
# ---------------------------------------------------------------------------


class SweepGeom(NamedTuple):
    w: Array  # (3,3) the k-independent homography (columns A, B, D)
    w_inv: Array
    alpha: Array  # () in-slice i offset
    beta: Array  # () in-slice j offset
    kappa: Array  # () gamma_k = k + kappa
    rin: Array  # (3,3) world->camera rotation
    tin: Array  # (3,) world->camera translation
    u_a: Array  # (3,) world unit vector of the sweep axis
    u_b: Array
    u_c: Array


def _k_matrix(cam: CameraIntrinsics) -> Array:
    return jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]], jnp.float32
    )


def make_sweep_geom(pose: Array, cam: CameraIntrinsics, vol_cfg: VolumeConfig, axis: int) -> SweepGeom:
    """axis: STATIC sweep axis (0/1/2 of the volume's (x,y,z) layout)."""
    cell = vol_cfg.voxel_size_m
    t_inv = se3_inverse(pose)
    rin, tin = t_inv[:3, :3], t_inv[:3, 3]
    k_mat = _k_matrix(cam)
    axes = [0, 1, 2]
    b_ax, c_ax = [x for x in axes if x != axis]
    u = jnp.eye(3, dtype=jnp.float32)
    u_a, u_b, u_c = u[axis], u[b_ax], u[c_ax]
    m = k_mat @ rin
    a_col = cell * m @ u_b
    b_col = cell * m @ u_c
    d_col = cell * m @ u_a
    c0 = k_mat @ (rin @ (jnp.full(3, 0.5 * cell)) + tin)
    w = jnp.stack([a_col, b_col, d_col], axis=1)
    w_inv = jnp.linalg.inv(w)
    g0 = w_inv @ c0
    return SweepGeom(
        w=w, w_inv=w_inv, alpha=g0[0], beta=g0[1], kappa=g0[2],
        rin=rin, tin=tin, u_a=u_a, u_b=u_b, u_c=u_c,
    )


def pick_sweep_axis(pose: Array) -> Array:
    """Traced index of the volume axis most parallel to the camera's
    forward direction (pose column z)."""
    view = pose[:3, 2]
    return jnp.argmax(jnp.abs(view))


# ---------------------------------------------------------------------------
# interpolation-matrix resampling (the gather replacement)
# ---------------------------------------------------------------------------


# Nearest-selection tie-break epsilon (index units). Degenerate geometry
# (axis-aligned canonical pose + the regular pixel grid) lands MANY
# positions exactly on .5 selection boundaries; CPU and TPU compute the
# affine positions with different FMA contraction, so 1-ulp differences
# flip the ties differently per backend (measured: 2.7%% of integrate
# voxels picking the neighboring depth pixel -> a stable 3.1 mm hit
# shift on chip). Shifting the boundary off the representable tie makes
# selection deterministic across backends; 1e-4 px is far below any
# geometric signal.
_TIE_EPS = 1e-4


def _interp_matrix(positions: Array, n_src: int, mode: str) -> Array:
    """(n_out, n_src) matrix M with M[o, s] = weight of source sample s for
    output position positions[o] (in source-index units).

    mode='nearest': box (exactly one 1 per valid row);
    mode='linear' : hat (two nonzeros). Rows whose position falls outside
    [0, n_src-1] get all-zero (nearest) / partial (linear edge) weights —
    consumers detect this through a swept validity channel.
    """
    src = jax.lax.broadcasted_iota(jnp.float32, (positions.shape[0], n_src), 1)
    d = src - positions[:, None]
    if mode == "nearest":
        return ((d >= -0.5 + _TIE_EPS) & (d < 0.5 + _TIE_EPS)).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def resample_slice(
    src: Array, rows_pos: Array, cols_pos: Array, mode: str, dtype=jnp.float32
) -> Array:
    """src (C, H, W) resampled at the separable grid rows_pos (n_i) x
    cols_pos (n_j) -> (C, n_i, n_j). Two MXU matmuls; no gathers.

    dtype=bfloat16 runs the matmuls with bf16 operands and f32
    accumulation: fine for tsdf/gradient channels in [-1,1] (<=0.4%
    weight rounding), NOT for metric depth values."""
    c, h, w = src.shape
    mi = _interp_matrix(rows_pos, h, mode).astype(dtype)  # (n_i, H)
    mj = _interp_matrix(cols_pos, w, mode).astype(dtype)  # (n_j, W)
    src = src.astype(dtype)
    tmp = jnp.einsum(
        "ih,chw->ciw", mi, src, preferred_element_type=jnp.float32
    ).astype(dtype)
    return jnp.einsum(
        "jw,ciw->cij", mj, tmp, preferred_element_type=jnp.float32
    )


def _interp_matrix_b(positions: Array, n_src: int, mode: str) -> Array:
    """Batched _interp_matrix: positions (B, n_out) -> (B, n_out, n_src)."""
    b, n_out = positions.shape
    src = jax.lax.broadcasted_iota(jnp.float32, (b, n_out, n_src), 2)
    d = src - positions[..., None]
    if mode == "nearest":
        return ((d >= -0.5 + _TIE_EPS) & (d < 0.5 + _TIE_EPS)).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def resample_slices_batched(
    src: Array, rows_pos: Array, cols_pos: Array, mode: str, dtype=jnp.float32
) -> Array:
    """Shared-source batched resample: src (C, H, W), rows_pos (B, n_i),
    cols_pos (B, n_j) -> (B, C, n_i, n_j). Used to process several sweep
    slices per scan step (fewer sequential steps, fatter matmuls).

    With mode='nearest' the interpolation matrices are exactly 0/1, so
    dtype=bfloat16 is EXACT selection of bf16-representable values (used
    with hi/lo-split f32 channels for full-precision metric depth)."""
    mi = _interp_matrix_b(rows_pos, src.shape[1], mode).astype(dtype)  # (B, n_i, H)
    mj = _interp_matrix_b(cols_pos, src.shape[2], mode).astype(dtype)  # (B, n_j, W)
    src = src.astype(dtype)
    tmp = jnp.einsum(
        "bih,chw->bciw", mi, src, preferred_element_type=jnp.float32
    ).astype(dtype)
    return jnp.einsum("bjw,bciw->bcij", mj, tmp, preferred_element_type=jnp.float32)


def resample_slices_batched_src(
    src: Array, rows_pos: Array, cols_pos: Array, mode: str, dtype=jnp.float32
) -> Array:
    """Per-slice-source batched resample: src (B, C, H, W), rows_pos
    (B, n_i), cols_pos (B, n_j) -> (B, C, n_i, n_j)."""
    mi = _interp_matrix_b(rows_pos, src.shape[2], mode).astype(dtype)
    mj = _interp_matrix_b(cols_pos, src.shape[3], mode).astype(dtype)
    src = src.astype(dtype)
    tmp = jnp.einsum(
        "bih,bchw->bciw", mi, src, preferred_element_type=jnp.float32
    ).astype(dtype)
    return jnp.einsum("bjw,bciw->bcij", mj, tmp, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# image -> volume projection (the integrate direction)
# ---------------------------------------------------------------------------


def _warp_image_to_q(
    channels: Array, geom: SweepGeom, q_grid, mode: str = "nearest",
    dtype=jnp.float32,
) -> Array:
    """channels (C, H, W) -> warped (C, Qh, Qw) with warped[:, gi, gj] =
    channels at pixel pi(W * (q1(gi), q2(gj), 1)). One per-pixel gather
    (Qh*Qw elements), once per frame.

    PERF NOTE (round 5, measured): leave the gather formulation alone.
    XLA already sinks the downstream bf16 cast before this gather and
    emits one bf16-pair-per-word gather (1.7 ms at 640x480/256^3).
    Both "optimizations" tried made it slower: a manual bitcast-packed
    1-D word gather hit the serial T(1024) path (3.0 ms) and an
    explicit pre-gather astype(bf16) broke the fusion (integrate chain
    4.1 -> 6.6 ms). The `dtype` param is accepted for signature
    stability but intentionally unused here."""
    c, h, w = channels.shape
    q1_0, q1_s, q2_0, q2_s, qh, qw = q_grid
    gi = jnp.arange(qh, dtype=jnp.float32)
    gj = jnp.arange(qw, dtype=jnp.float32)
    q1 = q1_0 + gi / q1_s
    q2 = q2_0 + gj / q2_s
    # homogeneous pixel = W @ (q1, q2, 1)
    p = (
        geom.w[:, 0][:, None, None] * q1[None, :, None]
        + geom.w[:, 1][:, None, None] * q2[None, None, :]
        + geom.w[:, 2][:, None, None]
    )  # (3, Qh, Qw)
    z = p[2]
    zsafe = jnp.where(jnp.abs(z) < 1e-20, 1e-20, z)
    u = p[0] / zsafe
    v = p[1] / zsafe
    ui = jnp.floor(u + 0.5 + _TIE_EPS).astype(jnp.int32)
    vi = jnp.floor(v + 0.5 + _TIE_EPS).astype(jnp.int32)
    # reference integrate rejects the outermost pixel ring (cu:43)
    in_img = (ui >= 1) & (ui < w - 1) & (vi >= 1) & (vi < h - 1)
    flat = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
    vals = channels.reshape(c, -1)[:, flat]
    return jnp.where(in_img[None], vals, 0.0)


def _q_grid_for(geom: SweepGeom, cam: CameraIntrinsics, res: int, qh: int, qw: int):
    """Affine q -> grid-index map (traced) for a STATIC (qh, qw) grid.

    The useful q domain is the image rectangle's footprint under W^-1
    intersected with the voxel-side q range over slices at least one
    slice away from the camera plane; we take the image footprint (it
    bounds everything the warp can see) with a small margin, falling
    back to a unit window if the horizon degenerates it.
    """
    corners = jnp.array(
        [[0.0, 0.0, 1.0], [cam.width - 1.0, 0.0, 1.0],
         [0.0, cam.height - 1.0, 1.0], [cam.width - 1.0, cam.height - 1.0, 1.0]],
        jnp.float32,
    )
    qc = corners @ geom.w_inv.T  # (4, 3)
    wz = qc[:, 2]
    ok = jnp.all(jnp.abs(wz) > 1e-8) & (jnp.all(wz > 0) | jnp.all(wz < 0))
    wz_safe = jnp.where(jnp.abs(wz) < 1e-8, 1e-8, wz)
    q1c = qc[:, 0] / wz_safe
    q2c = qc[:, 1] / wz_safe
    margin = 0.02
    q1_min = jnp.min(q1c); q1_max = jnp.max(q1c)
    q2_min = jnp.min(q2c); q2_max = jnp.max(q2c)
    d1 = jnp.maximum(q1_max - q1_min, 1e-6)
    d2 = jnp.maximum(q2_max - q2_min, 1e-6)
    q1_0 = jnp.where(ok, q1_min - margin * d1, 0.0)
    q2_0 = jnp.where(ok, q2_min - margin * d2, 0.0)
    q1_s = jnp.where(ok, (qh - 1) / (d1 * (1 + 2 * margin)), 1.0)  # grid per q
    q2_s = jnp.where(ok, (qw - 1) / (d2 * (1 + 2 * margin)), 1.0)
    return (q1_0, q1_s, q2_0, q2_s, qh, qw)


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def _round128(x: int) -> int:
    return -(-x // 128) * 128


def project_image_to_volume(
    channels: Array,
    pose: Array,
    cam: CameraIntrinsics,
    vol_cfg: VolumeConfig,
    axis: int,
    mode: str = "nearest",
    q_oversample: float = 1.15,
    dtype=jnp.float32,
    k0: Array | int = 0,
    nk: int | None = None,
    i0: Array | int = 0,
    ni: int | None = None,
) -> Array:
    """channels (C, H, W) -> (C, nk, ni, R) in SWEEP-PERMUTED voxel layout
    [k, i, j] (axis `axis` first), where out[:, k, i, j] = channels at the
    pixel the voxel projects to (zeros when unusable). `axis` is static.

    `k0`/`i0` (traced) + `nk`/`ni` (static, default full resolution)
    restrict the output to a local window [k0, k0+nk) x [i0, i0+ni) of
    global sweep/in-slice indices — the x-sharded execution path, where
    each shard projects only into its own slab. The warp and the q grid
    stay global, so a shard's window is bitwise-identical to the same
    window of the dense output (the 'nearest' selection matmuls sum one
    nonzero per row).
    """
    c, h, w = channels.shape
    res = vol_cfg.resolution
    nk = res if nk is None else nk
    ni = res if ni is None else ni
    geom = make_sweep_geom(pose, cam, vol_cfg, axis)
    qh = _round8(int(h * q_oversample))
    qw = _round128(int(w * q_oversample))
    q_grid = _q_grid_for(geom, cam, res, qh, qw)
    warped = _warp_image_to_q(channels, geom, q_grid, mode, dtype=dtype)
    q1_0, q1_s, q2_0, q2_s, _, _ = q_grid

    ii = i0 + jnp.arange(ni, dtype=jnp.float32)
    jj = jnp.arange(res, dtype=jnp.float32)
    bsz = INTEGRATE_BSZ if nk % INTEGRATE_BSZ == 0 else 1  # slices per loop step
    nb = nk // bsz

    # ---- frustum clip (EXACT): slices whose q-grid footprint misses
    # [0, Qh-1] x [0, Qw-1] (or |gamma| < 1) resample to all zeros, so
    # the loop only visits the contiguous live block band. The frustum
    # is convex, so the live k interval is contiguous; footprint windows
    # come from the affine rows/cols endpoints. Typical orbit poses clip
    # 30-60% of the blocks.
    k_all = (k0 + jnp.arange(nk)).astype(jnp.float32)
    gamma_all = k_all + geom.kappa
    usable_all = jnp.abs(gamma_all) >= 1.0
    gsafe_all = jnp.where(usable_all, gamma_all, 1.0)
    r_a = (ii[0] + geom.alpha) / gsafe_all
    r_b = (ii[-1] + geom.alpha) / gsafe_all
    c_a = (jj[0] + geom.beta) / gsafe_all
    c_b = (jj[-1] + geom.beta) / gsafe_all
    r_lo = (jnp.minimum(r_a, r_b) - q1_0) * q1_s
    r_hi = (jnp.maximum(r_a, r_b) - q1_0) * q1_s
    c_lo = (jnp.minimum(c_a, c_b) - q2_0) * q2_s
    c_hi = (jnp.maximum(c_a, c_b) - q2_0) * q2_s
    # +-1 margin: 'linear' mode has partial edge weights one sample out
    live = usable_all & (
        (r_hi >= -1.0) & (r_lo <= qh + 0.0)
        & (c_hi >= -1.0) & (c_lo <= qw + 0.0)
    )
    live_b = jnp.any(live.reshape(nb, bsz), axis=1)
    any_live = jnp.any(live_b)
    blk_lo = jnp.where(any_live, jnp.argmax(live_b), 0).astype(jnp.int32)
    blk_hi = jnp.where(
        any_live, nb - jnp.argmax(live_b[::-1]), 0
    ).astype(jnp.int32)

    def compute_block(kb):
        gamma = kb.astype(jnp.float32) + geom.kappa  # (B,)
        usable = jnp.abs(gamma) >= 1.0
        gsafe = jnp.where(usable, gamma, 1.0)
        q1 = (ii[None, :] + geom.alpha) / gsafe[:, None]  # (B, ni)
        q2 = (jj[None, :] + geom.beta) / gsafe[:, None]
        rows = (q1 - q1_0) * q1_s
        cols = (q2 - q2_0) * q2_s
        out = resample_slices_batched(warped, rows, cols, mode, dtype)  # (B, C, ni, R)
        return jnp.where(usable[:, None, None, None], out, 0.0)

    # Output in `dtype`: with bf16 the matmul operands were already bf16
    # (src.astype in resample_slices_batched) and 'nearest' selection is
    # a single 1.0 x value product, so the f32 accumulator holds exactly
    # bf16-representable values — the cast is value-preserving while
    # halving the materialized channel traffic.
    # The 0.0 * (...) term stamps the shard-varying axes (k0 / i0) onto
    # the init so the fori_loop carry matches the body under shard_map.
    vary = 0.0 * (k_all[0] + ii[0])
    acc0 = (jnp.zeros((c, nk, ni, res), jnp.float32) + vary).astype(dtype)

    def body(b, acc):
        kb = k0 + b * bsz + jnp.arange(bsz)
        out = compute_block(kb).astype(dtype)  # (B, C, ni, R)
        return jax.lax.dynamic_update_slice(
            acc, jnp.swapaxes(out, 0, 1), (0, b * bsz, 0, 0)
        )

    return jax.lax.fori_loop(blk_lo, blk_hi, body, acc0)


# ---------------------------------------------------------------------------
# fast integrate
# ---------------------------------------------------------------------------


_PERMS = ((0, 1, 2), (1, 0, 2), (2, 0, 1))  # axis -> (k, i, j) volume axes
_INV_PERMS = tuple(
    tuple(sorted(range(3), key=lambda i, p=p: p[i])) for p in _PERMS
)


def _cam_affine(geom: SweepGeom, vol_cfg: VolumeConfig):
    """Coefficients of the affine map (k,i,j) -> camera-frame point."""
    cell = vol_cfg.voxel_size_m
    ca = cell * geom.rin @ geom.u_a
    cb = cell * geom.rin @ geom.u_b
    cc = cell * geom.rin @ geom.u_c
    c0 = geom.rin @ (jnp.full(3, 0.5 * cell)) + geom.tin
    return ca, cb, cc, c0


def _integrate_axis(
    volume_native: tuple[Array, Array, Array],
    depth: Array,
    normals: Array,
    rgb: Array | None,
    pose: Array,
    depth_cam: CameraIntrinsics,
    vol_cfg: VolumeConfig,
    integ_cfg: IntegrateConfig,
    color_angle_weight: bool,
    axis: int,
    k0: Array | int = 0,
    i0: Array | int = 0,
):
    """Integrate with STATIC sweep axis. The volume arrays stay in NATIVE
    (x, y, z) layout: only the projected image channels (2 bf16-pair
    channels depth-only) are un-permuted from sweep layout, so the f32
    tsdf/weight/color arrays are never transposed — at 512^3 that saves
    ~4 GB of HBM traffic per frame vs permuting the volume both ways.

    `k0`/`i0` are the (traced) global sweep/in-slice offsets of the given
    arrays — nonzero when the caller passes a shard's local slab."""
    tsdf, weight, color = volume_native
    perm = _PERMS[axis]
    inv = _INV_PERMS[axis]
    nk, ni, nj = (tsdf.shape[perm[0]], tsdf.shape[perm[1]], tsdf.shape[perm[2]])
    h, w = depth.shape
    geom = make_sweep_geom(pose, depth_cam, vol_cfg, axis)

    # Channels resampled with 'nearest' (exact 0/1 selection matrices),
    # so the matmuls run in bf16. Metric depth needs f32 precision: split
    # it hi/lo (d = d_hi + d_lo with d_hi = bf16(d)); selection is linear
    # and both halves are bf16-representable, so the reconstruction is
    # exact to ~6e-5 relative — sub-0.2 mm at Kinect range.
    # The normal-z channel only feeds the color angle weight — skip the
    # whole swept channel in depth-only mode.
    # No separate validity channel: depth 0 marks invalid pixels and the
    # nearest-selection matrices produce exact 0 for out-of-range voxels,
    # so d_vol != 0 is the complete validity test.
    # bf16-representable high half via mantissa masking, NOT
    # f32->bf16->f32 casts: XLA:TPU's excess-precision simplification
    # elides the cast round-trip, which silently zeroed d_lo on chip and
    # degraded the projected depth to plain bf16 (one-ULP error on ~half
    # the voxels -> a stable ~3 mm tracking bias; tools/prof_op_diff.py).
    # Truncation (vs round-to-nearest) is equally valid for the split:
    # d_hi is exactly bf16-representable and |d_lo| < one bf16 ULP.
    d_hi = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(depth, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )
    d_lo = depth - d_hi
    chans = [d_hi, d_lo]
    if rgb is not None:
        chans += [normals[..., 2], rgb[..., 0], rgb[..., 1], rgb[..., 2]]
    img = jnp.stack(chans, axis=0)
    volch = project_image_to_volume(
        img, pose, depth_cam, vol_cfg, axis, mode="nearest", dtype=jnp.bfloat16,
        k0=k0, nk=nk, i0=i0, ni=ni,
    )
    # un-permute the (cheap, bf16) projected channels to native layout;
    # the hi/lo depth halves MUST be summed in f32 (a bf16 add would
    # round the lo half away)
    volch = jnp.transpose(volch, (0, 1 + inv[0], 1 + inv[1], 1 + inv[2]))
    d_vol = volch[0].astype(jnp.float32) + volch[1].astype(jnp.float32)
    nz_vol = volch[2].astype(jnp.float32) if rgb is not None else None

    # camera z per voxel: affine in (k, i, j); iotas laid along the
    # NATIVE axes carrying each sweep coordinate
    ca, cb, cc, c0 = _cam_affine(geom, vol_cfg)
    shape = tsdf.shape
    kk = k0 + jax.lax.broadcasted_iota(jnp.float32, shape, perm[0])
    ii = i0 + jax.lax.broadcasted_iota(jnp.float32, shape, perm[1])
    jj = jax.lax.broadcasted_iota(jnp.float32, shape, perm[2])
    pz = ca[2] * kk + cb[2] * ii + cc[2] * jj + c0[2]

    trunc = integ_cfg.sdf_trunc_m
    sdf = d_vol - pz
    update = (
        (pz > 0)
        & (d_vol != 0)
        & (d_vol < integ_cfg.max_integrate_dist_m)
        & (sdf > -trunc)
    )
    tsdf_new = jnp.minimum(1.0, sdf / trunc)
    w_old = weight
    w_new = jnp.where(update, jnp.minimum(w_old + 1.0, vol_cfg.max_weight), w_old)
    tsdf_fused = (tsdf * w_old + tsdf_new) / jnp.maximum(w_old + 1.0, 1e-30)
    tsdf_out = jnp.where(update, tsdf_fused, tsdf)

    if rgb is not None:
        # rgb 0..255 integers are exact in bf16 (8 significand bits)
        pix_color = jnp.stack(
            [volch[3], volch[4], volch[5]], axis=-1
        ).astype(jnp.float32)
        if color_angle_weight:
            w_color = jnp.minimum(1.0, jnp.abs(nz_vol) / 0.75) * 2.0
        else:
            w_color = jnp.full_like(nz_vol, 2.0)
        cdenom = jnp.maximum(w_old + w_color, 1e-30)
        color_fused = jnp.minimum(
            255.0,
            (color * w_old[..., None] + pix_color * w_color[..., None])
            / cdenom[..., None],
        )
        color_out = jnp.where(update[..., None], color_fused, color)
    else:
        color_out = color

    count = jnp.sum(update.astype(jnp.int32))
    return tsdf_out, w_new, color_out, count


def fast_integrate(
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
) -> tuple[TsdfVolume, Array]:
    """Gather-free TSDF fusion (shear-warp). API-compatible with
    tsdfjax.volume.integrate.

    Note: color is looked up through the DEPTH camera here (the two are
    registered in every shipped config); the exact path supports distinct
    rgb intrinsics.
    """
    axis = pick_sweep_axis(pose)

    def branch(a):
        def run(_):
            return _integrate_axis(
                (volume.tsdf, volume.weight, volume.color), depth, normals,
                rgb, pose, depth_cam, vol_cfg, integ_cfg, color_angle_weight, a,
            )

        return run

    t, w, c, count = jax.lax.switch(axis, [branch(0), branch(1), branch(2)], None)
    return TsdfVolume(tsdf=t, weight=w, color=c), count


def fast_integrate_sharded(
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
    x0: Array | int = 0,
) -> tuple[TsdfVolume, Array]:
    """fast_integrate for an x-sharded volume, called per shard inside
    shard_map: `volume` holds the LOCAL (block, R, R) slab starting at
    global voxel x = `x0` (traced). Entirely local — the q-warp is
    per-frame global and voxel x is either the sweep axis k (sweep along
    x) or the first in-slice axis i (sweep along y/z), so each shard
    projects the frame into just its own slab. No collectives; the
    per-shard count is NOT psum'd here (caller reduces)."""
    axis = pick_sweep_axis(pose)
    block = volume.tsdf.shape[0]
    res = vol_cfg.resolution

    def branch(a):
        def run(_):
            if a == 0:  # sweep along x: local slab = k band
                k0, i0 = x0, 0
            else:  # sweep along y/z: x is the in-slice i axis
                k0, i0 = 0, x0
            return _integrate_axis(
                (volume.tsdf, volume.weight, volume.color), depth, normals,
                rgb, pose, depth_cam, vol_cfg, integ_cfg, color_angle_weight,
                a, k0=k0, i0=i0,
            )

        return run

    t, w, c, count = jax.lax.switch(axis, [branch(0), branch(1), branch(2)], None)
    return TsdfVolume(tsdf=t, weight=w, color=c), count


# ---------------------------------------------------------------------------
# fast raycast
# ---------------------------------------------------------------------------


def _shift2(x: Array, axis: int, direction: int) -> Array:
    """x shifted by `direction` (+1 = value of the next-index neighbor)
    along `axis` with edge replication, for a 2-D slice."""
    n = x.shape[axis]
    if direction > 0:
        return jnp.concatenate(
            [jax.lax.slice_in_dim(x, 1, n, axis=axis),
             jax.lax.slice_in_dim(x, n - 1, n, axis=axis)],
            axis=axis,
        )
    return jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)],
        axis=axis,
    )


def _axis_min3(x: Array, ax: int) -> Array:
    """min(up, dn) of the +-1 shifts of x along `ax` (edge-replicated)."""
    n = x.shape[ax]
    up = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, n, axis=ax),
         jax.lax.slice_in_dim(x, n - 1, n, axis=ax)],
        axis=ax,
    )
    dn = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=ax),
         jax.lax.slice_in_dim(x, 0, n - 1, axis=ax)],
        axis=ax,
    )
    return jnp.minimum(up, dn)


def _subsample_sweep_native(
    tsdf: Array,
    weight: Array,
    color: Array | None,
    axis: int,
    stride: int,
    dtype=jnp.bfloat16,
) -> Array:
    """Strided sweep-sample channel stack built in NATIVE (x,y,z) layout:
    returns vol_samp (C, n_k, ni, nj) in sweep-permuted [k,i,j] order
    holding slices k = m*stride, with channels [tsdf, eroded-validity
    (+r,g,b)]. Equivalent to permute-full -> _erode6 -> reshape-pick, but
    only the sampled band is ever eroded, stacked, or transposed — at
    512^3/stride 4 this cuts the raycast preamble's HBM traffic ~2x.

    The 6-neighborhood erosion decomposes as min(ek, in-plane shifts of
    the sampled slice), where ek = min(v[k-1], v[k], v[k+1]) needs only
    slices {m*stride - 1, m*stride, m*stride + 1} (stride >= 2: the k+-1
    neighbors live at in-group offsets 1 and stride-1 of groups m/m-1)."""
    assert stride >= 2
    a = axis
    perm = _PERMS[axis]
    n_k = tsdf.shape[a] // stride

    def pick(arr, off):
        shp = arr.shape
        grouped = arr.reshape(shp[:a] + (n_k, stride) + shp[a + 1 :])
        return jax.lax.index_in_dim(grouped, off, axis=a + 1, keepdims=False)

    v = (weight > 0).astype(dtype)
    v0 = pick(v, 0)
    v1 = pick(v, 1)
    vlast = pick(v, stride - 1)
    # vprev[m] = v[m*stride - 1] = vlast[m-1]; edge-replicate group 0
    vprev = jnp.concatenate(
        [jax.lax.slice_in_dim(v0, 0, 1, axis=a),
         jax.lax.slice_in_dim(vlast, 0, n_k - 1, axis=a)],
        axis=a,
    )
    ek = jnp.minimum(jnp.minimum(v0, v1), vprev)
    b_ax, c_ax = perm[1], perm[2]
    gv = jnp.minimum(
        jnp.minimum(ek, _axis_min3(v0, b_ax)), _axis_min3(v0, c_ax)
    )
    chans = [pick(tsdf, 0).astype(dtype), gv]
    if color is not None:
        csub = pick(color, 0).astype(dtype)
        chans += [csub[..., 0], csub[..., 1], csub[..., 2]]
    return jnp.stack([jnp.transpose(c, perm) for c in chans], axis=0)


def _erode6(v: Array) -> Array:
    """min over the 6-neighborhood + self (edge-replicated)."""
    out = v
    for axis in range(3):
        up = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, v.shape[axis], axis=axis),
             jax.lax.slice_in_dim(v, v.shape[axis] - 1, v.shape[axis], axis=axis)],
            axis=axis,
        )
        dn = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 0, 1, axis=axis),
             jax.lax.slice_in_dim(v, 0, v.shape[axis] - 1, axis=axis)],
            axis=axis,
        )
        out = jnp.minimum(out, jnp.minimum(up, dn))
    return out


def _raycast_axis(
    tsdf_p: Array,
    weight_p: Array,
    color_p: Array | None,
    pose: Array,
    cam: CameraIntrinsics,
    vol_cfg: VolumeConfig,
    near_plane: float,
    far_plane: float,
    axis: int,
    q_oversample: float,
    dtype=jnp.bfloat16,
    stride: int = 1,
    halo: int = 0,
    k0: Array | int = 0,
    axis_name: str | None = None,
    native: bool = False,
):
    """Sweep raycast with STATIC axis over [k,i,j]-permuted volume arrays.
    Returns per-PIXEL packed model maps (vertices, normals, color, found,
    z_cam). dtype=bfloat16 (default) halves the resample matmul cost;
    all swept channels are in [-1,1] or O(1), so the rounding is
    sub-0.5%% — the validity threshold is loosened accordingly.

    Sharded mode (`axis_name` set): the arrays are a k-band slab extended
    by `halo` >= stride+1 slices on both sides (neighbor data; global
    edges edge-replicated), owning global sweep slices [k0, k0+n_own).
    The shard composites only crossing intervals (k-stride, k] for owned
    k — the previous sample for the first owned slice comes from the
    halo — and per-shard candidates are merged by pmin on camera depth
    (the first crossing along a ray is its minimum-depth crossing, so the
    merge reproduces the dense latch/overwrite semantics exactly)."""
    vthresh = 0.97 if dtype == jnp.bfloat16 else 0.999
    res = vol_cfg.resolution
    cell = vol_cfg.voxel_size_m
    n_own = tsdf_p.shape[axis if native else 0] - 2 * halo
    h, w = cam.height, cam.width
    geom = make_sweep_geom(pose, cam, vol_cfg, axis)
    qh = _round8(int(h * q_oversample))
    qw = _round128(int(w * q_oversample))
    q_grid = _q_grid_for(geom, cam, res, qh, qw)
    q1_0, q1_s, q2_0, q2_s, _, _ = q_grid
    q1 = q1_0 + jnp.arange(qh, dtype=jnp.float32) / q1_s  # (Qh,)
    q2 = q2_0 + jnp.arange(qw, dtype=jnp.float32) / q2_s  # (Qw,)

    # per-ray constant: z_cam = gamma_k * w2q
    w2q = (
        geom.w[2, 0] * q1[:, None] + geom.w[2, 1] * q2[None, :] + geom.w[2, 2]
    )  # (Qh, Qw)
    pos_dir = w2q > 0

    # channel stack: tsdf, validity (6-eroded observed mask — serves both
    # the crossing-interp check and the reference's gradient-stencil
    # rejection) [+ color r,g,b]. The SDF gradient is NOT swept as
    # channels: it is reconstructed per ray from in-plane q-space
    # differences + the along-ray difference (see composite_step), which
    # cuts the resample matmuls and the volume channel traffic by 60%.
    # k-sweep stride: only every stride-th slice is resampled and
    # composited (the caller derives a stride the truncation band cannot
    # slip through, _raycast_stride). Subsample via reshape-pick (strided
    # slices are slow).
    n_k = n_own // stride
    # Per-sample-slice occupancy for the dense paths: a sampled slice
    # whose weight is all zero holds tsdf == 0 and validity == 0, which
    # resamples to exact zeros; zeros produce no crossings (strict sign
    # tests), so compositing such a block only resets prev to zeros.
    # The scan body cond-skips those blocks and zeroes prev directly —
    # bitwise-identical to the dense result, at ~no cost per empty block.
    occ = None
    if axis_name is None and halo == 0 and native:
        if stride > 1:
            shp = weight_p.shape
            grouped = weight_p.reshape(
                shp[:axis] + (n_k, stride) + shp[axis + 1 :]
            )
            w_samp = jax.lax.index_in_dim(grouped, 0, axis=axis + 1,
                                          keepdims=False)
            red = tuple(ax for ax in range(3) if ax != axis)
            occ = jnp.any(w_samp > 0, axis=red)  # (n_k,) along `axis`
        else:
            red = tuple(ax for ax in range(3) if ax != axis)
            occ = jnp.any(weight_p > 0, axis=red)
    elif halo > 0:
        # sharded path: occupancy of the shard's OWN sampled slices
        # (weight_p here is the [k,i,j]-permuted extended slab). Each
        # shard clips its compositing loop independently; the pmin merge
        # runs after the loop, so divergent trip counts are fine.
        w_own = jax.lax.slice_in_dim(weight_p, halo, halo + n_own, axis=0)
        occ = jnp.any(
            w_own.reshape(n_k, stride, *w_own.shape[1:])[:, 0] > 0,
            axis=(1, 2),
        )
    if native and halo == 0 and stride > 1:
        # dense fast path: subsample + erode in native layout, permuting
        # only the sampled band (see _subsample_sweep_native)
        vol_samp = _subsample_sweep_native(
            tsdf_p, weight_p, color_p, axis, stride, dtype=dtype
        )
        n_ch = vol_samp.shape[0]
        samp_off = 0
    else:
        if native:  # stride-1 fallback: permute in full, as before
            perm = _PERMS[axis]
            tsdf_p = jnp.transpose(tsdf_p, perm)
            weight_p = jnp.transpose(weight_p, perm)
            if color_p is not None:
                color_p = jnp.transpose(color_p, (*perm, 3))
        v_obs = (weight_p > 0).astype(jnp.float32)
        gv = _erode6(v_obs)
        chans = [tsdf_p, gv]
        if color_p is not None:
            chans += [color_p[..., 0], color_p[..., 1], color_p[..., 2]]
        vol_ch = jnp.stack(chans, axis=0)  # (C, R, R, R) permuted
        n_ch = vol_ch.shape[0]
        if halo > 0:
            # local samples at extended positions halo, halo+stride, ...
            # plus ONE extra leading sample at halo-stride: the previous
            # sample of the first owned slice (lives in the exchanged halo)
            sub = jax.lax.slice_in_dim(
                vol_ch, halo - stride, halo - stride + (n_k + 1) * stride, axis=1
            )
            vol_samp = sub.reshape(n_ch, n_k + 1, stride, res, res)[:, :, 0]
            samp_off = 1
        elif stride > 1:
            vol_samp = vol_ch.reshape(n_ch, n_k, stride, res, res)[:, :, 0]
            samp_off = 0
        else:
            vol_samp = vol_ch
            samp_off = 0

    # slices per compositing scan step; with the bf16 5-channel state the
    # batched intermediate fits VMEM (it spilled with 6 f32 channels)
    bsz = RAYCAST_BSZ if n_k % RAYCAST_BSZ == 0 else 1

    def resample_sweep(src_bcrr, kb):
        """Resample sweep sample slices (B, C, R, R) at global sweep
        indices kb (B,) onto the q grid -> (B, C, Qh, Qw) in `dtype`."""
        gamma = kb.astype(jnp.float32) + geom.kappa  # (B,)
        usable = jnp.abs(gamma) >= 1e-3
        gsafe = jnp.where(usable, gamma, 1.0)
        rows = q1[None, :] * gsafe[:, None] - geom.alpha  # (B, Qh)
        cols = q2[None, :] * gsafe[:, None] - geom.beta  # (B, Qw)
        if src_bcrr.shape[0] == 1:
            out = resample_slice(src_bcrr[0], rows[0], cols[0], "linear", dtype=dtype)[None]
        else:
            out = resample_slices_batched_src(src_bcrr, rows, cols, "linear", dtype=dtype)
        out = jnp.where(usable[:, None, None, None], out, 0.0)
        # carry the swept channels in `dtype`: the compositing loop is
        # HBM-bandwidth-bound on this state, bf16 halves the traffic
        return out.astype(dtype), gamma

    def sample_block(m0):
        """Resample sweep samples m0..m0+B-1 (global slice k0 + m*stride)
        in one batched pair of matmuls."""
        kb = k0 + (m0 + jnp.arange(bsz)) * stride
        if bsz == 1:
            src = jax.lax.dynamic_index_in_dim(vol_samp, samp_off + m0, axis=1)
            src = jnp.swapaxes(src, 0, 1)  # (1, C, R, R)
        else:
            src = jax.lax.dynamic_slice_in_dim(vol_samp, samp_off + m0, bsz, axis=1)
            src = jnp.swapaxes(src, 0, 1)  # (B, C, R, R)
        return resample_sweep(src, kb)

    zero_q = jnp.zeros((qh, qw), jnp.float32)
    zero_qd = jnp.zeros((qh, qw), dtype)
    if halo > 0:
        # previous sample of the first owned slice, from the halo. For the
        # global-edge shard this is a replica of slice 0, which can never
        # sign-cross slice 0 itself — and the k>0 guard in composite_step
        # skips it anyway, reproducing the dense have_prev semantics.
        prev0, _ = resample_sweep(
            jnp.swapaxes(vol_samp[:, :1], 0, 1), k0 - stride + jnp.arange(1)
        )
        prev0 = prev0[0]
    else:
        prev0 = jnp.zeros((n_ch, qh, qw), dtype)
    if halo > 0:
        prev0_di, prev0_dj = (
            0.5 * (_shift2(prev0[0], 0, +1) - _shift2(prev0[0], 0, -1)),
            0.5 * (_shift2(prev0[0], 1, +1) - _shift2(prev0[0], 1, -1)),
        )
    else:
        prev0_di, prev0_dj = zero_qd, zero_qd
    init = dict(
        prev=prev0,
        prev_di=prev0_di,  # dS/dgi of the prev slice's tsdf channel
        prev_dj=prev0_dj,
        done_pos=jnp.zeros((qh, qw), bool),  # pos-dir rays: latch first
        hit=jnp.zeros((qh, qw), bool),
        out_ok=jnp.zeros((qh, qw), bool),
        k_star=zero_q,
        di_star=zero_qd,
        dj_star=zero_qd,
        rd_star=zero_qd,  # along-ray tsdf difference d(psi)/dk at the hit
    )
    if color_p is not None:
        # only the color channels are ever read back at the crossing; in
        # depth-only mode the field is dropped from the scan state (the
        # compositing loop is HBM-bound on this state)
        init["ch_star"] = jnp.zeros((3, qh, qw), dtype)
    if axis_name is not None:
        # under shard_map the scan carry becomes per-device varying (it
        # reads the sharded slab); mark the constant-zero init fields
        # accordingly (prev/prev_di/prev_dj already derive from the slab)
        for key in list(init):
            if key not in ("prev", "prev_di", "prev_dj"):
                init[key] = jax.lax.pvary(init[key], axis_name)

    def _inplane_diffs(f):
        """Central differences of a (Qh, Qw) slice along the q-grid axes
        (edge-replicated): dS/dgi, dS/dgj."""
        di = 0.5 * (_shift2(f, 0, +1) - _shift2(f, 0, -1))
        dj = 0.5 * (_shift2(f, 1, +1) - _shift2(f, 1, -1))
        return di, dj

    def composite_step(st, cur, k, gamma):
        f_cur = cur[0].astype(jnp.float32)
        f_prev = st["prev"][0].astype(jnp.float32)
        cur_di, cur_dj = _inplane_diffs(cur[0])
        have_prev = k > 0

        # pos-dir rays: ray order == k order; earlier sample = prev
        cross_p = have_prev & pos_dir & (f_prev > 0) & (f_cur < 0) & ~st["done_pos"]
        # neg-dir rays: ray order reversed; earlier sample = cur
        cross_n = have_prev & ~pos_dir & (f_cur > 0) & (f_prev < 0)

        cross = cross_p | cross_n
        # earlier(E)/later(L) samples along the RAY
        f_e = jnp.where(pos_dir, f_prev, f_cur)
        f_l = jnp.where(pos_dir, f_cur, f_prev)
        denom = f_e - f_l
        frac = f_e / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        k_e = jnp.where(pos_dir, k - float(stride), k.astype(jnp.float32))
        k_l = jnp.where(pos_dir, k.astype(jnp.float32), k - float(stride))
        k_star_new = k_e + (k_l - k_e) * frac
        fracd = frac.astype(dtype)
        if color_p is not None:
            ch_e = jnp.where(pos_dir[None], st["prev"][2:5], cur[2:5])
            ch_l = jnp.where(pos_dir[None], cur[2:5], st["prev"][2:5])
            ch_star_new = (ch_e + fracd[None] * (ch_l - ch_e)).astype(ch_e.dtype)
        di_e = jnp.where(pos_dir, st["prev_di"], cur_di)
        di_l = jnp.where(pos_dir, cur_di, st["prev_di"])
        dj_e = jnp.where(pos_dir, st["prev_dj"], cur_dj)
        dj_l = jnp.where(pos_dir, cur_dj, st["prev_dj"])
        di_star_new = di_e + fracd * (di_l - di_e)
        dj_star_new = dj_e + fracd * (dj_l - dj_e)
        rd_new = ((f_cur - f_prev) * (1.0 / stride)).astype(dtype)  # d(psi along ray)/dk

        z_star = (k_star_new + geom.kappa) * w2q
        in_range = (z_star >= near_plane) & (z_star <= far_plane)
        valid_interp = (
            (jnp.where(pos_dir, st["prev"][1], cur[1]) > vthresh)
            & (jnp.where(pos_dir, cur[1], st["prev"][1]) > vthresh)
        )
        accept = cross & in_range

        st_new = dict(
            prev=cur,
            prev_di=cur_di,
            prev_dj=cur_dj,
            done_pos=st["done_pos"] | (cross_p & in_range),
            # pos-dir: first accepted crossing latches (done_pos);
            # neg-dir: later (larger-k = nearer-to-camera) accepts overwrite
            hit=st["hit"] | accept,
            out_ok=jnp.where(accept, valid_interp, st["out_ok"]),
            k_star=jnp.where(accept, k_star_new, st["k_star"]),
            di_star=jnp.where(accept, di_star_new, st["di_star"]),
            dj_star=jnp.where(accept, dj_star_new, st["dj_star"]),
            rd_star=jnp.where(accept, rd_new, st["rd_star"]),
        )
        if color_p is not None:
            st_new["ch_star"] = jnp.where(accept[None], ch_star_new, st["ch_star"])
        return st_new

    def live_block(st, m0):
        block, gammas = sample_block(m0)
        for b in range(bsz):
            st = composite_step(st, block[b], k0 + (m0 + b) * stride, gammas[b])
        return st

    if occ is not None:
        # Occupancy clip (EXACT): compositing an all-unobserved block
        # (tsdf == 0, validity == 0 everywhere) produces no crossings —
        # it only resets prev to zeros — so the loop need only cover
        # [first, last] occupied sample blocks. Interior unobserved
        # blocks are still composited (cheap zeros); the win is the
        # empty prefix/suffix of the sweep range.
        nb = n_k // bsz
        occ_b = jnp.any(occ.reshape(nb, bsz), axis=1)
        any_occ = jnp.any(occ_b)
        blk_lo = jnp.where(any_occ, jnp.argmax(occ_b), 0).astype(jnp.int32)
        blk_hi = jnp.where(
            any_occ, nb - jnp.argmax(occ_b[::-1]), 0
        ).astype(jnp.int32)
        if halo > 0:
            # sharded: prev0 came from the halo, which is only the right
            # previous sample when the loop starts at block 0. A clipped
            # start means every earlier OWN slice was unobserved, so the
            # dense-equivalent prev entering blk_lo is zeros.
            zp = blk_lo > 0
            init = dict(init)
            for key in ("prev", "prev_di", "prev_dj"):
                init[key] = jnp.where(zp, jnp.zeros_like(init[key]), init[key])
        st = jax.lax.fori_loop(
            blk_lo, blk_hi, lambda b, st: live_block(st, b * bsz), init
        )
    else:

        def body(st, m0):
            return live_block(st, m0), None

        st, _ = jax.lax.scan(body, init, jnp.arange(0, n_k, bsz), unroll=1)

    if axis_name is not None:
        # Merge per-shard candidates: the first crossing along a ray is
        # its minimum-camera-depth crossing (z = gamma * w2q is monotone
        # along each ray in ray order for both sweep directions), so a
        # pmin on z + masked psum of the winner's fields reproduces the
        # dense first-hit semantics exactly. Ties (distinct crossings
        # with bit-equal z) break toward the lower shard index.
        z_cand = (st["k_star"] + geom.kappa) * w2q
        zkey = jnp.where(st["hit"], z_cand, jnp.inf)
        zmin = jax.lax.pmin(zkey, axis_name)
        win = st["hit"] & (zkey == zmin)
        idx = jax.lax.axis_index(axis_name)
        nsh = jax.lax.axis_size(axis_name)
        wid = jax.lax.pmin(jnp.where(win, idx, nsh), axis_name)
        win = win & (idx == wid)

        def merge_f(v):
            return jax.lax.psum(
                jnp.where(win, v.astype(jnp.float32), 0.0), axis_name
            )

        st = dict(st)
        st["hit"] = jnp.isfinite(zmin)
        st["out_ok"] = merge_f(st["out_ok"]) > 0.5
        st["k_star"] = merge_f(st["k_star"])
        st["di_star"] = merge_f(st["di_star"])
        st["dj_star"] = merge_f(st["dj_star"])
        st["rd_star"] = merge_f(st["rd_star"])
        if color_p is not None:
            st["ch_star"] = jax.lax.psum(
                jnp.where(win[None], st["ch_star"].astype(jnp.float32), 0.0),
                axis_name,
            )

    hit = st["hit"] & st["out_ok"]

    # ---- final per-pixel nearest lookup in q space, SLIMMED (round 5):
    # gather only the per-crossing scalars — k_star (f32) plus the
    # already-bf16 di/dj/rd and the hit flag bitcast-packed two-per-f32
    # word (3 words/sample vs the previous 11) — and reconstruct the
    # vertex / normal / depth on each PIXEL's own ray afterwards. The
    # TPU gather is the raycast's single most expensive op and its cost
    # scales with gathered bytes (measured 1.42 -> ~0.45 ms at 640x480).
    # Using the pixel's exact q (pq1, pq2) instead of the q-grid sample's
    # (q1[gi], q2[gj]) also REMOVES the q-cell quantization the packed
    # lookup used to bake into vertices/normals — strictly closer to the
    # exact per-pixel raycast semantics.
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    phom = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1) @ geom.w_inv.T
    wz = phom[..., 2]
    wz_safe = jnp.where(jnp.abs(wz) < 1e-20, 1e-20, wz)
    pq1 = phom[..., 0] / wz_safe
    pq2 = phom[..., 1] / wz_safe
    gi = jnp.floor((pq1 - q1_0) * q1_s + 0.5 + _TIE_EPS).astype(jnp.int32)
    gj = jnp.floor((pq2 - q2_0) * q2_s + 0.5 + _TIE_EPS).astype(jnp.int32)
    in_grid = (gi >= 0) & (gi < qh) & (gj >= 0) & (gj < qw)
    flat = jnp.clip(gi, 0, qh - 1) * qw + jnp.clip(gj, 0, qw - 1)

    halfpack = jnp.stack(
        [
            st["di_star"].astype(jnp.bfloat16),
            st["dj_star"].astype(jnp.bfloat16),
            st["rd_star"].astype(jnp.bfloat16),
            hit.astype(jnp.bfloat16),
        ],
        axis=-1,
    ).reshape(qh, qw, 2, 2)
    words = [st["k_star"][..., None],
             jax.lax.bitcast_convert_type(halfpack, jnp.float32)]
    if color_p is not None:
        chpack = jnp.stack(
            [
                st["ch_star"][0].astype(jnp.bfloat16),
                st["ch_star"][1].astype(jnp.bfloat16),
                st["ch_star"][2].astype(jnp.bfloat16),
                jnp.zeros((qh, qw), jnp.bfloat16),
            ],
            axis=-1,
        ).reshape(qh, qw, 2, 2)
        words.append(jax.lax.bitcast_convert_type(chpack, jnp.float32))
    packed = jnp.concatenate(words, axis=-1).reshape(qh * qw, -1)
    px = packed[flat]
    px = jnp.where(in_grid[..., None], px, 0.0)

    k_p = px[..., 0]
    b4 = jax.lax.bitcast_convert_type(px[..., 1:3], jnp.bfloat16)  # (H,W,2,2)
    di_p = b4[..., 0, 0].astype(jnp.float32)
    dj_p = b4[..., 0, 1].astype(jnp.float32)
    rd_p = b4[..., 1, 0].astype(jnp.float32)
    hit_p = (b4[..., 1, 1].astype(jnp.float32) > 0.5) & in_grid

    gamma_p = k_p + geom.kappa
    i_p = pq1 * gamma_p - geom.alpha
    j_p = pq2 * gamma_p - geom.beta
    vert = (
        (k_p[..., None] + 0.5) * geom.u_a
        + (i_p[..., None] + 0.5) * geom.u_b
        + (j_p[..., None] + 0.5) * geom.u_c
    ) * cell  # (H, W, 3) world, on the pixel's ray
    # SDF gradient by chain rule from the swept parametrization
    # (k, gi, gj) -> (k, i, j): i = q1(gi)*gamma - alpha (di/dgi =
    # gamma/q1_s, di/dk = q1), so
    #   psi_i = dS/dgi * q1_s / gamma,   psi_j = dS/dgj * q2_s / gamma,
    #   psi_k = d(psi along ray)/dk - psi_i*q1 - psi_j*q2.
    gsafe_p = jnp.where(jnp.abs(gamma_p) < 1e-3, 1.0, gamma_p)
    psi_i = di_p * (q1_s / gsafe_p)
    psi_j = dj_p * (q2_s / gsafe_p)
    psi_k = rd_p - psi_i * pq1 - psi_j * pq2
    grad_world = (
        psi_k[..., None] * geom.u_a
        + psi_i[..., None] * geom.u_b
        + psi_j[..., None] * geom.u_c
    )
    glen = jnp.linalg.norm(grad_world, axis=-1, keepdims=True)
    normal = grad_world / jnp.maximum(glen, 1e-30)
    hit_p = hit_p & (glen[..., 0] >= 1e-8)

    # per-pixel camera depth: z = gamma * w2(pixel q)
    w2_pix = geom.w[2, 0] * pq1 + geom.w[2, 1] * pq2 + geom.w[2, 2]
    z_pix = jnp.where(hit_p, gamma_p * w2_pix, 0.0)

    vert = jnp.where(hit_p[..., None], vert, 0.0)
    normal = jnp.where(hit_p[..., None], normal, 0.0)
    if color_p is not None:
        cb = jax.lax.bitcast_convert_type(px[..., 3:5], jnp.bfloat16)  # (H,W,2,2)
        color_pix = jnp.where(
            hit_p[..., None],
            jnp.stack(
                [cb[..., 0, 0], cb[..., 0, 1], cb[..., 1, 0]], axis=-1
            ).astype(jnp.float32),
            0.0,
        )
    else:
        color_pix = jnp.zeros((h, w, 3), jnp.float32)
    return vert, normal, color_pix, hit_p, z_pix


def fast_raycast(
    volume: TsdfVolume,
    pose: Array,
    cam: CameraIntrinsics,
    vol_cfg: VolumeConfig,
    near_plane: float,
    far_plane: float,
    with_color: bool = False,
    q_oversample: float = 1.1,
    dtype=jnp.bfloat16,
    sdf_trunc_m: float | None = None,
):
    """Gather-free shear-warp raycast. Returns a tsdfjax.raycast
    RaycastResult (hit_t is the camera-space depth of the hit, not the
    reference's ray parameter — both orderings agree per ray).

    `sdf_trunc_m` (the integration truncation) licenses the strided
    sweep: without it every slice is visited (stride 1, always safe)."""
    from tsdfjax.raycast import RaycastResult

    axis = pick_sweep_axis(pose)
    stride = _raycast_stride(vol_cfg, sdf_trunc_m)

    def branch(a):
        def run(_):
            return _raycast_axis(
                volume.tsdf, volume.weight,
                volume.color if with_color else None, pose, cam, vol_cfg,
                near_plane, far_plane, a, q_oversample, dtype=dtype,
                stride=stride, native=True,
            )

        return run

    vert, normal, color, found, z = jax.lax.switch(
        axis, [branch(0), branch(1), branch(2)], None
    )
    return RaycastResult(
        vertices=vert, normals=normal, color=color, found=found, hit_t=z
    )


# ---------------------------------------------------------------------------
# sweep SDF sampling (the fast SDF tracker's row kernel)
# ---------------------------------------------------------------------------


def sdf_sweep_stack(
    tsdf: Array, weight: Array, axis: int, stride: int, dtype=jnp.bfloat16
) -> Array:
    """(R,R,R) native volume -> (2, n_k, R, R) sweep-layout [k,i,j]
    channel stack [tsdf, observed] holding every `stride`-th slice. Built
    ONCE per tracking call: the volume is constant during the GN loop
    (the reference re-samples it 13x per pixel per iteration instead,
    CalSDFErrSolverParams.cu:38-67)."""
    perm = _PERMS[axis]
    v = (weight > 0).astype(dtype)
    t = tsdf.astype(dtype)
    if stride > 1:
        n_k = tsdf.shape[axis] // stride

        def pick(arr):
            shp = arr.shape
            grouped = arr.reshape(shp[:axis] + (n_k, stride) + shp[axis + 1:])
            return jax.lax.index_in_dim(grouped, 0, axis=axis + 1, keepdims=False)

        t, v = pick(t), pick(v)
    return jnp.stack([jnp.transpose(t, perm), jnp.transpose(v, perm)], axis=0)


def sdf_sweep_prepare(
    pose0: Array,
    depth: Array,
    cam: CameraIntrinsics,
    vol_cfg: VolumeConfig,
    axis: int,
    q_oversample: float = 1.1,
) -> dict:
    """Per-FRAME q-space quantities for the sweep SDF tracker, frozen at
    the tracking call's initial pose: the q grid, each q ray's target
    depth (the depth of its nearest pixel), and the pixel MULTIPLICITY
    map w (how many valid-depth pixels select each q point). With these
    frozen, the GN iterations need NO gathers at all: the per-pixel sum
    of Gauss-Newton rows equals the per-q sum weighted by w exactly, so
    the normal equations are assembled in q space (sdf_sweep_normal_eqs)
    and only the 7x7 moment matrix leaves the sweep. Freezing the
    pixel<->q association across iterations shifts associations by the
    (sub-pixel) per-iteration pose delta — the same class of approximation
    as the fast integrate's nearest-of-nearest lookup."""
    res = vol_cfg.resolution
    h, w = cam.height, cam.width
    geom = make_sweep_geom(pose0, cam, vol_cfg, axis)
    qh = _round8(int(h * q_oversample))
    qw = _round128(int(w * q_oversample))
    q_grid = _q_grid_for(geom, cam, res, qh, qw)
    q1_0, q1_s, q2_0, q2_s, _, _ = q_grid
    q1 = q1_0 + jnp.arange(qh, dtype=jnp.float32) / q1_s
    q2 = q2_0 + jnp.arange(qw, dtype=jnp.float32) / q2_s

    d_q = _warp_image_to_q(depth[None], geom, q_grid, "nearest")[0]

    # pixel -> nearest q point; multiplicity via one scatter-add
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    phom = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1) @ geom.w_inv.T
    wz = phom[..., 2]
    wz_safe = jnp.where(jnp.abs(wz) < 1e-20, 1e-20, wz)
    gi = jnp.floor((phom[..., 0] / wz_safe - q1_0) * q1_s + 0.5 + _TIE_EPS).astype(jnp.int32)
    gj = jnp.floor((phom[..., 1] / wz_safe - q2_0) * q2_s + 0.5 + _TIE_EPS).astype(jnp.int32)
    in_grid = (gi >= 0) & (gi < qh) & (gj >= 0) & (gj < qw)
    flat = jnp.where(in_grid, gi * qw + gj, 0)
    contrib = jnp.where(in_grid & (depth > 0), 1.0, 0.0)
    w_mult = (
        jnp.zeros(qh * qw, jnp.float32)
        .at[flat.reshape(-1)]
        .add(contrib.reshape(-1))
        .reshape(qh, qw)
    )
    return dict(q1=q1, q2=q2, q1_s=q1_s, q2_s=q2_s, d_q=d_q, w_mult=w_mult)


def sdf_sweep_stack_sharded(
    tsdf: Array, weight: Array, axis: int, stride: int,
    axis_name: str = "space", dtype=jnp.bfloat16,
) -> tuple[Array, Array]:
    """Sharded sdf_sweep_stack, called per shard inside shard_map: the
    local (block, R, R) x-slab becomes this shard's k-BAND of the sweep
    stack. When the sweep axis is x the slab already is a k band; for
    y/z the transposed slab (k full, i = x band) is re-sharded with one
    all_to_all (the same move as fast_raycast_sharded). One ppermute
    prepends the lower-k HALO slice (the left neighbor's last strided
    slice) so bracketing across the band boundary sees its `prev` slice.

    Returns ((2, n_k_own + 1, R, R) extended stack with the halo at
    index 0, mb = this band's global strided-slice offset)."""
    perm = _PERMS[axis]
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    t = jnp.transpose(tsdf.astype(dtype), perm)
    v = jnp.transpose((weight > 0).astype(dtype), perm)
    if axis != 0 and n > 1:
        t = jax.lax.all_to_all(t, axis_name, split_axis=0, concat_axis=1, tiled=True)
        v = jax.lax.all_to_all(v, axis_name, split_axis=0, concat_axis=1, tiled=True)
    band = t.shape[0]
    if stride > 1:
        # band start k0 = idx*band is a multiple of stride (the caller
        # guarantees band % stride == 0), so the local [::stride] pick
        # lands exactly on the dense stack's global strided slices
        n_k = band // stride
        t = t.reshape((n_k, stride) + t.shape[1:])[:, 0]
        v = v.reshape((n_k, stride) + v.shape[1:])[:, 0]
    stack = jnp.stack([t, v], axis=0)  # (2, n_k_own, R, R)
    if n == 1:  # static: no neighbor; the single shard owns the global
        # band start, so the halo slice is never bracketed against
        from_left = jnp.zeros_like(stack[:, :1])
    else:
        fwd = [(i, i + 1) for i in range(n - 1)]
        from_left = jax.lax.ppermute(stack[:, -1:], axis_name, fwd)
        from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    ext = jnp.concatenate([from_left, stack], axis=1)
    mb = idx * (band // max(stride, 1))
    return ext, mb


def sdf_sweep_normal_eqs(
    prep: dict,
    vol_samp: Array,
    pose: Array,
    cam: CameraIntrinsics,
    vol_cfg: VolumeConfig,
    axis: int,
    stride: int,
    dtype=jnp.bfloat16,
    mb: Array | None = None,
    axis_name: str | None = None,
    huber_delta: float = 0.0,
    hole_aware: bool = False,
) -> tuple[Array, Array, Array]:
    """One GN iteration's (a7 (7,7), n_valid, |psi| sum) for the direct
    SDF tracker — the reference's 27-scalar reduction
    (CalSDFErrSolverParams.cu:88-108) — evaluated with the SAME MXU
    shear-warp machinery as fast_raycast, entirely in q space:

      - each q grid point is one camera ray; its sample point is the ray
        at its target depth d (frozen in `prep`), which the k-sweep
        crosses exactly once (z = gamma_k * w2q is monotone in k);
      - resample strided volume slices onto the q grid (two bf16 matmuls
        per slice), latch the slice interval whose crossing depths
        bracket d, lerp [tsdf, validity, in-plane diffs] there;
      - reconstruct the analytic world gradient by the chain rule (the
        h->0 limit of the reference's 13-sample numeric scheme), build
        the GN rows elementwise, and MXU-reduce them weighted by the
        pixel multiplicity w — an EXACT rewrite of the per-pixel sum;
      - the k-loop visits only the slice band [min, max] of the target
        depths (lax.fori_loop with traced bounds). ZERO gathers.

    Sharded mode (`mb`/`axis_name` set, called per shard inside
    shard_map): `vol_samp` is this shard's k-band from
    sdf_sweep_stack_sharded (lower-k halo slice at index 0); each shard
    composites only its own band — every target depth is bracketed by
    exactly one shard's slice interval, so the psum of the partial
    (a7, n_valid, |psi| sum) is an EXACT rewrite of the dense
    reduction (the Schur-style decomposition of SURVEY.md §2.7)."""
    vthresh = 0.97 if dtype == jnp.bfloat16 else 0.999
    res = vol_cfg.resolution
    cell = vol_cfg.voxel_size_m
    if axis_name is not None:
        n_k_own = vol_samp.shape[1] - 1  # index 0 is the halo slice
        n_k = n_k_own * jax.lax.axis_size(axis_name)
    else:
        n_k = vol_samp.shape[1]
    geom = make_sweep_geom(pose, cam, vol_cfg, axis)
    q1, q2 = prep["q1"], prep["q2"]
    q1_s, q2_s = prep["q1_s"], prep["q2_s"]
    d_q = prep["d_q"]
    qh, qw = d_q.shape
    w2q = (
        geom.w[2, 0] * q1[:, None] + geom.w[2, 1] * q2[None, :] + geom.w[2, 2]
    )  # (Qh, Qw)
    wsafe = jnp.where(jnp.abs(w2q) < 1e-8, 1e-8, w2q)
    k_t = d_q / wsafe - geom.kappa  # fractional sweep index of the target
    has_target = (d_q > 0) & (k_t >= 0.0) & (k_t <= float(res - 1))

    # sweep band: only slices around the target depths are visited
    big = jnp.float32(res)
    k_min = jnp.min(jnp.where(has_target, k_t, big))
    k_max = jnp.max(jnp.where(has_target, k_t, -big))
    bsz = (
        (RAYCAST_BSZ if n_k % RAYCAST_BSZ == 0 else 1)
        if axis_name is None else 1
    )
    m_lo = jnp.clip(
        jnp.floor(k_min / stride).astype(jnp.int32) - 1, 0, jnp.int32(n_k)
    )
    m_hi = jnp.clip(
        jnp.floor(k_max / stride).astype(jnp.int32) + 2, 0, jnp.int32(n_k)
    )
    t_lo = m_lo // bsz
    t_hi = (m_hi + bsz - 1) // bsz
    m_first = t_lo * bsz  # first visited slice: no prev, bracket skipped

    def resample_sweep(src_bcrr, kb):
        gamma = kb.astype(jnp.float32) + geom.kappa
        usable = jnp.abs(gamma) >= 1e-3
        gsafe = jnp.where(usable, gamma, 1.0)
        rows = q1[None, :] * gsafe[:, None] - geom.alpha
        cols = q2[None, :] * gsafe[:, None] - geom.beta
        if src_bcrr.shape[0] == 1:
            out = resample_slice(src_bcrr[0], rows[0], cols[0], "linear", dtype=dtype)[None]
        else:
            out = resample_slices_batched_src(src_bcrr, rows, cols, "linear", dtype=dtype)
        out = jnp.where(usable[:, None, None, None], out, 0.0)
        return out.astype(dtype), usable

    zero_qd = jnp.zeros((qh, qw), dtype)
    init = dict(
        prev=jnp.zeros((2, qh, qw), dtype),
        prev_di=zero_qd,
        prev_dj=zero_qd,
        prev_usable=jnp.array(False),
        found=jnp.zeros((qh, qw), bool),
        psi=jnp.zeros((qh, qw), jnp.float32),
        ok=jnp.zeros((qh, qw), bool),
        di=zero_qd,
        dj=zero_qd,
        rd=zero_qd,
    )

    def composite(st, cur, m, usable):
        k = (m * stride).astype(jnp.float32)
        f_cur = cur[0].astype(jnp.float32)
        f_prev = st["prev"][0].astype(jnp.float32)
        if hole_aware:
            # validity-aware differences: near an unobserved neighbor
            # (map hole) the central difference reads tsdf == 0 garbage;
            # fall back to the one-sided form on the valid side (config
            # SdfTrackerConfig.hole_aware_gradient; opt-in — the
            # reference keeps plain central differences)
            vth = jnp.asarray(vthresh, dtype)
            f0 = cur[0]
            for ax in (0, 1):
                tp, tm = _shift2(f0, ax, +1), _shift2(f0, ax, -1)
                vp = _shift2(cur[1], ax, +1) > vth
                vm = _shift2(cur[1], ax, -1) > vth
                d = jnp.where(
                    vp & vm,
                    (tp - tm) * jnp.asarray(0.5, dtype),
                    jnp.where(vp, tp - f0,
                              jnp.where(vm, f0 - tm, jnp.asarray(0, dtype))),
                )
                if ax == 0:
                    cur_di = d
                else:
                    cur_dj = d
        else:
            cur_di = 0.5 * (_shift2(cur[0], 0, +1) - _shift2(cur[0], 0, -1))
            cur_dj = 0.5 * (_shift2(cur[0], 1, +1) - _shift2(cur[0], 1, -1))
        # bracket: target k_t inside (k - stride, k]
        hit = (
            (m > m_first)
            & usable
            & st["prev_usable"]
            & has_target
            & (k_t > k - float(stride))
            & (k_t <= k)
        )
        frac = ((k_t - (k - float(stride))) * (1.0 / stride)).astype(jnp.float32)
        psi_new = f_prev + frac * (f_cur - f_prev)
        v_new = (
            st["prev"][1].astype(jnp.float32)
            + frac * (cur[1].astype(jnp.float32) - st["prev"][1].astype(jnp.float32))
        )
        fracd = frac.astype(dtype)
        di_new = st["prev_di"] + fracd * (cur_di - st["prev_di"])
        dj_new = st["prev_dj"] + fracd * (cur_dj - st["prev_dj"])
        rd_new = ((f_cur - f_prev) * (1.0 / stride)).astype(dtype)
        return dict(
            prev=cur,
            prev_di=cur_di,
            prev_dj=cur_dj,
            prev_usable=usable,
            found=st["found"] | hit,
            psi=jnp.where(hit, psi_new, st["psi"]),
            ok=jnp.where(hit, v_new > vthresh, st["ok"]),
            di=jnp.where(hit, di_new, st["di"]),
            dj=jnp.where(hit, dj_new, st["dj"]),
            rd=jnp.where(hit, rd_new, st["rd"]),
        )

    def body(t, st):
        m0 = t * bsz
        src = jax.lax.dynamic_slice_in_dim(vol_samp, m0, bsz, axis=1)
        src = jnp.swapaxes(src, 0, 1)  # (B, 2, R, R)
        block, usables = resample_sweep(src, (m0 + jnp.arange(bsz)) * stride)
        for b in range(bsz):
            st = composite(st, block[b], m0 + b, usables[b])
        return st

    if axis_name is None:
        st = jax.lax.fori_loop(t_lo, t_hi, body, init)
    else:
        # this shard composites only the slices of its own band that the
        # global target range visits; the loop body has no collectives,
        # so per-shard trip counts may differ
        m_lo_own = jnp.maximum(m_lo, mb)
        m_hi_own = jnp.minimum(m_hi, mb + n_k_own)
        # the loop carry is per-shard "varying" (derived from the local
        # band); mark the replicated zero init accordingly for shard_map
        init = {
            k: jax.lax.pcast(v, (axis_name,), to="varying")
            for k, v in init.items()
        }
        # seed `prev` from the halo slice when this band continues a
        # sweep the left neighbor started (global band reaches below mb)
        have_halo = (m_lo < mb) & (m_lo_own < m_hi_own)
        halo_src = jnp.swapaxes(
            jax.lax.dynamic_slice_in_dim(vol_samp, 0, 1, axis=1), 0, 1
        )
        halo_block, halo_usable = resample_sweep(
            halo_src, jnp.reshape((mb - 1) * stride, (1,))
        )
        h0 = halo_block[0]
        init = dict(
            init,
            prev=jnp.where(have_halo, h0, init["prev"]),
            prev_di=jnp.where(
                have_halo,
                0.5 * (_shift2(h0[0], 0, +1) - _shift2(h0[0], 0, -1)),
                init["prev_di"],
            ),
            prev_dj=jnp.where(
                have_halo,
                0.5 * (_shift2(h0[0], 1, +1) - _shift2(h0[0], 1, -1)),
                init["prev_dj"],
            ),
            prev_usable=halo_usable[0] & have_halo,
        )

        def body_s(m, st):
            src = jnp.swapaxes(
                jax.lax.dynamic_slice_in_dim(vol_samp, m - mb + 1, 1, axis=1),
                0, 1,
            )
            block, usables = resample_sweep(src, jnp.reshape(m * stride, (1,)))
            return composite(st, block[0], m, usables[0])

        st = jax.lax.fori_loop(m_lo_own, m_hi_own, body_s, init)

    # chain rule (k, gi, gj) -> world, in 1/meter units (see _raycast_axis)
    gamma_star = k_t + geom.kappa
    gsafe_star = jnp.where(jnp.abs(gamma_star) < 1e-3, 1.0, gamma_star)
    psi_i = st["di"].astype(jnp.float32) * (q1_s / gsafe_star)
    psi_j = st["dj"].astype(jnp.float32) * (q2_s / gsafe_star)
    psi_k = (
        st["rd"].astype(jnp.float32) - psi_i * q1[:, None] - psi_j * q2[None, :]
    )
    inv_cell = 1.0 / cell
    gx = (
        psi_k * geom.u_a[0] + psi_i * geom.u_b[0] + psi_j * geom.u_c[0]
    ) * inv_cell
    gy = (
        psi_k * geom.u_a[1] + psi_i * geom.u_b[1] + psi_j * geom.u_c[1]
    ) * inv_cell
    gz = (
        psi_k * geom.u_a[2] + psi_i * geom.u_b[2] + psi_j * geom.u_c[2]
    ) * inv_cell
    # world sample point, elementwise (same parametrization as raycast)
    i_star = q1[:, None] * gamma_star - geom.alpha
    j_star = q2[None, :] * gamma_star - geom.beta
    px_ = ((k_t + 0.5) * geom.u_a[0] + (i_star + 0.5) * geom.u_b[0]
           + (j_star + 0.5) * geom.u_c[0]) * cell
    py_ = ((k_t + 0.5) * geom.u_a[1] + (i_star + 0.5) * geom.u_b[1]
           + (j_star + 0.5) * geom.u_c[1]) * cell
    pz_ = ((k_t + 0.5) * geom.u_a[2] + (i_star + 0.5) * geom.u_b[2]
           + (j_star + 0.5) * geom.u_c[2]) * cell

    wv = jnp.where(st["found"] & st["ok"], prep["w_mult"], 0.0)  # (Qh, Qw)
    psi = jnp.where(wv > 0, st["psi"], 0.0)
    if huber_delta > 0:
        # Huber IRLS on the normalized-TSDF residual: plain least squares
        # lets the noise tail (|psi| -> truncation saturation) outvote the
        # near-surface inliers — measured 16x ATE degradation vs ICP at
        # sigma = 0.005 (round-3 stress sweep). w = min(1, delta/|psi|)
        # multiplies the per-q weight; the contribution becomes
        # sum w_mult * w_huber * r r^T, the standard IRLS normal equation.
        w_hub = jnp.minimum(
            1.0, huber_delta / jnp.maximum(jnp.abs(psi), 1e-6)
        )
        wv = wv * jnp.where(wv > 0, w_hub, 0.0)
    rows = jnp.stack(
        [
            -gy * pz_ + gz * py_,  # d(psi)/d(omega) = grad . (G_i p)
            gx * pz_ - gz * px_,
            -gx * py_ + gy * px_,
            gx, gy, gz,
            psi,
        ],
        axis=-1,
    )
    rows = jnp.where(wv[..., None] > 0, rows, 0.0).reshape(-1, 7)
    r_w = rows * wv.reshape(-1, 1)
    a7 = jnp.dot(
        r_w.T, rows, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    n_val = jnp.sum(wv)
    res_sum = jnp.sum(jnp.abs(psi) * wv)
    if axis_name is not None:
        a7 = jax.lax.psum(a7, axis_name)
        n_val = jax.lax.psum(n_val, axis_name)
        res_sum = jax.lax.psum(res_sum, axis_name)
    return a7, n_val, res_sum


# ---------------------------------------------------------------------------
# sharded fast raycast
# ---------------------------------------------------------------------------


def _halo_k(local: Array, halo: int, axis_name: str) -> Array:
    """(B, ...) k-band slab -> (B + 2*halo, ...) extended slab via one-hop
    ppermute along the mesh ring. Global-edge shards REPLICATE their edge
    slice into the missing halo (matching the dense sweep's
    edge-replicated erosion stencil; the k>0 guard keeps the replicated
    phantom from ever producing a crossing)."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:  # static: no neighbors, both halos are edge replications
        edge_lo = jnp.broadcast_to(local[:1], (halo,) + local.shape[1:])
        edge_hi = jnp.broadcast_to(local[-1:], (halo,) + local.shape[1:])
        return jnp.concatenate([edge_lo, local, edge_hi], axis=0)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]
    from_left = jax.lax.ppermute(local[-halo:], axis_name, fwd)
    from_right = jax.lax.ppermute(local[:halo], axis_name, bwd)
    edge_lo = jnp.broadcast_to(local[:1], from_left.shape)
    edge_hi = jnp.broadcast_to(local[-1:], from_right.shape)
    from_left = jnp.where(idx == 0, edge_lo, from_left)
    from_right = jnp.where(idx == n - 1, edge_hi, from_right)
    return jnp.concatenate([from_left, local, from_right], axis=0)


def fast_raycast_sharded(
    volume: TsdfVolume,
    pose: Array,
    cam: CameraIntrinsics,
    vol_cfg: VolumeConfig,
    near_plane: float,
    far_plane: float,
    with_color: bool = False,
    q_oversample: float = 1.1,
    dtype=jnp.bfloat16,
    sdf_trunc_m: float | None = None,
    x0: Array | int = 0,
    axis_name: str = "space",
):
    """fast_raycast for an x-sharded volume, called per shard inside
    shard_map: `volume` holds the LOCAL (block, R, R) slab starting at
    global voxel x = `x0`. Each shard composites ONLY its own k-band of
    sweep slices — 1/N of the dense sweep's slice work — then per-shard
    crossing candidates merge with one pmin + masked psum in q space.

    When the sweep axis is x the slab already IS a k band (one halo
    ppermute). When it is y or z, the permuted slab (k-full, x-band) is
    re-sharded to (k-band, x-full) with a single all_to_all of the
    channel volume — the collective rides ICI once per frame, instead of
    every shard marching all rays over the full t-grid like the exact
    sharded path (parallel/sharded.py)."""
    from tsdfjax.raycast import RaycastResult

    axis = pick_sweep_axis(pose)
    block = volume.tsdf.shape[0]
    stride = _raycast_stride(vol_cfg, sdf_trunc_m)
    if block % stride != 0:
        stride = 1
    halo = stride + 1

    def branch(a):
        perm = _PERMS[a]

        def run(_):
            t_p = jnp.transpose(volume.tsdf, perm)
            w_p = jnp.transpose(volume.weight, perm)
            c_p = jnp.transpose(volume.color, (*perm, 3)) if with_color else None
            if a != 0 and jax.lax.axis_size(axis_name) > 1:
                # permuted local slab is (k=R full, i=x block): re-shard to
                # a k band with full in-slice extent
                t_p = jax.lax.all_to_all(t_p, axis_name, split_axis=0, concat_axis=1, tiled=True)
                w_p = jax.lax.all_to_all(w_p, axis_name, split_axis=0, concat_axis=1, tiled=True)
                if c_p is not None:
                    c_p = jax.lax.all_to_all(
                        c_p, axis_name, split_axis=0, concat_axis=1, tiled=True
                    )
            # x0 == axis_index * block, which is also this shard's k-band
            # start for the all_to_all layout
            t_e = _halo_k(t_p, halo, axis_name)
            w_e = _halo_k(w_p, halo, axis_name)
            c_e = _halo_k(c_p, halo, axis_name) if c_p is not None else None
            return _raycast_axis(
                t_e, w_e, c_e, pose, cam, vol_cfg, near_plane, far_plane,
                a, q_oversample, dtype=dtype, stride=stride,
                halo=halo, k0=x0, axis_name=axis_name,
            )

        return run

    vert, normal, color, found, z = jax.lax.switch(
        axis, [branch(0), branch(1), branch(2)], None
    )
    return RaycastResult(
        vertices=vert, normals=normal, color=color, found=found, hit_t=z
    )
