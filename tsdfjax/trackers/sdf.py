"""Direct SDF camera tracking (Bylow-style), fully on-device.

TPU-native redesign of the reference SDF tracker (SURVEY.md §2.4/§2.5):
  - 13-sample numeric gradient of the trilinear TSDF per pixel
    (center + 6 linearized-rotation-perturbed + 6 translation-perturbed
    poses) and the same 27-term Gauss-Newton reduction as ICP:
    CalSDFErrSolverParams.cu:7-138
  - GN loop with shake rejection, ||x|| < eps convergence, and the
    inverse-composed SE(3) exponential-map update
    R' = exp(w)^T R, t' = t - exp(w)^T t_exp:
    CameraPoseFinderSDF.cpp:44-106

Like the ICP tracker, the whole loop runs inside one jit — the reference
pays a device->host sync + Eigen solve per iteration; we don't. A pixel
contributes only if ALL 13 trilinear samples are valid (in-border and all
8 corners observed), matching buildSDFSolverRows' all-or-nothing `ret`.

The rotation perturbations are the reference's LINEARIZED deltas
(I + h*G_axis), not exact rotations (CalSDFErrSolverParams.cu:123-133);
we reproduce that exactly so the numeric gradient matches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tsdfjax.config import SdfTrackerConfig, VolumeConfig
from tsdfjax.geometry import (
    CameraIntrinsics,
    delta_pose_from_6dof,
    exp_se3,
    rotation_angle,
    se3_from_rt,
    transform_points,
)


from tsdfjax.volume import TsdfVolume, sample_tsdf_trilinear

Array = jnp.ndarray


def _frame_shake_ok(cur, pose, cfg) -> Array:
    """Cumulative per-frame shake gate (see icp.icp_track): the per-step
    check alone lets many small GN steps add up to a teleport."""
    return (
        (rotation_angle(cur[:3, :3] @ pose[:3, :3].T) <= cfg.angle_shake_rad)
        & (jnp.linalg.norm(cur[:3, 3] - pose[:3, 3]) <= cfg.dist_shake_m)
    )


class SdfResult(NamedTuple):
    pose: Array
    ok: Array
    residual: Array  # mean |sdf| over contributing pixels, last iteration
    num_valid: Array


def _linearized_rotation_deltas(w_h: float) -> Array:
    """The six I + h*G perturbation matrices (+x,-x,+y,-y,+z,-z), 4x4,
    matching cudaCalSDFSolverParams' host-built deltas (cu:123-133)."""
    deltas = []
    for axis in range(3):
        for sign in (1.0, -1.0):
            g = jnp.zeros((3, 3), jnp.float32)
            i, j = [(1, 2), (0, 2), (0, 1)][axis]
            s = [-1.0, 1.0, -1.0][axis]  # skew pattern: Rx: (1,2)=-h; Ry: (0,2)=+h; Rz: (0,1)=-h
            g = g.at[i, j].set(s * sign * w_h)
            g = g.at[j, i].set(-s * sign * w_h)
            deltas.append(se3_from_rt(jnp.eye(3, dtype=jnp.float32) + g, jnp.zeros(3)))
    return jnp.stack(deltas)  # (6, 4, 4)


def sdf_rows(
    volume: TsdfVolume,
    trunced_depth: Array,
    cam: CameraIntrinsics,
    cur_transform: Array,
    vol_cfg: VolumeConfig,
    w_h: float,
    x0=None,
    own_x_range=None,
) -> tuple[Array, Array]:
    """Per-pixel 7-vector [dψ/dω | dψ/dv | ψ] rows, zeros when invalid.
    Returns (rows (H,W,7), valid (H,W)).

    Sharded mode (`x0`, `own_x_range`): the volume is a local x-slab; a
    pixel contributes on this shard only if its unperturbed world point
    falls in the owned world-x interval (each pixel claimed exactly once
    across shards; perturbed samples stay within the halo since both
    perturbation radii are <= 1 voxel + trilinear support)."""
    v_h = vol_cfg.voxel_size_m
    from tsdfjax.frames import depth_to_vertices

    pts = depth_to_vertices(trunced_depth, cam)  # camera-space
    px_valid = trunced_depth > 0

    world0 = transform_points(cur_transform, pts)
    sdf0, ok0 = sample_tsdf_trilinear(volume, world0, vol_cfg, x0)
    valid = px_valid & ok0
    if own_x_range is not None:
        valid = valid & (world0[..., 0] >= own_x_range[0]) & (world0[..., 0] < own_x_range[1])

    rot_deltas = _linearized_rotation_deltas(w_h)  # (6,4,4)
    rot_sdfs = []
    for k in range(6):
        t_k = rot_deltas[k] @ cur_transform
        wpos = transform_points(t_k, pts)
        s, ok = sample_tsdf_trilinear(volume, wpos, vol_cfg, x0)
        rot_sdfs.append(s)
        valid = valid & ok

    trans_sdfs = []
    for axis in range(3):
        for sign in (1.0, -1.0):
            offset = jnp.zeros(3, jnp.float32).at[axis].set(sign * v_h)
            s, ok = sample_tsdf_trilinear(volume, world0 + offset, vol_cfg, x0)
            trans_sdfs.append(s)
            valid = valid & ok

    rows = jnp.stack(
        [
            (rot_sdfs[0] - rot_sdfs[1]) / (2.0 * w_h),
            (rot_sdfs[2] - rot_sdfs[3]) / (2.0 * w_h),
            (rot_sdfs[4] - rot_sdfs[5]) / (2.0 * w_h),
            (trans_sdfs[0] - trans_sdfs[1]) / (2.0 * v_h),
            (trans_sdfs[2] - trans_sdfs[3]) / (2.0 * v_h),
            (trans_sdfs[4] - trans_sdfs[5]) / (2.0 * v_h),
            sdf0,
        ],
        axis=-1,
    )
    return jnp.where(valid[..., None], rows, 0.0), valid


def sdf_track(
    volume: TsdfVolume,
    trunced_depth: Array,
    pose: Array,
    cam: CameraIntrinsics,
    vol_cfg: VolumeConfig,
    cfg: SdfTrackerConfig,
    reduce_fn=None,
    x0=None,
    own_x_range=None,
) -> SdfResult:
    """Gauss-Newton loop, max cfg.max_iters iterations inside jit."""
    if reduce_fn is None:
        reduce_fn = lambda a: a

    def body(_, carry):
        cur, ok, done, residual, n_val = carry
        rows, valid = sdf_rows(
            volume, trunced_depth, cam, cur, vol_cfg, cfg.rotation_step_h,
            x0=x0, own_x_range=own_x_range,
        )
        r = rows.reshape(-1, 7)
        a7 = reduce_fn(
            jnp.dot(
                r.T, r, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
        a = a7[:6, :6]
        b = a7[:6, 6]
        # the reference LLT-solves unconditionally (CameraPoseFinderSDF.cpp:79);
        # we additionally treat non-finite solutions as shake failure
        factor = jax.scipy.linalg.cho_factor(a + jnp.eye(6, dtype=jnp.float32) * 1e-20)
        x = jax.scipy.linalg.cho_solve(factor, b)
        _, angle, dist = delta_pose_from_6dof(x)
        finite = jnp.all(jnp.isfinite(x))
        shake = (angle > cfg.angle_shake_rad) | (dist > cfg.dist_shake_m) | ~finite
        active = ok & ~done
        ok = ok & (~active | ~shake)
        converged = jnp.linalg.norm(x) < cfg.convergence_eps
        done = done | (active & converged)

        # inverse-composed exp-map update (CameraPoseFinderSDF.cpp:91-100)
        aff = exp_se3(x)
        r_exp_t = aff[:3, :3].T
        r_new = r_exp_t @ cur[:3, :3]
        t_new = cur[:3, 3] - r_exp_t @ aff[:3, 3]
        t_upd = se3_from_rt(r_new, t_new)
        apply = active & ~shake & ~converged
        cur = jnp.where(apply, t_upd, cur)

        nv = reduce_fn(jnp.sum(valid.astype(jnp.int32)))
        res = reduce_fn(jnp.sum(jnp.abs(rows[..., 6]))) / jnp.maximum(
            nv.astype(jnp.float32), 1.0
        )
        return cur, ok, done, res, nv

    init = (
        pose,
        jnp.array(True),
        jnp.array(False),
        jnp.array(0.0, jnp.float32),
        jnp.array(0, jnp.int32),
    )
    cur, ok, _, residual, n_val = jax.lax.fori_loop(0, cfg.max_iters, body, init)
    ok = ok & _frame_shake_ok(cur, pose, cfg)
    return SdfResult(pose=cur, ok=ok, residual=residual, num_valid=n_val)


# ---------------------------------------------------------------------------
# fast path: analytic gradient + packed per-pixel sampling
# ---------------------------------------------------------------------------


def _central_diff(x: Array, axis: int) -> Array:
    fwd = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
         jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)],
        axis=axis,
    )
    bwd = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
        axis=axis,
    )
    return fwd - bwd


def _erode_box(v: Array, r: int) -> Array:
    """min over the (2r+1)^3 box (edge-replicated): a conservative stand-in
    for 'every one of the 13 perturbed trilinear samples is observed'."""
    out = v
    for axis in range(3):
        acc = out
        for s in range(1, r + 1):
            n = out.shape[axis]
            up = jnp.concatenate(
                [jax.lax.slice_in_dim(out, s, n, axis=axis),
                 jnp.repeat(jax.lax.slice_in_dim(out, n - 1, n, axis=axis), s, axis=axis)],
                axis=axis,
            )
            dn = jnp.concatenate(
                [jnp.repeat(jax.lax.slice_in_dim(out, 0, 1, axis=axis), s, axis=axis),
                 jax.lax.slice_in_dim(out, 0, n - s, axis=axis)],
                axis=axis,
            )
            acc = jnp.minimum(acc, jnp.minimum(up, dn))
        out = acc
    return out


def sdf_precompute_fields(volume: TsdfVolume, vol_cfg: VolumeConfig) -> Array:
    """(R, R, R, 5) packed [tsdf, d/dx, d/dy, d/dz, eroded-validity] —
    computed once per tracking call (pure shifts, memory-bound)."""
    cell = vol_cfg.voxel_size_m
    g = 1.0 / (2.0 * cell)
    # raw observed mask: its trilinear interpolation > 0.999 at a point is
    # exactly the reference's all-8-corners-observed rule for that point
    # (the numeric path additionally requires the 12 perturbed samples
    # valid; eroding here over-rejects the thin band behind surfaces and
    # destabilizes the solve, so the analytic path keeps the base rule)
    valid = (volume.weight > 0).astype(jnp.float32)
    return jnp.stack(
        [
            volume.tsdf,
            _central_diff(volume.tsdf, 0) * g,
            _central_diff(volume.tsdf, 1) * g,
            _central_diff(volume.tsdf, 2) * g,
            valid,
        ],
        axis=-1,
    )


def _sample_packed(fields: Array, pos: Array, vol_cfg: VolumeConfig) -> tuple[Array, Array]:
    """Trilinear sample of the packed (R,R,R,C) fields at world pos
    (...,3) -> ((...,C), valid). One 8-corner gather of C-wide slices."""
    from tsdfjax.volume import _interp_setup

    res = vol_cfg.resolution
    c = fields.shape[-1]
    base, frac, in_bounds = _interp_setup(pos, vol_cfg)
    a, b, cc = frac[..., 0], frac[..., 1], frac[..., 2]
    # ONE windowed (2,2,2,C) gather per point (vmapped dynamic_slice
    # lowers to a single lax.gather with slice_sizes=(2,2,2,C)) instead
    # of 8 independent row gathers — ~2x faster on TPU, where each
    # gathered row costs a full lane-padded fetch regardless of width.
    # Clamping base to res-2 only affects out-of-domain points, which
    # in_bounds already rejects.
    bidx = jnp.clip(base.reshape(-1, 3), 0, res - 2)

    def fetch(i):
        return jax.lax.dynamic_slice(fields, (i[0], i[1], i[2], 0), (2, 2, 2, c))

    win = jax.vmap(fetch)(bidx).reshape(*pos.shape[:-1], 2, 2, 2, c)
    wx = jnp.stack([1.0 - a, a], axis=-1)
    wy = jnp.stack([1.0 - b, b], axis=-1)
    wz = jnp.stack([1.0 - cc, cc], axis=-1)
    wgt = (
        wx[..., :, None, None] * wy[..., None, :, None] * wz[..., None, None, :]
    )
    out = jnp.sum(win * wgt[..., None], axis=(-4, -3, -2))
    valid = in_bounds & (out[..., 4] > 0.999)
    return out, valid


def sdf_rows_fast(
    fields: Array,
    pts: Array,
    px_valid: Array,
    cur_transform: Array,
    vol_cfg: VolumeConfig,
) -> tuple[Array, Array]:
    """Analytic-gradient rows: dψ/dω_i = ∇ψ(p) · (G_i p), dψ/dv = ∇ψ(p)
    — the first-order limit of the reference's 13-sample numeric scheme
    (h → 0 of CalSDFErrSolverParams.cu:59-65). `pts` are the (possibly
    subsampled) camera-space points of the valid depth pixels."""
    p = transform_points(cur_transform, pts)
    s, ok = _sample_packed(fields, p, vol_cfg)
    valid = px_valid & ok
    sdf0, gx, gy, gz = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    px_, py_, pz_ = p[..., 0], p[..., 1], p[..., 2]
    rows = jnp.stack(
        [
            -gy * pz_ + gz * py_,  # ∇ψ·(G1 p)
            gx * pz_ - gz * px_,  # ∇ψ·(G2 p)
            -gx * py_ + gy * px_,  # ∇ψ·(G3 p)
            gx, gy, gz,
            sdf0,
        ],
        axis=-1,
    )
    return jnp.where(valid[..., None], rows, 0.0), valid


def _gn_solve_update(a7: Array, cur: Array, ok: Array, done: Array, cfg: SdfTrackerConfig):
    """Shared GN inner step: 6x6 Cholesky solve of the psum'd normal
    equations, shake/finite rejection, ||x|| convergence, and the
    reference's inverse-composed exp-map update
    (CameraPoseFinderSDF.cpp:79-100). Returns (cur, ok, done)."""
    a = a7[:6, :6]
    b = a7[:6, 6]
    factor = jax.scipy.linalg.cho_factor(a + jnp.eye(6, dtype=jnp.float32) * 1e-20)
    x = jax.scipy.linalg.cho_solve(factor, b)
    _, angle, dist = delta_pose_from_6dof(x)
    finite = jnp.all(jnp.isfinite(x))
    shake = (angle > cfg.angle_shake_rad) | (dist > cfg.dist_shake_m) | ~finite
    active = ok & ~done
    ok = ok & (~active | ~shake)
    converged = jnp.linalg.norm(x) < cfg.convergence_eps
    done = done | (active & converged)
    aff = exp_se3(x)
    r_exp_t = aff[:3, :3].T
    t_upd = se3_from_rt(r_exp_t @ cur[:3, :3], cur[:3, 3] - r_exp_t @ aff[:3, 3])
    apply = active & ~shake & ~converged
    cur = jnp.where(apply, t_upd, cur)
    return cur, ok, done


def sdf_track_sweep(
    volume: TsdfVolume,
    trunced_depth: Array,
    pose: Array,
    cam: CameraIntrinsics,
    vol_cfg: VolumeConfig,
    cfg: SdfTrackerConfig,
    sdf_trunc_m: float | None = None,
) -> SdfResult:
    """MXU shear-warp SDF tracker: per GN iteration, ONE sweep of the
    strided volume slice stack resampled onto the q grid (two bf16
    matmuls per slice, ops/sweep.sdf_sweep_normal_eqs) assembles the
    7x7 normal equations with psi and the analytic world gradient at
    every pixel's sample point — replacing the per-pixel trilinear
    gathers that made the packed-field fast path gather-bound on TPU
    (~70 ms/iter at 640x480/256^3). The strided slice stack AND the
    pixel<->q association (target depths + multiplicity weights) are
    built once per call; the GN iterations are gather-free.

    Same GN semantics as sdf_track_fast: analytic-gradient rows (the
    h->0 limit of the reference's 13-sample scheme), shake rejection,
    ||x|| < eps early exit, inverse-composed exp-map update
    (CameraPoseFinderSDF.cpp:44-106). `sdf_trunc_m` (the integration
    truncation) licenses the slice stride exactly as in fast_raycast."""
    from tsdfjax.ops.sweep import (
        _raycast_stride,
        pick_sweep_axis,
        sdf_sweep_normal_eqs,
        sdf_sweep_prepare,
        sdf_sweep_stack,
    )

    stride = _raycast_stride(vol_cfg, sdf_trunc_m)
    # axis fixed for the whole GN loop from the initial pose (per-iter
    # pose deltas are far below the 1/sqrt(3) axis-switch margin)
    axis = pick_sweep_axis(pose)

    def branch(a):
        def run(_):
            vol_samp = sdf_sweep_stack(volume.tsdf, volume.weight, a, stride)
            return _sweep_gn_loop(
                vol_samp, pose, trunced_depth, cam, vol_cfg, cfg, a, stride
            )

        return run

    return jax.lax.switch(axis, [branch(0), branch(1), branch(2)], None)


def _sweep_gn_loop(
    vol_samp, pose, trunced_depth, cam, vol_cfg, cfg, a, stride,
    mb=None, axis_name=None,
) -> SdfResult:
    """Shared GN loop of the sweep SDF tracker (dense and sharded): per
    iteration one gather-free normal-equation sweep + solve/update.

    Iteration 1 runs with the association frozen at the INITIAL pose
    (exact there); the first step carries the bulk of the inter-frame
    motion, which would leave the frozen pixel<->q association several
    pixels stale — so prep is rebuilt ONCE at the stepped pose, and the
    remaining iterations (whose per-step motion is sub-pixel) run
    against it. Under sharding the prep is computed identically on every
    shard (replicated pose + depth, no collectives) and only the normal
    equations psum."""
    from tsdfjax.ops.sweep import sdf_sweep_normal_eqs, sdf_sweep_prepare

    def gn_iter(prep, carry):
        i, cur, ok, done, residual, n_val = carry
        a7, nv_f, res_sum = sdf_sweep_normal_eqs(
            prep, vol_samp, cur, cam, vol_cfg, a, stride,
            mb=mb, axis_name=axis_name, huber_delta=cfg.huber_delta,
            hole_aware=cfg.hole_aware_gradient,
        )
        cur, ok, done = _gn_solve_update(a7, cur, ok, done, cfg)
        nv = nv_f.astype(jnp.int32)
        res = res_sum / jnp.maximum(nv_f, 1.0)
        return i + 1, cur, ok, done, res, nv

    init = (
        jnp.array(0, jnp.int32),
        pose,
        jnp.array(True),
        jnp.array(False),
        jnp.array(0.0, jnp.float32),
        jnp.array(0, jnp.int32),
    )
    prep0 = sdf_sweep_prepare(pose, trunced_depth, cam, vol_cfg, a,
                              q_oversample=cfg.q_oversample)
    carry = gn_iter(prep0, init)
    if cfg.rebuild_assoc_every_iter:
        def iter_fresh(c):
            prep = sdf_sweep_prepare(c[1], trunced_depth, cam, vol_cfg,
                                     a, q_oversample=cfg.q_oversample)
            return gn_iter(prep, c)

        i, cur, ok, _, residual, n_val = jax.lax.while_loop(
            lambda c: (c[0] < cfg.max_iters) & ~c[3] & c[2],
            iter_fresh, carry,
        )
    else:
        prep1 = sdf_sweep_prepare(carry[1], trunced_depth, cam, vol_cfg,
                                  a, q_oversample=cfg.q_oversample)
        i, cur, ok, _, residual, n_val = jax.lax.while_loop(
            lambda c: (c[0] < cfg.max_iters) & ~c[3] & c[2],
            lambda c: gn_iter(prep1, c),
            carry,
        )
    ok = ok & _frame_shake_ok(cur, pose, cfg)
    return SdfResult(pose=cur, ok=ok, residual=residual, num_valid=n_val)


def sdf_track_sweep_sharded(
    volume: TsdfVolume,
    trunced_depth: Array,
    pose: Array,
    cam: CameraIntrinsics,
    vol_cfg: VolumeConfig,
    cfg: SdfTrackerConfig,
    sdf_trunc_m: float | None = None,
    axis_name: str = "space",
) -> SdfResult:
    """sdf_track_sweep for an x-sharded volume, called per shard inside
    shard_map (VERDICT r3 item 7 — the sharded engine previously fell
    back to the exact gather SDF kernel and lost the gather-free path).
    `volume` holds the LOCAL (block, R, R) slab; each shard composites
    only its own k-band of the sweep (sdf_sweep_stack_sharded: one
    all_to_all when the sweep axis isn't x + a 1-slice halo ppermute)
    and the per-iteration normal equations psum — the exact Schur-style
    sum decomposition of SURVEY.md §2.7.

    The GN while_loop stays SPMD-lockstep: the solve consumes the
    psum'd system, so every shard sees identical convergence/shake
    decisions."""
    from tsdfjax.ops.sweep import (
        _raycast_stride,
        pick_sweep_axis,
        sdf_sweep_stack_sharded,
    )

    n = jax.lax.axis_size(axis_name)
    band = vol_cfg.resolution // n
    stride = _raycast_stride(vol_cfg, sdf_trunc_m)
    if band % stride != 0:
        stride = 1
    axis = pick_sweep_axis(pose)  # replicated pose -> same branch everywhere

    def branch(a):
        def run(_):
            vol_samp, mb = sdf_sweep_stack_sharded(
                volume.tsdf, volume.weight, a, stride, axis_name
            )
            return _sweep_gn_loop(
                vol_samp, pose, trunced_depth, cam, vol_cfg, cfg, a, stride,
                mb=mb, axis_name=axis_name,
            )

        return run

    return jax.lax.switch(axis, [branch(0), branch(1), branch(2)], None)


def sdf_track_fast(
    volume: TsdfVolume,
    trunced_depth: Array,
    pose: Array,
    cam: CameraIntrinsics,
    vol_cfg: VolumeConfig,
    cfg: SdfTrackerConfig,
    reduce_fn=None,
) -> SdfResult:
    """Fast GN loop: the packed field volume is built once (the volume is
    constant during tracking); each iteration costs ONE trilinear packed
    sample per (possibly subsampled) pixel instead of the reference's 13
    full samples, and the loop exits as soon as every shard converges —
    the reference also breaks on ||x|| < eps (CameraPoseFinderSDF.cpp:
    87-90), so the early exit is parity, not a shortcut."""
    from tsdfjax.frames import depth_to_vertices, subsample_pick

    if reduce_fn is None:
        reduce_fn = lambda a: a
    fields = sdf_precompute_fields(volume, vol_cfg)
    # pose-independent per-frame quantities hoisted out of the GN loop
    pts = depth_to_vertices(trunced_depth, cam)
    px_valid = trunced_depth > 0
    if cfg.source_subsample > 1:
        pts = subsample_pick(pts, cfg.source_subsample)
        px_valid = subsample_pick(px_valid, cfg.source_subsample)

    def body(carry):
        i, cur, ok, done, residual, n_val = carry
        rows, valid = sdf_rows_fast(fields, pts, px_valid, cur, vol_cfg)
        r = rows.reshape(-1, 7)
        a7 = reduce_fn(
            jnp.dot(r.T, r, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        )
        a = a7[:6, :6]
        b = a7[:6, 6]
        factor = jax.scipy.linalg.cho_factor(a + jnp.eye(6, dtype=jnp.float32) * 1e-20)
        x = jax.scipy.linalg.cho_solve(factor, b)
        _, angle, dist = delta_pose_from_6dof(x)
        finite = jnp.all(jnp.isfinite(x))
        shake = (angle > cfg.angle_shake_rad) | (dist > cfg.dist_shake_m) | ~finite
        active = ok & ~done
        ok = ok & (~active | ~shake)
        converged = jnp.linalg.norm(x) < cfg.convergence_eps
        done = done | (active & converged)
        aff = exp_se3(x)
        r_exp_t = aff[:3, :3].T
        t_upd = se3_from_rt(r_exp_t @ cur[:3, :3], cur[:3, 3] - r_exp_t @ aff[:3, 3])
        apply = active & ~shake & ~converged
        cur = jnp.where(apply, t_upd, cur)
        nv = reduce_fn(jnp.sum(valid.astype(jnp.int32)))
        res = reduce_fn(jnp.sum(jnp.abs(rows[..., 6]))) / jnp.maximum(
            nv.astype(jnp.float32), 1.0
        )
        return i + 1, cur, ok, done, res, nv

    init = (
        jnp.array(0, jnp.int32),
        pose,
        jnp.array(True),
        jnp.array(False),
        jnp.array(0.0, jnp.float32),
        jnp.array(0, jnp.int32),
    )
    _, cur, ok, _, residual, n_val = jax.lax.while_loop(
        lambda c: (c[0] < cfg.max_iters) & ~c[3] & c[2], body, init
    )
    ok = ok & _frame_shake_ok(cur, pose, cfg)
    return SdfResult(pose=cur, ok=ok, residual=residual, num_valid=n_val)
