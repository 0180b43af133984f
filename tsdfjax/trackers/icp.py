"""Frame-to-model point-to-plane ICP, fully on-device.

TPU-native redesign of the reference ICP stack (SURVEY.md §2.4/§2.5):
  - projective data association + point-to-plane rows + 27-term
    Gauss-Newton reduction: CalPointToPlaneErrSolverParams.cu:7-129
  - coarse-to-fine schedule {10,5,4}, Euler-XYZ delta, shake/singularity
    rejection: CameraPoseFinderICP.cpp:12-145

Key structural difference from the reference: the CUDA version syncs the
27 reduced floats to the host and solves the 6x6 system with Eigen EVERY
iteration (CameraPoseFinderICP.cpp:117,143 — ~19 device->host round
trips per frame). Here the whole multi-level GN loop lives inside one
jit: the reduction is an einsum (a (HW,7)^T (HW,7) matmul that XLA maps
straight onto the MXU), and the 6x6 solve runs on-device. Zero host
syncs. Under multi-host sharding the einsum result is psum'd over the
mesh (see tsdfjax.parallel) — the Schur-style reduction of BASELINE.md.

The Jacobian row per valid pixel is [q x n | n | n.(p - q)] with
q = current-estimate world-space source vertex, p/n = model vertex/
normal looked up by projecting q into the previous frame's camera.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tsdfjax import frames as F
from tsdfjax.config import IcpConfig
from tsdfjax.geometry import (
    CameraIntrinsics,
    delta_pose_from_6dof,
    rotation_angle,
    se3_inverse,
    transform_points,
    rotate_vectors,
)

Array = jnp.ndarray


class IcpResult(NamedTuple):
    pose: Array  # (4,4) tracked camera-to-world pose
    ok: Array  # () bool — False on shake / singular-system rejection
    residual: Array  # () f32 — mean |point-to-plane error| of last level
    num_corr: Array  # () i32 — correspondences at the last iteration


def pack_model_zn(model_v: Array, model_n: Array, last_transform_inv: Array) -> Array:
    """Compact (H, W, 4) association table [z_cam | n_world] for
    icp_rows' gather: the TPU gather cost scales with table bytes, and
    the world vertex is recoverable from the looked-up pixel's ray and
    its camera depth (fast_raycast emits vertices on exact pixel rays,
    so the reconstruction is f32-rounding-exact at level 0). Invalid
    pixels keep the zero normal (the existing validity marker)."""
    v_cp = transform_points(last_transform_inv, model_v)
    valid_m = jnp.any(model_n != 0.0, axis=-1)
    mz = jnp.where(valid_m, v_cp[..., 2], 0.0)
    return jnp.concatenate([mz[..., None], model_n], axis=-1)


def icp_rows(
    new_v: Array,
    new_n: Array,
    model_v: Array,
    model_n: Array,
    cam: CameraIntrinsics,
    cur_transform: Array,
    last_transform_inv: Array,
    dist_thresh: float,
    norm_sin_thresh: float,
    model_zn: Array | None = None,
    model_pose: Array | None = None,
) -> Array:
    """Per-pixel 7-vector rows (zeros for rejected pixels): (H, W, 7).

    Association gates per findCorrs (CalPointToPlaneErrSolverParams.cu:
    17-60): invalid input normal; projection outside the image; invalid
    model normal at the looked-up pixel; ||p - q|| > dist_thresh;
    ||n_t x n_i|| > norm_sin_thresh.

    With `model_zn` (+`model_pose`, the inverse of last_transform_inv)
    the gather reads the compact 4-wide [z|n] table (pack_model_zn) and
    reconstructs the world vertex p on the looked-up pixel's ray — 1.5x
    fewer gathered bytes, which is the dominant per-iteration cost.
    """
    # bounds/indexing use the MODEL map's shape: the source maps may be a
    # row band of the image under sharding while the target stays full
    h, w = model_v.shape[:2]
    v_g = transform_points(cur_transform, new_v)  # source vertex, world
    n_g = rotate_vectors(cur_transform, new_n)
    v_cp = transform_points(last_transform_inv, v_g)  # in last camera

    z = v_cp[..., 2]
    zsafe = jnp.where(z != 0, z, 1e-30)
    u = jnp.floor(v_cp[..., 0] * cam.fx / zsafe + cam.cx + 0.5).astype(jnp.int32)
    vv = jnp.floor(v_cp[..., 1] * cam.fy / zsafe + cam.cy + 0.5).astype(jnp.int32)
    in_img = (u >= 0) & (u < w) & (vv >= 0) & (vv < h)

    flat = jnp.clip(vv, 0, h - 1) * w + jnp.clip(u, 0, w - 1)
    if model_zn is not None:
        packed = model_zn.reshape(-1, 4)[flat]
        mz = packed[..., 0]
        n_t = packed[..., 1:4]
        # target vertex on the looked-up pixel's camera ray at depth mz,
        # mapped to world by the model camera pose
        uf = (jnp.clip(u, 0, w - 1).astype(jnp.float32) - cam.cx) / cam.fx
        vf = (jnp.clip(vv, 0, h - 1).astype(jnp.float32) - cam.cy) / cam.fy
        p_cam = jnp.stack([uf * mz, vf * mz, mz], axis=-1)
        p = transform_points(model_pose, p_cam)
        target_valid = jnp.any(n_t != 0.0, axis=-1)
        p = jnp.where(target_valid[..., None], p, 0.0)
    else:
        # single packed 6-wide gather: TPU gather cost is per-index, so
        # one (vertex|normal) slice fetch halves the association cost
        packed = jnp.concatenate([model_v, model_n], axis=-1).reshape(-1, 6)[flat]
        p = packed[..., 0:3]  # target vertex, world
        n_t = packed[..., 3:6]  # target normal, world
        target_valid = jnp.any(n_t != 0.0, axis=-1)

    input_valid = jnp.any(new_n != 0.0, axis=-1)
    delta = p - v_g
    dist = jnp.linalg.norm(delta, axis=-1)
    sin = jnp.linalg.norm(jnp.cross(n_t, n_g), axis=-1)
    valid = (
        input_valid
        & in_img
        & target_valid
        & (dist <= dist_thresh)
        & (sin <= norm_sin_thresh)
    )

    qxn = jnp.cross(v_g, n_t)
    rhs = jnp.sum(n_t * delta, axis=-1, keepdims=True)
    rows = jnp.concatenate([qxn, n_t, rhs], axis=-1)  # (H, W, 7)
    return jnp.where(valid[..., None], rows, 0.0), valid


def normal_equations(rows: Array) -> Array:
    """(H, W, 7) rows -> (7, 7) sum of outer products. This is the
    two-stage CUDA reduction (computeGbufKernel + reduceGbufKernel)
    collapsed into one MXU matmul; under shard_map the caller psums it."""
    r = rows.reshape(-1, 7)
    # precision=HIGHEST: the MXU's default bf16 passes are not enough for
    # accumulating ~300k Jacobian outer products into a 6x6 system
    return jnp.dot(
        r.T, r, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )


def solve_gn_step(a7: Array, shake_angle: float, shake_dist: float):
    """27-parameter system -> (delta pose, step_ok, x).

    Mirrors minimizePointToPlaneErrFunc + vector6ToTransformMatrix
    (CameraPoseFinderICP.cpp:95-145): reject det(ATA) < 1e-10, solve by
    Cholesky, reject |angle| / ||t|| above the shake thresholds.
    """
    ata = a7[:6, :6]
    atb = a7[:6, 6]
    det = jnp.linalg.det(ata)
    solvable = det >= 1e-10
    ata_safe = jnp.where(solvable, ata, jnp.eye(6, dtype=jnp.float32))
    # LLT like the reference; cho_solve is fine for SPD 6x6
    factor = jax.scipy.linalg.cho_factor(ata_safe)
    x = jax.scipy.linalg.cho_solve(factor, atb)
    delta, angle, dist = delta_pose_from_6dof(x)
    ok = solvable & (angle <= shake_angle) & (dist <= shake_dist) & jnp.all(jnp.isfinite(x))
    return delta, ok, x


def icp_track(
    new_v_pyr: list[Array],
    new_n_pyr: list[Array],
    model_v_pyr: list[Array],
    model_n_pyr: list[Array],
    pose: Array,
    cam: CameraIntrinsics,
    cfg: IcpConfig,
    reduce_fn=None,
    model_pose: Array | None = None,
) -> IcpResult:
    """Multi-level GN: coarse -> fine with the reference's iteration
    table (10/5/4). `reduce_fn` optionally wraps the (7,7) normal-matrix
    reduction (identity on one device; lax.psum over the mesh axis when
    sharded).

    The model maps are WORLD-space maps organized in the image grid of
    the camera at `model_pose` (default: `pose` — frame-to-model
    tracking, where the model was raycast from the previous frame's
    camera; the reference's estimateCameraPose setup,
    CameraPoseFinderICP.cpp:62-63). Keyframe-pair alignment passes the
    other keyframe's pose here: associating through the wrong camera
    grid collapses the correspondence count as soon as the two poses
    differ.
    """
    if reduce_fn is None:
        reduce_fn = lambda a: a

    mp = pose if model_pose is None else model_pose
    last_transform_inv = se3_inverse(mp)
    iters = cfg.iters_per_level

    cur = pose
    ok = jnp.array(True)
    residual = jnp.array(0.0, jnp.float32)
    num_corr = jnp.array(0, jnp.int32)

    for level in range(cfg.pyramid_levels - 1, -1, -1):
        cam_l = cam.level(level)
        nv, nn = new_v_pyr[level], new_n_pyr[level]
        mv, mn = model_v_pyr[level], model_n_pyr[level]
        # Level 0: the gather table is the full-res model map and the
        # gather dominates the iteration (measured 1.9 ms vs 0.64 at the
        # 4x-smaller level 1 — XLA:TPU gathers fall off a cliff past
        # ~300k table rows, tools/prof_r5f.py). Two mitigations:
        #  - compact [z|n] association table (pack_model_zn), built ONCE
        #    per level outside the GN loop; the world vertex is
        #    reconstructed on the looked-up pixel's ray (f32-exact at
        #    level 0, where model vertices lie on exact pixel rays);
        #  - cfg.coarse_assoc (fast configs): source rows come from the
        #    ALREADY-BUILT averaged level-1 pyramid (subsample_pick's
        #    strided reshape/slice costs ~1.4 ms/frame in layout copies
        #    on TPU — the pyramid is free), and the association goes
        #    into the HALF-RES model pyramid -> 76.8k-row table on the
        #    fast gather path. +-1 px association slides the target
        #    along the surface — first-order invisible to point-to-plane.
        if level == 0 and cfg.coarse_assoc and cfg.pyramid_levels >= 2:
            # (measured: a PICKED full-res-sampled source instead of the
            # averaged L1 pyramid moves ATE only 0.137 -> 0.131 cm — the
            # mode's accuracy cost is inherent to half-res association,
            # not to source averaging; hence coarse_assoc ships off)
            nv, nn = new_v_pyr[1], new_n_pyr[1]
            mv, mn = model_v_pyr[1], model_n_pyr[1]
            cam_a = cam.level(1)
        else:
            if level == 0 and cfg.source_subsample > 1:
                s = cfg.source_subsample
                nv, nn = F.subsample_pick(nv, s), F.subsample_pick(nn, s)
            cam_a = cam_l
        zn = pack_model_zn(mv, mn, last_transform_inv) if level == 0 else None

        def body(carry, nv=nv, nn=nn, mv=mv, mn=mn, cam_a=cam_a, zn=zn):
            i, cur, ok, residual, num_corr, stop = carry
            rows, valid = icp_rows(
                nv, nn, mv, mn, cam_a, cur, last_transform_inv,
                cfg.dist_thresh_m, cfg.normal_sin_thresh,
                model_zn=zn, model_pose=mp if zn is not None else None,
            )
            a7 = reduce_fn(normal_equations(rows))
            delta, step_ok, x = solve_gn_step(a7, cfg.angle_shake_rad, cfg.dist_shake_m)
            apply = ok & step_ok
            cur = jnp.where(apply, delta @ cur, cur)
            ok = ok & step_ok
            n_val = reduce_fn(jnp.sum(valid.astype(jnp.int32)))
            res = reduce_fn(jnp.sum(jnp.abs(rows[..., 6]))) / jnp.maximum(
                n_val.astype(jnp.float32), 1.0
            )
            converged = jnp.linalg.norm(x) < cfg.converge_eps
            # stop on convergence or rejection: further iterations are
            # no-ops either way (once ok is False the pose never updates)
            stop = (converged & jnp.array(cfg.converge_eps > 0)) | ~ok
            return i + 1, cur, ok, res, n_val, stop

        carry = (jnp.array(0, jnp.int32), cur, ok, residual, num_corr, jnp.array(False))
        carry = jax.lax.while_loop(
            lambda c: (c[0] < iters[level]) & ~c[5], lambda c: body(c), carry
        )
        _, cur, ok, residual, num_corr, _ = carry

    # Cumulative per-FRAME shake gate: the reference only checks each GN
    # step's delta (CameraPoseFinderICP.cpp:104-107), which many small
    # steps evade — observed as a 46 cm "converged" jump at frame 1 on a
    # weight-1 noisy model (128^3 drift eval). A camera at 30 fps cannot
    # teleport; reject the frame when the TOTAL motion exceeds the same
    # shake thresholds.
    ok = (
        ok
        & (rotation_angle(cur[:3, :3] @ pose[:3, :3].T) <= cfg.angle_shake_rad)
        & (jnp.linalg.norm(cur[:3, 3] - pose[:3, 3]) <= cfg.dist_shake_m)
    )
    return IcpResult(pose=cur, ok=ok, residual=residual, num_corr=num_corr)
