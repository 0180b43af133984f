"""SE(3) / camera geometry primitives, pure jnp and jit-friendly.

Semantics match the reference system's math layer (see SURVEY.md §2.3/§2.5):
  - pinhole project/unproject: /root/reference/src/cuda/DepthCamera.h:19-43
    (nearest-pixel projection uses the +0.5 rounding of the reference)
  - SE(3) direct exponential map with sinc/mcosc/msinc small-angle guards:
    /root/reference/src/utils/eigen_utils.cpp:42-127 (ViSP-style), here
    re-derived branchless for XLA.
  - small-delta Euler X*Y*Z pose increment:
    /root/reference/src/CameraPoseFinderICP.cpp:95-111

Everything is float32, shapes static, no Python control flow on traced
values — safe inside jit / pallas callers.

Conventions:
  - poses are 4x4 camera-to-world matrices ("transform" in the reference)
  - points/vectors are (..., 3) arrays; transform_points applies R@p + t,
    rotate_vectors applies R@p only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

Array = jnp.ndarray

# Small-angle thresholds of the reference exp-map (eigen_utils.cpp:39-40).
_ANG_MIN_SINC = 1.0e-8
_ANG_MIN_MC = 2.5e-4


# ---------------------------------------------------------------------------
# Camera model
# ---------------------------------------------------------------------------


class CameraIntrinsics(NamedTuple):
    """Pinhole camera; static (Python) values so it can be closed over by jit."""

    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float

    def half(self) -> "CameraIntrinsics":
        """Next pyramid level: everything halved (CameraPoseFinderICP.cpp:35-46)."""
        return CameraIntrinsics(
            width=self.width // 2,
            height=self.height // 2,
            fx=self.fx / 2.0,
            fy=self.fy / 2.0,
            cx=self.cx / 2.0,
            cy=self.cy / 2.0,
        )

    def level(self, l: int) -> "CameraIntrinsics":
        cam = self
        for _ in range(l):
            cam = cam.half()
        return cam


def unproject(u: Array, v: Array, depth: Array, cam: CameraIntrinsics) -> Array:
    """Pixel (u,v) + depth -> camera-space point (...,3).

    Matches DepthCamera::depthToSkeleton (DepthCamera.h:19-29).
    """
    x = depth * (u - cam.cx) / cam.fx
    y = depth * (v - cam.cy) / cam.fy
    return jnp.stack([x, y, depth], axis=-1)


def project_float(p: Array, cam: CameraIntrinsics) -> tuple[Array, Array]:
    """Camera-space point -> continuous pixel coords (u, v).

    Matches DepthCamera::projectSkeletonToScreenfloat (DepthCamera.h:30-38).
    """
    z = p[..., 2]
    u = p[..., 0] * cam.fx / z + cam.cx
    v = p[..., 1] * cam.fy / z + cam.cy
    return u, v


def project_nearest(p: Array, cam: CameraIntrinsics) -> tuple[Array, Array]:
    """Camera-space point -> integer pixel coords with the reference's
    (int)(x + 0.5) rounding (DepthCamera.h:39-43).

    Uses floor(x + 0.5); identical to the C cast for non-negative coords,
    and out-of-image (negative) coords are rejected by callers anyway.
    """
    u, v = project_float(p, cam)
    ui = jnp.floor(u + 0.5).astype(jnp.int32)
    vi = jnp.floor(v + 0.5).astype(jnp.int32)
    return ui, vi


def pixel_grid(cam: CameraIntrinsics) -> tuple[Array, Array]:
    """(H,W) arrays of u (column) and v (row) pixel indices, float32."""
    v = jnp.arange(cam.height, dtype=jnp.float32)[:, None]
    u = jnp.arange(cam.width, dtype=jnp.float32)[None, :]
    return jnp.broadcast_to(u, (cam.height, cam.width)), jnp.broadcast_to(
        v, (cam.height, cam.width)
    )


# ---------------------------------------------------------------------------
# SE(3) basics
# ---------------------------------------------------------------------------


def se3_identity() -> Array:
    return jnp.eye(4, dtype=jnp.float32)


def se3_from_rt(r: Array, t: Array) -> Array:
    """Build 4x4 from (3,3) rotation and (3,) translation."""
    top = jnp.concatenate([r, t.reshape(3, 1)], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)
    return jnp.concatenate([top, bottom], axis=0).astype(jnp.float32)


def se3_inverse(t_mat: Array) -> Array:
    """Closed-form rigid inverse: [Rᵀ | -Rᵀt]."""
    r = t_mat[:3, :3]
    t = t_mat[:3, 3]
    rt = r.T
    return se3_from_rt(rt, -rt @ t)


def transform_points(t_mat: Array, pts: Array) -> Array:
    """Apply 4x4 rigid transform to (...,3) points."""
    return pts @ t_mat[:3, :3].T + t_mat[:3, 3]


def rotate_vectors(t_mat: Array, vecs: Array) -> Array:
    """Apply only the rotation part to (...,3) vectors (w=0 transform)."""
    return vecs @ t_mat[:3, :3].T


def rotation_angle(r: Array) -> Array:
    """Rotation angle of a 3x3 rotation matrix via its trace."""
    c = (jnp.trace(r) - 1.0) * 0.5
    return jnp.arccos(jnp.clip(c, -1.0, 1.0))


# ---------------------------------------------------------------------------
# Rotations: axis-angle, Euler, quaternion
# ---------------------------------------------------------------------------


def _sinc(x: Array) -> Array:
    """sin(x)/x with the reference's small-angle cutoff (eigen_utils.cpp:42-46)."""
    safe = jnp.where(jnp.abs(x) < _ANG_MIN_SINC, 1.0, x)
    return jnp.where(jnp.abs(x) < _ANG_MIN_SINC, 1.0, jnp.sin(safe) / safe)


def _mcosc(x: Array) -> Array:
    """(1-cos x)/x² with cutoff 0.5 (eigen_utils.cpp:48-52)."""
    safe = jnp.where(jnp.abs(x) < _ANG_MIN_MC, 1.0, x)
    return jnp.where(jnp.abs(x) < _ANG_MIN_MC, 0.5, (1.0 - jnp.cos(safe)) / (safe * safe))


def _msinc(x: Array) -> Array:
    """(1-sin(x)/x)/x² with cutoff 1/6 (eigen_utils.cpp:54-58)."""
    safe = jnp.where(jnp.abs(x) < _ANG_MIN_MC, 1.0, x)
    return jnp.where(
        jnp.abs(x) < _ANG_MIN_MC, 1.0 / 6.0, (1.0 - jnp.sin(safe) / safe) / (safe * safe)
    )


def axis_angle_to_rotation(u: Array) -> Array:
    """Rodrigues' formula, branchless (reference UThetaToAffine3d,
    eigen_utils.cpp:60-82)."""
    theta = jnp.sqrt(jnp.sum(u * u) + 1e-24)  # +eps: finite grad at u=0 (pose-graph AD)
    co = jnp.cos(theta)
    sinc = _sinc(theta)
    mcosc = _mcosc(theta)
    ux, uy, uz = u[0], u[1], u[2]
    r = jnp.array(
        [
            [co + mcosc * ux * ux, -sinc * uz + mcosc * ux * uy, sinc * uy + mcosc * ux * uz],
            [sinc * uz + mcosc * uy * ux, co + mcosc * uy * uy, -sinc * ux + mcosc * uy * uz],
            [-sinc * uy + mcosc * uz * ux, sinc * ux + mcosc * uz * uy, co + mcosc * uz * uz],
        ],
        dtype=jnp.float32,
    )
    return r


def exp_se3(twist: Array) -> Array:
    """Direct exponential map of a 6-twist [ω | v] -> 4x4.

    Matches eigen_utils::direct_exponential_map (eigen_utils.cpp:84-127):
    rotation by Rodrigues, translation through the so(3) left-Jacobian
    coupling with sinc/mcosc/msinc small-angle guards.
    """
    u = twist[:3]
    vt = twist[3:]
    r = axis_angle_to_rotation(u)
    theta = jnp.sqrt(jnp.sum(u * u) + 1e-24)  # +eps: finite grad at u=0 (pose-graph AD)
    sinc = _sinc(theta)
    mcosc = _mcosc(theta)
    msinc = _msinc(theta)
    ux, uy, uz = u[0], u[1], u[2]
    jac = jnp.array(
        [
            [sinc + ux * ux * msinc, ux * uy * msinc - uz * mcosc, ux * uz * msinc + uy * mcosc],
            [ux * uy * msinc + uz * mcosc, sinc + uy * uy * msinc, uy * uz * msinc - ux * mcosc],
            [ux * uz * msinc - uy * mcosc, uy * uz * msinc + ux * mcosc, sinc + uz * uz * msinc],
        ],
        dtype=jnp.float32,
    )
    return se3_from_rt(r, jac @ vt)


def log_so3(r: Array) -> Array:
    """Rotation matrix -> axis-angle vector (inverse of
    axis_angle_to_rotation).

    Autodiff-safe at the identity (pose-graph residuals are
    differentiated exactly there): angle comes from atan2 of the skew
    norm (safe sqrt) and trace instead of arccos, whose derivative blows
    up at +-1. Ill-conditioned only near angle = pi.
    """
    w = jnp.array(
        [r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]], jnp.float32
    )
    s = jnp.sqrt(jnp.sum(w * w) + 1e-24)  # = 2 sin(angle), AD-safe
    c = jnp.trace(r) - 1.0  # = 2 cos(angle)
    angle = jnp.arctan2(s, c)
    # axis*angle = w * angle / (2 sin angle); limit at 0 is w/2
    return w * (angle / s)


def log_se3(t_mat: Array) -> Array:
    """4x4 rigid transform -> 6-twist [w | v], inverse of exp_se3."""
    w = log_so3(t_mat[:3, :3])
    theta = jnp.sqrt(jnp.sum(w * w) + 1e-24)
    sinc = _sinc(theta)
    mcosc = _mcosc(theta)
    msinc = _msinc(theta)
    ux, uy, uz = w[0], w[1], w[2]
    jac = jnp.array(
        [
            [sinc + ux * ux * msinc, ux * uy * msinc - uz * mcosc, ux * uz * msinc + uy * mcosc],
            [ux * uy * msinc + uz * mcosc, sinc + uy * uy * msinc, uy * uz * msinc - ux * mcosc],
            [ux * uz * msinc - uy * mcosc, uy * uz * msinc + ux * mcosc, sinc + uz * uz * msinc],
        ],
        jnp.float32,
    )
    v = jnp.linalg.solve(jac, t_mat[:3, 3])
    return jnp.concatenate([w, v])


def euler_xyz_to_rotation(angles: Array) -> Array:
    """R = Rx(a0) @ Ry(a1) @ Rz(a2) — the reference tracker's delta-pose
    parameterization (CameraPoseFinderICP.cpp:97-99)."""
    a, b, c = angles[0], angles[1], angles[2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    rx = jnp.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]], dtype=jnp.float32)
    ry = jnp.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]], dtype=jnp.float32)
    rz = jnp.array([[cc, -sc, 0], [sc, cc, 0], [0, 0, 1]], dtype=jnp.float32)
    return rx @ ry @ rz


def delta_pose_from_6dof(x: Array) -> tuple[Array, Array, Array]:
    """6-vector (rx,ry,rz,tx,ty,tz) -> (4x4 delta, rotation angle, |t|).

    The caller applies the reference's shake rejection thresholds to the
    returned magnitudes (CameraPoseFinderICP.cpp:95-111).
    """
    r = euler_xyz_to_rotation(x[:3])
    t = x[3:]
    return se3_from_rt(r, t), rotation_angle(r), jnp.linalg.norm(t)


def quaternion_to_rotation(q: Array) -> Array:
    """Unit quaternion (x, y, z, w) -> 3x3 rotation matrix (TUM convention)."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.array(
        [
            [1.0 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1.0 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1.0 - (xx + yy)],
        ],
        dtype=jnp.float32,
    )


def rotation_to_quaternion(r: Array) -> Array:
    """3x3 rotation -> unit quaternion (x, y, z, w), branchless.

    Uses the 4-candidate construction (largest of 1±trace terms) combined
    with where-selects so it is jit-safe.
    """
    m00, m01, m02 = r[0, 0], r[0, 1], r[0, 2]
    m10, m11, m12 = r[1, 0], r[1, 1], r[1, 2]
    m20, m21, m22 = r[2, 0], r[2, 1], r[2, 2]
    tr = m00 + m11 + m22
    # four squared magnitudes (non-negative up to fp error)
    qw2 = jnp.maximum(0.0, 1.0 + tr) / 4.0
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22) / 4.0
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22) / 4.0
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22) / 4.0
    # candidate quats, one per dominant component
    def safe(x):
        return jnp.where(x > 1e-20, x, 1.0)

    qw_w = jnp.sqrt(qw2)
    cand_w = jnp.array(
        [(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw2], dtype=jnp.float32
    ) / (4.0 * safe(qw_w))
    qx_x = jnp.sqrt(qx2)
    cand_x = jnp.array(
        [4.0 * qx2, (m01 + m10), (m02 + m20), (m21 - m12)], dtype=jnp.float32
    ) / (4.0 * safe(qx_x))
    qy_y = jnp.sqrt(qy2)
    cand_y = jnp.array(
        [(m01 + m10), 4.0 * qy2, (m12 + m21), (m02 - m20)], dtype=jnp.float32
    ) / (4.0 * safe(qy_y))
    qz_z = jnp.sqrt(qz2)
    cand_z = jnp.array(
        [(m02 + m20), (m12 + m21), 4.0 * qz2, (m10 - m01)], dtype=jnp.float32
    ) / (4.0 * safe(qz_z))

    mags = jnp.array([qw2, qx2, qy2, qz2])
    best = jnp.argmax(mags)
    q = jnp.select(
        [best == 0, best == 1, best == 2, best == 3],
        [cand_w, cand_x, cand_y, cand_z],
    )
    return q / jnp.linalg.norm(q)
