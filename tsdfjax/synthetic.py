"""Analytic synthetic RGB-D scenes for tests and benchmarks.

The reference has no tests; SURVEY.md §4.2 defines our golden-pipeline
strategy instead: render depth frames of a closed-form scene (spheres +
axis-aligned walls) from known poses, fuse them, and compare raycast /
mesh output against the analytic surface. This module is that renderer.

World convention matches the engine: the volume occupies [0, size]^3 and
the camera starts in front of it looking +z (HybKinectfu.cpp:51-57).
Camera frame: x right, y down, z forward.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tsdfjax.geometry import CameraIntrinsics, pixel_grid, unproject

Array = jnp.ndarray


class Sphere(NamedTuple):
    center: tuple[float, float, float]
    radius: float


class AAWall(NamedTuple):
    """Axis-aligned plane `coord[axis] = offset` with outward normal
    -sign * e_axis (visible to rays travelling in +sign*axis direction)."""

    axis: int
    offset: float
    sign: float = 1.0


# Back-compat alias used by early tests
def ZWall(z0: float) -> AAWall:  # noqa: N802
    return AAWall(axis=2, offset=z0, sign=1.0)


class Box(NamedTuple):
    """Oriented box: |R^T (p - center)| <= half (componentwise). `rot` is
    the box-to-world rotation as a row-major 9-tuple (hashable for jit
    static closure, like the other primitives)."""

    center: tuple[float, float, float]
    half: tuple[float, float, float]
    rot: tuple[float, ...] = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


class Scene(NamedTuple):
    spheres: tuple[Sphere, ...] = ()
    walls: tuple[AAWall, ...] = ()
    boxes: tuple[Box, ...] = ()


def default_scene(volume_size: float = 2.0) -> Scene:
    """Two spheres inside a three-wall corner. The orthogonal planes make
    the point-to-plane system full-rank at every pyramid level (a single
    back wall leaves 3 DoF unconstrained and coarse-level ICP singular —
    exactly the failure the reference would also hit)."""
    c = volume_size / 2.0
    return Scene(
        spheres=(Sphere((c, c, c), 0.3 * c), Sphere((c * 0.6, c * 1.3, c * 0.8), 0.18 * c)),
        walls=(
            AAWall(axis=2, offset=volume_size * 0.75, sign=1.0),  # back wall
            AAWall(axis=0, offset=volume_size * 0.85, sign=1.0),  # right wall
            AAWall(axis=1, offset=volume_size * 0.85, sign=1.0),  # floor (y down)
        ),
    )


def cluttered_scene(volume_size: float = 2.0, seed: int = 7) -> Scene:
    """Non-axis-aligned clutter: rotated boxes + spheres at mixed depths
    inside the same three-wall corner (VERDICT r3 item 5: the default
    axis-aligned-planes scene is the easiest possible case for
    point-to-plane ICP and hides rotation/sliding failure modes). The
    tilted box faces put surface normals at generic orientations, so
    rotational drift is observable and sliding along a dominant plane is
    penalized. Deterministic for a given seed."""
    c = volume_size / 2.0
    rng = np.random.default_rng(seed)

    def rand_rot() -> tuple[float, ...]:
        # random rotation via QR of a gaussian matrix (Haar-ish; exact
        # distribution is irrelevant, genericity is the point)
        q, r = np.linalg.qr(rng.normal(size=(3, 3)))
        q *= np.sign(np.diag(r))
        if np.linalg.det(q) < 0:
            q[:, 2] *= -1
        return tuple(np.asarray(q, np.float64).reshape(-1).tolist())

    boxes = []
    # mixed depths: near clutter at z ~ 0.4..0.7 V, mid at ~ 0.75..0.95 V
    for i in range(6):
        zc = c * (0.8 + 0.55 * (i % 3) / 2.0)
        xc = c * (0.45 + 0.55 * ((i * 2) % 5) / 4.0 + 0.25 * rng.uniform(-1, 1))
        yc = c * (0.55 + 0.5 * ((i * 3) % 4) / 3.0 + 0.2 * rng.uniform(-1, 1))
        half = tuple((c * rng.uniform(0.06, 0.16, size=3)).tolist())
        boxes.append(Box(center=(xc, yc, zc), half=half, rot=rand_rot()))
    spheres = (
        Sphere((c * 1.25, c * 0.8, c * 1.35), 0.16 * c),
        Sphere((c * 0.55, c * 1.25, c * 1.1), 0.12 * c),
    )
    return Scene(
        spheres=spheres,
        walls=(
            AAWall(axis=2, offset=volume_size * 0.95, sign=1.0),  # back wall
            AAWall(axis=0, offset=volume_size * 0.9, sign=1.0),  # right wall
            AAWall(axis=1, offset=volume_size * 0.9, sign=1.0),  # floor
        ),
        boxes=tuple(boxes),
    )


def look_at(eye: np.ndarray, target: np.ndarray, down_hint=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Camera-to-world pose with +z forward, +y down, +x right."""
    eye = np.asarray(eye, np.float64)
    f = np.asarray(target, np.float64) - eye
    f = f / np.linalg.norm(f)
    d_hint = np.asarray(down_hint, np.float64)
    r = np.cross(d_hint, f)
    n = np.linalg.norm(r)
    if n < 1e-8:  # forward parallel to hint; pick another
        d_hint = np.array([0.0, 0.0, 1.0])
        r = np.cross(d_hint, f)
        n = np.linalg.norm(r)
    r = r / n
    d = np.cross(f, r)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0] = r
    pose[:3, 1] = d
    pose[:3, 2] = f
    pose[:3, 3] = eye
    return pose


def orbit_trajectory(
    n_frames: int,
    volume_size: float = 2.0,
    radius: float = 1.2,
    arc_rad: float = 0.6,
    height: float | None = None,
) -> list[np.ndarray]:
    """Poses sweeping an arc in front of the volume, always looking at its
    center. Small inter-frame motion (arc/n per frame) so ICP converges."""
    c = volume_size / 2.0
    target = np.array([c, c, c])
    h = c if height is None else height
    poses = []
    for i in range(n_frames):
        ang = (i / max(n_frames - 1, 1) - 0.5) * arc_rad
        eye = np.array([c + radius * np.sin(ang), h, c - radius * np.cos(ang)])
        poses.append(look_at(eye, target))
    return poses


def render_depth(pose: Array, cam: CameraIntrinsics, scene: Scene) -> Array:
    """Exact per-pixel depth (camera z, meters) of the scene from `pose`.

    Rays are cast with direction = R @ unproject(u, v, 1), so the ray
    parameter t IS the camera-frame depth.
    """
    pose = jnp.asarray(pose, jnp.float32)
    u, v = pixel_grid(cam)
    d_cam = unproject(u, v, jnp.ones_like(u), cam)
    dirs = d_cam @ pose[:3, :3].T  # (H, W, 3), camera-z-normalized
    o = pose[:3, 3]

    t_best = jnp.full(u.shape, jnp.inf, jnp.float32)
    for sph in scene.spheres:
        ctr = jnp.array(sph.center, jnp.float32)
        oc = o - ctr
        a = jnp.sum(dirs * dirs, axis=-1)
        b = 2.0 * jnp.sum(dirs * oc, axis=-1)
        c0 = jnp.sum(oc * oc) - sph.radius**2
        disc = b * b - 4.0 * a * c0
        t = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * a)
        t = jnp.where((disc > 0) & (t > 0), t, jnp.inf)
        t_best = jnp.minimum(t_best, t)
    for wall in scene.walls:
        da = dirs[..., wall.axis]
        t = (wall.offset - o[wall.axis]) / da
        facing = wall.sign * da > 0  # ray hits the wall's front face
        t = jnp.where((t > 0) & facing, t, jnp.inf)
        t_best = jnp.minimum(t_best, t)
    for box in scene.boxes:
        # slab test in the box frame (the reference's volume-AABB slab
        # test, raycastingVolume.cu:45-63, generalized to an oriented box)
        r = jnp.asarray(box.rot, jnp.float32).reshape(3, 3)
        ob = (o - jnp.asarray(box.center, jnp.float32)) @ r  # origin, box frame
        db = dirs @ r  # (H, W, 3)
        half = jnp.asarray(box.half, jnp.float32)
        dsafe = jnp.where(jnp.abs(db) > 1e-12, db, 1e-12)
        t1 = (-half - ob) / dsafe
        t2 = (half - ob) / dsafe
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        t = jnp.where((tmax >= tmin) & (tmin > 0), tmin, jnp.inf)
        t_best = jnp.minimum(t_best, t)

    return jnp.where(jnp.isfinite(t_best), t_best, 0.0).astype(jnp.float32)


def render_rgb(pose: Array, cam: CameraIntrinsics, scene: Scene) -> Array:
    """Cheap lambertian-ish shading from the depth gradient so color
    fusion has real signal; (H, W, 3) float32 in [0, 255]."""
    from tsdfjax.frames import depth_to_vertices, vertices_to_normals

    depth = render_depth(pose, cam, scene)
    verts = depth_to_vertices(depth, cam)
    normals = vertices_to_normals(verts)
    shade = jnp.clip(-normals[..., 2], 0.0, 1.0)
    base = jnp.stack(
        [jnp.full_like(shade, 0.8), jnp.full_like(shade, 0.6), jnp.full_like(shade, 0.4)],
        axis=-1,
    )
    return (base * shade[..., None] * 255.0).astype(jnp.float32)
