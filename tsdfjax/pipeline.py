"""The fusion pipeline: one jitted process_frame(state, frame) step.

Functional redesign of the reference's HybKinectfu::processNewFrame
(HybKinectfu.cpp:98-160) + CudaDeviceDataMan singleton: all mutable
device state becomes the FusionState pytree threaded through a pure
step function. The entire per-frame pipeline — preprocess, pyramid
build, tracking GN loops, TSDF integrate, raycast — is ONE XLA program
per frame; the reference instead launches ~30 kernels with a
cudaDeviceSynchronize each plus per-GN-iteration host syncs.

Per-frame flow (matching MainController::mainLoop + processNewFrame):
  1. truncate + bilateral-filter depth, build vertex/normal maps
  2. track: 'file' (external pose), 'icp', 'sdf', or 'none'
  3. on success: integrate into the TSDF volume
     on failure: keep old pose, skip integrate ("camera lost" — the
     reference blocks on a keypress, we report status instead,
     SURVEY.md §5 failure detection)
  4. raycast model maps from the (possibly unchanged) pose — always,
     like the reference (HybKinectfu.cpp:149)
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tsdfjax.config import AppConfig
from tsdfjax import frames as F
from tsdfjax import volume as V
from tsdfjax import raycast as R
from tsdfjax.trackers.icp import icp_track
from tsdfjax.trackers.sdf import sdf_track, sdf_track_sweep
from tsdfjax.ops.sweep import fast_integrate, fast_raycast

Array = jnp.ndarray


class FusionState(NamedTuple):
    volume: V.TsdfVolume
    pose: Array  # (4,4) camera-to-world
    model_vertices: Array  # (H,W,3) world-space, from last raycast
    model_normals: Array  # (H,W,3)
    model_color: Array  # (H,W,3)
    frame_id: Array  # () int32
    lost_count: Array  # () int32 — frames with failed tracking


class FrameDiagnostics(NamedTuple):
    tracking_ok: Array
    integrated_voxels: Array
    tracker_residual: Array
    tracker_corr: Array
    pose: Array


def initial_pose(cfg: AppConfig) -> np.ndarray:
    """Reference start pose: camera centered in front of the volume at
    z = -min_trunc (HybKinectfu.cpp:51-57)."""
    p = np.eye(4, dtype=np.float32)
    half = cfg.volume.size_m / 2.0
    p[:3, 3] = [half, half, -cfg.preprocess.min_trunc_m]
    return p


def init_state(cfg: AppConfig, pose: np.ndarray | None = None) -> FusionState:
    cam = cfg.depth_camera
    h, w = cam.height, cam.width
    return FusionState(
        volume=V.allocate(cfg.volume),
        pose=jnp.asarray(initial_pose(cfg) if pose is None else pose, jnp.float32),
        model_vertices=jnp.zeros((h, w, 3), jnp.float32),
        model_normals=jnp.zeros((h, w, 3), jnp.float32),
        model_color=jnp.zeros((h, w, 3), jnp.float32),
        frame_id=jnp.array(0, jnp.int32),
        lost_count=jnp.array(0, jnp.int32),
    )


def _track(cfg: AppConfig, mode: str, state: FusionState, trunced, verts, normals, ext_pose):
    """Returns (pose, ok, residual, corr). On failure the pose reverts to
    the previous frame's pose, like the reference (pose only assigned on
    success, CameraPoseFinderICP.cpp:84)."""
    if mode == "file":
        return ext_pose, jnp.array(True), jnp.array(0.0, jnp.float32), jnp.array(0, jnp.int32)
    if mode == "none":
        return state.pose, jnp.array(True), jnp.array(0.0, jnp.float32), jnp.array(0, jnp.int32)

    def frame0(_):
        return state.pose, jnp.array(True), jnp.array(0.0, jnp.float32), jnp.array(0, jnp.int32)

    if mode == "icp":
        levels = cfg.icp.pyramid_levels

        def run(_):
            nv = F.build_pyramid(verts, levels, F.downsample_vertices)
            nn = F.build_pyramid(normals, levels, F.downsample_normals)
            mv = F.build_pyramid(state.model_vertices, levels, F.downsample_vertices)
            mn = F.build_pyramid(state.model_normals, levels, F.downsample_normals)
            res = icp_track(nv, nn, mv, mn, state.pose, cfg.depth_camera, cfg.icp)
            pose = jnp.where(res.ok, res.pose, state.pose)
            return pose, res.ok, res.residual, res.num_corr

        return jax.lax.cond(state.frame_id == 0, frame0, run, None)

    if mode == "sdf":

        def run(_):
            if cfg.fast_ops:
                res = sdf_track_sweep(
                    state.volume, trunced, state.pose, cfg.depth_camera,
                    cfg.volume, cfg.sdf_tracker,
                    sdf_trunc_m=cfg.integrate.sdf_trunc_m,
                )
            else:
                res = sdf_track(
                    state.volume, trunced, state.pose, cfg.depth_camera,
                    cfg.volume, cfg.sdf_tracker,
                )
            pose = jnp.where(res.ok, res.pose, state.pose)
            return pose, res.ok, res.residual, res.num_valid

        return jax.lax.cond(state.frame_id == 0, frame0, run, None)

    raise ValueError(f"unknown tracker mode {mode!r}")


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mode", "with_color"),
    donate_argnames=("state",),
)
def process_frame(
    cfg: AppConfig,
    mode: str,
    with_color: bool,
    state: FusionState,
    depth_m: Array,
    rgb: Array,
    ext_pose: Array,
) -> tuple[FusionState, FrameDiagnostics]:
    """One frame through the full pipeline. `rgb` is (H,W,3) float32
    0..255 (ignored when with_color=False); `ext_pose` is the externally
    provided pose for mode='file' (ignored otherwise, pass anything).

    `state` is DONATED: the ~0.5 GB volume arrays update in place on
    device (the moral equivalent of the reference's persistent
    CudaDeviceDataMan buffers); callers must not reuse the passed state.
    """
    pre = cfg.preprocess
    trunced, filtered, verts, normals = F.preprocess_depth(
        depth_m, cfg.depth_camera, pre.min_trunc_m, pre.max_trunc_m,
        pre.sigma_pixel, pre.sigma_depth,
    )

    # the SDF tracker takes raw trunced depth for reference parity
    # (CalSDFErrSolverParams.cu), optionally the bilateral-filtered map
    # (config.SdfTrackerConfig.use_filtered_depth) — the same noise
    # treatment the ICP path gets via its filtered vertex maps
    sdf_depth = filtered if cfg.sdf_tracker.use_filtered_depth else trunced
    pose, ok, residual, corr = _track(cfg, mode, state, sdf_depth, verts, normals, ext_pose)

    # Skip-on-lost without lax.cond: a zero depth map makes integrate a
    # bitwise no-op (every update requires a valid nonzero depth) and
    # count == 0, while a cond's 256^3 branch boundaries forced volume
    # layout copies (~0.4-0.6 ms) on EVERY frame. The rare lost frame
    # pays a wasted integrate pass instead — the right trade.
    trunced_eff = jnp.where(ok, trunced, 0.0)
    if cfg.fast_ops:
        vol, count = fast_integrate(
            state.volume, trunced_eff, normals, rgb if with_color else None,
            pose, cfg.depth_camera, cfg.rgb_camera, cfg.volume, cfg.integrate,
            color_angle_weight=cfg.switches.color_angle_weight,
        )
    else:
        vol, count = V.integrate(
            state.volume, trunced_eff, normals, rgb if with_color else None,
            pose, cfg.depth_camera, cfg.rgb_camera, cfg.volume, cfg.integrate,
            color_angle_weight=cfg.switches.color_angle_weight,
        )

    if cfg.fast_ops:
        rc = fast_raycast(
            vol, pose, cfg.depth_camera, cfg.volume,
            pre.min_trunc_m, pre.max_trunc_m, with_color=with_color,
            sdf_trunc_m=cfg.integrate.sdf_trunc_m,
        )
    else:
        rc = R.raycast(
            vol, pose, cfg.depth_camera, cfg.volume,
            cfg.raycast.ray_increment_m, pre.min_trunc_m, pre.max_trunc_m,
            with_color=with_color,
        )

    new_state = FusionState(
        volume=vol,
        pose=pose,
        model_vertices=rc.vertices,
        model_normals=rc.normals,
        model_color=rc.color,
        frame_id=state.frame_id + 1,
        lost_count=state.lost_count + jnp.where(ok, 0, 1),
    )
    diag = FrameDiagnostics(
        tracking_ok=ok,
        integrated_voxels=count,
        tracker_residual=residual,
        tracker_corr=corr,
        pose=pose,
    )
    return new_state, diag


class FusionEngine:
    """Convenience host-side wrapper: owns config + state, exposes
    step(depth, rgb, pose). The jitted step is shared across frames."""

    def __init__(self, cfg: AppConfig, mode: str | None = None):
        self.cfg = cfg
        if mode is None:
            sw = cfg.switches
            mode = "file" if sw.use_traj_from_file else ("sdf" if sw.use_sdf_tracker else "icp")
        self.mode = mode
        self.with_color = cfg.switches.use_color
        self.state = init_state(cfg)
        self._dummy_rgb = jnp.zeros(
            (cfg.depth_camera.height, cfg.depth_camera.width, 3), jnp.float32
        )
        self._dummy_pose = jnp.eye(4, dtype=jnp.float32)

    def step(self, depth_m, rgb=None, ext_pose=None) -> FrameDiagnostics:
        rgb = self._dummy_rgb if rgb is None else jnp.asarray(rgb, jnp.float32)
        ext_pose = (
            self._dummy_pose if ext_pose is None else jnp.asarray(ext_pose, jnp.float32)
        )
        self.state, diag = process_frame(
            self.cfg, self.mode, self.with_color, self.state,
            jnp.asarray(depth_m, jnp.float32), rgb, ext_pose,
        )
        return diag

    def reintegrate(self, keyframes, live_pose=None) -> int:
        """Rebuild the volume from stored keyframe depths at their
        (optimized) poses — map-pose consistency after a loop-closure
        correction. Yanking only the live pose desynchronizes it from
        the map fused under the DRIFTED poses, which measurably
        destabilizes tracking (VERDICT r3: every live-correction A/B was
        negative); re-fusing the kept keyframe depths (keyframes.py
        stores them; the reference's KeyframeMan keeps the same data,
        keyframeMan.h:36-70) under the optimized trajectory gives
        tracking a consistent map to continue against.

        Runs the normal 'file'-mode step per keyframe, so the final
        raycast leaves model maps rendered from the LAST keyframe's
        pose — correction events fire on keyframe frames, so that pose
        IS the corrected live pose. Returns the number of re-fused
        keyframes. `live_pose` overrides the pose the state keeps
        afterwards (defaults to the last keyframe's pose).

        COVERAGE LIMIT: the rebuilt map holds only what the stored
        keyframe depths saw. The keyframe deque is bounded
        (KeyframeManager max_keyframes, default 50 at every-100 spacing
        = 5000 frames of coverage); once it saturates, evicted regions
        and all non-keyframe observations are dropped by the rebuild.
        The caller (app.py) warns when re-fusing from a saturated deque;
        raise max_keyframes for long sequences if full coverage after a
        late loop closure matters.
        """
        kfs = [kf for kf in keyframes if kf.depth_m is not None]
        if not kfs:
            return 0
        old = self.state
        state = init_state(self.cfg, pose=np.asarray(kfs[0].pose))
        for kf in kfs:
            rgb = (
                jnp.asarray(kf.rgb, jnp.float32)
                if (kf.rgb is not None and self.with_color) else self._dummy_rgb
            )
            state, _diag = process_frame(
                self.cfg, "file", self.with_color, state,
                jnp.asarray(kf.depth_m, jnp.float32), rgb,
                jnp.asarray(kf.pose, jnp.float32),
            )
        self.state = state._replace(
            frame_id=old.frame_id,
            lost_count=old.lost_count,
            pose=jnp.asarray(
                kfs[-1].pose if live_pose is None else live_pose, jnp.float32
            ),
        )
        return len(kfs)
