"""x-sharded TSDF fusion over a 1-D device mesh ("space" axis).

Design (idiomatic TPU, see SURVEY.md §2.7):

  - The volume's three arrays are sharded along voxel-x:
    NamedSharding(mesh, P('space')). Each device owns an (R/N, R, R)
    slab; slab i covers global voxel x in [i*R/N, (i+1)*R/N).
  - Ops run under shard_map. Where an op needs neighbor voxels (trilinear
    reads at slab faces, raycast stencils), the body first performs a
    HALO EXCHANGE: each shard ppermutes its boundary slices to its
    neighbors and concatenates them, yielding an (R/N + 2H, R, R)
    extended slab. Volume edges are zero-padded (weight 0 == "never
    observed"), which reproduces the dense border semantics because
    trilinear validity already rejects border voxels.
  - integrate is embarrassingly local (each voxel projects into the
    broadcast depth frame) — no halo, no collectives.
  - ICP/SDF normal equations: each shard computes partial (7,7) moment
    matrices and lax.psum's them over 'space' — an EXACT sum
    decomposition of the dense reduction (the two-stage CUDA reduction
    of CalPointToPlaneErrSolverParams.cu:90-127 with the second stage
    replaced by an ICI all-reduce). For ICP the image rows are the
    natural shard axis; for SDF each pixel is claimed by the shard
    owning its unperturbed sample point.
  - raycast: every shard marches all rays over the global t-grid but
    claims only zero crossings whose current sample falls in its owned
    world-x interval; the global first hit is a pmin over 'space' of the
    claimed hit parameters, and the winning shard's refined outputs are
    combined with a masked psum.

Works identically on N real devices (TPU pod) and on the virtual 8-CPU
mesh used in CI (xla_force_host_platform_device_count).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from tsdfjax.config import AppConfig
from tsdfjax import frames as F
from tsdfjax import volume as V
from tsdfjax import raycast as R
from tsdfjax.geometry import se3_inverse
from tsdfjax.ops.sweep import fast_integrate_sharded, fast_raycast_sharded
from tsdfjax.trackers.icp import icp_rows, normal_equations, pack_model_zn, solve_gn_step
from tsdfjax.trackers import sdf as sdf_mod
from tsdfjax.pipeline import FusionState, FrameDiagnostics, init_state

Array = jnp.ndarray

HALO_DEFAULT = 4


def make_space_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), axis_names=("space",))


def required_halo(cfg: AppConfig) -> int:
    """Halo (voxels) so every stencil the sharded ops run stays inside
    the extended slab:
      raycast: previous sample up to ceil(step/voxel) voxels away, plus
      gradient (+-1 cell) and trilinear support (+-1) around the refined
      vertex -> ceil(step/voxel) + 3.
      sdf tracker: 1 voxel translation perturbation + rotation sweep
      (~w_h * max depth) + trilinear support -> <= 4 in practice."""
    step_vox = cfg.raycast.ray_increment_m / cfg.volume.voxel_size_m
    return max(int(math.ceil(step_vox)) + 3, HALO_DEFAULT)


def _halo_exchange(local: Array, halo: int, axis_name: str = "space") -> Array:
    """(B, R, R[,C]) local slab -> (B + 2*halo, R, R[,C]) extended slab.

    Boundary slices travel one hop along the mesh ring via ppermute
    (left edge from the left neighbor, right edge from the right);
    global-edge shards receive zeros, matching 'unobserved' semantics.
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:  # static: no neighbors -> both halos are zero ("unobserved")
        z = jnp.zeros_like(local[:halo])
        return jnp.concatenate([z, local, z], axis=0)
    idx = jax.lax.axis_index(axis_name)
    right_piece = local[-halo:]  # sent rightward: becomes neighbor's left halo
    left_piece = local[:halo]  # sent leftward: becomes neighbor's right halo
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]
    from_left = jax.lax.ppermute(right_piece, axis_name, fwd)
    from_right = jax.lax.ppermute(left_piece, axis_name, bwd)
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right), from_right)
    return jnp.concatenate([from_left, local, from_right], axis=0)


class ShardedFusion:
    """Owner of the mesh + sharded jitted step. The FusionState layout is
    identical to the dense engine; only array shardings differ, so states
    round-trip between dense and sharded execution."""

    def __init__(
        self,
        cfg: AppConfig,
        mesh: Mesh | None = None,
        mode: str | None = None,
        fast_ops: bool | None = None,
    ):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_space_mesh()
        if mode is None:
            sw = cfg.switches
            mode = "file" if sw.use_traj_from_file else ("sdf" if sw.use_sdf_tracker else "icp")
        self.mode = mode
        self.with_color = cfg.switches.use_color
        # MXU shear-warp integrate/raycast under sharding (default: follow
        # the config, like the dense engine). fast_ops also selects the
        # gather-free sdf_track_sweep_sharded tracker; only the exact path
        # uses the halo-sampled 13-point kernel.
        self.fast_ops = cfg.fast_ops if fast_ops is None else fast_ops
        self.n = self.mesh.devices.size
        if cfg.volume.resolution % self.n:
            raise ValueError("volume resolution must divide the mesh size")
        self.halo = required_halo(cfg)
        self._vol_sharding = NamedSharding(self.mesh, P("space"))
        self._rep = NamedSharding(self.mesh, P())
        self.state = self._shard_state(init_state(cfg))
        self._step = self._build_step(self.mode)
        self._file_step = None  # lazily built for reintegrate()
        self._batch_steps = {}  # (mode, k) -> k-frame scan step

    def _shard_state(self, state: FusionState) -> FusionState:
        vol = V.TsdfVolume(
            tsdf=jax.device_put(state.volume.tsdf, self._vol_sharding),
            weight=jax.device_put(state.volume.weight, self._vol_sharding),
            color=jax.device_put(state.volume.color, self._vol_sharding),
        )
        rep = lambda x: jax.device_put(x, self._rep)
        return FusionState(
            volume=vol,
            pose=rep(state.pose),
            model_vertices=rep(state.model_vertices),
            model_normals=rep(state.model_normals),
            model_color=rep(state.model_color),
            frame_id=rep(state.frame_id),
            lost_count=rep(state.lost_count),
        )

    # ------------------------------------------------------------------
    # sharded step construction
    # ------------------------------------------------------------------

    def _build_step(self, mode, batch: int = 1):
        cfg = self.cfg
        with_color = self.with_color
        halo = self.halo
        res = cfg.volume.resolution
        block = res // self.n
        cell = cfg.volume.voxel_size_m

        vol_spec = V.TsdfVolume(tsdf=P("space"), weight=P("space"), color=P("space"))
        state_spec = FusionState(
            volume=vol_spec, pose=P(), model_vertices=P(), model_normals=P(),
            model_color=P(), frame_id=P(), lost_count=P(),
        )
        diag_spec = FrameDiagnostics(
            tracking_ok=P(), integrated_voxels=P(), tracker_residual=P(),
            tracker_corr=P(), pose=P(),
        )

        def psum(x):
            return jax.lax.psum(x, "space")

        def body(state: FusionState, depth_m, rgb, ext_pose):
            idx = jax.lax.axis_index("space")
            x0_own = idx * block  # global voxel x of the local slab start
            own_lo = x0_own.astype(jnp.float32) * cell
            own_hi = (x0_own + block).astype(jnp.float32) * cell
            x0_ext = x0_own - halo

            pre = cfg.preprocess
            trunced, filtered, verts, normals = F.preprocess_depth(
                depth_m, cfg.depth_camera, pre.min_trunc_m, pre.max_trunc_m,
                pre.sigma_pixel, pre.sigma_depth,
            )
            sdf_depth = (
                filtered if cfg.sdf_tracker.use_filtered_depth else trunced
            )

            # ---------------- tracking ----------------
            # Collectives (psum/ppermute) may not diverge across devices,
            # so instead of lax.cond on frame_id==0 (as the dense path
            # does) the trackers always run and frame 0 is a masked
            # select — SPMD-safe and costs one wasted GN loop once.
            frame0 = state.frame_id == 0
            if mode in ("file", "none"):
                pose = ext_pose if mode == "file" else state.pose
                ok = jnp.array(True)
                residual = jnp.array(0.0, jnp.float32)
                corr = jnp.array(0, jnp.int32)
            elif mode == "icp":
                levels = cfg.icp.pyramid_levels
                # DP over pixels: each shard handles an image row band;
                # band boundaries halve consistently with the pyramid
                nv = F.build_pyramid(verts, levels, F.downsample_vertices)
                nn = F.build_pyramid(normals, levels, F.downsample_normals)
                mv = F.build_pyramid(state.model_vertices, levels, F.downsample_vertices)
                mn = F.build_pyramid(state.model_normals, levels, F.downsample_normals)
                last_inv = se3_inverse(state.pose)
                cur = state.pose
                ok = jnp.array(True)
                residual = jnp.array(0.0, jnp.float32)
                corr = jnp.array(0, jnp.int32)
                nsh = self.n
                for level in range(levels - 1, -1, -1):
                    cam_l = cfg.depth_camera.level(level)
                    nv_lvl, nn_lvl = nv[level], nn[level]
                    mv_l, mn_l = mv[level], mn[level]
                    # same round-5 fast-path treatment as the dense
                    # tracker (trackers/icp.py): level 0 sources the
                    # averaged level-1 pyramid and associates into the
                    # half-res model table via the compact [z|n] pack
                    if level == 0 and cfg.icp.coarse_assoc and levels >= 2:
                        nv_lvl, nn_lvl = nv[1], nn[1]
                        mv_l, mn_l = mv[1], mn[1]
                        cam_l = cfg.depth_camera.level(1)
                    elif level == 0 and cfg.icp.source_subsample > 1:
                        ss = cfg.icp.source_subsample
                        nv_lvl, nn_lvl = F.subsample_pick(nv_lvl, ss), F.subsample_pick(nn_lvl, ss)
                    zn = (
                        pack_model_zn(mv_l, mn_l, last_inv)
                        if level == 0 else None
                    )
                    # exact row partition: pad to a multiple of the mesh
                    # size with invalid rows (zero contributions), so no
                    # shard double-counts when height % n != 0
                    band = -(-nv_lvl.shape[0] // nsh)
                    pad = band * nsh - nv_lvl.shape[0]
                    nv_p = jnp.pad(nv_lvl, ((0, pad), (0, 0), (0, 0)))
                    nn_p = jnp.pad(nn_lvl, ((0, pad), (0, 0), (0, 0)))
                    r0 = idx * band
                    nv_l = jax.lax.dynamic_slice_in_dim(nv_p, r0, band, 0)
                    nn_l = jax.lax.dynamic_slice_in_dim(nn_p, r0, band, 0)

                    def it_body(carry, nv_l=nv_l, nn_l=nn_l, mv_l=mv_l,
                                mn_l=mn_l, cam_l=cam_l, zn=zn):
                        i, cur, ok, residual, corr, stop = carry
                        rows, valid = icp_rows(
                            nv_l, nn_l, mv_l, mn_l, cam_l, cur, last_inv,
                            cfg.icp.dist_thresh_m, cfg.icp.normal_sin_thresh,
                            model_zn=zn,
                            model_pose=state.pose if zn is not None else None,
                        )
                        a7 = psum(normal_equations(rows))
                        delta, step_ok, x = solve_gn_step(
                            a7, cfg.icp.angle_shake_rad, cfg.icp.dist_shake_m
                        )
                        apply = ok & step_ok
                        cur = jnp.where(apply, delta @ cur, cur)
                        ok = ok & step_ok
                        n_val = psum(jnp.sum(valid.astype(jnp.int32)))
                        res = psum(jnp.sum(jnp.abs(rows[..., 6]))) / jnp.maximum(
                            n_val.astype(jnp.float32), 1.0
                        )
                        # same early exit as the dense tracker (icp_track):
                        # x derives from the psum'd system, so every shard
                        # agrees and the loop stays SPMD-lockstep
                        converged = jnp.linalg.norm(x) < cfg.icp.converge_eps
                        stop = (converged & jnp.array(cfg.icp.converge_eps > 0)) | ~ok
                        return i + 1, cur, ok, res, n_val, stop

                    n_iters = cfg.icp.iters_per_level[level]
                    carry = (jnp.array(0, jnp.int32), cur, ok, residual,
                             corr, jnp.array(False))
                    carry = jax.lax.while_loop(
                        lambda c: (c[0] < n_iters) & ~c[5], it_body, carry
                    )
                    _, cur, ok, residual, corr, _ = carry
                pose = jnp.where(frame0, state.pose, jnp.where(ok, cur, state.pose))
                ok = ok | frame0
            elif mode == "sdf":
                if self.fast_ops:
                    # gather-free sweep tracker under the k-band
                    # decomposition (sdf_track_sweep_sharded): per-iter
                    # normal equations psum, no volume halo needed
                    res_t = sdf_mod.sdf_track_sweep_sharded(
                        state.volume, sdf_depth, state.pose, cfg.depth_camera,
                        cfg.volume, cfg.sdf_tracker,
                        sdf_trunc_m=cfg.integrate.sdf_trunc_m,
                        axis_name="space",
                    )
                else:
                    ext_vol = V.TsdfVolume(
                        tsdf=_halo_exchange(state.volume.tsdf, halo),
                        weight=_halo_exchange(state.volume.weight, halo),
                        color=_halo_exchange(state.volume.color, halo),
                    )
                    res_t = sdf_mod.sdf_track(
                        ext_vol, sdf_depth, state.pose, cfg.depth_camera,
                        cfg.volume, cfg.sdf_tracker, reduce_fn=psum,
                        x0=x0_ext, own_x_range=(own_lo, own_hi),
                    )
                pose = jnp.where(
                    frame0, state.pose, jnp.where(res_t.ok, res_t.pose, state.pose)
                )
                ok = res_t.ok | frame0
                residual = res_t.residual
                corr = res_t.num_valid
            else:
                raise ValueError(mode)

            # ---------------- integrate (local) ----------------
            def do_integrate(vol):
                if self.fast_ops:
                    return fast_integrate_sharded(
                        vol, trunced, normals, rgb if with_color else None, pose,
                        cfg.depth_camera, cfg.rgb_camera, cfg.volume, cfg.integrate,
                        color_angle_weight=cfg.switches.color_angle_weight, x0=x0_own,
                    )
                return V.integrate(
                    vol, trunced, normals, rgb if with_color else None, pose,
                    cfg.depth_camera, cfg.rgb_camera, cfg.volume, cfg.integrate,
                    color_angle_weight=cfg.switches.color_angle_weight, x0=x0_own,
                )

            def no_integrate(vol):
                # pvary: keep branch output types identical (the count is
                # per-shard "varying" in the true branch)
                return vol, jax.lax.pvary(jnp.array(0, jnp.int32), "space")

            vol, count = jax.lax.cond(ok, do_integrate, no_integrate, state.volume)
            count = psum(count)

            # ---------------- raycast ----------------
            if self.fast_ops:
                # per-shard k-band shear-warp sweep; candidates merge on
                # camera depth inside fast_raycast_sharded (1/N of the
                # dense slice work per shard, vs the exact path's full
                # t-grid march on every shard)
                rc = fast_raycast_sharded(
                    vol, pose, cfg.depth_camera, cfg.volume,
                    cfg.preprocess.min_trunc_m, cfg.preprocess.max_trunc_m,
                    with_color=with_color, sdf_trunc_m=cfg.integrate.sdf_trunc_m,
                    x0=x0_own, axis_name="space",
                )
                model_v, model_n, model_c = rc.vertices, rc.normals, rc.color
            else:
                # exact path: halo-extended slab + full t-grid march with
                # ownership masking, then pmin first-hit combine
                ext2 = V.TsdfVolume(
                    tsdf=_halo_exchange(vol.tsdf, halo),
                    weight=_halo_exchange(vol.weight, halo),
                    color=_halo_exchange(vol.color, halo),
                )
                rc = R.raycast(
                    ext2, pose, cfg.depth_camera, cfg.volume,
                    cfg.raycast.ray_increment_m, cfg.preprocess.min_trunc_m,
                    cfg.preprocess.max_trunc_m, with_color=with_color,
                    x0=x0_ext, own_x_range=(own_lo, own_hi), axis_name="space",
                )
                # global first hit = min claimed ray parameter over shards
                # (the t-grid is identical on every shard, so the winner's
                # outputs — including 'refinement failed -> zeros', matching
                # dense break-on-invalid semantics — are psum-selected)
                tkey = jnp.where(rc.found, rc.hit_t, jnp.inf)
                tmin = jax.lax.pmin(tkey, "space")
                win = rc.found & (tkey == tmin)
                winf = win[..., None].astype(jnp.float32)
                model_v = psum(rc.vertices * winf)
                model_n = psum(rc.normals * winf)
                model_c = psum(rc.color * winf)

            new_state = FusionState(
                volume=vol, pose=pose, model_vertices=model_v,
                model_normals=model_n, model_color=model_c,
                frame_id=state.frame_id + 1,
                lost_count=state.lost_count + jnp.where(ok, 0, 1),
            )
            diag = FrameDiagnostics(
                tracking_ok=ok, integrated_voxels=count,
                tracker_residual=residual, tracker_corr=corr, pose=pose,
            )
            return new_state, diag

        if batch > 1:
            # Frame batching (SCALING.md mitigation #1): lax.scan over k
            # frames INSIDE the shard_map body, so the fixed per-dispatch
            # overhead (shard_map launch + tunnel round trip, measured
            # 0.8-1.2 ms) is paid once per k frames instead of per frame.
            # Collectives stay lockstep: every scan iteration runs the
            # same psum/ppermute sequence on every shard.
            def body_k(state, depths, rgbs, ext_poses):
                def f(st, xs):
                    st2, diag = body(st, *xs)
                    return st2, diag

                return jax.lax.scan(f, state, (depths, rgbs, ext_poses))

            smapped = shard_map(
                body_k, mesh=self.mesh,
                in_specs=(state_spec, P(), P(), P()),
                out_specs=(state_spec, diag_spec),
            )
        else:
            smapped = shard_map(
                body, mesh=self.mesh,
                in_specs=(state_spec, P(), P(), P()),
                out_specs=(state_spec, diag_spec),
            )
        # donate the state: volume slabs update in place on each device
        return jax.jit(smapped, donate_argnums=(0,))

    def step(self, depth_m, rgb=None, ext_pose=None) -> FrameDiagnostics:
        cam = self.cfg.depth_camera
        if rgb is None:
            rgb = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
        if ext_pose is None:
            ext_pose = jnp.eye(4, dtype=jnp.float32)
        self.state, diag = self._step(
            self.state, jnp.asarray(depth_m, jnp.float32),
            jnp.asarray(rgb, jnp.float32), jnp.asarray(ext_pose, jnp.float32),
        )
        return diag

    def step_batch(self, depths, rgbs=None, ext_poses=None):
        """Process k frames in ONE dispatch (lax.scan inside shard_map) —
        amortizes the fixed per-dispatch overhead that dominates the
        multi-host scaling model's non-parallel term (SCALING.md §3
        mitigation 1). Returns stacked FrameDiagnostics (leading axis k).
        Semantically identical to k sequential step() calls."""
        k = len(depths)
        key = (self.mode, k)
        if key not in self._batch_steps:
            self._batch_steps[key] = self._build_step(self.mode, batch=k)
        cam = self.cfg.depth_camera
        d = jnp.stack([jnp.asarray(x, jnp.float32) for x in depths])
        r = (
            jnp.stack([jnp.asarray(x, jnp.float32) for x in rgbs])
            if rgbs is not None
            else jnp.zeros((k, cam.height, cam.width, 3), jnp.float32)
        )
        p = (
            jnp.stack([jnp.asarray(x, jnp.float32) for x in ext_poses])
            if ext_poses is not None
            else jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (k, 4, 4))
        )
        self.state, diags = self._batch_steps[key](self.state, d, r, p)
        return diags

    def reintegrate(self, keyframes, live_pose=None) -> int:
        """Sharded counterpart of FusionEngine.reintegrate: rebuild the
        volume slabs from stored keyframe depths at their (optimized)
        poses via a lazily-built 'file'-mode sharded step (map-pose
        consistency after a loop-closure correction)."""
        kfs = [kf for kf in keyframes if kf.depth_m is not None]
        if not kfs:
            return 0
        if self._file_step is None:
            self._file_step = self._build_step("file")
        old = self.state
        state = self._shard_state(init_state(self.cfg))
        cam = self.cfg.depth_camera
        dummy_rgb = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
        for kf in kfs:
            rgb = (
                jnp.asarray(kf.rgb, jnp.float32)
                if (kf.rgb is not None and self.with_color) else dummy_rgb
            )
            state, _diag = self._file_step(
                state, jnp.asarray(kf.depth_m, jnp.float32), rgb,
                jnp.asarray(kf.pose, jnp.float32),
            )
        self.state = state._replace(
            frame_id=old.frame_id,
            lost_count=old.lost_count,
            pose=jax.device_put(
                jnp.asarray(
                    kfs[-1].pose if live_pose is None else live_pose,
                    jnp.float32,
                ),
                self._rep,
            ),
        )
        return len(kfs)

    def extract_mesh(self, max_triangles: int = 1_500_000,
                     with_color: bool | None = None,
                     compute_normals: bool = True):
        """Distributed marching cubes on the current sharded volume."""
        return extract_mesh_sharded(
            self.state.volume, self.cfg.volume, self.mesh,
            max_triangles=max_triangles,
            with_color=self.with_color if with_color is None else with_color,
            compute_normals=compute_normals,
        )

    def save_checkpoint(self, dir_path: str) -> None:
        """Per-shard slab checkpoint (each host writes only what it owns)."""
        from tsdfjax.checkpoint import save_state_sharded

        save_state_sharded(dir_path, self.state, self.cfg)

    def load_checkpoint(self, dir_path: str) -> None:
        from tsdfjax.checkpoint import load_state_sharded

        self.state = load_state_sharded(dir_path, self.cfg, self.mesh)


# ---------------------------------------------------------------------------
# distributed mesh extraction (SURVEY.md §7 step 8: per-shard marching
# cubes on the 1-voxel-halo-extended slab, host-side concat, then the
# usual weld — marchingcube.cu:138-153 + MeshGeneratorMarchingcube.cpp)
# ---------------------------------------------------------------------------


def marching_cubes_sharded(
    volume: V.TsdfVolume,
    vol_cfg,
    device_mesh: Mesh,
    max_triangles_per_shard: int,
    with_color: bool = False,
    iso_threshold: float | None = None,
):
    """Per-shard triangle soups: returns host numpy
    (soup_vertices (M,3,3), soup_colors (M,3,3), overflow:int) where the
    concatenated soup is ordered exactly like the dense x-major scan (so
    the welded mesh is identical to the dense extraction's)."""
    from tsdfjax.mesh import _marching_cubes_impl

    n = device_mesh.devices.size
    res = vol_cfg.resolution
    block = res // n

    def body(tsdf, weight, color):
        idx = jax.lax.axis_index("space")
        # one right-halo voxel slice: cells with base x at the slab's last
        # owned voxel read corners from the neighbor; the global top shard
        # pads zeros (weight 0 -> the phantom cell row is never observed)
        def right_halo(a):
            bwd = [(i + 1, i) for i in range(n - 1)]
            from_right = jax.lax.ppermute(a[:1], "space", bwd)
            from_right = jnp.where(
                idx == n - 1, jnp.zeros_like(from_right), from_right
            )
            return jnp.concatenate([a, from_right], axis=0)

        buf = _marching_cubes_impl(
            right_halo(tsdf), right_halo(weight), right_halo(color), vol_cfg,
            max_triangles_per_shard, iso_threshold, with_color, None,
            x0=idx * block, axis_name="space",
        )
        return (buf.vertices, buf.colors, buf.count[None], buf.overflow[None])

    smapped = shard_map(
        body, mesh=device_mesh,
        in_specs=(P("space"), P("space"), P("space")),
        out_specs=(P("space"), P("space"), P("space"), P("space")),
    )
    v, c, counts, overflow = jax.jit(smapped)(
        volume.tsdf, volume.weight, volume.color
    )
    v = np.asarray(v).reshape(n, max_triangles_per_shard, 3, 3)
    c = np.asarray(c).reshape(n, max_triangles_per_shard, 3, 3)
    counts = np.asarray(counts)
    soup_v = np.concatenate([v[i, : counts[i]] for i in range(n)], axis=0)
    soup_c = np.concatenate([c[i, : counts[i]] for i in range(n)], axis=0)
    return soup_v, soup_c, int(np.asarray(overflow).sum())


def extract_mesh_sharded(
    volume: V.TsdfVolume,
    vol_cfg,
    device_mesh: Mesh,
    max_triangles: int = 1_500_000,
    with_color: bool = False,
    compute_normals: bool = True,
    merge_eps: float = 1e-4,
):
    """One-call distributed pipeline: per-shard marching cubes -> host
    concat -> weld -> normals. Equals tsdfjax.mesh.extract_mesh on the
    same (gathered) volume: every shard gets the FULL triangle budget (a
    locally dense surface — e.g. a wall inside one x-slab — must not be
    truncated by a rigid 1/N share) and the GLOBAL budget is enforced on
    the concatenated soup, which is in dense x-major order, so the kept
    prefix matches the dense extraction's drop-at-capacity exactly."""
    from tsdfjax.mesh import Mesh as TriMesh, weld_mesh, compute_vertex_normals

    soup_v, soup_c, overflow = marching_cubes_sharded(
        volume, vol_cfg, device_mesh, max_triangles, with_color=with_color
    )
    if len(soup_v) > max_triangles:
        overflow += len(soup_v) - max_triangles
        soup_v = soup_v[:max_triangles]
        soup_c = soup_c[:max_triangles]
    mesh = weld_mesh(
        soup_v.reshape(-1, 3), soup_c.reshape(-1, 3) if with_color else None,
        merge_eps,
    )
    if not with_color:
        mesh.colors = None
    if compute_normals:
        compute_vertex_normals(mesh)
    return mesh
