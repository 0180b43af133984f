"""Ablation timing of process_frame variants on the real bench workload."""
import time, sys, functools
import numpy as np
import jax, jax.numpy as jnp

from tsdfjax.config import AppConfig, IcpConfig, SwitchConfig
from tsdfjax.pipeline import init_state, initial_pose, FusionState, FrameDiagnostics
from tsdfjax import synthetic as syn
from tsdfjax import frames as F
from tsdfjax.ops.sweep import fast_integrate, fast_raycast
from tsdfjax.trackers.icp import icp_track

cfg = AppConfig(switches=SwitchConfig(use_color=False), icp=IcpConfig(pyramid_levels=3))
cam = cfg.depth_camera
scene = syn.default_scene(cfg.volume.size_m)
c = cfg.volume.size_m / 2.0
start = initial_pose(cfg)
radius = c + cfg.preprocess.min_trunc_m
target = np.array([c, c, c])
poses = [start]
n_warm, n_meas = 3, 20
for i in range(1, n_warm + n_meas):
    ang = 0.004 * i
    eye = np.array([c + radius * np.sin(ang), c, c - radius * np.cos(ang)])
    poses.append(syn.look_at(eye, target))
render = jax.jit(lambda p: syn.render_depth(p, cam, scene))
frames_dev = [render(jnp.asarray(p, jnp.float32)) for p in poses]
jax.block_until_ready(frames_dev)
pre = cfg.preprocess

def make_step(do_track, do_integrate, do_raycast):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, depth):
        trunced, _f, verts, normals = F.preprocess_depth(
            depth, cam, pre.min_trunc_m, pre.max_trunc_m, pre.sigma_pixel, pre.sigma_depth)
        pose = state.pose
        ok = jnp.array(True)
        if do_track:
            L = cfg.icp.pyramid_levels
            nv = F.build_pyramid(verts, L, F.downsample_vertices)
            nn = F.build_pyramid(normals, L, F.downsample_normals)
            mv = F.build_pyramid(state.model_vertices, L, F.downsample_vertices)
            mn = F.build_pyramid(state.model_normals, L, F.downsample_normals)
            def frame0(_):
                return state.pose, jnp.array(True)
            def run(_):
                r = icp_track(nv, nn, mv, mn, state.pose, cam, cfg.icp)
                return jnp.where(r.ok, r.pose, state.pose), r.ok
            pose, ok = jax.lax.cond(state.frame_id == 0, frame0, run, None)
        vol = state.volume
        if do_integrate:
            vol, _cnt = fast_integrate(vol, trunced, normals, None, pose, cam,
                                       cfg.rgb_camera, cfg.volume, cfg.integrate)
        mvert, mnorm = state.model_vertices, state.model_normals
        if do_raycast:
            rc = fast_raycast(vol, pose, cam, cfg.volume, pre.min_trunc_m,
                              pre.max_trunc_m, with_color=False, sdf_trunc_m=cfg.integrate.sdf_trunc_m)
            mvert, mnorm = rc.vertices, rc.normals
        return FusionState(volume=vol, pose=pose, model_vertices=mvert,
                           model_normals=mnorm, model_color=state.model_color,
                           frame_id=state.frame_id + 1, lost_count=state.lost_count)
    return step

@jax.jit
def probe(state):
    return (state.pose.sum() + state.volume.tsdf[::64, ::64, ::64].sum()
            + state.model_vertices[::32, ::32].sum())

def run(name, step):
    state = init_state(cfg)
    for k in range(n_warm):
        state = step(state, frames_dev[k])
    float(probe(state))
    t0 = time.perf_counter(); float(probe(state)); floor = time.perf_counter() - t0
    t0 = time.perf_counter()
    for k in range(n_warm, n_warm + n_meas):
        state = step(state, frames_dev[k])
    float(probe(state))
    dt = (time.perf_counter() - t0 - floor) / n_meas
    print(f"{name:32s} {dt*1000:7.2f} ms/frame", file=sys.stderr)
    return dt

run("preprocess only", make_step(False, False, False))
run("pre+track", make_step(True, False, False))
run("pre+integrate", make_step(False, True, False))
run("pre+raycast", make_step(False, False, True))
run("pre+integrate+raycast", make_step(False, True, True))
run("FULL", make_step(True, True, True))
