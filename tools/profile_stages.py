"""Per-stage timing of the fusion pipeline on the current device (dev tool)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from tsdfjax.config import AppConfig, IcpConfig, SwitchConfig
from tsdfjax.pipeline import FusionEngine, init_state, initial_pose
from tsdfjax import synthetic as syn
from tsdfjax import frames as F
from tsdfjax.ops.sweep import fast_integrate, fast_raycast
from tsdfjax.trackers.icp import icp_track

cfg = AppConfig(switches=SwitchConfig(use_color=False), icp=IcpConfig(pyramid_levels=3))
cam = cfg.depth_camera
scene = syn.default_scene(cfg.volume.size_m)
pose0 = initial_pose(cfg)
render = jax.jit(lambda p: syn.render_depth(p, cam, scene))
depth = render(jnp.asarray(pose0, jnp.float32))
state = init_state(cfg)

pre = cfg.preprocess

@jax.jit
def stage_pre(depth):
    return F.preprocess_depth(depth, cam, pre.min_trunc_m, pre.max_trunc_m,
                              pre.sigma_pixel, pre.sigma_depth)

trunced, filt, verts, normals = stage_pre(depth)

@jax.jit
def stage_icp(verts, normals, mv, mn, pose):
    L = cfg.icp.pyramid_levels
    nv = F.build_pyramid(verts, L, F.downsample_vertices)
    nn = F.build_pyramid(normals, L, F.downsample_normals)
    mvp = F.build_pyramid(mv, L, F.downsample_vertices)
    mnp = F.build_pyramid(mn, L, F.downsample_normals)
    r = icp_track(nv, nn, mvp, mnp, pose, cam, cfg.icp)
    return r.pose, r.ok

@jax.jit
def stage_integrate(vol, trunced, normals, pose):
    return fast_integrate(vol, trunced, normals, None, pose, cam, cfg.rgb_camera,
                          cfg.volume, cfg.integrate,
                          color_angle_weight=cfg.switches.color_angle_weight)

@jax.jit
def stage_raycast(vol, pose):
    return fast_raycast(vol, pose, cam, cfg.volume, pre.min_trunc_m, pre.max_trunc_m,
                        with_color=False, sdf_trunc_m=cfg.integrate.sdf_trunc_m)

pose = jnp.asarray(pose0, jnp.float32)
vol, cnt = stage_integrate(state.volume, trunced, normals, pose)
rc = stage_raycast(vol, pose)
mv, mn = rc.vertices, rc.normals
p2, ok = stage_icp(verts, normals, mv, mn, pose)

def probe(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(jnp.sum(l[..., ::8].astype(jnp.float32)) if l.ndim else l.astype(jnp.float32) for l in leaves))

def bench(name, fn, *args, n=10):
    fn(*args)  # warm
    r = fn(*args); probe(r)
    # floor: one probe round-trip
    t = time.perf_counter(); probe(r); floor = time.perf_counter() - t
    t = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    probe(r)
    dt = (time.perf_counter() - t - floor) / n
    print(f"{name:12s} {dt*1000:8.2f} ms", file=sys.stderr)
    return dt

bench("preprocess", stage_pre, depth)
bench("icp(19GN)", stage_icp, verts, normals, mv, mn, pose)
bench("integrate", stage_integrate, state.volume, trunced, normals, pose)
bench("raycast", stage_raycast, vol, pose)
