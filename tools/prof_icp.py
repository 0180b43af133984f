"""Micro-profile of ICP GN iteration cost (dev tool)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from tsdfjax.config import AppConfig, IcpConfig, SwitchConfig
from tsdfjax.pipeline import init_state, initial_pose
from tsdfjax import synthetic as syn
from tsdfjax import frames as F
from tsdfjax.ops.sweep import fast_integrate, fast_raycast
from tsdfjax.trackers import icp as I

cfg = AppConfig(switches=SwitchConfig(use_color=False), icp=IcpConfig(pyramid_levels=3))
cam = cfg.depth_camera
scene = syn.default_scene(cfg.volume.size_m)
pose0 = initial_pose(cfg)
render = jax.jit(lambda p: syn.render_depth(p, cam, scene))
depth = render(jnp.asarray(pose0, jnp.float32))
state = init_state(cfg)
pre = cfg.preprocess

trunced, filt, verts, normals = F.preprocess_depth(
    depth, cam, pre.min_trunc_m, pre.max_trunc_m, pre.sigma_pixel, pre.sigma_depth)
pose = jnp.asarray(pose0, jnp.float32)
vol, cnt = fast_integrate(state.volume, trunced, normals, None, pose, cam,
                          cfg.rgb_camera, cfg.volume, cfg.integrate)
rc = fast_raycast(vol, pose, cam, cfg.volume, pre.min_trunc_m, pre.max_trunc_m,
                  with_color=False, sdf_trunc_m=cfg.integrate.sdf_trunc_m)
mv, mn = rc.vertices, rc.normals

L = cfg.icp.pyramid_levels
nv_p = F.build_pyramid(verts, L, F.downsample_vertices)
nn_p = F.build_pyramid(normals, L, F.downsample_normals)
mv_p = F.build_pyramid(mv, L, F.downsample_vertices)
mn_p = F.build_pyramid(mn, L, F.downsample_normals)
jax.block_until_ready(nv_p + nn_p + mv_p + mn_p)


def probe(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(jnp.sum(l.astype(jnp.float32)) if l.size < 64 else
                     jnp.sum(l.reshape(-1)[::257].astype(jnp.float32)) for l in leaves))


def bench(name, fn, *args, n=20):
    fn(*args); r = fn(*args); probe(r)
    t = time.perf_counter(); probe(r); floor = time.perf_counter() - t
    t = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    probe(r)
    dt = (time.perf_counter() - t - floor) / n
    print(f"{name:28s} {dt*1000:8.3f} ms", file=sys.stderr)
    return dt


def make_track(iters):
    c = IcpConfig(pyramid_levels=3, iters_coarse_to_fine=iters)
    @jax.jit
    def f(pose):
        r = I.icp_track(nv_p, nn_p, mv_p, mn_p, pose, cam, c)
        return r.pose, r.ok
    return f

# is iters_per_level configurable? check attribute
print("iters_per_level:", cfg.icp.iters_per_level, file=sys.stderr)

# rows+NE at each level, single iteration
inv = jnp.linalg.inv(pose)
for lvl in [0, 1, 2]:
    cam_l = cam.level(lvl)
    @jax.jit
    def one(pose, lvl=lvl, cam_l=cam_l):
        rows, valid = I.icp_rows(nv_p[lvl], nn_p[lvl], mv_p[lvl], mn_p[lvl],
                                 cam_l, pose, inv, cfg.icp.dist_thresh_m,
                                 cfg.icp.normal_sin_thresh)
        return I.normal_equations(rows)
    bench(f"rows+NE level{lvl}", one, pose)

# solve alone
a7 = jax.jit(lambda p: I.normal_equations(
    I.icp_rows(nv_p[0], nn_p[0], mv_p[0], mn_p[0], cam, p, inv,
               cfg.icp.dist_thresh_m, cfg.icp.normal_sin_thresh)[0]))(pose)
jax.block_until_ready(a7)

@jax.jit
def solve_only(a7):
    return I.solve_gn_step(a7, cfg.icp.angle_shake_rad, cfg.icp.dist_shake_m)[0]
bench("solve 6x6 (1x)", solve_only, a7)

@jax.jit
def solve_loop(a7):
    def body(i, a):
        d, ok, x = I.solve_gn_step(a, cfg.icp.angle_shake_rad, cfg.icp.dist_shake_m)
        return a + jnp.pad(d, ((0, 3), (0, 3))) * 1e-9
    return jax.lax.fori_loop(0, 19, body, a7)
bench("solve 6x6 (19x loop)", solve_loop, a7)

# full track
@jax.jit
def full(pose):
    r = I.icp_track(nv_p, nn_p, mv_p, mn_p, pose, cam, cfg.icp)
    return r.pose, r.ok
bench("icp_track full (19 iters)", full, pose)

@jax.jit
def pyr4(verts, normals, mv, mn):
    a = F.build_pyramid(verts, L, F.downsample_vertices)
    b = F.build_pyramid(normals, L, F.downsample_normals)
    c = F.build_pyramid(mv, L, F.downsample_vertices)
    d = F.build_pyramid(mn, L, F.downsample_normals)
    return a + b + c + d
bench("pyramid build x4", pyr4, verts, normals, mv, mn)

@jax.jit
def pyr4_chw(verts, normals, mv, mn):
    # channel-major layout experiment: (3,H,W)
    def ds_v(v):
        p00 = v[:, ::2, ::2]; p01 = v[:, ::2, 1::2]; p10 = v[:, 1::2, ::2]; p11 = v[:, 1::2, 1::2]
        mean = (p00 + p01 + p10 + p11) * 0.25
        valid = (p00[2] != 0) & (p01[2] != 0) & (p10[2] != 0) & (p11[2] != 0)
        return jnp.where(valid[None], mean, 0.0)
    outs = []
    for x in (verts, normals, mv, mn):
        t = x.transpose(2, 0, 1)
        p = [t]
        for _ in range(L - 1):
            p.append(ds_v(p[-1]))
        outs += p
    return outs
bench("pyramid build x4 (CHW)", pyr4_chw, verts, normals, mv, mn)

@jax.jit
def stage_icp_all(verts, normals, mv, mn, pose):
    a = F.build_pyramid(verts, L, F.downsample_vertices)
    b = F.build_pyramid(normals, L, F.downsample_normals)
    c = F.build_pyramid(mv, L, F.downsample_vertices)
    d = F.build_pyramid(mn, L, F.downsample_normals)
    r = I.icp_track(a, b, c, d, pose, cam, cfg.icp)
    return r.pose, r.ok
bench("pyr + track (as pipeline)", stage_icp_all, verts, normals, mv, mn, pose)
