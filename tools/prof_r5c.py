"""Round-5: in-jit repetition microbenchmarks (dev tool).

Each op runs R times inside one jitted lax.fori_loop with a loop-carried
data dependence (so XLA cannot hoist it), in ONE dispatch — per-op time
= (t_loop - t_overhead) / R. Clean device numbers, immune to tunnel
dispatch overhead."""
import os, sys, time, functools
import numpy as np
import jax

if os.environ.get("DRIVE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from tsdfjax.config import AppConfig, IcpConfig, SwitchConfig
from tsdfjax.pipeline import init_state, initial_pose
from tsdfjax import synthetic as syn
from tsdfjax import frames as F
from tsdfjax.ops.sweep import fast_integrate, fast_raycast
from tsdfjax.trackers import icp as I
from tsdfjax.geometry import se3_inverse

cfg = AppConfig(
    switches=SwitchConfig(use_color=False),
    icp=IcpConfig(pyramid_levels=3, source_subsample=2, converge_eps=1e-4,
                  coarse_assoc=True),
)
cam = cfg.depth_camera
pre = cfg.preprocess
scene = syn.default_scene(cfg.volume.size_m)
c = cfg.volume.size_m / 2.0
start = initial_pose(cfg)
radius = c + cfg.preprocess.min_trunc_m
render = jax.jit(lambda p: syn.render_depth(p, cam, scene))
depth = render(jnp.asarray(start, jnp.float32))
eye = np.array([c + radius * np.sin(0.02), c, c - radius * np.cos(0.02)])
pose2 = jnp.asarray(syn.look_at(eye, np.array([c, c, c])), jnp.float32)

trunced, filt, verts, normals = jax.jit(
    lambda d: F.preprocess_depth(d, cam, pre.min_trunc_m, pre.max_trunc_m,
                                 pre.sigma_pixel, pre.sigma_depth))(depth)
state = init_state(cfg)
vol, _ = jax.jit(lambda v, t, n, p: fast_integrate(
    v, t, n, None, p, cam, cfg.rgb_camera, cfg.volume, cfg.integrate))(
        state.volume, trunced, normals, jnp.asarray(start, jnp.float32))
rc = jax.jit(lambda v, p: fast_raycast(
    v, p, cam, cfg.volume, pre.min_trunc_m, pre.max_trunc_m,
    with_color=False, sdf_trunc_m=cfg.integrate.sdf_trunc_m))(vol, pose2)
mv0, mn0 = rc.vertices, rc.normals

nv_p = F.build_pyramid(verts, 3, F.downsample_vertices)
nn_p = F.build_pyramid(normals, 3, F.downsample_normals)
mv_p = F.build_pyramid(mv0, 3, F.downsample_vertices)
mn_p = F.build_pyramid(mn0, 3, F.downsample_normals)
jax.block_until_ready((nv_p, mv_p))
print(f"device: {jax.devices()[0]}", file=sys.stderr)


def rep(name, make_body, R, *args):
    """make_body(carry, *args) -> new (4,4)-ish carry; run R reps in one
    jit; report (t_R - t_0) / R from value-readback wall times."""
    def looped(n_reps):
        @jax.jit
        def run(p0, *a):
            def body(i, p):
                return make_body(i, p, *a)
            return jax.lax.fori_loop(0, n_reps, body, p0)
        return run
    f_full = looped(R)
    f_zero = looped(0)
    o_full = f_full(pose2, *args); o_zero = f_zero(pose2, *args)
    float(jnp.sum(o_full)); float(jnp.sum(o_zero))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(jnp.sum(f_zero(pose2, *args))); tz = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jnp.sum(f_full(pose2, *args))); tf = time.perf_counter() - t0
        ts.append((tf - tz) / R * 1e3)
    print(f"{name:44s} {min(ts):8.4f} ms  (rounds: " + ", ".join(f"{t:.4f}" for t in ts) + ")")
    return min(ts)


lti = se3_inverse(pose2)

# --- ICP decomposition at L0 (subsampled 240x320)
nv0, nn0 = F.subsample_pick(nv_p[0], 2), F.subsample_pick(nn_p[0], 2)

def full_iter(i, p, nv, nn, mv, mn):
    rows, valid = I.icp_rows(nv, nn, mv, mn, cam, p, lti,
                             cfg.icp.dist_thresh_m, cfg.icp.normal_sin_thresh)
    a7 = I.normal_equations(rows)
    delta, ok, x = I.solve_gn_step(a7, cfg.icp.angle_shake_rad, cfg.icp.dist_shake_m)
    return jnp.where(ok, delta @ p, p)

def rows_only(i, p, nv, nn, mv, mn):
    rows, valid = I.icp_rows(nv, nn, mv, mn, cam, p, lti,
                             cfg.icp.dist_thresh_m, cfg.icp.normal_sin_thresh)
    # fold the rows back into the carry cheaply (keep dependence)
    return p + 1e-30 * rows[0, 0, 0]

def rows_neq(i, p, nv, nn, mv, mn):
    rows, valid = I.icp_rows(nv, nn, mv, mn, cam, p, lti,
                             cfg.icp.dist_thresh_m, cfg.icp.normal_sin_thresh)
    a7 = I.normal_equations(rows)
    return p + 1e-30 * a7[0, 0]

def solve_only(i, p, a7):
    delta, ok, x = I.solve_gn_step(a7 + 1e-30 * p[0, 0],
                                   cfg.icp.angle_shake_rad, cfg.icp.dist_shake_m)
    return jnp.where(ok, delta @ p, p)

a7_0 = jax.jit(lambda: I.normal_equations(I.icp_rows(
    nv0, nn0, mv_p[0], mn_p[0], cam, pose2, lti,
    cfg.icp.dist_thresh_m, cfg.icp.normal_sin_thresh)[0]))()

rep("icp L0: rows only", rows_only, 40, nv0, nn0, mv_p[0], mn_p[0])
rep("icp L0: rows + normal_eqs", rows_neq, 40, nv0, nn0, mv_p[0], mn_p[0])
rep("icp L0: full iter (+solve)", full_iter, 40, nv0, nn0, mv_p[0], mn_p[0])
rep("icp L2: full iter", full_iter, 40,
    nv_p[2], nn_p[2], mv_p[2], mn_p[2])
rep("solve_gn_step alone", solve_only, 40, a7_0)

# --- gather cost inside icp_rows: time a plain packed gather of same size
packed6 = jnp.concatenate([mv_p[0], mn_p[0]], axis=-1).reshape(-1, 6)
idx0 = jnp.arange(nv0.shape[0] * nv0.shape[1], dtype=jnp.int32).reshape(nv0.shape[:2]) % packed6.shape[0]

def gather_only(i, p, pk, idx):
    g = pk[(idx + i) % pk.shape[0]]
    return p + 1e-30 * g[0, 0, 0]
rep("packed (76.8k,6) gather", gather_only, 40, packed6, idx0)

# --- integrate scan-step cost: whole integrate, per-R amortized
def int_body(i, p, v_ts, v_w, t, n):
    from tsdfjax.volume import TsdfVolume
    v = TsdfVolume(tsdf=v_ts + 0e0 * p[0, 0], weight=v_w, color=None)
    vol2, _ = fast_integrate(v, t, n, None, p, cam, cfg.rgb_camera,
                             cfg.volume, cfg.integrate)
    return p + 1e-30 * vol2.tsdf[0, 0, 0]
rep("fast_integrate 256 (in-jit)", int_body, 6, vol.tsdf, vol.weight, trunced, normals)

def ray_body(i, p, v_ts, v_w):
    from tsdfjax.volume import TsdfVolume
    v = TsdfVolume(tsdf=v_ts, weight=v_w, color=None)
    r = fast_raycast(v, p + 0.0, cam, cfg.volume, pre.min_trunc_m,
                     pre.max_trunc_m, with_color=False,
                     sdf_trunc_m=cfg.integrate.sdf_trunc_m)
    return p + 1e-30 * r.vertices[0, 0, 0]
rep("fast_raycast 256 (in-jit)", ray_body, 6, vol.tsdf, vol.weight)
