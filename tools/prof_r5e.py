"""Round-5: ICP cost decomposition + raycast final-gather cost (dev tool)."""
import os, sys, time
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
eye = np.array([c + radius * np.sin(0.004), c, c - radius * np.cos(0.004)])
pose2 = jnp.asarray(syn.look_at(eye, np.array([c, c, c])), jnp.float32)
depth2 = render(pose2)

trunced, filt, verts, normals = jax.jit(
    lambda d: F.preprocess_depth(d, cam, pre.min_trunc_m, pre.max_trunc_m,
                                 pre.sigma_pixel, pre.sigma_depth))(depth2)
state = init_state(cfg)
vol, _ = jax.jit(lambda v, t, n, p: fast_integrate(
    v, t, n, None, p, cam, cfg.rgb_camera, cfg.volume, cfg.integrate))(
        state.volume, jax.jit(lambda d: F.preprocess_depth(
            d, cam, pre.min_trunc_m, pre.max_trunc_m, pre.sigma_pixel,
            pre.sigma_depth))(depth)[0],
        jax.jit(lambda d: F.preprocess_depth(
            d, cam, pre.min_trunc_m, pre.max_trunc_m, pre.sigma_pixel,
            pre.sigma_depth))(depth)[3],
        jnp.asarray(start, jnp.float32))
rc = jax.jit(lambda v, p: fast_raycast(
    v, p, cam, cfg.volume, pre.min_trunc_m, pre.max_trunc_m,
    with_color=False, sdf_trunc_m=cfg.integrate.sdf_trunc_m))(vol, jnp.asarray(start, jnp.float32))
mv0, mn0 = rc.vertices, rc.normals

nv_p = F.build_pyramid(verts, 3, F.downsample_vertices)
nn_p = F.build_pyramid(normals, 3, F.downsample_normals)
mv_p = F.build_pyramid(mv0, 3, F.downsample_vertices)
mn_p = F.build_pyramid(mn0, 3, F.downsample_normals)
jax.block_until_ready((nv_p, mv_p))
print(f"device: {jax.devices()[0]}", file=sys.stderr)


def rep(name, body, R, carry0):
    def looped(n_reps):
        @jax.jit
        def run(c0):
            return jax.lax.fori_loop(0, n_reps, body, c0)
        return run
    f_full, f_zero = looped(R), looped(0)
    def rd(x):
        return float(jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(lambda t: jnp.sum(t).astype(jnp.float32), x)))
    rd(f_full(carry0)); rd(f_zero(carry0))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); rd(f_zero(carry0)); tz = time.perf_counter() - t0
        t0 = time.perf_counter(); rd(f_full(carry0)); tf = time.perf_counter() - t0
        ts.append((tf - tz) / R * 1e3)
    ts.sort()
    print(f"{name:44s} {ts[1]:8.4f} ms  (" + ", ".join(f"{t:.4f}" for t in ts) + ")")
    return ts[1]


# --- iteration counts actually executed (converge_eps early exit)
lti = se3_inverse(jnp.asarray(start, jnp.float32))
pose_t = jnp.asarray(start, jnp.float32)  # tracking starts from last pose


def count_iters():
    iters = cfg.icp.iters_per_level
    cur = pose_t
    counts = []
    for level in range(cfg.icp.pyramid_levels - 1, -1, -1):
        cam_l = cam.level(level)
        nv, nn = nv_p[level], nn_p[level]
        mv, mn = mv_p[level], mn_p[level]
        if level == 0 and cfg.icp.source_subsample > 1:
            s = cfg.icp.source_subsample
            nv, nn = F.subsample_pick(nv, s), F.subsample_pick(nn, s)
        n_it = 0
        for it in range(iters[level]):
            rows, valid = I.icp_rows(nv, nn, mv, mn, cam_l, cur, lti,
                                     cfg.icp.dist_thresh_m, cfg.icp.normal_sin_thresh)
            a7 = I.normal_equations(rows)
            delta, ok, x = I.solve_gn_step(a7, cfg.icp.angle_shake_rad,
                                           cfg.icp.dist_shake_m)
            cur = jnp.where(ok, delta @ cur, cur)
            n_it += 1
            if float(jnp.linalg.norm(x)) < cfg.icp.converge_eps:
                break
        counts.append((level, n_it))
    return counts

print("iterations per level (eager replay):", count_iters(), file=sys.stderr)

# --- icp_track timing, real (early exit) vs fixed iters
def t_track(i, p):
    r = I.icp_track(
        [F.subsample_pick(nv_p[0], 2)] + nv_p[1:],
        [F.subsample_pick(nn_p[0], 2)] + nn_p[1:],
        [F.subsample_pick(mv_p[0], 2)] + mv_p[1:],
        [F.subsample_pick(mn_p[0], 2)] + mn_p[1:],
        p, cam, cfg.icp)
    # NOTE: icp_track subsamples level 0 internally per cfg; passing full
    # pyramids replicates pipeline behavior:
    return jnp.where(r.ok, r.pose, p)

def t_track_real(i, p):
    r = I.icp_track(nv_p, nn_p, mv_p, mn_p, p, cam, cfg.icp)
    return jnp.where(r.ok, r.pose, p)

rep("icp_track (early exit, real)", t_track_real, 20, pose_t)

cfg_noexit = AppConfig(
    switches=SwitchConfig(use_color=False),
    icp=IcpConfig(pyramid_levels=3, source_subsample=2, converge_eps=0.0),
)
def t_track_fix(i, p):
    r = I.icp_track(nv_p, nn_p, mv_p, mn_p, p, cam, cfg_noexit.icp)
    return jnp.where(r.ok, r.pose, p)
rep("icp_track (fixed 19 iters)", t_track_fix, 8, pose_t)

# --- per-level single-iteration cost with tensor carry (DCE-proof)
for lvl in (0, 1, 2):
    cam_l = cam.level(lvl)
    nv, nn = nv_p[lvl], nn_p[lvl]
    mv, mn = mv_p[lvl], mn_p[lvl]
    if lvl == 0:
        nv, nn = F.subsample_pick(nv, 2), F.subsample_pick(nn, 2)
    def one_iter(i, p, nv=nv, nn=nn, mv=mv, mn=mn, cam_l=cam_l):
        rows, valid = I.icp_rows(nv, nn, mv, mn, cam_l, p, lti,
                                 cfg.icp.dist_thresh_m, cfg.icp.normal_sin_thresh)
        a7 = I.normal_equations(rows)
        delta, ok, x = I.solve_gn_step(a7, cfg.icp.angle_shake_rad,
                                       cfg.icp.dist_shake_m)
        return jnp.where(ok, delta @ p, p)
    rep(f"icp one iter L{lvl}", one_iter, 30, pose_t)

# --- raycast final packed gather cost (307k pixels x 11 channels)
qh, qw = 528, 768
packed = jax.random.normal(jax.random.PRNGKey(1), (qh * qw, 11), jnp.float32)
flat0 = jax.random.randint(jax.random.PRNGKey(2), (cam.height, cam.width), 0, qh * qw)
def g11(i, acc):
    px = packed[(flat0 + i) % (qh * qw)]
    return acc + px
rep("final lookup gather (307k, 11ch)", g11, 30,
    jnp.zeros((cam.height, cam.width, 11), jnp.float32))

packed8 = packed[:, :8]
def g8(i, acc):
    px = packed8[(flat0 + i) % (qh * qw)]
    return acc + px
rep("final lookup gather (307k, 8ch)", g8, 30,
    jnp.zeros((cam.height, cam.width, 8), jnp.float32))
