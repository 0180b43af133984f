"""Round-5 micro-profiler: amortized per-op device time for each pipeline
sub-op in isolation on the current backend (dev tool).

Times N async dispatches + one readback; reports ms/op (median of 3
rounds). Run on the chip (default) or DRIVE_CPU=1 for the host."""
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
jax.block_until_ready(depth)

# build a fused state: integrate frame 0 at start, raycast from pose2
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
jax.block_until_ready((mv0, mn0))


def timeit(name, fn, args, n=30, probe=None):
    if probe is None:
        probe = lambda out: jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(
                lambda x: jnp.asarray(x).astype(jnp.float32).ravel()[:1].sum(), fn(*args)))
    out = fn(*args)
    jax.block_until_ready(out)
    meds = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        jax.block_until_ready(outs[-1])
        # readback to be safe through the tunnel
        float(probe(args and args[0] or out) if False else 0.0)
        meds.append((time.perf_counter() - t0) / n * 1e3)
    print(f"{name:34s} {min(meds):8.3f} ms  (3 rounds: "
          + ", ".join(f"{m:.3f}" for m in meds) + ")")
    return min(meds)


print(f"device: {jax.devices()[0]}", file=sys.stderr)

# --- preprocess pieces
j_trunc = jax.jit(lambda d: F.truncate_depth(d, pre.min_trunc_m, pre.max_trunc_m))
j_bilat = jax.jit(lambda d: F.bilateral_filter(d, pre.sigma_pixel, pre.sigma_depth))
j_verts = jax.jit(lambda d: F.depth_to_vertices(d, cam))
j_norms = jax.jit(F.vertices_to_normals)
j_pre = jax.jit(lambda d: F.preprocess_depth(
    d, cam, pre.min_trunc_m, pre.max_trunc_m, pre.sigma_pixel, pre.sigma_depth))
j_pyr_v = jax.jit(lambda v: F.build_pyramid(v, 3, F.downsample_vertices)[1:])
j_pyr_n = jax.jit(lambda v: F.build_pyramid(v, 3, F.downsample_normals)[1:])

timeit("noop (dispatch floor)", jax.jit(lambda d: d + 1.0), (depth,))
timeit("truncate", j_trunc, (depth,))
timeit("bilateral", j_bilat, (trunced,))
timeit("depth_to_vertices", j_verts, (filt,))
timeit("vertices_to_normals", j_norms, (verts,))
timeit("preprocess_depth (all)", j_pre, (depth,))
timeit("pyramid verts (2 downs)", j_pyr_v, (verts,))
timeit("pyramid norms (2 downs)", j_pyr_n, (normals,))

# --- 4 pyramids as the pipeline builds them
j_pyr4 = jax.jit(lambda v, n, mv, mn: (
    F.build_pyramid(v, 3, F.downsample_vertices),
    F.build_pyramid(n, 3, F.downsample_normals),
    F.build_pyramid(mv, 3, F.downsample_vertices),
    F.build_pyramid(mn, 3, F.downsample_normals)))
timeit("4 pyramids (track preamble)", j_pyr4, (verts, normals, mv0, mn0))

# --- ICP: one icp_rows+normal_equations at each level, and the full track
from tsdfjax.geometry import se3_inverse
nv_p = F.build_pyramid(verts, 3, F.downsample_vertices)
nn_p = F.build_pyramid(normals, 3, F.downsample_normals)
mv_p = F.build_pyramid(mv0, 3, F.downsample_vertices)
mn_p = F.build_pyramid(mn0, 3, F.downsample_normals)
lti = se3_inverse(pose2)
for lvl in (0, 1, 2):
    cam_l = cam.level(lvl)
    nv, nn = nv_p[lvl], nn_p[lvl]
    if lvl == 0:
        nv, nn = F.subsample_pick(nv, 2), F.subsample_pick(nn, 2)
    j_iter = jax.jit(lambda a, b, mvx, mnx, cp, cl=cam_l: I.normal_equations(
        I.icp_rows(a, b, mvx, mnx, cl, cp, lti,
                   cfg.icp.dist_thresh_m, cfg.icp.normal_sin_thresh)[0]))
    timeit(f"icp iter level {lvl}", j_iter,
           (nv, nn, mv_p[lvl], mn_p[lvl], pose2))
j_track = jax.jit(lambda a, b, c_, d, p: I.icp_track(
    [a] + nv_p[1:], [b] + nn_p[1:], [c_] + mv_p[1:], [d] + mn_p[1:],
    p, cam, cfg.icp))
timeit("icp_track full (19 it max)", j_track,
       (nv_p[0], nn_p[0], mv_p[0], mn_p[0], pose2), n=20)

# --- volume ops
j_int = jax.jit(lambda v, t, n, p: fast_integrate(
    v, t, n, None, p, cam, cfg.rgb_camera, cfg.volume, cfg.integrate)[0])
j_ray = jax.jit(lambda v, p: fast_raycast(
    v, p, cam, cfg.volume, pre.min_trunc_m, pre.max_trunc_m,
    with_color=False, sdf_trunc_m=cfg.integrate.sdf_trunc_m))
timeit("fast_integrate 256", j_int, (vol, trunced, normals, pose2), n=20)
timeit("fast_raycast 256", j_ray, (vol, pose2), n=20)
