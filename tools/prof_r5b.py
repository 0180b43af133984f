"""Round-5: separate host/dispatch chain overhead from device time (dev tool).

Times DEPENDENT chains (state = step(state)) of donated steps of varying
device cost, like the real engine loop does."""
import os, sys, time, functools
import numpy as np
import jax

if os.environ.get("DRIVE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from tsdfjax.config import AppConfig, IcpConfig, SwitchConfig
from tsdfjax.pipeline import init_state, initial_pose, process_frame
from tsdfjax import synthetic as syn
from tsdfjax import frames as F
from tsdfjax.ops.sweep import fast_integrate, fast_raycast

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
poses, depths = [], []
for i in range(24):
    ang = 0.004 * i
    eye = np.array([c + radius * np.sin(ang), c, c - radius * np.cos(ang)])
    p = start if i == 0 else syn.look_at(eye, np.array([c, c, c]))
    poses.append(jnp.asarray(p, jnp.float32))
    depths.append(render(poses[-1]))
jax.block_until_ready(depths)
print(f"device: {jax.devices()[0]}", file=sys.stderr)


@jax.jit
def _probe(state):
    return (jnp.sum(state.volume.tsdf[::16, ::16, ::16])
            + jnp.sum(state.model_vertices[::8, ::8]) + jnp.sum(state.pose))


def chain(name, step, state, n_warm=4, n=16, probe=None):
    """block_until_ready does NOT reliably wait through the axon relay;
    only a value readback does (bench.py measure_engine). Measure the
    readback floor and subtract it."""
    for k in range(n_warm):
        state = step(state, k)
    float(_probe(state))
    floor = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(_probe(state))
        d = time.perf_counter() - t0
        floor = d if floor is None else min(floor, d)
    outs = []
    for r in range(3):
        t0 = time.perf_counter()
        host = 0.0
        for k in range(n):
            h0 = time.perf_counter()
            state = step(state, k)
            host += time.perf_counter() - h0
        float(_probe(state))
        dt = (time.perf_counter() - t0 - floor) / n * 1e3
        outs.append((dt, host / n * 1e3))
    best = min(outs)
    print(f"{name:38s} {best[0]:8.3f} ms/step (host-side {best[1]:.3f} ms)"
          f"  rounds: {', '.join(f'{a:.2f}' for a, _ in outs)}")
    return best


state0 = init_state(cfg)

# 1. donated identity on the full FusionState
@functools.partial(jax.jit, donate_argnums=(0,))
def id_step(state, d):
    return state._replace(frame_id=state.frame_id + 1)
chain("identity (donated state chain)", lambda s, k: id_step(s, depths[k]), state0)

# 2. donated preprocess-only (the ablation's base case)
@functools.partial(jax.jit, donate_argnums=(0,))
def pre_step(state, d):
    t, f, v, n = F.preprocess_depth(d, cam, pre.min_trunc_m, pre.max_trunc_m,
                                    pre.sigma_pixel, pre.sigma_depth)
    return state._replace(frame_id=state.frame_id + 1,
                          model_vertices=v, model_normals=n)
chain("preprocess (donated chain)", lambda s, k: pre_step(s, depths[k]), init_state(cfg))

# 3. donated integrate-only
@functools.partial(jax.jit, donate_argnums=(0,))
def int_step(state, d, p):
    t, f, v, n = F.preprocess_depth(d, cam, pre.min_trunc_m, pre.max_trunc_m,
                                    pre.sigma_pixel, pre.sigma_depth)
    vol, _ = fast_integrate(state.volume, t, n, None, p, cam, cfg.rgb_camera,
                            cfg.volume, cfg.integrate)
    return state._replace(volume=vol, frame_id=state.frame_id + 1)
chain("pre+integrate (donated chain)",
      lambda s, k: int_step(s, depths[k], poses[k]), init_state(cfg))

# 4. + raycast
@functools.partial(jax.jit, donate_argnums=(0,))
def ray_step(state, d, p):
    t, f, v, n = F.preprocess_depth(d, cam, pre.min_trunc_m, pre.max_trunc_m,
                                    pre.sigma_pixel, pre.sigma_depth)
    vol, _ = fast_integrate(state.volume, t, n, None, p, cam, cfg.rgb_camera,
                            cfg.volume, cfg.integrate)
    rc = fast_raycast(vol, p, cam, cfg.volume, pre.min_trunc_m, pre.max_trunc_m,
                      with_color=False, sdf_trunc_m=cfg.integrate.sdf_trunc_m)
    return state._replace(volume=vol, model_vertices=rc.vertices,
                          model_normals=rc.normals, frame_id=state.frame_id + 1)
chain("pre+int+raycast (donated chain)",
      lambda s, k: ray_step(s, depths[k], poses[k]), init_state(cfg))

# 5. the real full step (process_frame, GT-pose mode to skip tracking)
def file_step(s, k):
    s2, diag = process_frame(cfg, "file", False, s, depths[k], None, poses[k])
    return s2
chain("process_frame file-mode (real)", file_step, init_state(cfg))

# 6. the real full step with ICP tracking
def icp_step(s, k):
    s2, diag = process_frame(cfg, "icp", False, s, depths[k], None, None)
    return s2
chain("process_frame icp-mode (real)", icp_step, init_state(cfg))
