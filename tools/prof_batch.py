"""Sharded-n1 frame batching measurement (dev tool): fps for k frames
per dispatch, k in {1, 2, 4}, vs the dense engine — the amortized
per-dispatch overhead feeds SCALING.md's efficiency model."""
import os, sys, time
import numpy as np
import jax

if os.environ.get("DRIVE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from tsdfjax.config import AppConfig, IcpConfig, SwitchConfig
from tsdfjax.pipeline import FusionEngine, initial_pose
from tsdfjax.parallel import ShardedFusion, make_space_mesh
from tsdfjax import synthetic as syn

cfg = AppConfig(
    switches=SwitchConfig(use_color=False),
    icp=IcpConfig(pyramid_levels=3, source_subsample=2, converge_eps=1e-4,
                  coarse_assoc=True),
)
cam = cfg.depth_camera
scene = syn.default_scene(cfg.volume.size_m)
c = cfg.volume.size_m / 2.0
start = initial_pose(cfg)
radius = c + cfg.preprocess.min_trunc_m
render = jax.jit(lambda p: syn.render_depth(p, cam, scene))
N = 28
depths = []
for i in range(N):
    ang = 0.004 * i
    eye = np.array([c + radius * np.sin(ang), c, c - radius * np.cos(ang)])
    p = start if i == 0 else syn.look_at(eye, np.array([c, c, c]))
    depths.append(render(jnp.asarray(p, jnp.float32)))
jax.block_until_ready(depths)
print(f"device: {jax.devices()[0]}", file=sys.stderr)


def probe(state):
    return float(jnp.sum(state.pose) + jnp.sum(state.volume.tsdf[::16, ::16, ::16]))


def fps_of(run, n_frames):
    outs = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        outs.append(n_frames / dt)
    outs.sort()
    return outs


def measure(make_engine, batch):
    eng = make_engine()
    warm = 4
    if batch == 1:
        for k in range(warm):
            eng.step(depths[k])
        probe(eng.state)
        meas = list(range(warm, N))
        def run():
            for k in meas:
                eng.step(depths[k])
            probe(eng.state)
    else:
        eng.step_batch(depths[:batch])
        probe(eng.state)
        meas = list(range(warm, N))
        def run():
            for k0 in range(warm, N, batch):
                eng.step_batch(depths[k0:k0 + batch])
            probe(eng.state)
    return fps_of(run, len(meas))


lo, med, hi = measure(lambda: FusionEngine(cfg, mode="icp"), 1)
print(f"dense              : {med:6.2f} fps  [{lo:.2f}, {hi:.2f}]")
for b in (1, 2, 4):
    mk = lambda: ShardedFusion(cfg, mesh=make_space_mesh(1), mode="icp")
    lo, med, hi = measure(mk, b)
    print(f"sharded n=1 k={b}    : {med:6.2f} fps  [{lo:.2f}, {hi:.2f}]")
