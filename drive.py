"""Verify drive: full FusionEngine round-trip on a synthetic scene (dev tool).

Runs ICP-tracked fusion over an orbit, checks tracking stays ok, and
compares raycast depth against the rendered input depth.
"""
import os, sys, time
import numpy as np
import jax

if os.environ.get("DRIVE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from tsdfjax.config import AppConfig, IcpConfig, SwitchConfig, VolumeConfig
from tsdfjax.pipeline import FusionEngine, initial_pose
from tsdfjax import synthetic as syn

# fast tracker settings (the shipped config_default.ini [tsdfjax] section,
# same as bench.py); the strict-parity defaults (source_subsample=1) hit a
# pathologically slow XLA compile on the axon TPU (~200s vs 16s)
cfg = AppConfig(
    switches=SwitchConfig(use_color=False),
    icp=IcpConfig(pyramid_levels=3, source_subsample=2, converge_eps=1e-4),
)
cam = cfg.depth_camera
scene = syn.default_scene(cfg.volume.size_m)
c = cfg.volume.size_m / 2.0
start = initial_pose(cfg)
radius = c + cfg.preprocess.min_trunc_m
target = np.array([c, c, c])

render = jax.jit(lambda p: syn.render_depth(p, cam, scene))
engine = FusionEngine(cfg, mode="icp")

n = 8
oks = []
for i in range(n):
    ang = 0.004 * i
    eye = np.array([c + radius * np.sin(ang), c, c - radius * np.cos(ang)])
    pose = start if i == 0 else syn.look_at(eye, target)
    depth = render(jnp.asarray(pose, jnp.float32))
    diag = engine.step(depth)
    oks.append(bool(diag.tracking_ok))

assert all(oks), f"tracking failed: {oks}"

# raycast depth (model_vertices in camera frame) vs input depth
state = engine.state
pose = np.asarray(state.pose)
mv = np.asarray(state.model_vertices)
depth_np = np.asarray(depth)
w2c = np.linalg.inv(pose)
pts = mv.reshape(-1, 3) @ w2c[:3, :3].T + w2c[:3, 3]
rc_depth = pts[:, 2].reshape(mv.shape[:2])
hit = np.any(mv != 0, axis=-1)
valid = hit & (depth_np > 0)
frac = valid.mean()
err = np.abs(rc_depth[valid] - depth_np[valid])
med = float(np.median(err))
print(f"platform={jax.devices()[0].platform} tracked {n}/{n} frames, "
      f"hit/valid frac={frac:.3f}, median |rc - input| = {med*1000:.2f} mm")
assert frac > 0.5, f"too few raycast hits: {frac}"
assert med < 0.002, f"raycast depth mismatch: {med*1000:.2f} mm"
print("DRIVE OK")
