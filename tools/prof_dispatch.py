"""Measure per-call dispatch overhead through the axon tunnel (dev tool)."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from tsdfjax.config import AppConfig, IcpConfig, SwitchConfig
from tsdfjax.pipeline import FusionEngine, init_state, initial_pose
from tsdfjax import synthetic as syn

cfg = AppConfig(switches=SwitchConfig(use_color=False), icp=IcpConfig(pyramid_levels=3))
state = init_state(cfg)
cam = cfg.depth_camera
depth = jnp.zeros((cam.height, cam.width), jnp.float32)

@jax.jit
def probe(state):
    return state.pose.sum() + state.volume.tsdf[::64, ::64, ::64].sum()

def sync(s):
    return float(probe(s))

# 1) donated identity-ish step (touch pose only)
import functools
@functools.partial(jax.jit, donate_argnums=(0,))
def noop_step(state, depth):
    return state._replace(frame_id=state.frame_id + (depth[0, 0] > 0))

noop_step(state, depth)  # compile... donates state! re-init
state = init_state(cfg)
s = noop_step(state, depth)
sync(s)
t0 = time.perf_counter(); sync(s); floor = time.perf_counter() - t0
n = 30
t0 = time.perf_counter()
for _ in range(n):
    s = noop_step(s, depth)
sync(s)
dt = (time.perf_counter() - t0 - floor) / n
print(f"noop donated step: {dt*1000:.2f} ms/call", file=sys.stderr)

# 2) tiny jit (no big args)
@jax.jit
def tiny(x):
    return x + 1

x = jnp.zeros((8,), jnp.float32)
tiny(x)
t0 = time.perf_counter()
for _ in range(n):
    x = tiny(x)
float(x[0])
dt = time.perf_counter() - t0
print(f"tiny chained step: {dt/n*1000:.2f} ms/call", file=sys.stderr)
