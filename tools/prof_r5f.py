"""Round-5: TPU gather scaling law (dev tool).

How does XLA:TPU gather cost scale with (a) index count, (b) table rows,
(c) row width, (d) index locality? In-jit fori reps, tensor carries."""
import os, sys, time
import numpy as np
import jax

if os.environ.get("DRIVE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

print(f"device: {jax.devices()[0]}", file=sys.stderr)


def rep(name, body, R, carry0):
    def looped(n_reps):
        @jax.jit
        def run(c0):
            return jax.lax.fori_loop(0, n_reps, body, c0)
        return run
    f_full, f_zero = looped(R), looped(0)
    def rd(x):
        return float(jnp.sum(x))
    rd(f_full(carry0)); rd(f_zero(carry0))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); rd(f_zero(carry0)); tz = time.perf_counter() - t0
        t0 = time.perf_counter(); rd(f_full(carry0)); tf = time.perf_counter() - t0
        ts.append((tf - tz) / R * 1e3)
    ts.sort()
    print(f"{name:52s} {ts[1]:8.4f} ms  (" + ", ".join(f"{t:.4f}" for t in ts) + ")")
    return ts[1]


key = jax.random.PRNGKey(0)

def bench_gather(n_idx, n_rows, width, local=False, name=None):
    table = jax.random.normal(key, (n_rows, width), jnp.float32)
    if local:
        idx = (jnp.arange(n_idx, dtype=jnp.int32) * n_rows // n_idx)
    else:
        idx = jax.random.randint(key, (n_idx,), 0, n_rows, jnp.int32)
    z = jnp.zeros((n_idx, width), jnp.float32)
    def body(i, acc):
        g = table[(idx + i) % n_rows]
        return acc + g
    nm = name or f"gather idx={n_idx//1000}k rows={n_rows//1000}k w={width}" + (" local" if local else "")
    rep(nm, body, 30, z)

# scaling in table rows (fixed 76.8k indices, width 6)
for rows in (19_200, 76_800, 307_200, 1_228_800):
    bench_gather(76_800, rows, 6)
# scaling in width (fixed 76.8k idx, 307k rows)
for wdt in (1, 2, 4, 6, 8):
    bench_gather(76_800, 307_200, wdt)
# scaling in index count (fixed 307k rows, width 6)
for ni in (19_200, 76_800, 307_200):
    bench_gather(ni, 307_200, 6)
# locality
bench_gather(76_800, 307_200, 6, local=True)

# 2D-shaped indices as in icp (H, W) -> same?
table = jax.random.normal(key, (307_200, 4), jnp.float32)
idx2 = jax.random.randint(key, (240, 320), 0, 307_200, jnp.int32)
z2 = jnp.zeros((240, 320, 4), jnp.float32)
def body2(i, acc):
    return acc + table[(idx2 + i) % 307_200]
rep("gather 2D-idx (240,320) rows=307k w=4", body2, 30, z2)

# take_along_axis formulation
def body3(i, acc):
    g = jnp.take(table, (idx2 + i) % 307_200, axis=0)
    return acc + g
rep("jnp.take same", body3, 30, z2)

# bf16 table
table_b = table.astype(jnp.bfloat16)
zb = jnp.zeros((240, 320, 4), jnp.bfloat16)
def body4(i, acc):
    return acc + table_b[(idx2 + i) % 307_200]
rep("gather bf16 table rows=307k w=4", body4, 30, zb)

# one wide row gather: rows as (307k,) f32 x4 separate gathers
t1 = jax.random.normal(key, (307_200,), jnp.float32)
z1 = jnp.zeros((240, 320), jnp.float32)
def body5(i, acc):
    return acc + t1[(idx2 + i) % 307_200]
rep("gather single channel w=1 rows=307k", body5, 30, z1)
