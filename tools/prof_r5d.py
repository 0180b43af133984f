"""Round-5: dissect the integrate sweep's per-block cost (dev tool).

Variants for the row/col selection, transpose cost, epilogue cost —
all as in-jit fori_loop reps (one dispatch, DCE-guarded)."""
import os, sys, time
import numpy as np
import jax

if os.environ.get("DRIVE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

B, C, NI, RES = 4, 2, 256, 256
QH, QW = 552, 768
NB = 64

key = jax.random.PRNGKey(0)
warped = jax.random.normal(key, (C, QH, QW), jnp.float32)
warped_b = warped.astype(jnp.bfloat16)
vol_ts = jax.random.normal(key, (RES, RES, RES), jnp.float32)
vol_w = (jax.random.uniform(key, (RES, RES, RES)) > 0.5).astype(jnp.float32)
volch_b = jax.random.normal(key, (C, RES, RES, RES)).astype(jnp.bfloat16)
jax.block_until_ready((warped, vol_ts, volch_b))
print(f"device: {jax.devices()[0]}", file=sys.stderr)


def rep(name, body, R, carry0):
    def looped(n_reps):
        @jax.jit
        def run(c0):
            return jax.lax.fori_loop(0, n_reps, body, c0)
        return run
    f_full, f_zero = looped(R), looped(0)
    float(jnp.sum(f_full(carry0))); float(jnp.sum(f_zero(carry0)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(jnp.sum(f_zero(carry0))); tz = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jnp.sum(f_full(carry0))); tf = time.perf_counter() - t0
        ts.append((tf - tz) / R * 1e3)
    print(f"{name:46s} {min(ts):8.4f} ms  (" + ", ".join(f"{t:.4f}" for t in ts) + ")")
    return min(ts)


def interp_nearest(pos, n_src):
    src = jax.lax.broadcasted_iota(jnp.float32, pos.shape + (n_src,), pos.ndim)
    d = src - pos[..., None]
    return ((d >= -0.5) & (d < 0.5)).astype(jnp.bfloat16)


def rows_cols(i, sc=1.0):
    """per-block affine positions, varied by i to defeat hoisting"""
    a = 0.001 * i.astype(jnp.float32)
    rows = a + jnp.linspace(0.0, QH - 1.0, NI)[None, :] * jnp.ones((B, 1)) * sc
    cols = a + jnp.linspace(0.0, QW - 1.0, RES)[None, :] * jnp.ones((B, 1)) * sc
    return rows, cols


# ---- variant 1: current einsum pair (bf16 operands)
def v_einsum(i, acc):
    rows, cols = rows_cols(i)
    mi = interp_nearest(rows, QH)                       # (B, NI, QH)
    mj = interp_nearest(cols, QW)                       # (B, RES, QW)
    tmp = jnp.einsum("bih,chw->bciw", mi, warped_b,
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    out = jnp.einsum("bjw,bciw->bcij", mj, tmp,
                     preferred_element_type=jnp.float32)
    return acc + out

# ---- variant 2: row one-hot einsum only (isolate first einsum)
def v_rows_only(i, acc):
    rows, _ = rows_cols(i)
    mi = interp_nearest(rows, QH)
    tmp = jnp.einsum("bih,chw->bciw", mi, warped_b,
                     preferred_element_type=jnp.float32)
    return acc + tmp

# ---- variant 3: interp-matrix construction only
def v_interp_only(i, acc):
    rows, cols = rows_cols(i)
    mi = interp_nearest(rows, QH)
    mj = interp_nearest(cols, QW)
    return (acc[0] + mi.astype(jnp.float32), acc[1] + mj.astype(jnp.float32))

# ---- variant 4: row-gather (take_along_axis) + col einsum
def v_gather_rows(i, acc):
    rows, cols = rows_cols(i)
    idx = jnp.clip(jnp.round(rows).astype(jnp.int32), 0, QH - 1)  # (B, NI)
    g = warped_b[:, idx]          # (C, B, NI, QW) row gather
    mj = interp_nearest(cols, QW)  # (B, RES, QW)
    out = jnp.einsum("bjw,cbiw->bcij", mj, g,
                     preferred_element_type=jnp.float32)
    return acc + out

# ---- variant 5: both gathers (row then per-element col)
def v_gather_both(i, acc):
    rows, cols = rows_cols(i)
    ri = jnp.clip(jnp.round(rows).astype(jnp.int32), 0, QH - 1)   # (B, NI)
    ci = jnp.clip(jnp.round(cols).astype(jnp.int32), 0, QW - 1)   # (B, RES)
    g = warped_b[:, ri]                                            # (C,B,NI,QW)
    out = jnp.take_along_axis(
        g, ci[None, :, None, :].astype(jnp.int32), axis=3
    )
    return acc + jnp.moveaxis(out, 0, 1).astype(jnp.float32)

z_out = jnp.zeros((B, C, NI, RES), jnp.float32)
z_tmp = jnp.zeros((B, C, NI, QW), jnp.float32)
z_mi = jnp.zeros((B, NI, QH), jnp.float32)
z_mj = jnp.zeros((B, RES, QW), jnp.float32)
rep("block: einsum pair (current)", v_einsum, 64, z_out)
rep("block: first einsum only", v_rows_only, 64, z_tmp)
rep("block: interp matrices only", v_interp_only, 64, (z_mi, z_mj))
rep("block: row-gather + col einsum", v_gather_rows, 64, z_out)
rep("block: row+col gathers", v_gather_both, 64, z_out)

# ---- transpose cost of the projected channels
def v_transpose(i, acc):
    t = jnp.transpose(volch_b + acc, (0, 2, 3, 1))
    return jnp.transpose(t, (0, 3, 1, 2))
rep("transpose volch (2,256^3) bf16 (0,2,3,1) x2", v_transpose, 8, volch_b * 0)

def v_transpose2(i, acc):
    t = jnp.transpose(volch_b + acc, (0, 3, 1, 2))
    return jnp.transpose(t, (0, 2, 3, 1))
rep("transpose volch (2,256^3) bf16 (0,3,1,2) x2", v_transpose2, 8, volch_b * 0)

# ---- epilogue: elementwise fused tsdf update (reads 2xf32 + bf16, writes 2xf32)
def v_epi(i, acc):
    d_vol = volch_b[0].astype(jnp.float32) + volch_b[1].astype(jnp.float32)
    pz = 0.001 * i.astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.float32, vol_ts.shape, 0) * 0.01
    sdf = d_vol - pz
    update = (pz > 0) & (d_vol != 0) & (d_vol < 4.0) & (sdf > -0.08)
    tsdf_new = jnp.minimum(1.0, sdf / 0.08)
    w_new = jnp.where(update, jnp.minimum(vol_w + 1, 128.0), vol_w)
    fused = (vol_ts * vol_w + tsdf_new) / jnp.maximum(vol_w + 1, 1e-30)
    out = jnp.where(update, fused, vol_ts)
    return (acc[0] + out, acc[1] + w_new)
z3 = jnp.zeros((RES, RES, RES), jnp.float32)
rep("epilogue elementwise update 256^3", v_epi, 8, (z3, z3))
