"""Layout experiment: (H,W,3) vs (3,H,W) vs (H,W) planes (dev tool)."""
import time, sys
import jax, jax.numpy as jnp

H, W = 480, 640
key = jax.random.PRNGKey(0)
hwc = jax.random.normal(key, (H, W, 3), jnp.float32)
chw = jnp.asarray(hwc.transpose(2, 0, 1))
planes = [jnp.asarray(hwc[..., i]) for i in range(3)]
jax.block_until_ready([hwc, chw, planes])


def bench(name, fn, *args, n=50):
    fn(*args); r = fn(*args); jax.block_until_ready(r); float(jnp.sum(r))
    t = time.perf_counter(); float(jnp.sum(r)); floor = time.perf_counter() - t
    t = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(jnp.sum(r))
    dt = (time.perf_counter() - t - floor) / n
    print(f"{name:30s} {dt*1e6:9.1f} us", file=sys.stderr)


@jax.jit
def f_hwc(x):
    # 10 elementwise passes
    for _ in range(10):
        x = x * 1.0001 + 0.001
    return x

@jax.jit
def f_chw(x):
    for _ in range(10):
        x = x * 1.0001 + 0.001
    return x

@jax.jit
def f_planes(a, b, c):
    for _ in range(10):
        a = a * 1.0001 + 0.001
        b = b * 1.0001 + 0.001
        c = c * 1.0001 + 0.001
    return a + b + c

@jax.jit
def ds_hwc(x):
    out = [x]
    for _ in range(2):
        v = out[-1]
        v = (v[::2, ::2] + v[1::2, ::2] + v[::2, 1::2] + v[1::2, 1::2]) * 0.25
        out.append(v)
    return out[-1]

@jax.jit
def ds_chw(x):
    out = [x]
    for _ in range(2):
        v = out[-1]
        v = (v[:, ::2, ::2] + v[:, 1::2, ::2] + v[:, ::2, 1::2] + v[:, 1::2, 1::2]) * 0.25
        out.append(v)
    return out[-1]

bench("elemwise x10 HWC", f_hwc, hwc)
bench("elemwise x10 CHW", f_chw, chw)
bench("elemwise x10 planes", f_planes, *planes)
bench("downsample2 HWC", ds_hwc, hwc)
bench("downsample2 CHW", ds_chw, chw)

# norm along channel axis
bench("norm HWC", jax.jit(lambda x: jnp.linalg.norm(x, axis=-1)), hwc)
bench("norm CHW", jax.jit(lambda x: jnp.linalg.norm(x, axis=0)), chw)
# cross product
bench("cross HWC", jax.jit(lambda x: jnp.cross(x, x[::-1])), hwc)
bench("cross CHW", jax.jit(lambda x: jnp.cross(x, x[:, ::-1], axis=0)), chw)

@jax.jit
def ds_reshape(x):
    out = [x]
    for _ in range(2):
        v = out[-1]
        h, w, c = v.shape
        r = v.reshape(h // 2, 2, w // 2, 2, c)
        v = (r[:, 0, :, 0] + r[:, 1, :, 0] + r[:, 0, :, 1] + r[:, 1, :, 1]) * 0.25
        out.append(v)
    return out[-1]

@jax.jit
def ds_reshape_mean(x):
    out = [x]
    for _ in range(2):
        v = out[-1]
        h, w, c = v.shape
        v = v.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))
        out.append(v)
    return out[-1]

@jax.jit
def ds_reduce_window(x):
    out = [x]
    for _ in range(2):
        v = out[-1]
        v = jax.lax.reduce_window(v, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID") * 0.25
        out.append(v)
    return out[-1]

@jax.jit
def ds_wide_reshape(x):
    # fold W into lanes: (H, W*3) view, downsample rows by add of even/odd rows,
    # cols via reshape on packed pairs
    out = [x]
    for _ in range(2):
        v = out[-1]
        h, w, c = v.shape
        r = v.reshape(h // 2, 2, w // 2, 2 * c)
        rr = r[:, 0] + r[:, 1]          # (h/2, w/2, 2c)
        v = (rr[..., :c] + rr[..., c:]) * 0.25
        out.append(v)
    return out[-1]

bench("ds reshape-slices", ds_reshape, hwc)
bench("ds reshape-mean", ds_reshape_mean, hwc)
bench("ds reduce_window", ds_reduce_window, hwc)
bench("ds wide-reshape", ds_wide_reshape, hwc)
