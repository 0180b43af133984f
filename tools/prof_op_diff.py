#!/usr/bin/env python
"""Bisect the fast-ops chip-vs-CPU numerics gap op by op.

Builds one fused volume + pose deterministically, then runs
fast_integrate and fast_raycast on the ACTIVE backend and dumps compact
statistics plus raw outputs to an .npz. Run once per backend and diff:

  python tools/prof_op_diff.py --out /tmp/ops_tpu.npz
  TSDFJAX_CPU=1 python tools/prof_op_diff.py --out /tmp/ops_cpu.npz
  python tools/prof_op_diff.py --compare /tmp/ops_cpu.npz /tmp/ops_tpu.npz
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if os.environ.get("TSDFJAX_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def compare(a_path, b_path):
    a = np.load(a_path)
    b = np.load(b_path)
    for key in a.files:
        x, y = a[key], b[key]
        if x.shape != y.shape:
            print(f"{key}: SHAPE {x.shape} vs {y.shape}")
            continue
        m = np.isfinite(x) & np.isfinite(y)
        if x.dtype == bool:
            print(f"{key}: {np.mean(x != y)*100:.4f}% mismatch")
            continue
        d = np.abs(x[m] - y[m])
        print(f"{key}: max {d.max():.3e}  mean {d.mean():.3e}  "
              f"p99 {np.percentile(d, 99):.3e}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--compare", nargs=2, default=None)
    args = ap.parse_args()
    if args.compare:
        return compare(*args.compare)

    import jax.numpy as jnp
    from tsdfjax import synthetic as syn
    from tsdfjax.config import AppConfig, SwitchConfig
    from tsdfjax.ops.sweep import fast_integrate, fast_raycast
    from tsdfjax.pipeline import init_state, initial_pose
    from tsdfjax import frames as F

    cfg = AppConfig(switches=SwitchConfig(use_color=False))
    cam = cfg.depth_camera
    scene = syn.default_scene(cfg.volume.size_m)
    pose0 = jnp.asarray(initial_pose(cfg), jnp.float32)
    # everything must be jitted: eager dispatch through the TPU tunnel
    # pays a round trip per op
    depth = jax.jit(lambda p: syn.render_depth(p, cam, scene))(pose0)
    trunced, normals = jax.jit(lambda d: (lambda t: (t[0], t[3]))(
        F.preprocess_depth(
            d, cam, cfg.preprocess.min_trunc_m, cfg.preprocess.max_trunc_m,
            cfg.preprocess.sigma_pixel, cfg.preprocess.sigma_depth,
        )))(depth)

    state = init_state(cfg)
    vol = state.volume
    integ = jax.jit(lambda v, d, n, p: fast_integrate(
        v, d, n, None, p, cam, cfg.rgb_camera,
        cfg.volume, cfg.integrate, color_angle_weight=False,
    ))
    for _ in range(3):
        vol, _cnt = integ(vol, trunced, normals, pose0)
    rc = jax.jit(lambda v, p: fast_raycast(
        v, p, cam, cfg.volume,
        cfg.preprocess.min_trunc_m, cfg.preprocess.max_trunc_m,
        sdf_trunc_m=cfg.integrate.sdf_trunc_m,
    ))(vol, pose0)
    found = np.asarray(rc.found)
    out = dict(
        tsdf_slice=np.asarray(vol.tsdf[128]),
        weight_sum=np.asarray(vol.weight.sum())[None],
        model_v=np.asarray(rc.vertices),
        model_n=np.asarray(rc.normals),
        hit_t=np.asarray(rc.hit_t),
        found=found,
        depth_in=np.asarray(depth),
    )
    print(f"backend={jax.default_backend()} found={found.mean()*100:.1f}%")
    np.savez_compressed(args.out or "/tmp/ops_dump.npz", **out)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
