#!/usr/bin/env python
"""Attribute the sharded n=1 frame-time overhead vs dense (dev tool).

Round-3 measured 2.09 ms/frame fixed overhead for ShardedFusion on a
1-device mesh vs the dense engine (BENCH_SUITE r3: 56.49 vs 64.04 fps)
— the input that drags the SCALING.md N=2 efficiency model below the
80% target at 256^3. This measures, on the current code and chip:

  dense      — FusionEngine.step
  sharded_n1 — ShardedFusion.step on a 1-device mesh
  noop_smap  — a shard_map'd donated pass-through step (same state
               pytree, trivial compute): isolates the shard_map/GSPMD
               dispatch cost from actual op differences

Usage: python tools/prof_shard_overhead.py [--n-meas 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def measure(step, state, depth, rgb, pose, probe, n_warm, n_meas):
    for _ in range(n_warm):
        state, _ = step(state, depth, rgb, pose)
    float(probe(state))
    t0 = time.perf_counter()
    float(probe(state))
    floor = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_meas):
        state, _ = step(state, depth, rgb, pose)
    float(probe(state))
    return (time.perf_counter() - t0 - floor) / n_meas, state


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-warm", type=int, default=4)
    ap.add_argument("--n-meas", type=int, default=30)
    args = ap.parse_args()

    from tsdfjax.config import AppConfig, IcpConfig, SwitchConfig
    from tsdfjax.pipeline import FusionEngine, init_state, process_frame
    from tsdfjax.parallel import ShardedFusion, make_space_mesh

    cfg = AppConfig(
        switches=SwitchConfig(use_color=False),
        icp=IcpConfig(pyramid_levels=3, source_subsample=2, converge_eps=1e-4,
                  coarse_assoc=True),
    )
    cam = cfg.depth_camera
    from tsdfjax import synthetic as syn
    from tsdfjax.pipeline import initial_pose

    scene = syn.default_scene(cfg.volume.size_m)
    pose0 = initial_pose(cfg)
    depth = jax.jit(lambda p: syn.render_depth(p, cam, scene))(
        jnp.asarray(pose0, jnp.float32)
    )
    rgb = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
    pose = jnp.asarray(pose0, jnp.float32)

    @jax.jit
    def probe(state):
        return (
            state.pose.sum()
            + state.volume.tsdf[::64, ::64, ::64].sum()
            + state.model_vertices[::32, ::32].sum()
        )

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    # dense
    def dense_step(state, d, r, p):
        return process_frame(cfg, "icp", False, state, d, r, p)

    t_dense, _ = measure(dense_step, init_state(cfg), depth, rgb, pose,
                         probe, args.n_warm, args.n_meas)
    print(f"dense:      {t_dense*1e3:7.2f} ms/frame", file=sys.stderr)

    # sharded n=1
    eng = ShardedFusion(cfg, mesh=make_space_mesh(1), mode="icp")

    def shard_step(state, d, r, p):
        return eng._step(state, d, r, p)

    t_shard, _ = measure(shard_step, eng.state, depth, rgb, pose,
                         probe, args.n_warm, args.n_meas)
    print(f"sharded_n1: {t_shard*1e3:7.2f} ms/frame "
          f"(+{(t_shard-t_dense)*1e3:.2f} vs dense)", file=sys.stderr)

    # shard_map'd noop with the same pytree in/out
    from jax.sharding import PartitionSpec as P
    from tsdfjax import volume as V
    from tsdfjax.pipeline import FusionState, FrameDiagnostics

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    vol_spec = V.TsdfVolume(tsdf=P("space"), weight=P("space"), color=P("space"))
    st_spec = FusionState(volume=vol_spec, pose=P(), model_vertices=P(),
                          model_normals=P(), model_color=P(), frame_id=P(),
                          lost_count=P())
    dg_spec = FrameDiagnostics(tracking_ok=P(), integrated_voxels=P(),
                               tracker_residual=P(), tracker_corr=P(), pose=P())

    def noop_body(state, d, r, p):
        diag = FrameDiagnostics(
            tracking_ok=jnp.array(True),
            integrated_voxels=jnp.array(0, jnp.int32),
            tracker_residual=d[0, 0],
            tracker_corr=jnp.array(0, jnp.int32),
            pose=p,
        )
        return state._replace(frame_id=state.frame_id + 1), diag

    noop = jax.jit(
        shard_map(noop_body, mesh=eng.mesh,
                  in_specs=(st_spec, P(), P(), P()),
                  out_specs=(st_spec, dg_spec)),
        donate_argnums=(0,),
    )
    eng2 = ShardedFusion(cfg, mesh=make_space_mesh(1), mode="icp")
    t_noop, _ = measure(lambda s, d, r, p: noop(s, d, r, p), eng2.state,
                        depth, rgb, pose, probe, args.n_warm, args.n_meas)
    print(f"noop_smap:  {t_noop*1e3:7.2f} ms/frame "
          f"(pure shard_map dispatch floor)", file=sys.stderr)
    import json

    print(json.dumps({
        "dense_ms": round(t_dense * 1e3, 3),
        "sharded_n1_ms": round(t_shard * 1e3, 3),
        "noop_shard_map_ms": round(t_noop * 1e3, 3),
        "overhead_ms": round((t_shard - t_dense) * 1e3, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
