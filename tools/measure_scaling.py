#!/usr/bin/env python
"""Quantitative scaling-efficiency evidence on the virtual CPU mesh.

Real multi-host hardware is unavailable in this environment (one TPU
chip behind a tunnel), so the >=80%-at-N>=2 scaling target (BASELINE.md
north_star) cannot be measured as wall clock. What CAN be measured — and
is, here, at N in {1,2,4,8} on the 8-virtual-device CPU mesh — is the
quantity that determines scaling: the WORK each shard executes, plus the
exact byte volume every collective moves. Combined with the measured
n=1 shard_map overhead from BENCH_SUITE.json and v5e ICI bandwidth, this
yields the efficiency model written to SCALING.md.

Measured per shard and per frame:
  - integrate: TSDF voxel updates executed (shard_map probe, psum-free)
  - fast raycast: composited sweep slices (static: block/stride) and the
    ownership histogram of claimed hits (from merged model vertices)
  - exact raycast: per-shard executed march steps (raycast return_steps)
Computed per frame from shapes:
  - ICP psum bytes, raycast merge psum/pmin bytes, all_to_all re-shard
    bytes, halo-exchange ppermute bytes

Usage: python tools/measure_scaling.py [--out SCALING.json] [--frames 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def small_config():
    from tsdfjax.config import AppConfig, CameraIntrinsics, IcpConfig, SwitchConfig, VolumeConfig

    return AppConfig(
        switches=SwitchConfig(use_color=False),
        depth_camera=CameraIntrinsics(width=160, height=120, fx=131.25,
                                      fy=131.25, cx=79.5, cy=59.5),
        rgb_camera=CameraIntrinsics(width=160, height=120, fx=131.25,
                                    fy=131.25, cx=79.5, cy=59.5),
        volume=VolumeConfig(resolution=128, size_m=2.0, max_weight=128.0),
        icp=IcpConfig(pyramid_levels=3, source_subsample=2, converge_eps=1e-4,
                  coarse_assoc=True),
    )


def measure_n(cfg, n: int, n_frames: int) -> dict:
    from tsdfjax import synthetic as syn
    from tsdfjax.parallel import ShardedFusion, make_space_mesh, required_halo
    from tsdfjax.pipeline import initial_pose
    from tsdfjax import raycast as R
    from tsdfjax import volume as V
    from tsdfjax.ops.sweep import _raycast_stride, fast_integrate_sharded

    mesh = make_space_mesh(n)
    engine = ShardedFusion(cfg, mesh=mesh, mode="icp")
    cam = cfg.depth_camera
    scene = syn.default_scene(cfg.volume.size_m)
    c = cfg.volume.size_m / 2.0
    radius = c + cfg.preprocess.min_trunc_m
    target = np.array([c, c, c])
    poses = [initial_pose(cfg)]
    for i in range(1, n_frames):
        ang = 0.05 * i
        poses.append(syn.look_at(
            np.array([c + radius * np.sin(ang), c, c - radius * np.cos(ang)]),
            target,
        ))
    depths = [syn.render_depth(jnp.asarray(p, jnp.float32), cam, scene)
              for p in poses]

    res = cfg.volume.resolution
    block = res // n
    cell = cfg.volume.voxel_size_m
    stride = _raycast_stride(cfg.volume, cfg.integrate.sdf_trunc_m)
    halo = required_halo(cfg)

    # ---- per-shard integrate updates (probe around the production op)
    def integ_probe(tsdf, weight, color, depth, normals, pose):
        idx = jax.lax.axis_index("space")
        vol = V.TsdfVolume(tsdf=tsdf, weight=weight, color=color)
        _vol2, count = fast_integrate_sharded(
            vol, depth, normals, None, pose, cfg.depth_camera, cfg.rgb_camera,
            cfg.volume, cfg.integrate, x0=idx * block,
        )
        return count[None]

    integ_probe_sm = jax.jit(shard_map(
        integ_probe, mesh=mesh,
        in_specs=(P("space"), P("space"), P("space"), P(), P(), P()),
        out_specs=P("space"),
    ))

    # ---- per-shard EXACT raycast executed steps (the redundant-march
    # t-grid path the fast sweep replaced; its step counters quantify the
    # slab clipping win)
    def exact_probe(tsdf, weight, color, pose):
        idx = jax.lax.axis_index("space")
        x0_own = idx * block
        own_lo = x0_own.astype(jnp.float32) * cell
        own_hi = (x0_own + block).astype(jnp.float32) * cell

        def halo_x(a):
            nn = jax.lax.axis_size("space")
            fwd = [(i, i + 1) for i in range(nn - 1)]
            bwd = [(i + 1, i) for i in range(nn - 1)]
            fl = jax.lax.ppermute(a[-halo:], "space", fwd)
            fr = jax.lax.ppermute(a[:halo], "space", bwd)
            fl = jnp.where(idx == 0, jnp.zeros_like(fl), fl)
            fr = jnp.where(idx == nn - 1, jnp.zeros_like(fr), fr)
            return jnp.concatenate([fl, a, fr], axis=0)

        vol = V.TsdfVolume(tsdf=halo_x(tsdf), weight=halo_x(weight),
                           color=halo_x(color))
        rc, steps = R.raycast(
            vol, pose, cfg.depth_camera, cfg.volume,
            cfg.raycast.ray_increment_m, cfg.preprocess.min_trunc_m,
            cfg.preprocess.max_trunc_m, with_color=False,
            x0=x0_own - halo, own_x_range=(own_lo, own_hi),
            axis_name="space", return_steps=True,
        )
        return steps[None]

    exact_probe_sm = jax.jit(shard_map(
        exact_probe, mesh=mesh,
        in_specs=(P("space"), P("space"), P("space"), P()),
        out_specs=P("space"),
    ))

    from tsdfjax import frames as F

    integ_counts = np.zeros(n, np.int64)
    exact_steps = np.zeros(n, np.int64)
    hit_hist = np.zeros(n, np.int64)
    for k in range(n_frames):
        depth = depths[k]
        pose = jnp.asarray(poses[k], jnp.float32)
        pre = cfg.preprocess
        trunced, _f, _v, normals = F.preprocess_depth(
            depth, cam, pre.min_trunc_m, pre.max_trunc_m,
            pre.sigma_pixel, pre.sigma_depth,
        )
        st = engine.state
        integ_counts += np.asarray(integ_probe_sm(
            st.volume.tsdf, st.volume.weight, st.volume.color,
            trunced, normals, pose,
        )).astype(np.int64)
        exact_steps += np.asarray(exact_probe_sm(
            st.volume.tsdf, st.volume.weight, st.volume.color, pose,
        )).astype(np.int64)
        engine.step(depth, ext_pose=None)  # icp mode ignores ext
        mv = np.asarray(engine.state.model_vertices)
        hits = mv[np.any(mv != 0, axis=-1)]
        if len(hits):
            shard_of = np.clip(
                (hits[:, 0] / (cell * block)).astype(np.int64), 0, n - 1
            )
            hit_hist += np.bincount(shard_of, minlength=n)

    # ---- collective byte volumes per frame (exact, from shapes) -------
    qh = -(-int(cam.height * 1.1) // 8) * 8
    qw = -(-int(cam.width * 1.1) // 128) * 128
    icp_iters = sum(cfg.icp.iters_per_level)  # upper bound (early exit)
    # ring all-reduce moves 2(N-1)/N x bytes per device
    ar = lambda b: 2 * (n - 1) / n * b
    merge_fields = 6  # hit pmin key + 5 psum'd scalars (depth-only)
    coll = {
        "icp_psum_bytes": int(ar(7 * 7 * 4) * icp_iters + ar(8) * icp_iters),
        "raycast_merge_psum_bytes": int(ar(qh * qw * 4) * merge_fields),
        "raycast_all_to_all_bytes": int(
            (n - 1) / n * 2 * (res ** 3 // max(n, 1)) * 2
        ),  # 2 bf16 channels re-sharded when sweep axis != x
        "integrate_bytes": 0,
    }
    total_coll = sum(coll.values())

    return {
        "n": n,
        "slices_per_shard_fast_raycast": block // max(stride, 1),
        "slices_dense": res // max(stride, 1),
        "integrate_updates_per_shard": integ_counts.tolist(),
        "exact_raycast_steps_per_shard": exact_steps.tolist(),
        "raycast_hits_claimed_per_shard": hit_hist.tolist(),
        "collective_bytes_per_frame": coll,
        "collective_total_bytes_per_frame": total_coll,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--frames", type=int, default=6)
    args = ap.parse_args()

    cfg = small_config()
    rows = [measure_n(cfg, n, args.frames) for n in (1, 2, 4, 8)]

    # ---- efficiency model at the HEADLINE shapes ----------------------
    # T(N) = T_compute/N + T_fixed + bytes(N)/BW_ici, with
    #   T_compute, T_fixed from BENCH_SUITE.json chip numbers (dense
    #   frame time; sharded n=1 minus dense = the shard_map fixed cost),
    #   collective bytes computed for 640x480 @ 256^3 and 512^3,
    #   ICI v5e ~ 4.5e10 B/s per link per direction.
    # The per-shard compute really is ~1/N: sweep slices and integrate
    # slabs partition exactly (measured above); the imbalanced counters
    # (updates/hits) are USEFUL-work histograms, not cost — both ops are
    # dense elementwise over the slab. Best case = sweep axis x (slab
    # already a k-band, no all_to_all); worst adds the 2-channel bf16
    # re-shard.
    bench = {}
    bench_path = os.path.join(REPO, "BENCH_SUITE.json")
    if os.path.exists(bench_path):
        for line in json.load(open(bench_path)).get("results", []):
            if "value" in line:
                bench[line["metric"]] = line["value"]
    dense_fps = bench.get("depth_fps_per_chip_icp_256")
    shard_fps = bench.get("depth_fps_sharded_n1_icp_256")
    fps_512 = bench.get("depth_fps_per_chip_file_512")
    model = {}
    if dense_fps and shard_fps:
        t_fixed = max(1.0 / shard_fps - 1.0 / dense_fps, 0.0)
        bw = 4.5e10
        qh, qw = 528, 768  # _round8(480*1.1), _round128(640*1.1)
        cases = {}
        for label, res_m, t_dense in (
            ("icp_256", 256, 1.0 / dense_fps),
            ("file_512", 512, (1.0 / fps_512) if fps_512 else None),
        ):
            if t_dense is None:
                continue
            per_n = {}
            for n in (2, 4, 8):
                ar = 2 * (n - 1) / n
                merge = ar * qh * qw * 4 * 6
                a2a = (n - 1) / n * 2 * (res_m ** 3 // n) * 2
                icp_b = ar * (7 * 7 * 4 + 8) * 19
                best = (merge + icp_b) / bw
                worst = (merge + a2a + icp_b) / bw
                e = lambda tc: round(t_dense / (n * (t_dense / n + t_fixed + tc)), 4)
                per_n[n] = {"eff_sweep_x": e(best), "eff_sweep_yz": e(worst),
                            "coll_bytes_best": int(merge + icp_b),
                            "coll_bytes_worst": int(merge + a2a + icp_b)}
            cases[label] = {"dense_frame_s": round(t_dense, 5), "per_n": per_n}
        model = {
            "shard_map_fixed_s": round(t_fixed, 5),
            "ici_bytes_per_s": bw,
            "cases": cases,
        }

    out = {
        "config": {
            "volume_resolution": cfg.volume.resolution,
            "camera": [cfg.depth_camera.width, cfg.depth_camera.height],
            "frames": args.frames,
        },
        "per_n": rows,
        "efficiency_model": model,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
