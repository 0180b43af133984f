#!/usr/bin/env python
"""Chip-vs-CPU tracking accuracy diagnostic.

Runs the same synthetic orbit through FusionEngine with identical
settings on the active backend and prints per-frame translation error
vs the known ground-truth poses. Run once with default (TPU) backend
and once with TSDFJAX_CPU=1 to compare numerics.

Usage: [TSDFJAX_CPU=1] python tools/prof_chip_ate.py [--frames 30]
       [--strict] [--res 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if os.environ.get("TSDFJAX_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--strict", action="store_true",
                    help="strict-parity ICP settings (subsample 1, eps 0)")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--tracker", default="icp", choices=["icp", "sdf"])
    ap.add_argument("--exact", action="store_true",
                    help="fast_ops=False: reference-semantics gather ops "
                         "instead of the bf16 sweep ops")
    ap.add_argument("--sdf-rebuild", action="store_true",
                    help="SDF sweep: rebuild pixel<->q association every iter")
    ap.add_argument("--sdf-stride1", action="store_true",
                    help="SDF sweep: force slice stride 1")
    args = ap.parse_args()

    from tsdfjax.config import (AppConfig, IcpConfig, SdfTrackerConfig,
                                SwitchConfig, VolumeConfig)
    from tsdfjax.io.sources import SyntheticSource
    from tsdfjax.pipeline import FusionEngine

    if args.strict:
        icp = IcpConfig(pyramid_levels=3, source_subsample=1, converge_eps=0.0)
    else:
        icp = IcpConfig(pyramid_levels=3, source_subsample=2, converge_eps=1e-4)
    cfg = AppConfig(
        switches=SwitchConfig(use_color=False,
                              use_sdf_tracker=args.tracker == "sdf"),
        icp=icp,
        sdf_tracker=SdfTrackerConfig(
            source_subsample=2,
            rebuild_assoc_every_iter=args.sdf_rebuild,
        ),
        volume=VolumeConfig(resolution=args.res, size_m=2.0),
        fast_ops=not args.exact,
    )
    if args.sdf_stride1:
        from tsdfjax.ops import sweep as _S

        _S._raycast_stride = lambda *a, **k: 1
    src = SyntheticSource(cfg, args.frames)
    gt_poses = src.poses()
    engine = FusionEngine(cfg, mode=args.tracker)
    print(f"backend={jax.default_backend()} strict={args.strict} "
          f"res={args.res} tracker={args.tracker}", file=sys.stderr)
    errs = []
    t0 = time.perf_counter()
    for frame in src:
        engine.step(frame.depth_m)
        est = np.asarray(engine.state.pose)
        gt = gt_poses[frame.index]
        dt = np.linalg.norm(est[:3, 3] - gt[:3, 3])
        # rotation geodesic angle
        r = est[:3, :3] @ gt[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1)))
        errs.append(dt)
        print(f"frame {frame.index:3d}  t_err {dt*1000:8.3f} mm  "
              f"r_err {ang:7.4f} deg", file=sys.stderr)
    errs = np.array(errs)
    print(f"frames={len(errs)} rmse_t={np.sqrt((errs**2).mean())*1000:.3f} mm "
          f"max_t={errs.max()*1000:.3f} mm wall={time.perf_counter()-t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
