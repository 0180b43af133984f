#!/usr/bin/env python
"""Accuracy ablation for the sweep SDF tracker (CPU).

Compares pose error of the sweep tracker vs the packed-field fast path
on the same synthetic flight, ablating: slice stride, q-grid
oversample, per-iteration association rebuild.

Usage: python tools/prof_sdf_acc.py [--frames 15]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def run_case(label, frames, make_engine):
    import time

    from tsdfjax import synthetic as syn
    from tsdfjax import pipeline as P

    # process_frame is a module-level jit keyed on the static cfg; the
    # ablations monkeypatch sweep internals, so force a retrace.
    P.process_frame.clear_cache()
    engine, cfg, poses = make_engine()
    scene = syn.default_scene(cfg.volume.size_m)
    errs = []
    t0 = time.perf_counter()
    for pose in poses[:frames]:
        d = syn.render_depth(pose, cfg.depth_camera, scene)
        diag = engine.step(d)
        errs.append(np.linalg.norm(np.asarray(diag.pose)[:3, 3] - pose[:3, 3]))
    errs = np.array(errs)
    print(f"{label:28s} rmse {np.sqrt((errs**2).mean())*1000:7.3f} mm  "
          f"max {errs.max()*1000:7.3f} mm  wall {time.perf_counter()-t0:5.1f}s",
          flush=True)
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=15)
    args = ap.parse_args()

    import dataclasses

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_pipeline import fly_through, small_config
    from tsdfjax.config import SdfTrackerConfig
    from tsdfjax.pipeline import FusionEngine
    from tsdfjax.ops import sweep as S
    from tsdfjax.trackers import sdf as T

    def mk(fast_ops=True, sub=2):
        cfg = dataclasses.replace(
            small_config(), fast_ops=fast_ops,
            sdf_tracker=SdfTrackerConfig(source_subsample=sub),
        )
        poses = fly_through(cfg, args.frames, arc=0.12)
        return FusionEngine(cfg, mode="sdf"), cfg, poses

    run_case("packed-field (old fast)", args.frames, lambda: mk(fast_ops=False))
    run_case("sweep stride=derived", args.frames, lambda: mk())

    orig_stride = S._raycast_stride
    S._raycast_stride = lambda *a, **k: 1
    try:
        run_case("sweep stride=1", args.frames, lambda: mk())
    finally:
        S._raycast_stride = orig_stride

    orig_prep = S.sdf_sweep_prepare
    S.sdf_sweep_prepare = lambda *a, **k: orig_prep(*a, q_oversample=1.6, **k)
    try:
        run_case("sweep q_oversample=1.6", args.frames, lambda: mk())
    finally:
        S.sdf_sweep_prepare = orig_prep

    S._raycast_stride = lambda *a, **k: 1
    S.sdf_sweep_prepare = lambda *a, **k: orig_prep(*a, q_oversample=1.6, **k)
    try:
        run_case("sweep stride=1 + q=1.6", args.frames, lambda: mk())
    finally:
        S._raycast_stride = orig_stride
        S.sdf_sweep_prepare = orig_prep
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
