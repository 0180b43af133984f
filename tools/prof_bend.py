#!/usr/bin/env python
"""Offline A/B of trajectory-bending strategies on a dumped pose graph.

Loads the pickle written by `prof_posegraph.py --dump-graph` (measured
keyframe graph + recorded estimated trajectory + sequence path) and
compares full-trajectory ATE for:

  raw        — recorded odometry, no correction
  lerp       — round-3 scheme: per-keyframe world-frame correction
               C_k = opt_k @ inv(snap_k), log interpolated linearly over
               time, applied on the left (app.py final pass)
  compose    — odometry composition: each inter-keyframe segment is
               re-anchored at the optimized keyframe pose, the tracked
               relative motion replayed, and the residual end-of-segment
               mismatch distributed along the segment in the BODY frame
  kf-only    — optimized poses at keyframe samples, raw elsewhere
               (upper-bound sanity: what bending must at least beat)

Also prints the error decomposition (RMSE at keyframe samples vs between)
so the gap between kf-subset improvement and full-trajectory improvement
is visible.

Usage: python tools/prof_bend.py /tmp/graph.pkl
"""

from __future__ import annotations

import json
import os
import pickle
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tsdfjax.geometry import exp_se3, log_se3
from tsdfjax.io import tum
from tsdfjax.posegraph import PoseGraph, bend_trajectory


def bend_lerp(est, kf_ts, snaps, opt):
    """Round-3 world-frame lerp bend (app.py r3 final pass)."""
    kts, xis = [], []
    for k, ts in enumerate(kf_ts):
        corr = np.asarray(opt[k], np.float64) @ np.linalg.inv(
            np.asarray(snaps[k], np.float64))
        kts.append(ts)
        xis.append(np.asarray(log_se3(jnp.asarray(corr, jnp.float32)), np.float64))
    kts_a = np.asarray(kts)
    xis_a = np.stack(xis)
    ts_a = np.asarray([t for t, _ in est])
    xi_frames = np.stack(
        [np.interp(ts_a, kts_a, xis_a[:, i]) for i in range(6)], axis=1)
    corrs = np.asarray(jax.vmap(exp_se3)(jnp.asarray(xi_frames, jnp.float32))
                       ).astype(np.float64)
    return [(t, (corrs[i] @ np.asarray(p, np.float64)).astype(np.float32))
            for i, (t, p) in enumerate(est)]


def main() -> int:
    with open(sys.argv[1], "rb") as f:
        d = pickle.load(f)

    est = d["est"]  # list[(ts, pose)] — recorded odometry
    kf_ids = d["kf_ids"]
    kf_ts = d["kf_ts"]
    snaps = [d["snaps"][i][1] for i in kf_ids]
    gt = tum.read_trajectory(os.path.join(d["seq"], "groundtruth.txt"))

    g = PoseGraph()
    g.poses = d["poses"]
    g.edges = d["edges"]
    opt = g.optimize()

    results = {}
    results["raw"] = tum.ate_rmse(est, gt)

    bent_lerp = bend_lerp(est, kf_ts, snaps, opt)
    results["lerp"] = tum.ate_rmse(bent_lerp, gt)

    bent_comp = bend_trajectory(est, kf_ts, snaps, opt)
    results["compose"] = tum.ate_rmse(bent_comp, gt)

    # kf-only: optimized at keyframe samples, raw elsewhere
    kf_set = {round(t, 6): k for k, t in enumerate(kf_ts)}
    kf_only = [
        (t, np.asarray(opt[kf_set[round(t, 6)]], np.float32))
        if round(t, 6) in kf_set else (t, p)
        for t, p in est
    ]
    results["kf_only"] = tum.ate_rmse(kf_only, gt)

    # keyframe-subset ATEs
    kf_raw = tum.ate_rmse([(t, s) for t, s in zip(kf_ts, snaps)], gt)
    kf_opt = tum.ate_rmse([(t, np.asarray(o, np.float32))
                           for t, o in zip(kf_ts, opt)], gt)

    # decomposition: per-frame translation error (after one shared Horn
    # alignment of the raw trajectory) at kf samples vs between
    gt_times = np.array([t for t, _ in gt])

    def err_profile(traj):
        errs = []
        for (t, p) in traj:
            gtp = gt[int(np.argmin(np.abs(gt_times - t)))][1]
            errs.append((t, p[:3, 3] - gtp[:3, 3]))
        return errs

    out = {
        "ate_cm": {k: round(v * 100, 4) for k, v in results.items()},
        "kf_ate_raw_cm": round(kf_raw * 100, 4),
        "kf_ate_opt_cm": round(kf_opt * 100, 4),
        "improvement_pct": {
            k: round((results["raw"] - v) / results["raw"] * 100, 1)
            for k, v in results.items() if k != "raw"
        },
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
