#!/usr/bin/env python
"""Offline pose-graph replay: rebuild the keyframe graph from a recorded
run (sequence dir + estimated trajectory), print per-gate rejection
stats, and report the ATE the bent trajectory would achieve — without
re-running the 10-minute app loop.

Usage: python tools/prof_posegraph.py SEQ_DIR TRAJ_FILE [--keyframe-every 10]
       [--loop-radius 1.0] [--min-corr-frac 0.15] [--max-residual 0.02]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("seq")
    ap.add_argument("traj")
    ap.add_argument("--keyframe-every", type=int, default=10)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--loop-radius", type=float, default=1.0)
    ap.add_argument("--min-corr-frac", type=float, default=None,
                    help="override; default = library default")
    ap.add_argument("--max-residual", type=float, default=0.02)
    ap.add_argument("--max-dev-t", type=float, default=None)
    ap.add_argument("--min-gap", type=int, default=2)
    ap.add_argument("--subsample", type=int, default=2)
    ap.add_argument("--dump-graph", default=None,
                    help="pickle the measured graph + context for offline "
                         "optimizer experiments (skips re-running pairwise ICP)")
    args = ap.parse_args()

    from tsdfjax.config import AppConfig, IcpConfig
    from tsdfjax.geometry import CameraIntrinsics
    from tsdfjax.io import tum
    from tsdfjax.keyframes import Keyframe
    from tsdfjax.posegraph import build_keyframe_graph

    import jax.numpy as jnp

    cam = CameraIntrinsics(
        width=args.width, height=args.height,
        fx=262.5 * args.width / 320, fy=262.5 * args.height / 240,
        cx=(args.width - 1) / 2.0, cy=(args.height - 1) / 2.0,
    )
    icp_cfg = IcpConfig(pyramid_levels=3, source_subsample=args.subsample,
                        converge_eps=1e-4)
    pre = AppConfig().preprocess

    ds = tum.TumDataset(args.seq, with_rgb=False)
    est = tum.read_trajectory(args.traj)  # list[(ts, pose)]
    est_by_idx = list(est)

    kfs, snaps = [], {}
    for i, (ts, pose) in enumerate(est_by_idx):
        if i % args.keyframe_every:
            continue
        fr = ds[i]
        kfs.append(Keyframe(frame_id=i, timestamp=ts,
                            pose=np.asarray(pose, np.float32),
                            depth_m=np.asarray(fr.depth_m, np.float32),
                            rgb=None))
        snaps[i] = (ts, np.asarray(pose, np.float32))
    print(f"{len(kfs)} keyframes from {len(est_by_idx)} frames", file=sys.stderr)

    stats: dict = {}
    kw = {}
    if args.min_corr_frac is not None:
        kw["min_corr_frac"] = args.min_corr_frac
    if args.max_dev_t is not None:
        kw["max_closure_dev_t"] = args.max_dev_t
    g = build_keyframe_graph(
        kfs, cam, icp_cfg, pre,
        loop_radius_m=args.loop_radius,
        max_residual_m=args.max_residual,
        min_gap=args.min_gap,
        stats=stats,
        **kw,
    )
    cands = stats.pop("candidates")
    print("gate stats:", json.dumps(stats), file=sys.stderr)
    for c in cands[:40]:
        print("  cand", json.dumps(c), file=sys.stderr)

    # closure MEASUREMENT quality vs ground truth: how good is each
    # accepted t_ab compared to the GT relative pose, and how big was the
    # odometry-implied error it should correct?
    gt_traj = tum.read_trajectory(os.path.join(args.seq, "groundtruth.txt"))
    gt_times = np.array([t for t, _ in gt_traj])

    def gt_pose_at(ts):
        return gt_traj[int(np.argmin(np.abs(gt_times - ts)))][1]

    for (a, b, t_ab, w) in g.edges:
        if abs(b - a) <= 1:
            continue
        ga = np.asarray(gt_pose_at(kfs[a].timestamp), np.float64)
        gb = np.asarray(gt_pose_at(kfs[b].timestamp), np.float64)
        t_gt = np.linalg.inv(ga) @ gb
        t_odo = np.linalg.inv(np.asarray(kfs[a].pose, np.float64)) @ np.asarray(
            kfs[b].pose, np.float64)
        e_meas = np.linalg.norm(np.asarray(t_ab, np.float64)[:3, 3] - t_gt[:3, 3])
        e_odo = np.linalg.norm(t_odo[:3, 3] - t_gt[:3, 3])
        print(f"  closure ({a:2d},{b:2d}) meas_err {e_meas*1000:6.2f} mm  "
              f"odo_err {e_odo*1000:6.2f} mm", file=sys.stderr)

    if args.dump_graph:
        import pickle

        with open(args.dump_graph, "wb") as f:
            pickle.dump(dict(
                poses=g.poses, edges=g.edges,
                snaps={k: (t, p) for k, (t, p) in snaps.items()},
                kf_ids=[kf.frame_id for kf in kfs],
                kf_ts=[kf.timestamp for kf in kfs],
                est=est_by_idx, seq=args.seq,
            ), f)
        print(f"graph dumped to {args.dump_graph}", file=sys.stderr)

    opt = g.optimize()
    for k in range(len(kfs)):
        corr = np.asarray(opt[k], np.float64) @ np.linalg.inv(
            np.asarray(snaps[kfs[k].frame_id][1], np.float64))
        print(f"  kf {k:2d} corr |t| {np.linalg.norm(corr[:3,3])*1000:6.2f} mm",
              file=sys.stderr)

    # bend the trajectory exactly like app.py's final pass (odometry
    # composition, posegraph.bend_trajectory)
    from tsdfjax.posegraph import bend_trajectory

    kts = [snaps[kf.frame_id][0] for kf in kfs]
    snap_poses = [snaps[kf.frame_id][1] for kf in kfs]
    bent = bend_trajectory(est_by_idx, kts, snap_poses, opt)

    gt = tum.read_trajectory(os.path.join(args.seq, "groundtruth.txt"))
    ate_raw = tum.ate_rmse(est_by_idx, gt)
    ate_bent = tum.ate_rmse(bent, gt)

    # keyframe-level error: the LOW-frequency drift the graph can fix
    # (full-trajectory ATE is dominated by per-frame tracking noise)
    # ate_rmse Horn-aligns, which absorbs the fixed render->GT world
    # transform of the synthetic sequences
    kf_traj_raw = [(kf.timestamp, snaps[kf.frame_id][1]) for kf in kfs]
    kf_traj_opt = [(kf.timestamp, np.asarray(opt[k], np.float32))
                   for k, kf in enumerate(kfs)]
    kf_raw = tum.ate_rmse(kf_traj_raw, gt)
    kf_opt = tum.ate_rmse(kf_traj_opt, gt)

    print(json.dumps({
        "closures": int(stats["accepted"]),
        "ate_raw_cm": round(ate_raw * 100, 4),
        "ate_bent_cm": round(ate_bent * 100, 4),
        "improvement_pct": round((ate_raw - ate_bent) / max(ate_raw, 1e-12) * 100, 1),
        "kf_ate_raw_cm": round(kf_raw * 100, 4),
        "kf_ate_opt_cm": round(kf_opt * 100, 4),
        "kf_improvement_pct": round((kf_raw - kf_opt) / max(kf_raw, 1e-12) * 100, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
