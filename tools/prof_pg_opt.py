#!/usr/bin/env python
"""Offline pose-graph OPTIMIZER experiments on a dumped graph
(tools/prof_posegraph.py --dump-graph). Evaluates keyframe ATE vs GT for
optimizer variants in seconds instead of re-running pairwise ICP.

Usage: python tools/prof_pg_opt.py /tmp/pg128.pkl
"""

from __future__ import annotations

import os
import pickle
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> int:
    with open(sys.argv[1], "rb") as f:
        d = pickle.load(f)

    from tsdfjax.io import tum
    from tsdfjax.posegraph import PoseGraph

    gt = tum.read_trajectory(os.path.join(d["seq"], "groundtruth.txt"))
    gt_times = np.array([t for t, _ in gt])
    kf_ts = d["kf_ts"]

    def kf_ate(poses):
        traj = [(kf_ts[k], np.asarray(poses[k], np.float32))
                for k in range(len(kf_ts))]
        return tum.ate_rmse(traj, gt)

    def gt_pose_at(ts):
        return gt[int(np.argmin(np.abs(gt_times - ts)))][1]

    # closure rotation quality (translation was measured before)
    print("closure rotation errors:", file=sys.stderr)
    for (a, b, t_ab, w) in d["edges"]:
        if abs(b - a) <= 1:
            continue
        ga = np.asarray(gt_pose_at(kf_ts[a]), np.float64)
        gb = np.asarray(gt_pose_at(kf_ts[b]), np.float64)
        t_gt = np.linalg.inv(ga) @ gb
        dr = np.asarray(t_ab, np.float64)[:3, :3].T @ t_gt[:3, :3]
        ang = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1)))
        et = np.linalg.norm(np.asarray(t_ab)[:3, 3] - t_gt[:3, 3])
        print(f"  ({a:2d},{b:2d}) rot_err {ang:6.3f} deg  t_err {et*1000:6.2f} mm",
              file=sys.stderr)

    base = kf_ate(d["poses"])
    print(f"raw keyframe ATE: {base*100:.4f} cm")

    def run(label, edges, iters=10, damping=1e-6):
        g = PoseGraph()
        for p in d["poses"]:
            g.add_node(p)
        g.edges = list(edges)
        opt = g.optimize(iters=iters, damping=damping)
        ate = kf_ate(opt)
        print(f"{label:42s} kf_ate {ate*100:8.4f} cm  ({(base-ate)/base*100:+.1f}%)")
        return opt

    edges = d["edges"]
    # CONTROL: odometry-only graph is exactly consistent with the input
    # poses -> optimize() must return them unchanged (0.0%)
    run("CONTROL odometry edges only", [
        e for e in edges if abs(e[1] - e[0]) <= 1])
    # CONTROL: replace every closure measurement with GROUND TRUTH
    # relative poses -> optimization should clearly improve
    gt_edges = []
    for (a, b, t, w) in edges:
        if abs(b - a) > 1:
            ga = np.asarray(gt_pose_at(kf_ts[a]), np.float64)
            gb = np.asarray(gt_pose_at(kf_ts[b]), np.float64)
            gt_edges.append((a, b, (np.linalg.inv(ga) @ gb).astype(np.float32), w))
        else:
            gt_edges.append((a, b, t, w))
    run("CONTROL ground-truth closures", gt_edges)
    run("default (huber, w=2 closures)", edges)
    run("closure weight 10", [
        (a, b, t, 10.0 if abs(b - a) > 1 else w) for (a, b, t, w) in edges])
    run("closure weight 0.5", [
        (a, b, t, 0.5 if abs(b - a) > 1 else w) for (a, b, t, w) in edges])
    run("30 iters", edges, iters=30)
    run("damping 1e-3", edges, damping=1e-3)
    # translation-only closures: keep odometry rotation, ICP translation
    t_only = []
    for (a, b, t, w) in edges:
        if abs(b - a) > 1:
            t_odo = np.linalg.inv(d["poses"][a]) @ d["poses"][b]
            t2 = t_odo.copy()
            t2[:3, 3] = t[:3, 3]
            t_only.append((a, b, t2.astype(np.float32), w))
        else:
            t_only.append((a, b, t, w))
    run("translation-only closures", t_only)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
