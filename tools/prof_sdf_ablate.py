"""SDF tracker accuracy ablation (VERDICT r4 item 3).

Measures ATE on the clean / blob-dropout / cluttered stress points for:
  - ICP (the comparison floor)
  - SDF at the reference budget (6 iters, eps 1e-3, plain gradients)
  - SDF with hole-aware one-sided gradients (map-hole robustness)
  - SDF with an extended budget done right (12 iters, eps 1e-4, and the
    pixel<->q association REBUILT every iteration)

Runs the full app CLI per leg (subprocess, like run_baseline). CPU by
default; pass --chip to run on the default backend.

Usage: python tools/prof_sdf_ablate.py [--frames 100] [--out FILE.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from run_baseline import ate_of_traj, ensure_sequence, run_app, write_ini


def write_ablate_ini(path, base_ini, extra):
    with open(base_ini) as f:
        lines = f.read().rstrip("\n").split("\n")
    lines += extra
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--out", default="output/sdf_ablate.json")
    ap.add_argument("--data-root", default="data/tum")
    ap.add_argument("--workdir", default="output/sdf_ablate")
    ap.add_argument("--chip", action="store_true",
                    help="run on the default backend instead of CPU")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    points = [
        ("clean", 0.002, 0.0, "default"),
        ("blob_dropout", 0.005, 0.2, "default"),
        ("cluttered", 0.005, 0.0, "cluttered"),
    ]
    # (label, tracker, extra [tsdfjax]/sdfTracker INI lines).
    # NOTE a plain extended budget (eps 1e-4, 24 iters, frozen assoc)
    # DIVERGES: 15.4 cm + tracking lost on the clean point — the sweep
    # tracker freezes the pixel<->q association after the second
    # iteration, and 20+ GN steps against a stale association walk away.
    # The honest extended-budget leg rebuilds the association per
    # iteration.
    legs = [
        ("icp", "icp", []),
        ("sdf_ref_budget", "sdf", []),
        ("sdf_hole_aware", "sdf",
         ["sdf_hole_aware_gradient = 1"]),
        ("sdf_ext_rebuild", "sdf",
         ["sdf_convergence_eps = 1e-4", "sdf_rebuild_assoc = 1"]),
    ]

    results = {"frames": args.frames, "points": []}
    for pname, sigma, drop, scene in points:
        seq, _src = ensure_sequence(
            args.data_root, "fr1_desk", "desk", args.frames, sigma,
            width=320, height=240, dropout=drop, scene=scene,
        )
        gt = os.path.join(seq, "groundtruth.txt")
        point = {"point": pname, "noise": sigma, "dropout": drop,
                 "scene": scene, "legs": {}}
        for label, tracker, extra in legs:
            base = write_ini(
                os.path.join(args.workdir, f"base_{label}.ini"),
                256, tracker, fast=True, width=320, height=240,
            )
            ini = write_ablate_ini(
                os.path.join(args.workdir, f"cfg_{label}.ini"), base, extra,
            )
            if "ext" in label:
                # max_iter_nums lives in [sdfTracker]: patch in place
                with open(ini) as f:
                    txt = f.read()
                txt = txt.replace("max_iter_nums=6", "max_iter_nums=12")
                with open(ini, "w") as f:
                    f.write(txt)
            traj = os.path.join(args.workdir, f"traj_{pname}_{label}.txt")
            argv = ["--config", ini, "--dataset", seq, "--tracker", tracker,
                    "--traj-out", traj, "--groundtruth", gt]
            if not args.chip:
                argv.append("--cpu")
            rc, err, wall = run_app(argv)
            assert rc == 0, f"{pname}/{label} failed rc={rc}\n{err[-2000:]}"
            ate = ate_of_traj(traj, gt)
            lost = "lost 0" not in err
            point["legs"][label] = {
                "ate_rmse_cm": round(ate * 100, 4),
                "lost": lost,
                "wall_s": round(wall, 1),
            }
            print(f"{pname:13s} {label:20s} ATE {ate*100:7.3f} cm"
                  f"{'  LOST' if lost else ''}  ({wall:.0f}s)", flush=True)
        results["points"].append(point)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
