#!/usr/bin/env python
"""Execute the BASELINE.md eval configs end-to-end and record ATE + fps.

BASELINE.json names five configs on TUM RGB-D sequences. This
environment has no network egress (tools/fetch_tum.py documents the
blocker), so when the real sequences are absent the runner renders
synthetic TUM-format stand-ins (tools/make_tum_synthetic.py) with the
same directory layout and drives the IDENTICAL application CLI path
(tsdfjax.app main: TumDataset reader -> tracker -> trajectory writer ->
bundled ATE). The output JSON records which data source was used.

Configs (BASELINE.json 1-5, plus evidence runs 6-8):
  1 GT-pose fusion, fr1_xyz, 128^3          -> ATE ~ 0 sanity + fps
  2 3-level ICP, fr1_desk, 256^3            -> ATE RMSE (strict parity
                                               AND fast settings)
  3 SDF tracker, fr1_desk                   -> ATE RMSE vs ICP
  4 marching cubes + keyframes, fr2_desk 512^3 -> artifacts + timings
  5 SHARDED engine (--engine sharded CLI) vs dense, fr3_long_office
    -> ATE parity + distributed mesh/checkpoint artifacts
  6 pose-graph drift A/B on a noisy looping sequence -> ATE improvement
  7 noise/dropout robustness sweep, ICP vs SDF -> ATE degradation curves
  8 strict-parity ICP, short -> chip execution evidence for strict mode

Usage: python tools/run_baseline.py [--data-root data/tum] [--out ATE.json]
       [--frames N] [--configs 1,2,3] [--virtual-devices 8]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def ensure_sequence(data_root: str, name: str, kind: str, frames: int,
                    noise: float, width: int = 640, height: int = 480,
                    dropout: float = 0.0, scene: str = "default") -> tuple[str, str]:
    """Returns (sequence_dir, source) where source is 'tum' or 'synthetic'."""
    real = {
        "fr1_xyz": "rgbd_dataset_freiburg1_xyz",
        "fr1_desk": "rgbd_dataset_freiburg1_desk",
        "fr2_desk": "rgbd_dataset_freiburg2_desk",
        "fr3_long_office": "rgbd_dataset_freiburg3_long_office_household",
    }.get(name)
    if real is not None:
        real_dir = os.path.join(data_root, real)
        if os.path.exists(os.path.join(real_dir, "depth.txt")):
            return real_dir, "tum"
    tag = f"synthetic_{name}_{frames}f"
    if width != 640:
        tag += f"_{width}x{height}"
    if noise != 0.002:
        tag += f"_n{noise:g}"
    if dropout:
        tag += f"_d{dropout:g}"
    if scene != "default":
        tag += f"_{scene}"
    syn_dir = os.path.join(data_root, tag)
    if not os.path.exists(os.path.join(syn_dir, "depth.txt")):
        from make_tum_synthetic import write_sequence

        print(f"[baseline] rendering synthetic stand-in for {name} "
              f"({kind}, {frames} frames, {width}x{height}, noise {noise}, "
              f"dropout {dropout}, scene {scene})...", file=sys.stderr)
        write_sequence(syn_dir, kind=kind, n_frames=frames, noise=noise,
                       width=width, height=height, dropout=dropout,
                       scene=scene)
    return syn_dir, "synthetic"


def run_app(argv: list[str]) -> tuple[int, str, float]:
    """Run the application CLI as a SUBPROCESS (`python -m tsdfjax.app`),
    teeing stderr live and returning its text.

    This used to run app.main in-process; on the axon TPU tunnel the
    teardown of one run's engine (freeing ~0.5 GB of device buffers +
    executables) deadlocked before the next run could start — observed
    as an 18-minute futex hang between config-6 legs. A subprocess per
    leg isolates device state completely and is also exactly what a user
    types."""
    import subprocess

    if "--cpu" not in argv and jax_is_cpu():
        argv = list(argv) + ["--cpu"]
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "-m", "tsdfjax.app", *argv],
        cwd=REPO, stderr=subprocess.PIPE, stdout=subprocess.DEVNULL,
        text=True,
    )
    lines = []
    for line in proc.stderr:
        lines.append(line)
        sys.__stderr__.write(line)
    rc = proc.wait()
    return rc, "".join(lines), time.perf_counter() - t0


def jax_is_cpu() -> bool:
    import jax

    return jax.default_backend() == "cpu"


def parse_metrics(err_text: str) -> dict:
    out = {}
    m = re.search(r"(\d+) frames in ([0-9.]+)s \(([0-9.]+) fps\)", err_text)
    if m:
        out["frames"] = int(m.group(1))
        out["fps"] = float(m.group(3))
    m = re.search(r"ATE RMSE vs .*: ([0-9.]+) cm", err_text)
    if m:
        out["ate_rmse_cm"] = float(m.group(1))
    m = re.search(r"mesh: (\d+) verts / (\d+) faces .*\(([0-9.]+)s\)", err_text)
    if m:
        out["mesh_vertices"] = int(m.group(1))
        out["mesh_faces"] = int(m.group(2))
        out["mesh_seconds"] = float(m.group(3))
    m = re.search(r"posegraph_overhead_ms_per_frame = ([0-9.]+)", err_text)
    if m:
        out["posegraph_overhead_ms_per_frame"] = float(m.group(1))
    return out


def ate_of_traj(traj_path: str, gt_path: str) -> float:
    from tsdfjax.io import tum

    est = tum.read_trajectory(traj_path)
    gt = tum.read_trajectory(gt_path)
    return tum.ate_rmse(est, gt)


def write_ini(path: str, volume_res: int, tracker: str, size_m: float = 2.0,
              fast: bool | None = None, use_color: bool = False,
              max_triangles: int = 1_500_000, width: int = 640,
              height: int = 480) -> str:
    """A reference-format config.ini for the run. `fast=None` leaves the
    [tsdfjax] section out entirely = strict-parity ICP defaults."""
    fx = 525.0 * width / 640
    fy = 525.0 * height / 480
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    lines = [
        "[switch]",
        f"use_color={int(use_color)}",
        "read_rgbd_from_rgbddataset=1",
        f"use_sdf_tracker={int(tracker == 'sdf')}",
        f"read_trajactory_from_file={int(tracker == 'file')}",
        "[camera]",
        f"depth_cols={width}", f"depth_rows={height}",
        f"depth_cx={cx}", f"depth_cy={cy}", f"depth_fx={fx}", f"depth_fy={fy}",
        f"rgb_cols={width}", f"rgb_rows={height}",
        f"rgb_cx={cx}", f"rgb_cy={cy}", f"rgb_fx={fx}", f"rgb_fy={fy}",
        "[kinectfusion]",
        "depth_trunc_max=4.0", "depth_trunc_min=0.3",
        "filter_sigma_depth=0.02", "filter_sigma_pixel=2.0",
        f"volume_resolution={volume_res}",
        f"volume_size_meter={size_m}",
        "volume_max_weight=128",
        "integrate_sdf_trunc=0.04", "integrate_depth_trunc=2.0",
        "raycast_increment_factor=0.8",
        "[icp]",
        "icp_pyramid_level=3", "icp_thre_dist=0.1", "icp_thre_sin_angle=0.2",
        "camera_shake_dist=0.4", "camera_shake_angle=0.4",
        "[sdfTracker]",
        "max_iter_nums=6", "camera_shake_dist=0.4", "camera_shake_angle=0.4",
        "[mesh]",
        f"max_triangle_num={max_triangles}",
        "[IO]",
        "mesh_filename=",  # no automatic end-of-run mesh for tracker runs
    ]
    if fast is not None:
        lines += ["[tsdfjax]",
                  f"fast_ops={int(fast)}",
                  "icp_source_subsample=2" if fast else "icp_source_subsample=1",
                  "icp_converge_eps=1e-4" if fast else "icp_converge_eps=0",
                  # coarse_assoc stays 0 even in fast mode: 5x ATE cost for ~10% fps
                  "icp_coarse_assoc=0",
                  # filtered-depth SDF residuals: the same noise treatment
                  # ICP gets from its filtered vertex maps (measured
                  # 0.52 -> 0.41 cm at the sigma=0.005 stress point)
                  f"sdf_use_filtered_depth={int(bool(fast))}"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", default="data/tum")
    ap.add_argument("--out", default="ATE_run.json")
    ap.add_argument("--frames", type=int, default=120,
                    help="synthetic stand-in sequence length")
    ap.add_argument("--noise", type=float, default=0.002,
                    help="synthetic Kinect-like depth noise (sigma=noise*z^2)")
    ap.add_argument("--configs", default="1,2,3",
                    help="comma list out of 1..8 (5=sharded engine, "
                         "6=posegraph drift A/B, 7=noise/dropout stress "
                         "sweep, 8=strict-parity short run for the chip)")
    ap.add_argument("--workdir", default="output/baseline")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                         "ignores JAX_PLATFORMS, so this must be a flag)")
    ap.add_argument("--virtual-devices", type=int, default=0,
                    help="host-platform virtual device count for the "
                         "sharded config-5 run (sets XLA_FLAGS before jax "
                         "init; implies --cpu)")
    args = ap.parse_args()
    if args.virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{args.virtual_devices}"
            )
        args.cpu = True
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    configs = {int(x) for x in args.configs.split(",")}
    os.makedirs(args.workdir, exist_ok=True)

    results = {"runs": [], "env": {}}
    import jax

    results["env"]["backend"] = jax.default_backend()
    results["env"]["device"] = str(jax.devices()[0])

    def record(name, seq_dir, source, extra, err, wall):
        met = parse_metrics(err)
        met.update(extra)
        met["config"] = name
        met["sequence"] = seq_dir
        met["data_source"] = source
        met["wall_seconds"] = round(wall, 1)
        results["runs"].append(met)
        print(f"[baseline] {name}: {met}", file=sys.stderr)

    # ---------------- config 1: GT fusion, fr1_xyz, 128^3 ----------------
    if 1 in configs:
        seq, source = ensure_sequence(args.data_root, "fr1_xyz", "xyz",
                                      args.frames, args.noise)
        ini = write_ini(os.path.join(args.workdir, "cfg1.ini"), 128, "file")
        traj = os.path.join(args.workdir, "traj_cfg1.txt")
        rc, err, wall = run_app([
            "--config", ini, "--dataset", seq, "--tracker", "file",
            "--traj-out", traj,
            "--groundtruth", os.path.join(seq, "groundtruth.txt"),
        ])
        assert rc == 0, f"config 1 failed rc={rc}"
        ate = ate_of_traj(traj, os.path.join(seq, "groundtruth.txt"))
        record("1_gt_fusion_fr1_xyz_128", seq, source,
               {"ate_rmse_cm": round(ate * 100, 4)}, err, wall)

    # ---------------- config 2: ICP, fr1_desk, 256^3 ----------------
    if 2 in configs:
        seq, source = ensure_sequence(args.data_root, "fr1_desk", "desk",
                                      args.frames, args.noise)
        gt = os.path.join(seq, "groundtruth.txt")
        for label, fast in (("strict", None), ("fast", True)):
            ini = write_ini(
                os.path.join(args.workdir, f"cfg2_{label}.ini"), 256, "icp",
                fast=fast,
            )
            traj = os.path.join(args.workdir, f"traj_cfg2_{label}.txt")
            rc, err, wall = run_app([
                "--config", ini, "--dataset", seq, "--tracker", "icp",
                "--traj-out", traj, "--groundtruth", gt,
            ])
            assert rc == 0, f"config 2 {label} failed rc={rc}"
            ate = ate_of_traj(traj, gt)
            record(f"2_icp_fr1_desk_256_{label}", seq, source,
                   {"ate_rmse_cm": round(ate * 100, 4)}, err, wall)

    # ---------------- config 3: SDF tracker, fr1_desk ----------------
    # Two legs: the reference-default budget (6 iters, eps 1e-3, frozen
    # association) and the round-5 tuned opt-in (12 iters, eps 1e-4,
    # association rebuilt per iteration) — the ablation
    # (tools/prof_sdf_ablate.py) shows the reference budget IS the SDF
    # accuracy floor (0.193 -> 0.061 cm on the clean stress point).
    if 3 in configs:
        seq, source = ensure_sequence(args.data_root, "fr1_desk", "desk",
                                      args.frames, args.noise)
        gt = os.path.join(seq, "groundtruth.txt")
        for label, tuned in (("default", False), ("tuned", True)):
            ini = write_ini(
                os.path.join(args.workdir, f"cfg3_{label}.ini"), 256, "sdf")
            if tuned:
                with open(ini) as f:
                    txt = f.read()
                txt = txt.replace("max_iter_nums=6", "max_iter_nums=12")
                txt += ("[tsdfjax]\nsdf_convergence_eps=1e-4\n"
                        "sdf_rebuild_assoc=1\nfast_ops=1\n"
                        "sdf_source_subsample=2\nsdf_use_filtered_depth=1\n")
                with open(ini, "w") as f:
                    f.write(txt)
            traj = os.path.join(args.workdir, f"traj_cfg3_{label}.txt")
            rc, err, wall = run_app([
                "--config", ini, "--dataset", seq, "--tracker", "sdf",
                "--traj-out", traj, "--groundtruth", gt,
            ])
            assert rc == 0, f"config 3 {label} failed rc={rc}"
            ate = ate_of_traj(traj, gt)
            record(f"3_sdf_fr1_desk_256_{label}", seq, source,
                   {"ate_rmse_cm": round(ate * 100, 4)}, err, wall)

    # ------- config 4: marching cubes + keyframes, fr2_desk, 512^3 -------
    if 4 in configs:
        seq, source = ensure_sequence(args.data_root, "fr2_desk", "desk",
                                      min(args.frames, 60), args.noise)
        gt = os.path.join(seq, "groundtruth.txt")
        ini = write_ini(os.path.join(args.workdir, "cfg4.ini"), 512, "icp",
                        size_m=2.0, fast=True, use_color=True,
                        max_triangles=6_500_000)
        mesh_out = os.path.join(args.workdir, "cfg4_mesh.obj")
        tex_out = os.path.join(args.workdir, "textured_mesh.obj")
        kf_dir = os.path.join(args.workdir, "cfg4_keyframes")
        rc, err, wall = run_app([
            "--config", ini, "--dataset", seq, "--tracker", "icp",
            "--groundtruth", gt, "--mesh-out", mesh_out,
            "--texture-out", tex_out, "--keyframe-dir", kf_dir,
            "--keyframe-every", "20",
        ])
        assert rc == 0, f"config 4 failed rc={rc}"
        record("4_mc_keyframes_fr2_desk_512", seq, source, {
            "mesh_file": mesh_out,
            "textured_mesh": tex_out if os.path.exists(tex_out) else None,
            "mesh_bytes": os.path.getsize(mesh_out) if os.path.exists(mesh_out) else 0,
        }, err, wall)

    # ------- config 5: SHARDED volume engine, fr3_long_office ---------
    # BASELINE configs[4]: "Block-partitioned TSDF across N>=2 hosts with
    # halo exchange + psum'd ICP ... full ATE eval". The run goes through
    # the SAME application CLI a user would type (--engine sharded),
    # exercising ShardedFusion + distributed mesh extraction; a dense run
    # with identical settings is recorded for the tolerance comparison.
    if 5 in configs:
        n_dev = args.virtual_devices or 0
        seq, source = ensure_sequence(args.data_root, "fr3_long_office",
                                      "long", max(args.frames, 200), args.noise)
        gt = os.path.join(seq, "groundtruth.txt")
        ini = write_ini(os.path.join(args.workdir, "cfg5.ini"), 256, "icp",
                        fast=True)
        ates = {}
        for label in ("sharded", "dense"):
            traj = os.path.join(args.workdir, f"traj_cfg5_{label}.txt")
            argv = [
                "--config", ini, "--dataset", seq, "--tracker", "icp",
                "--traj-out", traj, "--groundtruth", gt,
                "--keyframe-every", "20", "--posegraph-every", "50",
                "--engine", label if label == "sharded" else "dense",
            ]
            if label == "sharded" and n_dev:
                argv += ["--devices", str(n_dev)]
            if label == "sharded":
                argv += ["--mesh-out",
                         os.path.join(args.workdir, "cfg5_mesh.obj"),
                         "--checkpoint",
                         os.path.join(args.workdir, "cfg5_ckpt")]
            rc, err, wall = run_app(argv)
            assert rc == 0, f"config 5 {label} failed rc={rc}"
            ates[label] = ate_of_traj(traj, gt)
            extra = {"ate_rmse_cm": round(ates[label] * 100, 4),
                     "engine": label}
            if label == "sharded":
                extra["devices"] = n_dev or 1
            record(f"5_long_office_{label}", seq, source, extra, err, wall)
        print(f"[baseline] config 5 sharded-vs-dense ATE delta: "
              f"{abs(ates['sharded']-ates['dense'])*100:.4f} cm",
              file=sys.stderr)

    # ------- config 6: pose-graph drift A/B on a looping sequence -----
    # North-star claim "pose-graph over keyframes handles drift": a
    # DRIFT-DOMINATED rotation-heavy loop through the cluttered
    # non-axis-aligned scene (round-3's noisy/dropout setup manufactured
    # per-frame JITTER instead — 7 mm/frame tracking noise that no
    # keyframe graph can touch by construction; this sequence measures
    # 0.6 mm/frame jitter growing to ~4 mm relative error over 100
    # frames, i.e. error the graph CAN fix). The A run closes loops +
    # applies the final composition bend, the B run is identical without
    # the pose graph. A must beat B by >= 10%.
    if 6 in configs:
        seq, source = ensure_sequence(
            args.data_root, "drift_clutter", "loop", max(args.frames, 400),
            0.004, scene="cluttered",
        )
        gt = os.path.join(seq, "groundtruth.txt")
        ini = write_ini(os.path.join(args.workdir, "cfg6.ini"), 256, "icp",
                        fast=True)
        ates = {}
        for label, pg in (("posegraph", "40"), ("odometry", "0")):
            traj = os.path.join(args.workdir, f"traj_cfg6_{label}.txt")
            argv = [
                "--config", ini, "--dataset", seq, "--tracker", "icp",
                "--traj-out", traj, "--groundtruth", gt,
                "--keyframe-every", "10",
            ]
            if pg != "0":
                argv += ["--posegraph-every", pg]
            rc, err, wall = run_app(argv)
            assert rc == 0, f"config 6 {label} failed rc={rc}"
            ates[label] = ate_of_traj(traj, gt)
            record(f"6_drift_clutter_{label}", seq, source,
                   {"ate_rmse_cm": round(ates[label] * 100, 4)}, err, wall)
        impr = (ates["odometry"] - ates["posegraph"]) / max(ates["odometry"], 1e-9)
        fps6 = {r["config"]: r.get("fps") for r in results["runs"]
                if r["config"].startswith("6_drift_clutter")}
        pg_fps = fps6.get("6_drift_clutter_posegraph")
        odo_fps = fps6.get("6_drift_clutter_odometry")
        results["posegraph_ab"] = {
            "ate_posegraph_cm": round(ates["posegraph"] * 100, 4),
            "ate_odometry_cm": round(ates["odometry"] * 100, 4),
            "improvement_pct": round(impr * 100, 1),
            # runtime budget (VERDICT r4 item 5): posegraph-mode fps must
            # stay within 2x of odometry
            "fps_posegraph": pg_fps,
            "fps_odometry": odo_fps,
            "fps_ratio": (
                round(odo_fps / pg_fps, 2) if pg_fps and odo_fps else None
            ),
        }
        # keyframe-level A/B on the odometry run (the drift component the
        # graph can actually fix; full-trajectory ATE is dominated by
        # per-frame tracking noise): tools/prof_posegraph.py replay.
        import subprocess

        try:
            rp = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "tools", "prof_posegraph.py"),
                 seq, os.path.join(args.workdir, "traj_cfg6_odometry.txt"),
                 "--width", "640", "--height", "480"],
                capture_output=True, text=True, timeout=2400,
                env={**os.environ, "JAX_PLATFORMS": "cpu"},
            )
            if rp.returncode == 0 and rp.stdout.strip():
                results["posegraph_keyframe_ab"] = json.loads(
                    rp.stdout.strip().splitlines()[-1])
            else:
                results["posegraph_keyframe_ab"] = {
                    "error": f"rc={rp.returncode}",
                    "stderr_tail": rp.stderr[-500:],
                }
        except (subprocess.TimeoutExpired, json.JSONDecodeError) as e:
            # don't abort the suite after the expensive app runs completed
            results["posegraph_keyframe_ab"] = {"error": repr(e)}
        print(f"[baseline] config 6 drift A/B: posegraph "
              f"{ates['posegraph']*100:.3f} cm vs odometry "
              f"{ates['odometry']*100:.3f} cm ({impr*100:+.1f}%); "
              f"keyframe A/B {results.get('posegraph_keyframe_ab')}",
              file=sys.stderr)

    # ------- config 7: noise / dropout robustness sweep ----------------
    # The synthetic baseline numbers validate plumbing; this sweep records
    # how ATE degrades as depth noise and dropout rise, for ICP vs SDF
    # (the reference's evaluation intent, README.md:8, stressed within the
    # no-network constraint).
    if 7 in configs:
        sweep = []
        nf = min(args.frames, 100)
        # the last row re-runs the sigma=0.005 point on the CLUTTERED
        # non-axis-aligned scene (VERDICT r3 weak #6: axis-aligned planes
        # are the easiest case for point-to-plane ICP and hide
        # rotation/sliding failure modes)
        points = [(0.002, 0.0, "default"), (0.005, 0.0, "default"),
                  (0.005, 0.2, "default"), (0.01, 0.0, "default"),
                  (0.005, 0.0, "cluttered")]
        for sigma, drop, scene in points:
            seq, source = ensure_sequence(
                args.data_root, "fr1_desk", "desk", nf, sigma,
                width=320, height=240, dropout=drop, scene=scene,
            )
            gt = os.path.join(seq, "groundtruth.txt")
            for tracker in ("icp", "sdf"):
                ini = write_ini(
                    os.path.join(args.workdir, f"cfg7_{tracker}.ini"),
                    256, tracker, fast=True, width=320, height=240,
                )
                traj = os.path.join(args.workdir, "traj_cfg7.txt")
                rc, err, wall = run_app([
                    "--config", ini, "--dataset", seq, "--tracker", tracker,
                    "--traj-out", traj, "--groundtruth", gt,
                ])
                assert rc == 0, f"config 7 {tracker} s={sigma} failed"
                ate = ate_of_traj(traj, gt)
                met = parse_metrics(err)
                point = {
                    "tracker": tracker, "noise": sigma, "dropout": drop,
                    "scene": scene,
                    "ate_rmse_cm": round(ate * 100, 4),
                    "lost": "lost 0" not in err,
                    "fps": met.get("fps"),
                }
                sweep.append(point)
                print(f"[baseline] stress {point}", file=sys.stderr)
        results["stress_sweep"] = sweep

    # ------- config 8: strict-parity ICP, short, for chip execution ----
    # Strict settings (subsample 1, eps 0 — the reference's fixed 10/5/4
    # GN schedule) on whatever backend is active; run WITHOUT --cpu on the
    # TPU host to give strict-parity settings chip execution evidence.
    if 8 in configs:
        # 300 frames (VERDICT r4 item 6's soak bar; round 4 ran 120 at
        # 1.34 exact-ops fps — the round-5 exact-path early exit at 1.52
        # fps makes the longer soak ~3.5 min of step time)
        nf = min(args.frames, 300) if args.frames >= 300 else min(args.frames, 120)
        seq, source = ensure_sequence(args.data_root, "fr1_desk", "desk",
                                      nf, args.noise)
        gt = os.path.join(seq, "groundtruth.txt")
        ini = write_ini(os.path.join(args.workdir, "cfg8.ini"), 256, "icp",
                        fast=None)
        traj = os.path.join(args.workdir, "traj_cfg8.txt")
        rc, err, wall = run_app([
            "--config", ini, "--dataset", seq, "--tracker", "icp",
            "--traj-out", traj, "--groundtruth", gt,
            "--max-frames", str(nf),
        ])
        assert rc == 0, f"config 8 failed rc={rc}"
        ate = ate_of_traj(traj, gt)
        record("8_icp_strict_short", seq, source,
               {"ate_rmse_cm": round(ate * 100, 4)}, err, wall)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["runs"], indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
