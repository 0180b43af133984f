#!/usr/bin/env python
"""Render a synthetic RGB-D sequence to disk in EXACT TUM RGB-D layout.

Produces depth/*.png (16-bit, 5000 per meter), rgb/*.png, depth.txt,
rgb.txt and groundtruth.txt (each with the TUM 3-comment-line header the
reference skips, DataSourceProducerRGBDDataset.cpp:40-48), so the full
application CLI path — TumDataset reader, timestamp association,
GroundTruthPoseProvider anchoring, TrajectoryWriter, bundled ATE — runs
bit-for-bit the way it would on a downloaded sequence. Used by
tools/run_baseline.py because this environment has no network egress
(see tools/fetch_tum.py).

Ground-truth poses are written in a DELIBERATELY different world frame
(a fixed rigid transform of the render frame) to exercise the frame-0
anchoring refer = pose0 @ file0^-1 (CameraPoseFinderFromFile.cpp:82-88)
and the Horn alignment inside ATE.

Trajectories:
  xyz   translation-dominant wiggle (fr1_xyz-like)
  desk  arc sweep with height variation and look-at rotation (fr1_desk)
  long  multi-arc sweep with slow drift-prone yaw (fr3_long_office-like)

Depth noise: --noise adds the Kinect-like quadratic model
sigma(z) = noise * z^2 (meters), plus the 16-bit/5000 quantization that
the PNG format itself imposes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def trajectory(kind: str, n: int, volume_size: float, min_trunc: float):
    from tsdfjax import synthetic as syn

    c = volume_size / 2.0
    radius = c + min_trunc
    target = np.array([c, c, c])
    start_eye = np.array([c, c, -min_trunc])
    poses = []
    for i in range(n):
        s = i / max(n - 1, 1)
        if kind == "xyz":
            eye = start_eye + np.array(
                [0.12 * np.sin(2 * np.pi * 1.5 * s),
                 0.08 * np.sin(2 * np.pi * 2.5 * s + 1.0),
                 0.10 * np.sin(2 * np.pi * 1.0 * s + 2.0)]
            )
            tgt = target
        elif kind == "desk":
            ang = 0.5 * np.sin(2 * np.pi * 0.5 * s)  # +-0.5 rad sweep
            h = c + 0.15 * np.sin(2 * np.pi * 1.0 * s)
            eye = np.array(
                [c + radius * np.sin(ang), h, c - radius * np.cos(ang)]
            )
            tgt = target + np.array([0.05 * np.sin(6 * s), 0.0, 0.0])
        elif kind == "loop":
            # drift-demo trajectory: fast out-and-back arc that re-visits
            # its start twice (s=0.5 and s=1.0) so keyframe loop closures
            # against the early map are geometrically available; the high
            # angular rate + height wobble makes odometry genuinely drift
            # under depth noise (VERDICT r2 item 4)
            ang = 0.9 * np.sin(2 * np.pi * 1.0 * s)
            h = c + 0.25 * np.sin(2 * np.pi * 3.0 * s)
            r = radius * (1.0 + 0.15 * np.sin(2 * np.pi * 2.0 * s))
            eye = np.array([c + r * np.sin(ang), h, c - r * np.cos(ang)])
            tgt = target + np.array(
                [0.08 * np.sin(7 * s), 0.06 * np.cos(5 * s), 0.0]
            )
        elif kind == "long":
            ang = 0.7 * np.sin(2 * np.pi * 1.5 * s)
            h = c + 0.2 * np.sin(2 * np.pi * 2.0 * s)
            r = radius * (1.0 + 0.1 * np.sin(2 * np.pi * 1.0 * s))
            eye = np.array([c + r * np.sin(ang), h, c - r * np.cos(ang)])
            tgt = target + np.array(
                [0.1 * np.sin(4 * s), 0.05 * np.cos(5 * s), 0.0]
            )
        else:
            raise ValueError(kind)
        poses.append(syn.look_at(eye, tgt))
    # frame 0 exactly at the engine's initial pose (identity rotation at
    # (c, c, -min_trunc), HybKinectfu.cpp:51-57) so tracker modes fuse
    # frame 0 in the render world frame
    poses[0] = syn.look_at(start_eye, target)
    return poses


def write_sequence(
    out_dir: str,
    kind: str = "desk",
    n_frames: int = 120,
    width: int = 640,
    height: int = 480,
    volume_size: float = 2.0,
    min_trunc: float = 0.3,
    noise: float = 0.0,
    dropout: float = 0.0,
    seed: int = 0,
    fps: float = 30.0,
    t0: float = 1305031100.0,
    scene: str = "default",
) -> str:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from tsdfjax import synthetic as syn
    from tsdfjax.geometry import CameraIntrinsics, rotation_to_quaternion

    cam = CameraIntrinsics(
        width=width, height=height, fx=525.0 * width / 640,
        fy=525.0 * height / 480, cx=(width - 1) / 2.0, cy=(height - 1) / 2.0,
    )
    scene = (syn.cluttered_scene(volume_size) if scene == "cluttered"
             else syn.default_scene(volume_size))
    poses = trajectory(kind, n_frames, volume_size, min_trunc)
    rng = np.random.default_rng(seed)

    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    render_d = jax.jit(lambda p: syn.render_depth(p, cam, scene))
    render_c = jax.jit(lambda p: syn.render_rgb(p, cam, scene))

    # ground-truth frame differs from the render frame by a fixed rigid G
    ang = 0.3
    g = np.eye(4, dtype=np.float64)
    g[:3, :3] = np.array(
        [[np.cos(ang), -np.sin(ang), 0.0],
         [np.sin(ang), np.cos(ang), 0.0],
         [0.0, 0.0, 1.0]]
    )
    g[:3, 3] = [0.5, -0.2, 0.8]

    hdr = "# synthetic TUM-format sequence (tsdfjax tools/make_tum_synthetic.py)\n"
    f_depth = open(os.path.join(out_dir, "depth.txt"), "w")
    f_rgb = open(os.path.join(out_dir, "rgb.txt"), "w")
    f_gt = open(os.path.join(out_dir, "groundtruth.txt"), "w")
    for f, what in ((f_depth, "depth"), (f_rgb, "rgb"), (f_gt, "groundtruth")):
        f.write(hdr)
        f.write(f"# {what}\n")
        f.write("# timestamp data\n")

    for i, pose in enumerate(poses):
        ts = t0 + i / fps
        depth = np.asarray(render_d(jnp.asarray(pose, jnp.float32)))
        if noise > 0:
            sigma = noise * depth**2
            depth = np.where(
                depth > 0, np.maximum(depth + rng.normal(0, 1, depth.shape) * sigma, 0), 0
            )
        if dropout > 0:
            # Kinect-like blob dropout: zero out random 8x8 blocks (depth
            # holes at specular/oblique surfaces) with probability
            # `dropout` per block — stresses association density
            bh, bw = -(-height // 8), -(-width // 8)
            blocks = rng.random((bh, bw)) < dropout
            mask = np.kron(blocks, np.ones((8, 8), bool))[:height, :width]
            depth = np.where(mask, 0.0, depth)
        d16 = np.clip(np.round(depth * 5000.0), 0, 65535).astype(np.uint16)
        dname = f"depth/{ts:.6f}.png"
        Image.fromarray(d16).save(os.path.join(out_dir, dname))
        f_depth.write(f"{ts:.6f} {dname}\n")

        rgb = np.asarray(render_c(jnp.asarray(pose, jnp.float32))).astype(np.uint8)
        cname = f"rgb/{ts:.6f}.png"
        Image.fromarray(rgb).save(os.path.join(out_dir, cname))
        f_rgb.write(f"{ts:.6f} {cname}\n")

        gt_pose = g @ pose.astype(np.float64)
        q = np.asarray(
            rotation_to_quaternion(jnp.asarray(gt_pose[:3, :3], jnp.float32))
        )
        t = gt_pose[:3, 3]
        f_gt.write(
            f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
        )
    for f in (f_depth, f_rgb, f_gt):
        f.close()
    return out_dir


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir")
    ap.add_argument("--kind", choices=["xyz", "desk", "long", "loop"],
                    default="desk")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="Kinect-like depth noise factor: sigma = noise*z^2")
    ap.add_argument("--dropout", type=float, default=0.0,
                    help="probability of zeroing each 8x8 depth block")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scene", choices=["default", "cluttered"],
                    default="default",
                    help="'cluttered' = rotated boxes + spheres at mixed "
                         "depths (non-axis-aligned; VERDICT r3 item 5)")
    args = ap.parse_args()
    write_sequence(
        args.out_dir, kind=args.kind, n_frames=args.frames,
        width=args.width, height=args.height, noise=args.noise,
        dropout=args.dropout, seed=args.seed, scene=args.scene,
    )
    print(args.out_dir, file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
