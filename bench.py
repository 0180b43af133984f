"""Headline benchmark: depth frames/s per chip through the FULL fusion
pipeline (preprocess -> 3-level ICP tracking -> 256^3 TSDF integrate ->
raycast) at the reference's default 640x480 configuration, on synthetic
frames (no dataset download in this environment).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 30 depth fps/chip (BASELINE.md north-star; the reference's
targeted Kinect sensor rate, DataSourceProducerOpenni2.cpp:103).

Extra per-stage numbers go to stderr so stdout stays one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tsdfjax.config import AppConfig, IcpConfig, SwitchConfig
    from tsdfjax.pipeline import FusionEngine, initial_pose
    from tsdfjax import synthetic as syn

    dev = jax.devices()[0]
    log(f"device: {dev}")

    # fast tracker settings (the shipped config_default.ini [tsdfjax]
    # section); strict-parity defaults are subsample 1 / eps 0
    cfg = AppConfig(
        switches=SwitchConfig(use_color=False),
        icp=IcpConfig(pyramid_levels=3, source_subsample=2, converge_eps=1e-4),
    )
    cam = cfg.depth_camera
    scene = syn.default_scene(cfg.volume.size_m)

    # pre-render a short orbit on host so frame IO is out of the loop
    n_warm, n_meas = 3, 20
    c = cfg.volume.size_m / 2.0
    start = initial_pose(cfg)
    radius = c + cfg.preprocess.min_trunc_m
    target = np.array([c, c, c])
    poses = [start]
    for i in range(1, n_warm + n_meas):
        ang = 0.004 * i
        eye = np.array([c + radius * np.sin(ang), c, c - radius * np.cos(ang)])
        poses.append(syn.look_at(eye, target))
    log("rendering synthetic frames...")
    # Frames are rendered ON DEVICE and stay there: through the axon
    # tunnel a host->device upload of even a 1.2 MB frame costs ~0.8 s
    # (lazy transfer at first use), which would measure the tunnel, not
    # the pipeline. On a real TPU host the same H2D copy is ~microseconds.
    render = jax.jit(lambda p: syn.render_depth(p, cam, scene))
    frames_dev = [render(jnp.asarray(p, jnp.float32)) for p in poses]
    jax.block_until_ready(frames_dev)

    engine = FusionEngine(cfg, mode="icp")

    # jax.block_until_ready does NOT reliably wait through the axon
    # relay; only an actual value readback guarantees the device work
    # finished. sync() reduces every state leaf to one scalar.
    import jax.numpy as jnp  # noqa: F811

    @jax.jit
    def _probe(state):
        return (
            jnp.sum(state.volume.tsdf[::16, ::16, ::16])
            + jnp.sum(state.volume.weight[::16, ::16, ::16])
            + jnp.sum(state.model_vertices[::8, ::8])
            + jnp.sum(state.model_normals[::8, ::8])
            + jnp.sum(state.pose)
        )

    def sync():
        return float(_probe(engine.state))

    log("warmup/compile...")
    t0 = time.perf_counter()
    for k in range(n_warm):
        diag = engine.step(frames_dev[k])
    sync()
    log(f"warmup done in {time.perf_counter()-t0:.1f}s")

    # measure the readback floor so it can be amortized out
    t0 = time.perf_counter()
    floor = 0.0
    for _ in range(3):
        t1 = time.perf_counter()
        sync()
        floor = min(floor, time.perf_counter() - t1) if floor else time.perf_counter() - t1
    log(f"readback floor: {floor*1000:.1f} ms")

    t0 = time.perf_counter()
    for k in range(n_warm, n_warm + n_meas):
        diag = engine.step(frames_dev[k])
    sync()
    dt = max(time.perf_counter() - t0 - floor, 1e-9)
    fps = n_meas / dt
    log(f"{n_meas} frames in {dt:.3f}s -> {fps:.2f} fps "
        f"(tracking ok on last: {bool(diag.tracking_ok)})")

    baseline = 30.0
    print(json.dumps({
        "metric": "depth_fps_per_chip_icp_256",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
