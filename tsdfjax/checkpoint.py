"""Checkpoint / resume of the full fusion state.

The reference has NO persistence for the volume (its writeVolumeToFile is
commented out, tsdfVolume.h:149); SURVEY.md §5 marks this as a required
improvement slot. A checkpoint stores every FusionState leaf plus enough
config fingerprint to refuse mismatched resumes. Plain npz keeps it
dependency-free; orbax can be layered later for multi-host sharded saves
(each host dumps its volume slab — the layout is already x-major).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from tsdfjax.config import AppConfig
from tsdfjax.pipeline import FusionState
from tsdfjax.volume import TsdfVolume


def _config_fingerprint(cfg: AppConfig) -> str:
    d = {
        "resolution": cfg.volume.resolution,
        "size_m": cfg.volume.size_m,
        "width": cfg.depth_camera.width,
        "height": cfg.depth_camera.height,
    }
    return json.dumps(d, sort_keys=True)


def save_state(path: str, state: FusionState, cfg: AppConfig) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp + ".npz",
        tsdf=np.asarray(state.volume.tsdf),
        weight=np.asarray(state.volume.weight),
        color=np.asarray(state.volume.color),
        pose=np.asarray(state.pose),
        model_vertices=np.asarray(state.model_vertices),
        model_normals=np.asarray(state.model_normals),
        model_color=np.asarray(state.model_color),
        frame_id=np.asarray(state.frame_id),
        lost_count=np.asarray(state.lost_count),
        fingerprint=np.frombuffer(
            _config_fingerprint(cfg).encode(), dtype=np.uint8
        ),
    )
    src = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(src, path)


def save_state_sharded(dir_path: str, state: FusionState, cfg: AppConfig) -> None:
    """Multi-host checkpoint: each process writes ONLY its addressable
    volume slabs (one .npy per shard, keyed by the slab's global x
    origin), so no host ever materializes the full volume. Replicated
    leaves (pose, model maps, counters) and the config fingerprint are
    written once by process 0. Layout:

        dir/meta.json                      fingerprint + resolution
        dir/{tsdf,weight,color}_x{X}.npy   per-shard slabs
        dir/replicated.npz                 pose/model maps/counters
    """
    import glob
    import jax

    os.makedirs(dir_path, exist_ok=True)
    # drop stale slab files from a previous save with a different shard
    # layout — the loader globs {name}_x*.npy and would mix them in.
    # (On a true multi-process deployment this cleanup must run once
    # before the collective save — process 0 here — since hosts write
    # concurrently into the same directory.)
    if jax.process_index() == 0:
        for old in glob.glob(os.path.join(dir_path, "*_x*.npy")):
            os.remove(old)
    for name in ("tsdf", "weight", "color"):
        arr = getattr(state.volume, name)
        for shard in arr.addressable_shards:
            x0 = shard.index[0].start or 0
            np.save(os.path.join(dir_path, f"{name}_x{x0}.npy"),
                    np.asarray(shard.data))
    if jax.process_index() == 0:
        np.savez(
            os.path.join(dir_path, "replicated.npz"),
            pose=np.asarray(state.pose),
            model_vertices=np.asarray(state.model_vertices),
            model_normals=np.asarray(state.model_normals),
            model_color=np.asarray(state.model_color),
            frame_id=np.asarray(state.frame_id),
            lost_count=np.asarray(state.lost_count),
        )
        with open(os.path.join(dir_path, "meta.json"), "w") as f:
            json.dump({"fingerprint": _config_fingerprint(cfg)}, f)


def load_state_sharded(dir_path: str, cfg: AppConfig, mesh) -> FusionState:
    """Restore a save_state_sharded checkpoint onto `mesh` (any device
    count whose shard boundaries align with the saved slab files — e.g.
    the same mesh, or one whose block size divides the saved one).
    Each device's slab is assembled from the covering files without ever
    building the dense volume on host."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    with open(os.path.join(dir_path, "meta.json")) as f:
        meta = json.load(f)
    want = _config_fingerprint(cfg)
    if meta["fingerprint"] != want:
        raise ValueError(
            f"checkpoint/config mismatch: {meta['fingerprint']} != {want}"
        )
    res = cfg.volume.resolution
    sharding = NamedSharding(mesh, P("space"))

    import re as _re

    def leaf(name, trailing):
        files = {}
        for fn in os.listdir(dir_path):
            m = _re.fullmatch(rf"{name}_x(\d+)\.npy", fn)
            if m:
                files[int(m.group(1))] = os.path.join(dir_path, fn)
        starts = sorted(files)
        shape = (res, res, res, *trailing)

        def cb(index):
            lo = index[0].start or 0
            hi = index[0].stop if index[0].stop is not None else res
            pieces = []
            for s in starts:
                block = np.load(files[s], mmap_mode="r")
                s_hi = s + block.shape[0]
                if s_hi <= lo or s >= hi:
                    continue
                pieces.append(np.asarray(block[max(lo - s, 0): hi - s]))
            out = np.concatenate(pieces, axis=0) if len(pieces) > 1 else pieces[0]
            assert out.shape[0] == hi - lo, (out.shape, lo, hi)
            return out

        return jax.make_array_from_callback(shape, sharding, cb)

    rep = np.load(os.path.join(dir_path, "replicated.npz"))
    rep_sharding = NamedSharding(mesh, P())
    put = lambda x: jax.device_put(jnp.asarray(x), rep_sharding)
    return FusionState(
        volume=TsdfVolume(
            tsdf=leaf("tsdf", ()), weight=leaf("weight", ()),
            color=leaf("color", (3,)),
        ),
        pose=put(rep["pose"]),
        model_vertices=put(rep["model_vertices"]),
        model_normals=put(rep["model_normals"]),
        model_color=put(rep["model_color"]),
        frame_id=put(rep["frame_id"]),
        lost_count=put(rep["lost_count"]),
    )


def load_state(path: str, cfg: AppConfig) -> FusionState:
    data = np.load(path)
    fp = bytes(data["fingerprint"]).decode()
    want = _config_fingerprint(cfg)
    if fp != want:
        raise ValueError(f"checkpoint/config mismatch: {fp} != {want}")
    return FusionState(
        volume=TsdfVolume(
            tsdf=jnp.asarray(data["tsdf"]),
            weight=jnp.asarray(data["weight"]),
            color=jnp.asarray(data["color"]),
        ),
        pose=jnp.asarray(data["pose"]),
        model_vertices=jnp.asarray(data["model_vertices"]),
        model_normals=jnp.asarray(data["model_normals"]),
        model_color=jnp.asarray(data["model_color"]),
        frame_id=jnp.asarray(data["frame_id"]),
        lost_count=jnp.asarray(data["lost_count"]),
    )
