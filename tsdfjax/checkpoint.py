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
