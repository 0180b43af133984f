"""Structured per-frame logging and stage timing.

The reference's observability is couts of per-stage milliseconds and
counters (HybKinectfu.cpp:101-155, integrateVolume.cu:92-94); SURVEY.md
§5 calls for a structured equivalent: frame id, stage times, GN
residual/correspondence counts, tracked/lost status, fused-voxel counts.
Emits human-readable lines and optional JSONL.
"""

from __future__ import annotations

import json
import sys
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class FrameLog:
    frame_id: int
    timestamp: float = 0.0
    tracking_ok: bool = True
    tracker_residual: float = 0.0
    tracker_corr: int = 0
    integrated_voxels: int = 0
    lost_count: int = 0
    stages_ms: dict = field(default_factory=dict)

    def line(self) -> str:
        stages = " ".join(f"{k}={v:.1f}ms" for k, v in self.stages_ms.items())
        status = "ok" if self.tracking_ok else "LOST"
        return (
            f"frame {self.frame_id:5d} [{status}] voxels={self.integrated_voxels} "
            f"corr={self.tracker_corr} res={self.tracker_residual:.5f} {stages}"
        )


class RunLogger:
    def __init__(self, jsonl_path: str | None = None, stream=sys.stderr, every: int = 1):
        self._jsonl = open(jsonl_path, "w") if jsonl_path else None
        self._stream = stream
        self._every = max(every, 1)

    def log(self, fl: FrameLog) -> None:
        if self._stream and fl.frame_id % self._every == 0:
            print(fl.line(), file=self._stream, flush=True)
        if self._jsonl:
            self._jsonl.write(
                json.dumps(
                    {
                        "frame_id": fl.frame_id,
                        "timestamp": fl.timestamp,
                        "tracking_ok": fl.tracking_ok,
                        "tracker_residual": fl.tracker_residual,
                        "tracker_corr": fl.tracker_corr,
                        "integrated_voxels": fl.integrated_voxels,
                        "lost_count": fl.lost_count,
                        "stages_ms": fl.stages_ms,
                    }
                )
                + "\n"
            )
            self._jsonl.flush()

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()


class StageTimer:
    """Wall-clock stage timer. NOTE: on the axon relay only value
    readbacks truly synchronize, so per-stage device times inside one jit
    are not separable — this times host-visible boundaries (frame IO,
    step dispatch+sync, meshing), which is what the reference's clock()
    pairs measured too."""

    def __init__(self):
        self.ms: dict[str, float] = {}

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.ms[name] = self.ms.get(name, 0.0) + (time.perf_counter() - t0) * 1e3
