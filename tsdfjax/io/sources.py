"""Data sources: the framework's equivalent of the reference's
DataSourceProducer hierarchy (DataSourceProducer.h:16-44 template-method
base; DataSourceProducerRGBDDataset.{h,cpp} TUM reader;
DataSourceProducerOpenni2.{h,cpp} live Kinect / .oni playback).

All sources yield TumFrame records (index, timestamp, depth_m meters,
optional rgb 0..255). `make_data_source` reproduces MainController's
switch on use_dataset_rgbd (MainController.cpp:87-94).

The OpenNI2 source requires Python OpenNI2 bindings (`primesense`) and
the native OpenNI2 runtime — neither ships in this environment, so the
class gates on import and raises a clear error when unavailable. The
semantics mirror DataSourceProducerOpenni2.cpp: 1 mm depth format at
30 fps, RGB888, depth-to-color registration, optional .oni recording.
"""

from __future__ import annotations

import time
from typing import Iterator, Protocol, runtime_checkable

import numpy as np

from tsdfjax.config import AppConfig
from tsdfjax.io.tum import TumDataset, TumFrame


@runtime_checkable
class DataSource(Protocol):
    """Anything that yields TumFrame records."""

    def __iter__(self) -> Iterator[TumFrame]: ...

    def __len__(self) -> int: ...


class SyntheticSource:
    """Renders an orbit around the analytic scene — the dependency-free
    stand-in for a sensor (used by tests, bench, and `app --synthetic`)."""

    def __init__(self, cfg: AppConfig, n_frames: int, angular_step: float = 0.004):
        self.cfg = cfg
        self.n = n_frames
        self.step = angular_step

    def __len__(self) -> int:
        return self.n

    def poses(self) -> list[np.ndarray]:
        from tsdfjax import synthetic as syn
        from tsdfjax.pipeline import initial_pose

        c = self.cfg.volume.size_m / 2.0
        radius = c + self.cfg.preprocess.min_trunc_m
        target = np.array([c, c, c])
        out = [initial_pose(self.cfg)]
        for i in range(1, self.n):
            ang = self.step * i
            eye = np.array([c + radius * np.sin(ang), c, c - radius * np.cos(ang)])
            out.append(syn.look_at(eye, target))
        return out

    def __iter__(self) -> Iterator[TumFrame]:
        import jax
        import jax.numpy as jnp
        from tsdfjax import synthetic as syn

        cam = self.cfg.depth_camera
        scene = syn.default_scene(self.cfg.volume.size_m)
        render_d = jax.jit(lambda p: syn.render_depth(p, cam, scene))
        render_c = jax.jit(lambda p: syn.render_rgb(p, cam, scene))
        with_rgb = self.cfg.switches.use_color
        for i, pose in enumerate(self.poses()):
            p = jnp.asarray(pose, jnp.float32)
            depth = np.asarray(render_d(p))
            rgb = np.asarray(render_c(p)) if with_rgb else None
            yield TumFrame(
                index=i, timestamp=i / 30.0, depth_m=depth, rgb=rgb,
                rgb_timestamp=i / 30.0 if with_rgb else None,
            )


class Openni2Source:
    """Live Kinect-class sensor or .oni playback via OpenNI2
    (DataSourceProducerOpenni2.cpp). Requires the `primesense` Python
    bindings + libOpenNI2; raises ImportError otherwise.

    uri=None opens ANY_DEVICE (cpp:117); uri='file.oni' plays a
    recording; record_path attaches a Recorder to both streams
    (cpp:53-63)."""

    def __init__(
        self,
        cfg: AppConfig,
        uri: str | None = None,
        record_path: str | None = None,
        max_frames: int = 1 << 30,
    ):
        try:
            from primesense import openni2  # type: ignore
        except ImportError as e:  # pragma: no cover - no OpenNI2 in CI
            raise ImportError(
                "Openni2Source needs the 'primesense' OpenNI2 bindings and "
                "the OpenNI2 native runtime; install them or use the TUM "
                "dataset / synthetic sources instead"
            ) from e
        self._openni2 = openni2
        self.cfg = cfg
        self.uri = uri
        self.record_path = record_path
        self.max_frames = max_frames
        self._dev = None

    def __len__(self) -> int:
        return self.max_frames

    def _setup(self):  # pragma: no cover - requires hardware/runtime
        openni2 = self._openni2
        openni2.initialize()
        dev = openni2.Device.open_any() if self.uri is None else openni2.Device.open_file(
            self.uri.encode()
        )
        c_api = openni2.c_api
        depth = dev.create_depth_stream()
        # 1 mm depth format @ 30 fps, 640x480 (cpp:100-104)
        depth.set_video_mode(
            c_api.OniVideoMode(
                pixelFormat=c_api.ONI_PIXEL_FORMAT_DEPTH_1_MM,
                resolutionX=self.cfg.depth_camera.width,
                resolutionY=self.cfg.depth_camera.height,
                fps=30,
            )
        )
        color = None
        if self.cfg.switches.use_color:
            color = dev.create_color_stream()
            color.set_video_mode(
                c_api.OniVideoMode(
                    pixelFormat=c_api.ONI_PIXEL_FORMAT_RGB888,
                    resolutionX=self.cfg.rgb_camera.width,
                    resolutionY=self.cfg.rgb_camera.height,
                    fps=30,
                )
            )
            # depth-to-color registration (cpp:128-131)
            dev.set_image_registration_mode(
                openni2.IMAGE_REGISTRATION_DEPTH_TO_COLOR
            )
        recorder = None
        if self.record_path:
            recorder = openni2.Recorder(self.record_path.encode())
            recorder.attach(depth)
            if color is not None:
                recorder.attach(color)
            recorder.start()
        depth.start()
        if color is not None:
            color.start()
        self._dev = dev
        return depth, color, recorder

    def __iter__(self) -> Iterator[TumFrame]:  # pragma: no cover - hardware
        depth_stream, color_stream, recorder = self._setup()
        try:
            for i in range(self.max_frames):
                df = depth_stream.read_frame()
                d = np.frombuffer(df.get_buffer_as_uint16(), np.uint16)
                d = d.reshape(df.height, df.width).astype(np.float32) / 1000.0
                rgb = None
                ts = df.timestamp / 1e6 if df.timestamp else time.time()
                if color_stream is not None:
                    cf = color_stream.read_frame()
                    rgb = np.frombuffer(cf.get_buffer_as_uint8(), np.uint8)
                    rgb = rgb.reshape(cf.height, cf.width, 3).astype(np.float32)
                yield TumFrame(
                    index=i, timestamp=ts, depth_m=d, rgb=rgb,
                    rgb_timestamp=ts if rgb is not None else None,
                )
        finally:
            if recorder is not None:
                recorder.stop()
            depth_stream.stop()
            if color_stream is not None:
                color_stream.stop()
            self._openni2.unload()


def make_data_source(
    cfg: AppConfig,
    dataset_dir: str | None = None,
    synthetic_frames: int = 0,
    depth_factor: float = 5000.0,
) -> DataSource:
    """Source selection per MainController::init (MainController.cpp:
    87-94): dataset reader when use_dataset_rgbd / a directory is given,
    otherwise the OpenNI2 sensor (rgbd_read_filename = .oni playback);
    synthetic_frames > 0 short-circuits to the synthetic orbit."""
    if synthetic_frames > 0:
        return SyntheticSource(cfg, synthetic_frames)
    if dataset_dir or cfg.switches.use_dataset_rgbd:
        root = dataset_dir or cfg.io.rgbd_read_filename
        cam = cfg.depth_camera
        return TumDataset(
            root,
            with_rgb=cfg.switches.use_color,
            depth_factor=depth_factor,
            target_size=(cam.width, cam.height),
        )
    return Openni2Source(
        cfg,
        uri=cfg.io.rgbd_read_filename or None,
        record_path=cfg.io.rgbd_write_filename if cfg.switches.record_rgbd else None,
    )
