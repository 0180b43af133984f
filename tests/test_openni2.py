"""Execute the Openni2Source path against an in-memory fake of the
`primesense.openni2` bindings.

The real OpenNI2 runtime cannot exist in CI, but the source's semantics
(DataSourceProducerOpenni2.cpp: 1 mm depth format @30 fps, RGB888,
depth-to-color registration, .oni Recorder attach/start on both streams,
mm -> m decode) are pure call-sequence logic — this harness verifies all
of them by injecting a scripted fake module, so the subsystem has real
execution evidence instead of only an import gate."""

import sys
import types

import numpy as np
import pytest


class _FakeFrame:
    def __init__(self, arr):
        self._arr = arr
        self.height, self.width = arr.shape[:2]
        self.timestamp = 123456  # microseconds

    def get_buffer_as_uint16(self):
        return self._arr.astype(np.uint16).tobytes()

    def get_buffer_as_uint8(self):
        return self._arr.astype(np.uint8).tobytes()


class _FakeStream:
    def __init__(self, kind, log):
        self.kind = kind
        self.log = log
        self.video_mode = None

    def set_video_mode(self, mode):
        self.video_mode = mode
        self.log.append(("set_video_mode", self.kind, mode.kwargs))

    def start(self):
        self.log.append(("start", self.kind))

    def stop(self):
        self.log.append(("stop", self.kind))

    def read_frame(self):
        if self.kind == "depth":
            # 1234 mm everywhere
            return _FakeFrame(np.full((24, 32), 1234, np.uint16))
        return _FakeFrame(np.full((24, 32, 3), 77, np.uint8))


class _FakeDevice:
    def __init__(self, log):
        self.log = log

    def create_depth_stream(self):
        return _FakeStream("depth", self.log)

    def create_color_stream(self):
        return _FakeStream("color", self.log)

    def set_image_registration_mode(self, mode):
        self.log.append(("registration", mode))


class _FakeRecorder:
    def __init__(self, path, log):
        self.log = log
        log.append(("recorder_create", path))

    def attach(self, stream):
        self.log.append(("recorder_attach", stream.kind))

    def start(self):
        self.log.append(("recorder_start",))

    def stop(self):
        self.log.append(("recorder_stop",))


def _install_fake(monkeypatch, log):
    c_api = types.SimpleNamespace(
        ONI_PIXEL_FORMAT_DEPTH_1_MM="DEPTH_1_MM",
        ONI_PIXEL_FORMAT_RGB888="RGB888",
    )

    class OniVideoMode:
        def __init__(self, **kw):
            self.kwargs = kw

    c_api.OniVideoMode = OniVideoMode

    openni2 = types.SimpleNamespace(
        c_api=c_api,
        IMAGE_REGISTRATION_DEPTH_TO_COLOR="DEPTH_TO_COLOR",
        initialize=lambda: log.append(("initialize",)),
        unload=lambda: log.append(("unload",)),
        Recorder=lambda path: _FakeRecorder(path, log),
        Device=types.SimpleNamespace(
            open_any=lambda: (log.append(("open_any",)), _FakeDevice(log))[1],
            open_file=lambda uri: (log.append(("open_file", uri)), _FakeDevice(log))[1],
        ),
    )
    pkg = types.ModuleType("primesense")
    pkg.openni2 = openni2
    monkeypatch.setitem(sys.modules, "primesense", pkg)
    monkeypatch.setitem(sys.modules, "primesense.openni2", openni2)


def _small_cfg(use_color):
    from tsdfjax.config import AppConfig, SwitchConfig
    from tsdfjax.geometry import CameraIntrinsics

    cam = CameraIntrinsics(width=32, height=24, fx=32.0, fy=32.0, cx=15.5, cy=11.5)
    return AppConfig(depth_camera=cam, rgb_camera=cam,
                     switches=SwitchConfig(use_color=use_color))


class TestOpenni2Source:
    def test_live_depth_only(self, monkeypatch):
        log = []
        _install_fake(monkeypatch, log)
        from tsdfjax.io.sources import Openni2Source

        src = Openni2Source(_small_cfg(False), max_frames=3)
        frames = list(src)
        assert len(frames) == 3
        # mm -> m decode (cpp: DEPTH_1_MM stream, our frames are meters)
        assert frames[0].depth_m.shape == (24, 32)
        assert np.allclose(frames[0].depth_m, 1.234)
        assert frames[0].rgb is None
        assert frames[0].timestamp == pytest.approx(0.123456)
        assert ("open_any",) in log  # ANY_DEVICE open (cpp:117)
        # 1 mm format @30 fps at the configured resolution (cpp:100-104)
        vm = [e for e in log if e[0] == "set_video_mode" and e[1] == "depth"][0][2]
        assert vm == {"pixelFormat": "DEPTH_1_MM", "resolutionX": 32,
                      "resolutionY": 24, "fps": 30}
        # clean shutdown: stream stopped, runtime unloaded
        assert ("stop", "depth") in log and ("unload",) in log

    def test_color_registration_and_recorder(self, monkeypatch, tmp_path):
        log = []
        _install_fake(monkeypatch, log)
        from tsdfjax.io.sources import Openni2Source

        rec = str(tmp_path / "out.oni")
        src = Openni2Source(_small_cfg(True), record_path=rec, max_frames=2)
        frames = list(src)
        assert frames[0].rgb.shape == (24, 32, 3)
        assert np.allclose(frames[0].rgb, 77.0)
        # RGB888 color mode (cpp:106-111)
        vm = [e for e in log if e[0] == "set_video_mode" and e[1] == "color"][0][2]
        assert vm["pixelFormat"] == "RGB888" and vm["fps"] == 30
        # depth-to-color registration enabled with color (cpp:128-131)
        assert ("registration", "DEPTH_TO_COLOR") in log
        # .oni Recorder attached to BOTH streams then started (cpp:53-63)
        assert ("recorder_create", rec.encode()) in log
        assert ("recorder_attach", "depth") in log
        assert ("recorder_attach", "color") in log
        assert log.index(("recorder_start",)) < log.index(("start", "depth"))
        assert ("recorder_stop",) in log

    def test_oni_playback_uri(self, monkeypatch):
        log = []
        _install_fake(monkeypatch, log)
        from tsdfjax.io.sources import Openni2Source

        src = Openni2Source(_small_cfg(False), uri="session.oni", max_frames=1)
        assert len(list(src)) == 1
        assert ("open_file", b"session.oni") in log
