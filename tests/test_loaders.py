"""Inference source loaders: lazy videos, threaded live streams, screenshots.

Covers the reference contracts of ``data/loaders.py``: LoadStreams (:51,
ring buffer / vid_stride / buffer flag / liveness), LoadScreenshots (:213),
LoadImagesAndVideos (:285, lazy + vid_stride), and load_source dispatch
(``data/build.py:186``).
"""
import threading
import time
from pathlib import Path

import numpy as np
import pytest


class FakeCap:
    """A synthetic live source: produces `total` frames, each tagged in
    pixel [0,0,0] with its index; `delay` simulates camera frame pacing."""

    def __init__(self, source, total=40, delay=0.002, fps=30.0):
        self.source = source
        self.total = total
        self.delay = delay
        self.fps = fps
        self.i = -1
        self.opened = True
        self.released = False
        self.grabbed_before_release = 0

    def isOpened(self):
        return self.opened and not self.released

    def get(self, prop):
        import cv2

        if prop == cv2.CAP_PROP_FPS:
            return self.fps
        if prop == cv2.CAP_PROP_FRAME_COUNT:
            return float(self.total)
        return 0.0

    def _frame(self):
        im = np.full((32, 48, 3), 7, np.uint8)
        im[0, 0, 0] = self.i % 256
        return im

    def grab(self):
        if self.i + 1 >= self.total:
            return False
        time.sleep(self.delay)
        self.i += 1
        self.grabbed_before_release += 1
        return True

    def retrieve(self):
        return True, self._frame()

    def read(self):
        return (True, self._frame()) if self.grab() else (False, None)

    def release(self):
        self.released = True

    def open(self, source):
        self.opened = True


def _make_video(path: Path, n_frames: int = 24, wh=(64, 48)) -> Path:
    import cv2

    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 12, wh)
    assert w.isOpened()
    for i in range(n_frames):
        im = np.full((wh[1], wh[0], 3), i * 10 % 255, np.uint8)
        w.write(im)
    w.release()
    return path


def test_images_and_videos_lazy_and_strided(tmp_path):
    from xlstm_yolo_tpu.data.loaders import LoadImagesAndVideos

    vid = _make_video(tmp_path / "v.mp4", n_frames=24)
    it = iter(LoadImagesAndVideos([vid], vid_stride=4))
    # lazy: pulling one frame must not decode the rest
    path0, f0 = next(it)
    assert path0.endswith("#0") and f0.shape == (48, 64, 3)
    rest = list(it)
    assert len(rest) == 5  # frames 4, 8, 12, 16, 20
    assert rest[0][0].endswith("#4")


def test_images_and_videos_mixed(tmp_path):
    import cv2

    from xlstm_yolo_tpu.data.loaders import LoadImagesAndVideos

    img = tmp_path / "a.png"
    cv2.imwrite(str(img), np.zeros((10, 12, 3), np.uint8))
    vid = _make_video(tmp_path / "v.mp4", n_frames=3)
    got = list(LoadImagesAndVideos([img, vid]))
    assert len(got) == 4
    assert got[0][0] == str(img)


def test_load_streams_live_before_close():
    """Frames must be consumed while the source is still producing —
    the round-3 gap was full pre-decode before the first inference."""
    from xlstm_yolo_tpu.data.loaders import LoadStreams

    cap = FakeCap("rtsp://fake", total=200, delay=0.005)
    ls = LoadStreams("rtsp://fake", cap_factory=lambda s: cap)
    it = iter(ls)
    _, first = next(it)
    # the producer is still mid-stream when the first frame is consumed
    assert cap.grabbed_before_release < cap.total
    assert not cap.released
    assert first.shape == (32, 48, 3)
    ls.close()
    assert cap.released


def test_load_streams_terminates_and_bounded():
    from xlstm_yolo_tpu.data.loaders import LoadStreams

    cap = FakeCap("0", total=25, delay=0.0)
    ls = LoadStreams(0, cap_factory=lambda s: cap, buffer=True, max_buffer=5)
    frames = list(ls)
    assert 1 <= len(frames) <= 25
    # ring buffer never exceeded its bound
    assert max((len(b) for b in ls.imgs), default=0) <= 5
    assert cap.released


def test_load_streams_nonbuffered_keeps_newest():
    from xlstm_yolo_tpu.data.loaders import LoadStreams

    cap = FakeCap("0", total=60, delay=0.001)
    ls = LoadStreams(0, cap_factory=lambda s: cap, buffer=False)
    it = iter(ls)
    next(it)
    time.sleep(0.08)  # let the producer run ahead
    _, frame = next(it)
    ls.close()
    assert frame[0, 0, 2] > 1  # RGB: tag in channel 2; newest frame, not frame #1


def test_load_streams_vid_stride():
    from xlstm_yolo_tpu.data.loaders import LoadStreams

    cap = FakeCap("0", total=21, delay=0.0)
    ls = LoadStreams(0, cap_factory=lambda s: cap, buffer=True, vid_stride=5,
                     max_buffer=100)
    frames = list(ls)
    # first frame is read eagerly; thereafter every 5th grab retrieves
    assert len(frames) <= 1 + 20 // 5
    assert cap.released


def test_streams_file_expansion(tmp_path):
    from xlstm_yolo_tpu.data.loaders import LoadStreams

    f = tmp_path / "cams.streams"
    f.write_text("rtsp://a\nrtsp://b\n")
    caps = {}

    def factory(s):
        caps[s] = FakeCap(s, total=6, delay=0.0)
        return caps[s]

    ls = LoadStreams(f, cap_factory=factory, buffer=True)
    assert ls.bs == 2 and set(caps) == {"rtsp://a", "rtsp://b"}
    names = {p for p, _ in ls}
    assert names == {"stream0", "stream1"}


def test_screenshots_injected_grab():
    from xlstm_yolo_tpu.data.loaders import LoadScreenshots

    calls = []

    def grab(monitor):
        calls.append(dict(monitor))
        return np.zeros((monitor["height"], monitor["width"], 4), np.uint8)

    ls = LoadScreenshots("screen 0 10 20 64 48", grab=grab, max_frames=3)
    frames = list(ls)
    assert len(frames) == 3
    assert frames[0][1].shape == (48, 64, 3)
    assert calls[0] == {"left": 10, "top": 20, "width": 64, "height": 48}


def test_screenshots_requires_mss_or_grab():
    from xlstm_yolo_tpu.data.loaders import LoadScreenshots

    with pytest.raises(ImportError, match="mss"):
        LoadScreenshots("screen")


def test_load_source_dispatch(tmp_path):
    import cv2

    from xlstm_yolo_tpu.data.loaders import (LoadImagesAndVideos,
                                             LoadPilAndNumpy, LoadScreenshots)
    from xlstm_yolo_tpu.engine.predictor import load_source

    assert isinstance(load_source(np.zeros((4, 4, 3), np.uint8)), LoadPilAndNumpy)
    img = tmp_path / "x.jpg"
    cv2.imwrite(str(img), np.zeros((8, 8, 3), np.uint8))
    assert isinstance(load_source(str(img)), LoadImagesAndVideos)
    assert isinstance(load_source(tmp_path), LoadImagesAndVideos)
    assert isinstance(load_source("screen 0", grab=lambda m: np.zeros((2, 2, 4), np.uint8)),
                      LoadScreenshots)
    with pytest.raises(FileNotFoundError):
        load_source(tmp_path / "missing.jpg")


def test_predictor_streams_lazily(tmp_path):
    """End-to-end: Predictor(stream=True) yields a Result while the live
    source is still open (reference predictor stream_inference contract)."""
    from xlstm_yolo_tpu.data import loaders as L
    from xlstm_yolo_tpu.engine.predictor import Predictor
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    cap = FakeCap("rtsp://cam", total=100_000, delay=0.002)
    orig = L.LoadStreams

    def patched(sources, **kw):
        kw["cap_factory"] = lambda s: cap
        return orig(sources, **kw)

    L.LoadStreams = patched
    try:
        m = TaskModel("yolov8n.yaml", nc=2)
        v = m.init(0, imgsz=64)
        p = Predictor(m, v, imgsz=64, conf=0.001, verbose=False)
        gen = p("rtsp://cam", stream=True)
        r0 = next(gen)
        assert not cap.released
        assert cap.grabbed_before_release < cap.total
        assert r0.orig_shape == (32, 48)
        gen.close()
    finally:
        L.LoadStreams = orig
