"""Inference source loaders — lazy, constant-memory, live-capable.

Re-design of reference ``data/loaders.py``:

* ``LoadImagesAndVideos`` (reference :285) — lazy iterator over image files
  and video frames. Videos decode ONE frame at a time (``vid_stride``
  honoured via ``grab``), so a 10k-frame video costs one frame of host RAM,
  not the whole clip.
* ``LoadStreams`` (reference :51) — threaded live sources (webcam index,
  RTSP/RTMP/HTTP URLs, ``*.streams`` text file of URLs). One daemon reader
  per source keeps a bounded ring buffer; ``buffer=True`` queues frames
  (FIFO), ``buffer=False`` keeps only the newest. Unresponsive streams are
  re-opened; iteration stops when every reader thread has exited and the
  buffers drain.
* ``LoadScreenshots`` (reference :213) — ``mss``-based screen capture for
  ``source="screen ..."``; the grabber is injectable so the loader is
  testable without a display server.
* ``LoadPilAndNumpy`` (reference :398) — in-memory arrays / PIL images.

All loaders yield ``(path, rgb_uint8_ndarray)`` pairs — the predictor's
single frame contract — instead of the reference's (paths, imgs, info)
batch triple: TPU inference is jitted per-frame at a fixed shape, so the
multi-stream batch dimension is composed by the caller, not the loader.
"""
from __future__ import annotations

import math
import threading
import time
from pathlib import Path

import numpy as np

IMG_FORMATS = {".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp"}
VID_FORMATS = {".avi", ".mp4", ".mkv", ".mov", ".webm", ".m4v", ".mpg", ".mpeg", ".wmv"}


def _bgr2rgb(im: np.ndarray) -> np.ndarray:
    import cv2

    return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)


class LoadImagesAndVideos:
    """Lazy iterator over image paths, directories and video files.

    Mirrors reference ``data/loaders.py:285`` (``LoadImagesAndVideos``)
    semantics — ordered traversal, ``vid_stride`` frame skipping — with
    constant memory: frames are decoded on demand, never pre-materialized.
    """

    def __init__(self, files, vid_stride: int = 1):
        self.files = [Path(f) for f in files]
        self.vid_stride = max(1, int(vid_stride))
        self.mode = "image"

    def __iter__(self):
        import cv2

        for p in self.files:
            if p.suffix.lower() in VID_FORMATS:
                self.mode = "video"
                cap = cv2.VideoCapture(str(p))
                fi = 0
                try:
                    while True:
                        ok = cap.grab()
                        if not ok:
                            break
                        if fi % self.vid_stride == 0:
                            ok, frame = cap.retrieve()
                            if not ok:
                                break
                            yield f"{p}#{fi}", _bgr2rgb(frame)
                        fi += 1
                finally:
                    cap.release()
            else:
                self.mode = "image"
                img = cv2.imread(str(p))
                if img is None:
                    raise FileNotFoundError(f"cannot read image {p}")
                yield str(p), _bgr2rgb(img)


class LoadStreams:
    """Threaded live-stream reader (reference ``data/loaders.py:51``).

    One daemon thread per source ``grab()``s frames continuously into a
    bounded buffer (``max_buffer`` frames, reference keeps <=30).
    ``buffer=True`` -> FIFO queue (every ``vid_stride``-th frame kept);
    ``buffer=False`` -> only the newest frame survives, so a slow consumer
    always sees live data. Readers re-open sources that stop responding,
    matching the reference's IP-camera recovery path.

    ``cap_factory`` injects the capture constructor (default
    ``cv2.VideoCapture``) so tests can drive the loader with a synthetic
    live source.
    """

    def __init__(self, sources, vid_stride: int = 1, buffer: bool = False,
                 max_buffer: int = 30, cap_factory=None):
        from ..utils import LOGGER

        if cap_factory is None:
            import cv2

            cap_factory = cv2.VideoCapture
        if isinstance(sources, (str, Path)) and Path(str(sources)).suffix == ".streams" \
                and Path(str(sources)).is_file():
            sources = Path(str(sources)).read_text().split()
        elif not isinstance(sources, (list, tuple)):
            sources = [sources]
        self.sources = [int(s) if isinstance(s, str) and s.isnumeric() else s
                        for s in sources]
        self.vid_stride = max(1, int(vid_stride))
        self.buffer = bool(buffer)
        self.max_buffer = int(max_buffer)
        self.mode = "stream"
        self.running = True
        n = len(self.sources)
        self.bs = n
        self._cap_factory = cap_factory
        self.caps = [None] * n
        self.fps = [30.0] * n
        self.frames = [float("inf")] * n
        self.shape = [None] * n
        self.imgs: list[list[np.ndarray]] = [[] for _ in range(n)]
        self._locks = [threading.Lock() for _ in range(n)]
        self.threads = []
        for i, s in enumerate(self.sources):
            cap = cap_factory(s)
            if not cap.isOpened():
                raise ConnectionError(f"failed to open stream {i + 1}/{n}: {s}")
            self.caps[i] = cap
            try:
                import cv2

                fps = cap.get(cv2.CAP_PROP_FPS)
                cnt = cap.get(cv2.CAP_PROP_FRAME_COUNT)
            except Exception:
                fps, cnt = 0, 0
            self.fps[i] = max((fps if math.isfinite(fps) else 0) % 100, 0) or 30.0
            self.frames[i] = max(int(cnt), 0) or float("inf")
            ok, im = cap.read()  # guarantee first frame (reference :135)
            if not ok or im is None:
                raise ConnectionError(f"failed to read from stream {i + 1}/{n}: {s}")
            self.shape[i] = im.shape
            self.imgs[i].append(im)
            t = threading.Thread(target=self._update, args=(i, cap, s), daemon=True)
            self.threads.append(t)
            t.start()
            LOGGER.info(f"stream {i + 1}/{n}: {s} ok "
                        f"({self.frames[i]} frames at {self.fps[i]:.1f} FPS)")

    def _update(self, i, cap, source):
        """Daemon loop: grab every frame, retrieve every vid_stride-th
        (reference ``update`` :143-161)."""
        from ..utils import LOGGER

        n = 0
        while self.running and cap.isOpened() and n < (self.frames[i] - 1):
            if len(self.imgs[i]) >= self.max_buffer:
                time.sleep(0.01)  # back-pressure: wait for the consumer
                continue
            n += 1
            cap.grab()
            if n % self.vid_stride:
                continue
            ok, im = cap.retrieve()
            if not ok or im is None:
                im = np.zeros(self.shape[i], np.uint8)
                LOGGER.warning(f"stream {i} unresponsive; re-opening {source}")
                cap.open(source)
            with self._locks[i]:
                if self.buffer:
                    self.imgs[i].append(im)
                else:
                    self.imgs[i] = [im]

    def close(self):
        self.running = False
        for t in self.threads:
            if t.is_alive():
                t.join(timeout=5)
        for cap in self.caps:
            try:
                cap.release()
            except Exception:
                pass

    def __len__(self):
        return self.bs

    def __iter__(self):
        """Yield one (name, rgb_frame) per source per tick, newest-first in
        non-buffered mode; stops (and closes) when all readers exit."""
        try:
            while True:
                for i in range(self.bs):
                    waited = 0.0
                    while not self.imgs[i]:
                        if not self.threads[i].is_alive():
                            if all(not t.is_alive() for t in self.threads) and \
                                    not any(self.imgs):
                                return
                            break
                        time.sleep(1 / max(min(self.fps), 1))
                        waited += 1 / max(min(self.fps), 1)
                        if waited > 30:
                            # reference logs dead/stalled streams before
                            # giving up (/root/reference/data/loaders.py:143-161)
                            LOGGER.warning(
                                f"stream {i} produced no frame for {waited:.0f}s "
                                f"(reader alive={self.threads[i].is_alive()}); "
                                "ending stream iteration")
                            return
                    with self._locks[i]:
                        if not self.imgs[i]:
                            if all(not t.is_alive() for t in self.threads):
                                return
                            continue
                        im = self.imgs[i].pop(0 if self.buffer else -1)
                        if not self.buffer:
                            self.imgs[i].clear()
                    yield f"stream{i}", _bgr2rgb(im)
        finally:
            self.close()


class LoadScreenshots:
    """Screen-capture source (reference ``data/loaders.py:213``).

    ``source`` grammar matches the reference: ``"screen"``,
    ``"screen 0"``, ``"screen left top width height"``, or
    ``"screen 0 left top width height"``. Requires ``mss`` unless a
    ``grab(monitor_dict) -> BGRA ndarray`` callable is injected.
    """

    def __init__(self, source: str = "screen", grab=None, max_frames: int | None = None):
        parts = str(source).split()
        if parts and parts[0] == "screen":
            parts = parts[1:]
        self.screen, left, top, width, height = 0, None, None, None, None
        if len(parts) == 1:
            self.screen = int(parts[0])
        elif len(parts) == 4:
            left, top, width, height = (int(x) for x in parts)
        elif len(parts) == 5:
            self.screen, left, top, width, height = (int(x) for x in parts)
        self.mode = "stream"
        self.frame = 0
        self.bs = 1
        self.fps = 30
        self.max_frames = max_frames
        if grab is not None:
            self._grab = grab
            mon = {"top": 0, "left": 0, "width": 0, "height": 0}
        else:
            try:
                import mss
            except ImportError as e:
                raise ImportError(
                    "screenshot capture needs the 'mss' package "
                    "(pip install mss), or pass grab=...") from e
            sct = mss.mss()
            mon = sct.monitors[self.screen]
            self._grab = lambda m: np.asarray(sct.grab(m))
        self.monitor = {
            "top": mon["top"] if top is None else mon["top"] + top,
            "left": mon["left"] if left is None else mon["left"] + left,
            "width": width or mon["width"],
            "height": height or mon["height"],
        }

    def __iter__(self):
        while self.max_frames is None or self.frame < self.max_frames:
            im = np.asarray(self._grab(self.monitor))[:, :, :3]  # BGRA -> BGR
            self.frame += 1
            yield f"screen{self.screen}#{self.frame - 1}", _bgr2rgb(np.ascontiguousarray(im))


class LoadPilAndNumpy:
    """In-memory sources: ndarray / PIL image / lists thereof
    (reference ``data/loaders.py:398``)."""

    def __init__(self, items):
        self.items = items if isinstance(items, (list, tuple)) else [items]
        self.mode = "image"

    def __iter__(self):
        for i, s in enumerate(self.items):
            if hasattr(s, "convert"):  # PIL
                yield f"pil{i}", np.asarray(s.convert("RGB"))
            else:
                yield f"array{i}", np.asarray(s)
