"""Predictor — source loading, jitted inference, Results assembly.

Re-design of reference ``engine/predictor.py`` (BasePredictor :66,
stream_inference :221): letterbox preprocess on host, ONE jitted
device program for forward + decode + fixed-shape NMS, host-side box
rescale to original image coords. The three Profile timers
(preprocess/inference/postprocess, predictor.py:245-249) are kept as
wall-clock sections with block_until_ready at the device boundary.
"""
from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import letterbox
from ..ops.nms import non_max_suppression
from .results import Results

IMG_FORMATS = {".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp"}
VID_FORMATS = {".avi", ".mp4", ".mkv", ".mov", ".webm", ".m4v", ".mpg", ".mpeg", ".wmv"}


def load_source(source) -> list:
    """Resolve a source into a list of (path, RGB ndarray) frames.

    Handles: ndarray, PIL image, path to image, directory, glob list, video
    file (all frames; reference data/loaders.py LoadImagesAndVideos).
    """
    import cv2

    if isinstance(source, np.ndarray):
        return [("array", source)]
    if hasattr(source, "convert"):  # PIL
        return [("pil", np.asarray(source.convert("RGB")))]
    if isinstance(source, (list, tuple)):
        out = []
        for s in source:
            out.extend(load_source(s))
        return out
    p = Path(str(source))
    if p.is_dir():
        out = []
        for f in sorted(p.iterdir()):
            if f.suffix.lower() in IMG_FORMATS:
                out.extend(load_source(f))
        return out
    if p.suffix.lower() in VID_FORMATS:
        cap = cv2.VideoCapture(str(p))
        frames = []
        fi = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append((f"{p}#{fi}", cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)))
            fi += 1
        cap.release()
        return frames
    if p.is_file():
        img = cv2.imread(str(p))
        if img is None:
            raise FileNotFoundError(f"cannot read image {p}")
        return [(str(p), cv2.cvtColor(img, cv2.COLOR_BGR2RGB))]
    raise FileNotFoundError(f"source not found: {source}")


class Predictor:
    def __init__(self, model, variables, imgsz: int = 640, conf: float = 0.25,
                 iou: float = 0.7, max_det: int = 300, classes=None,
                 agnostic_nms: bool = False, verbose: bool = True, **kwargs):
        self.model = model
        self.variables = variables
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.classes = classes
        self.agnostic = agnostic_nms
        self.verbose = verbose
        self._jit = jax.jit(self._device_fn)
        self._trackers = None

    def _device_fn(self, variables, img):
        pred = self.model.predictions(variables, img)
        return non_max_suppression(
            pred, conf_thres=self.conf, iou_thres=self.iou, max_det=self.max_det,
            class_agnostic=self.agnostic,
        )

    def __call__(self, source, stream: bool = False):
        gen = self._run(source)
        return gen if stream else list(gen)

    def _run(self, source):
        frames = load_source(source if source is not None else _default_asset())
        for path, orig in frames:
            t0 = time.perf_counter()
            img, _, (r, px, py) = letterbox(orig, self.imgsz)
            x = jnp.asarray(img, jnp.float32)[None] / 255.0
            t1 = time.perf_counter()
            dets, valid = self._jit(self.variables, x)
            jax.block_until_ready(dets)
            t2 = time.perf_counter()
            d = np.asarray(dets[0])[np.asarray(valid[0])]
            if self.classes is not None and len(d):
                d = d[np.isin(d[:, 5].astype(int), list(self.classes))]
            if len(d):
                d[:, [0, 2]] = np.clip((d[:, [0, 2]] - px) / r, 0, orig.shape[1])
                d[:, [1, 3]] = np.clip((d[:, [1, 3]] - py) / r, 0, orig.shape[0])
            t3 = time.perf_counter()
            res = Results(
                orig, path=path, names=self.model.names, boxes=d,
                speed={"preprocess": (t1 - t0) * 1e3, "inference": (t2 - t1) * 1e3,
                       "postprocess": (t3 - t2) * 1e3},
            )
            if self.verbose:
                print(f"{path}: {res.verbose()} "
                      f"({res.speed['inference']:.1f}ms inference)")
            yield res


def _default_asset():
    # the canonical smoke-test image (reference engine/model.py:539 uses
    # assets/bus.jpg); we look in the mounted reference assets if present
    for cand in ("/root/reference/assets/bus.jpg", "assets/bus.jpg"):
        if Path(cand).exists():
            return cand
    raise FileNotFoundError("no default predict source; pass source=")
