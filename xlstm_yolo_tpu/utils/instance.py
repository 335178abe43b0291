"""Vectorized label containers used by the augmentation pipeline
(reference ``utils/instance.py``: Bboxes :25, Instances :200). Numpy host-side.
"""
from __future__ import annotations

import numpy as np

_FORMATS = ("xyxy", "xywh", "ltwh")


class Bboxes:
    """Boxes with tracked format and vectorized conversion."""

    def __init__(self, bboxes: np.ndarray, format: str = "xyxy"):
        assert format in _FORMATS, f"format must be one of {_FORMATS}"
        bboxes = bboxes[None, :] if bboxes.ndim == 1 else bboxes
        assert bboxes.ndim == 2 and bboxes.shape[1] == 4
        self.bboxes = bboxes.astype(np.float32)
        self.format = format

    def convert(self, format: str):
        assert format in _FORMATS
        if format == self.format:
            return
        b = self.bboxes
        # to xyxy first
        if self.format == "xywh":
            cx, cy, w, h = b.T
            b = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
        elif self.format == "ltwh":
            l, t, w, h = b.T
            b = np.stack([l, t, l + w, t + h], 1)
        if format == "xywh":
            x1, y1, x2, y2 = b.T
            b = np.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], 1)
        elif format == "ltwh":
            x1, y1, x2, y2 = b.T
            b = np.stack([x1, y1, x2 - x1, y2 - y1], 1)
        self.bboxes = b
        self.format = format

    def areas(self) -> np.ndarray:
        fmt = self.format
        self.convert("xyxy")
        b = self.bboxes
        a = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        self.convert(fmt)
        return a

    def mul(self, scale):
        scale = (scale,) * 4 if isinstance(scale, (int, float)) else scale
        self.bboxes *= np.asarray(scale, np.float32)

    def add(self, offset):
        offset = (offset,) * 4 if isinstance(offset, (int, float)) else offset
        self.bboxes += np.asarray(offset, np.float32)

    def __len__(self):
        return len(self.bboxes)

    def __getitem__(self, index):
        return Bboxes(self.bboxes[index].reshape(-1, 4), self.format)


class Instances:
    """Boxes + segments + keypoints moving together through geometric
    transforms (reference utils/instance.py:200)."""

    def __init__(self, bboxes: np.ndarray, segments: list | None = None,
                 keypoints: np.ndarray | None = None, bbox_format: str = "xywh",
                 normalized: bool = True):
        self._bboxes = Bboxes(bboxes, format=bbox_format)
        self.segments = segments if segments is not None else []
        self.keypoints = keypoints
        self.normalized = normalized

    @property
    def bboxes(self):
        return self._bboxes.bboxes

    @property
    def bbox_areas(self):
        return self._bboxes.areas()

    def convert_bbox(self, format: str):
        self._bboxes.convert(format)

    def scale(self, sw: float, sh: float, bbox_only: bool = False):
        self._bboxes.mul((sw, sh, sw, sh))
        if bbox_only:
            return
        self.segments = [s * np.asarray([sw, sh], np.float32) for s in self.segments]
        if self.keypoints is not None:
            self.keypoints[..., 0] *= sw
            self.keypoints[..., 1] *= sh

    def denormalize(self, w: int, h: int):
        if not self.normalized:
            return
        self.scale(w, h)
        self.normalized = False

    def normalize(self, w: int, h: int):
        if self.normalized:
            return
        self.scale(1 / w, 1 / h)
        self.normalized = True

    def add_padding(self, padw: float, padh: float):
        assert not self.normalized, "add_padding on normalized coords"
        self._bboxes.add((padw, padh, padw, padh))
        self.segments = [s + np.asarray([padw, padh], np.float32) for s in self.segments]
        if self.keypoints is not None:
            self.keypoints[..., 0] += padw
            self.keypoints[..., 1] += padh

    def flipud(self, h: int):
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        b = self._bboxes.bboxes
        y1 = b[:, 1].copy()
        b[:, 1] = h - b[:, 3]
        b[:, 3] = h - y1
        self.convert_bbox(fmt)
        self.segments = [np.stack([s[:, 0], h - s[:, 1]], 1) for s in self.segments]
        if self.keypoints is not None:
            self.keypoints[..., 1] = h - self.keypoints[..., 1]

    def fliplr(self, w: int):
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        b = self._bboxes.bboxes
        x1 = b[:, 0].copy()
        b[:, 0] = w - b[:, 2]
        b[:, 2] = w - x1
        self.convert_bbox(fmt)
        self.segments = [np.stack([w - s[:, 0], s[:, 1]], 1) for s in self.segments]
        if self.keypoints is not None:
            self.keypoints[..., 0] = w - self.keypoints[..., 0]

    def clip(self, w: int, h: int):
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        b = self._bboxes.bboxes
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, w)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, h)
        self.convert_bbox(fmt)
        self.segments = [np.stack([s[:, 0].clip(0, w), s[:, 1].clip(0, h)], 1) for s in self.segments]
        if self.keypoints is not None:
            self.keypoints[..., 0] = self.keypoints[..., 0].clip(0, w)
            self.keypoints[..., 1] = self.keypoints[..., 1].clip(0, h)

    def remove_zero_area_boxes(self) -> np.ndarray:
        good = self.bbox_areas > 0
        if not good.all():
            self._bboxes = self._bboxes[good]
            self.segments = [s for s, g in zip(self.segments, good) if g]
            if self.keypoints is not None:
                self.keypoints = self.keypoints[good]
        return good

    def __len__(self):
        return len(self._bboxes)

    def __getitem__(self, index):
        kp = self.keypoints[index] if self.keypoints is not None else None
        segs = [self.segments[i] for i in np.atleast_1d(np.arange(len(self.segments))[index])] \
            if self.segments else []
        return Instances(self.bboxes[index].reshape(-1, 4), segs, kp,
                         bbox_format=self._bboxes.format, normalized=self.normalized)
