"""Results container — device-agnostic prediction results with render/export.

Re-design of reference ``engine/results.py`` (Results :187, Boxes :1004).
Internally numpy (host post-processing); carries the validity-mask
fixed-shape convention from the NMS stage instead of ragged tensors.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


class Boxes:
    """(n, 6) = x1, y1, x2, y2, conf, cls — pixel coords of the original image."""

    def __init__(self, data: np.ndarray, orig_shape: tuple):
        self.data = np.asarray(data, np.float32).reshape(-1, 6)
        self.orig_shape = orig_shape

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, 4]

    @property
    def cls(self):
        return self.data[:, 5]

    @property
    def xywh(self):
        b = self.data[:, :4]
        return np.stack([(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2,
                         b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], 1)

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.data[:, :4] / np.asarray([w, h, w, h], np.float32)

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.asarray([w, h, w, h], np.float32)

    def __len__(self):
        return len(self.data)

    def __iter__(self):
        for row in self.data:
            yield Boxes(row[None], self.orig_shape)


class Results:
    """One image's predictions + render/serialize helpers."""

    def __init__(self, orig_img: np.ndarray, path: str = "", names: dict | None = None,
                 boxes: np.ndarray | None = None, speed: dict | None = None,
                 masks: np.ndarray | None = None, keypoints: np.ndarray | None = None,
                 probs: np.ndarray | None = None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names or {}
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.masks = masks
        self.keypoints = keypoints
        self.probs = probs
        self.speed = speed or {}

    def __len__(self):
        return len(self.boxes) if self.boxes is not None else 0

    def plot(self, line_width: int | None = None, font_scale: float | None = None,
             labels: bool = True, conf: bool = True) -> np.ndarray:
        """Draw boxes/labels on a copy of the original image (RGB)."""
        import cv2

        img = self.orig_img.copy()
        if self.boxes is None:
            return img
        lw = line_width or max(round(sum(img.shape[:2]) / 2 * 0.003), 2)
        for x1, y1, x2, y2, cf, cl in self.boxes.data:
            color = _class_color(int(cl))
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), color, lw)
            if labels:
                name = self.names.get(int(cl), str(int(cl)))
                txt = f"{name} {cf:.2f}" if conf else name
                fs = font_scale or lw / 3
                tw, th = cv2.getTextSize(txt, 0, fs, max(lw - 1, 1))[0]
                y0 = int(y1) - th - 3 if y1 - th - 3 > 0 else int(y1) + th + 3
                cv2.rectangle(img, (int(x1), int(y1)), (int(x1) + tw, y0), color, -1)
                cv2.putText(img, txt, (int(x1), y0 - 2 if y0 < y1 else y0 - 2), 0, fs,
                            (255, 255, 255), max(lw - 1, 1), cv2.LINE_AA)
        if self.masks is not None:
            overlay = img.copy()
            for mi, m in enumerate(self.masks):
                color = np.asarray(_class_color(mi), np.uint8)
                mm = m.astype(bool)
                overlay[mm] = overlay[mm] // 2 + color // 2
            img = overlay
        return img

    def save(self, filename: str):
        import cv2

        cv2.imwrite(str(filename), cv2.cvtColor(self.plot(), cv2.COLOR_RGB2BGR))
        return filename

    def to_json(self) -> list:
        out = []
        if self.boxes is not None:
            for x1, y1, x2, y2, cf, cl in self.boxes.data:
                out.append({
                    "name": self.names.get(int(cl), str(int(cl))),
                    "class": int(cl),
                    "confidence": round(float(cf), 5),
                    "box": {"x1": float(x1), "y1": float(y1), "x2": float(x2), "y2": float(y2)},
                })
        return out

    def save_txt(self, txt_file: str, save_conf: bool = False):
        """YOLO-format txt lines (reference results.py save_txt)."""
        lines = []
        if self.boxes is not None:
            for i in range(len(self.boxes)):
                cl = int(self.boxes.cls[i])
                xywhn = self.boxes.xywhn[i]
                line = f"{cl} " + " ".join(f"{x:.6f}" for x in xywhn)
                if save_conf:
                    line += f" {self.boxes.conf[i]:.6f}"
                lines.append(line)
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        Path(txt_file).write_text("\n".join(lines) + ("\n" if lines else ""))

    def verbose(self) -> str:
        if self.boxes is None or len(self.boxes) == 0:
            return "(no detections)"
        counts = {}
        for c in self.boxes.cls.astype(int):
            counts[c] = counts.get(c, 0) + 1
        return ", ".join(f"{n} {self.names.get(c, c)}{'s' if n > 1 else ''}" for c, n in sorted(counts.items()))


_PALETTE = [
    (255, 56, 56), (255, 157, 151), (255, 112, 31), (255, 178, 29), (207, 210, 49),
    (72, 249, 10), (146, 204, 23), (61, 219, 134), (26, 147, 52), (0, 212, 187),
    (44, 153, 168), (0, 194, 255), (52, 69, 147), (100, 115, 255), (0, 24, 236),
    (132, 56, 255), (82, 0, 133), (203, 56, 255), (255, 149, 200), (255, 55, 199),
]


def _class_color(c: int) -> tuple:
    return _PALETTE[c % len(_PALETTE)]
