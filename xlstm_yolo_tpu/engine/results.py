"""Results containers — device-agnostic prediction results with render/export.

Re-design of reference ``engine/results.py`` (Results :187, Boxes :1004,
Masks :1222, Keypoints :1320, Probs :1444, OBB :1585). Internally numpy (host
post-processing); carries the validity-mask fixed-shape convention from the
NMS stage instead of ragged tensors. Serializers (`summary`/`to_df`/`to_csv`/
`to_xml`/`to_json`/`to_sql`, reference :759-1003) operate on the same
summary-dict structure the reference produces.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


class BaseNP:
    """Numpy-backed container base (reference BaseTensor :22): raw ``data``
    plus the original image shape; len/index/iter return sliced copies."""

    def __init__(self, data: np.ndarray, orig_shape: tuple):
        self.data = np.asarray(data)
        self.orig_shape = tuple(orig_shape)

    @property
    def shape(self):
        return self.data.shape

    def numpy(self):
        return self

    def cpu(self):
        return self

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return self.__class__(self.data[idx], self.orig_shape)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class Boxes(BaseNP):
    """(n, 6) = x1, y1, x2, y2, conf, cls — or (n, 7) with a track id column
    before conf (reference Boxes :1004) — pixel coords of the original image."""

    def __init__(self, data: np.ndarray, orig_shape: tuple):
        data = np.asarray(data, np.float32)
        if data.ndim == 1:
            data = data.reshape(-1, data.shape[0] if data.size else 6)
        # keep the column count of empty (0, 7) track frames — collapsing to
        # 6 would flip is_track off exactly on frames with no detections
        data = data.reshape(-1, data.shape[-1])
        assert data.shape[-1] in (6, 7), f"expected 6 or 7 cols, got {data.shape}"
        super().__init__(data, orig_shape)
        self.is_track = data.shape[-1] == 7

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def id(self):
        """Track ids when produced by Model.track (reference Boxes.id :1128)."""
        return self.data[:, -3] if self.is_track else None

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


def masks2segments(masks: np.ndarray) -> list:
    """Binary (n, h, w) masks -> largest-contour polygon per mask
    (reference utils/ops.py masks2segments)."""
    import cv2

    segments = []
    for m in np.asarray(masks, np.uint8):
        contours = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)[0]
        if contours:
            c = max((x.reshape(-1, 2) for x in contours), key=len)
        else:
            c = np.zeros((0, 2), np.float32)
        segments.append(c.astype(np.float32))
    return segments


class Masks(BaseNP):
    """(n, h, w) instance masks (reference Masks :1222). ``xy``/``xyn``
    derive polygon contours, scaled from mask space to the original image."""

    def __init__(self, masks, orig_shape):
        masks = np.asarray(masks)
        if masks.ndim == 2:
            masks = masks[None]
        super().__init__(masks, orig_shape)

    def _segments(self, normalize: bool) -> list:
        mh, mw = self.data.shape[1:]
        oh, ow = self.orig_shape
        # mask space -> original pixels (identity when masks are orig-res)
        sx, sy = ow / mw, oh / mh
        out = []
        for seg in masks2segments(self.data):
            seg = seg * np.asarray([sx, sy], np.float32)
            if normalize:
                seg = seg / np.asarray([ow, oh], np.float32)
            out.append(seg)
        return out

    @property
    def xy(self) -> list:
        """Per-mask (N, 2) polygon in original-image pixels."""
        return self._segments(normalize=False)

    @property
    def xyn(self) -> list:
        """Per-mask (N, 2) polygon normalized to [0, 1]."""
        return self._segments(normalize=True)


class Keypoints(BaseNP):
    """(n, K, 2|3) keypoints in original-image pixels (reference
    Keypoints :1320). 3-dim keypoints carry visibility; low-confidence
    points (< 0.5) are zeroed like the reference."""

    def __init__(self, keypoints, orig_shape):
        keypoints = np.asarray(keypoints, np.float32)
        if keypoints.ndim == 2:
            keypoints = keypoints[None]
        if keypoints.shape[-1] == 3:
            keypoints = keypoints.copy()
            keypoints[..., :2][keypoints[..., 2] < 0.5] = 0
        super().__init__(keypoints, orig_shape)
        self.has_visible = keypoints.shape[-1] == 3

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def xyn(self):
        h, w = self.orig_shape
        return self.xy / np.asarray([w, h], np.float32)

    @property
    def conf(self):
        return self.data[..., 2] if self.has_visible else None


class Probs(BaseNP):
    """(nc,) classification probabilities with top-1/top-5 accessors
    (reference Probs :1444)."""

    def __init__(self, probs, orig_shape=None):
        super().__init__(np.asarray(probs, np.float32).reshape(-1),
                         orig_shape or (0, 0))

    @property
    def top1(self) -> int:
        return int(self.data.argmax())

    @property
    def top5(self) -> list:
        return np.argsort(-self.data)[:5].tolist()

    @property
    def top1conf(self):
        return self.data[self.top1]

    @property
    def top5conf(self):
        return self.data[self.top5]


class OBB(BaseNP):
    """(n, 7) = cx, cy, w, h, angle(rad), conf, cls — or (n, 8) with a track
    id before conf (reference OBB :1585) — original-image pixels."""

    def __init__(self, data, orig_shape):
        data = np.asarray(data, np.float32)
        if data.ndim == 1:
            data = data.reshape(-1, data.shape[0] if data.size else 7)
        # keep the column count of empty (0, 8) track frames (see Boxes)
        data = data.reshape(-1, data.shape[-1])
        assert data.shape[-1] in (7, 8), f"expected 7 or 8 cols, got {data.shape}"
        super().__init__(data, orig_shape)
        self.is_track = data.shape[-1] == 8

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def id(self):
        return self.data[:, -3] if self.is_track else None

    @property
    def xyxyxyxy(self):
        """(n, 4, 2) corner points (reference ops.xywhr2xyxyxyxy)."""
        cx, cy, w, h, r = (self.data[:, i] for i in range(5))
        cos, sin = np.cos(r), np.sin(r)
        dx1, dy1 = w / 2 * cos, w / 2 * sin
        dx2, dy2 = -h / 2 * sin, h / 2 * cos
        pts = np.stack([
            np.stack([cx + dx1 + dx2, cy + dy1 + dy2], -1),
            np.stack([cx + dx1 - dx2, cy + dy1 - dy2], -1),
            np.stack([cx - dx1 - dx2, cy - dy1 - dy2], -1),
            np.stack([cx - dx1 + dx2, cy - dy1 + dy2], -1),
        ], 1)
        return pts.astype(np.float32)

    @property
    def xyxyxyxyn(self):
        h, w = self.orig_shape
        return self.xyxyxyxy / np.asarray([w, h], np.float32)

    @property
    def xyxy(self):
        """Axis-aligned enclosing boxes of the rotated boxes."""
        p = self.xyxyxyxy
        if not len(p):
            return np.zeros((0, 4), np.float32)
        return np.concatenate([p.min(1), p.max(1)], -1)


class Results:
    """One image's predictions + render/serialize helpers (reference
    Results :187)."""

    def __init__(self, orig_img: np.ndarray, path: str = "", names: dict | None = None,
                 boxes: np.ndarray | None = None, speed: dict | None = None,
                 masks: np.ndarray | None = None, keypoints: np.ndarray | None = None,
                 probs: np.ndarray | None = None, obb: np.ndarray | None = None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names or {}
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.keypoints = (Keypoints(keypoints, self.orig_shape)
                          if keypoints is not None else None)
        self.probs = Probs(probs) if probs is not None else None
        self.obb = OBB(obb, self.orig_shape) if obb is not None else None
        self.speed = speed or {}

    def __len__(self):
        for v in (self.boxes, self.obb, self.masks, self.keypoints):
            if v is not None:
                return len(v)
        return 0

    def __getitem__(self, idx):
        return self.new(
            boxes=self.boxes.data[idx] if self.boxes is not None else None,
            masks=self.masks.data[idx] if self.masks is not None else None,
            keypoints=self.keypoints.data[idx] if self.keypoints is not None else None,
            obb=self.obb.data[idx] if self.obb is not None else None,
        )

    def update(self, boxes=None, masks=None, probs=None, obb=None, keypoints=None):
        """Replace fields in place (reference Results.update :308)."""
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_shape)
        if masks is not None:
            self.masks = Masks(masks, self.orig_shape)
        if probs is not None:
            self.probs = Probs(probs)
        if obb is not None:
            self.obb = OBB(obb, self.orig_shape)
        if keypoints is not None:
            self.keypoints = Keypoints(keypoints, self.orig_shape)

    def new(self, **kw):
        """Fresh Results on the same image (reference Results.new :436)."""
        return Results(self.orig_img, path=self.path, names=self.names,
                       speed=self.speed, **kw)

    # ------------------------------------------------------------------
    # rendering
    # ------------------------------------------------------------------
    def plot(self, line_width: int | None = None, font_scale: float | None = None,
             labels: bool = True, conf: bool = True, boxes: bool = True,
             masks: bool = True, kpt_line: bool = True) -> np.ndarray:
        """Draw boxes/masks/keypoint-skeletons/obb/labels on a copy of the
        image (RGB), via the Annotator (reference Results.plot :476)."""
        from ..utils.annotator import Annotator, colors

        ann = Annotator(self.orig_img, line_width=line_width, font_scale=font_scale)
        if self.masks is not None and masks and len(self.masks):
            cls_of = (lambda mi: int(self.boxes.cls[mi])
                      if self.boxes is not None and mi < len(self.boxes) else mi)
            ann.masks(self.masks.data,
                      [colors(cls_of(mi)) for mi in range(len(self.masks.data))])
        if self.obb is not None and len(self.obb) and boxes:
            for oi, pts in enumerate(self.obb.xyxyxyxy):
                cl, cf = int(self.obb.cls[oi]), float(self.obb.conf[oi])
                name = self.names.get(cl, str(cl))
                if self.obb.is_track:
                    name = f"id:{int(self.obb.id[oi])} {name}"
                txt = (f"{name} {cf:.2f}" if conf else name) if labels else ""
                ann.box_label(pts, txt, color=colors(cl), rotated=True)
        # rotated predictions carry an axis-aligned Boxes mapping for the
        # box API — draw only the rotated form (reference draws one or the
        # other, never both)
        if self.boxes is not None and self.obb is None and boxes:
            for row in self.boxes.data:
                cl, cf = int(row[-1]), float(row[-2])
                name = self.names.get(cl, str(cl))
                if self.boxes.is_track:
                    name = f"id:{int(row[4])} {name}"
                txt = (f"{name} {cf:.2f}" if conf else name) if labels else ""
                ann.box_label(row[:4], txt, color=colors(cl))
        if self.keypoints is not None:
            for inst in self.keypoints.data:
                ann.kpts(inst, kpt_line=kpt_line)
        if self.probs is not None and labels:
            for li, c in enumerate(self.probs.top5):
                ann.text((8, 28 + 24 * li),
                         f"{self.names.get(c, c)} {self.probs.data[c]:.2f}",
                         box_style=True)
        return ann.result()

    def save(self, filename: str):
        import cv2

        cv2.imwrite(str(filename), cv2.cvtColor(self.plot(), cv2.COLOR_RGB2BGR))
        return filename

    def save_crop(self, save_dir, file_name: str | Path = Path("im.jpg")):
        """Save per-detection crops under save_dir/<class_name>/
        (reference Results.save_crop :723; cls/obb unsupported, like there)."""
        import cv2

        from ..utils import LOGGER

        if self.probs is not None:
            LOGGER.warning("save_crop: classify task not supported")
            return
        if self.obb is not None:
            LOGGER.warning("save_crop: OBB task not supported")
            return
        if self.boxes is None:
            return
        h, w = self.orig_shape
        for i in range(len(self.boxes)):
            x1, y1, x2, y2 = self.boxes.xyxy[i]
            # square-ish gain+pad crop like reference plotting.save_one_box
            bw, bh = (x2 - x1) * 1.02 + 10, (y2 - y1) * 1.02 + 10
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            xa, xb = int(max(cx - bw / 2, 0)), int(min(cx + bw / 2, w))
            ya, yb = int(max(cy - bh / 2, 0)), int(min(cy + bh / 2, h))
            crop = self.orig_img[ya:yb, xa:xb]
            if crop.size == 0:
                continue
            name = self.names.get(int(self.boxes.cls[i]), str(int(self.boxes.cls[i])))
            d = Path(save_dir) / name
            d.mkdir(parents=True, exist_ok=True)
            stem = Path(file_name).stem
            f = d / f"{stem}{i if i else ''}.jpg"
            cv2.imwrite(str(f), cv2.cvtColor(crop, cv2.COLOR_RGB2BGR))

    # ------------------------------------------------------------------
    # serialization (reference Results.summary/to_df/to_csv/to_xml/to_json/
    # to_sql, results.py:759-1003)
    # ------------------------------------------------------------------
    def summary(self, normalize: bool = False, decimals: int = 5) -> list:
        """List of per-detection dicts; the base structure every serializer
        shares (reference Results.summary :759)."""
        results = []
        if self.probs is not None:
            c = self.probs.top1
            return [{"name": self.names.get(c, str(c)), "class": c,
                     "confidence": round(float(self.probs.top1conf), decimals)}]
        is_obb = self.obb is not None
        data = self.obb if is_obb else self.boxes
        if data is None:
            return results
        h, w = self.orig_shape if normalize else (1, 1)
        mask_xy = self.masks.xy if self.masks is not None else None
        for i in range(len(data)):
            cls_i, conf = int(data.cls[i]), round(float(data.conf[i]), decimals)
            box = (data.xyxyxyxy[i] if is_obb else data.xyxy[i]).reshape(-1, 2)
            xy = {}
            for j, (bx, by) in enumerate(box):
                xy[f"x{j + 1}"] = round(float(bx) / w, decimals)
                xy[f"y{j + 1}"] = round(float(by) / h, decimals)
            rec = {"name": self.names.get(cls_i, str(cls_i)), "class": cls_i,
                   "confidence": conf, "box": xy}
            if data.is_track:
                rec["track_id"] = int(data.id[i])
            if mask_xy is not None and i < len(mask_xy):
                rec["segments"] = {
                    "x": np.round(mask_xy[i][:, 0] / w, decimals).tolist(),
                    "y": np.round(mask_xy[i][:, 1] / h, decimals).tolist(),
                }
            if self.keypoints is not None and i < len(self.keypoints):
                kp = self.keypoints.data[i]
                rec["keypoints"] = {
                    "x": np.round(kp[:, 0] / w, decimals).tolist(),
                    "y": np.round(kp[:, 1] / h, decimals).tolist(),
                }
                if self.keypoints.has_visible:
                    rec["keypoints"]["visible"] = np.round(kp[:, 2], decimals).tolist()
            results.append(rec)
        return results

    def to_df(self, normalize: bool = False, decimals: int = 5):
        """Pandas DataFrame of the summary (reference to_df :825)."""
        import pandas as pd

        return pd.DataFrame(self.summary(normalize=normalize, decimals=decimals))

    def to_csv(self, normalize: bool = False, decimals: int = 5, *args, **kwargs):
        return self.to_df(normalize=normalize, decimals=decimals).to_csv(*args, **kwargs)

    def to_xml(self, normalize: bool = False, decimals: int = 5, *args, **kwargs):
        df = self.to_df(normalize=normalize, decimals=decimals)
        if df.empty:
            return '<?xml version="1.0" encoding="utf-8"?>\n<root></root>'
        return df.to_xml(*args, **kwargs)

    def to_json(self, normalize: bool = False, decimals: int = 5) -> str:
        """JSON string of the summary (reference to_json :911). Note: the
        round-1 API returned a list here; the reference returns a string —
        use ``summary()`` for the list form."""
        import json

        return json.dumps(self.summary(normalize=normalize, decimals=decimals), indent=2)

    def to_sql(self, table_name: str = "results", normalize: bool = False,
               decimals: int = 5, db_path: str = "results.db"):
        """Write the summary into a sqlite table (reference to_sql :945)."""
        import json
        import sqlite3

        data = self.summary(normalize=normalize, decimals=decimals)
        conn = sqlite3.connect(db_path)
        try:
            cur = conn.cursor()
            cur.execute(
                f"CREATE TABLE IF NOT EXISTS {table_name} (id INTEGER PRIMARY KEY "
                "AUTOINCREMENT, class_name TEXT, confidence REAL, box TEXT, "
                "masks TEXT, kpts TEXT)")
            for item in data:
                cur.execute(
                    f"INSERT INTO {table_name} (class_name, confidence, box, masks, "
                    "kpts) VALUES (?, ?, ?, ?, ?)",
                    (item.get("name"), item.get("confidence"),
                     json.dumps(item.get("box", {})),
                     json.dumps(item.get("segments", {})),
                     json.dumps(item.get("keypoints", {}))))
            conn.commit()
        finally:
            conn.close()

    def save_txt(self, txt_file: str, save_conf: bool = False):
        """YOLO-format txt lines (reference results.py save_txt :668)."""
        lines = []
        h, w = self.orig_shape
        if self.probs is not None:
            for c in self.probs.top5:
                lines.append(f"{self.probs.data[c]:.2f} {self.names.get(c, c)}")
        elif self.obb is not None:
            for i in range(len(self.obb)):
                pts = (self.obb.xyxyxyxyn[i].reshape(-1)).tolist()
                line = f"{int(self.obb.cls[i])} " + " ".join(f"{x:.6f}" for x in pts)
                if save_conf:
                    line += f" {self.obb.conf[i]:.6f}"
                lines.append(line)
        elif self.boxes is not None:
            seg_xyn = self.masks.xyn if self.masks is not None else None
            for i in range(len(self.boxes)):
                cl = int(self.boxes.cls[i])
                if seg_xyn is not None and i < len(seg_xyn) and len(seg_xyn[i]):
                    coords = seg_xyn[i].reshape(-1)
                else:
                    coords = self.boxes.xywhn[i]
                line = f"{cl} " + " ".join(f"{x:.6f}" for x in coords)
                if self.keypoints is not None and i < len(self.keypoints):
                    kp = self.keypoints.data[i]
                    kxyn = kp[:, :2] / np.asarray([w, h], np.float32)
                    cols = (np.concatenate([kxyn, kp[:, 2:3]], 1).reshape(-1)
                            if self.keypoints.has_visible else kxyn.reshape(-1))
                    line += " " + " ".join(f"{x:.6f}" for x in cols)
                if save_conf:
                    line += f" {self.boxes.conf[i]:.6f}"
                lines.append(line)
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        Path(txt_file).write_text("\n".join(lines) + ("\n" if lines else ""))

    def verbose(self) -> str:
        if self.probs is not None:
            return ", ".join(
                f"{self.names.get(c, c)} {self.probs.data[c]:.2f}" for c in self.probs.top5)
        data = self.obb if self.obb is not None else self.boxes
        if data is None or len(data) == 0:
            return "(no detections)"
        counts = {}
        for c in data.cls.astype(int):
            counts[c] = counts.get(c, 0) + 1
        return ", ".join(f"{n} {self.names.get(c, c)}{'s' if n > 1 else ''}"
                         for c, n in sorted(counts.items()))


_PALETTE = [
    (255, 56, 56), (255, 157, 151), (255, 112, 31), (255, 178, 29), (207, 210, 49),
    (72, 249, 10), (146, 204, 23), (61, 219, 134), (26, 147, 52), (0, 212, 187),
    (44, 153, 168), (0, 194, 255), (52, 69, 147), (100, 115, 255), (0, 24, 236),
    (132, 56, 255), (82, 0, 133), (203, 56, 255), (255, 149, 200), (255, 55, 199),
]


def _class_color(c: int) -> tuple:
    return _PALETTE[c % len(_PALETTE)]
