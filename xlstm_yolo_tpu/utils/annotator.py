"""Annotator — cv2 drawing for Results, predictions and solutions.

Re-implements the capability set of reference ``utils/plotting.py:158``
(``Annotator``): labeled boxes (axis-aligned + rotated), alpha-blended
instance masks, keypoint skeletons, plus the solution-facing helpers
(regions, track trails, queue/analytics overlays, distance lines,
workout angles, visioneye). Design differences from the reference:

* numpy/cv2 only — no PIL branch, no GPU-tensor ``im_gpu`` path: masks
  arrive as host numpy from the jitted decode, so blending is a single
  vectorized numpy expression rather than a torch einsum.
* images are RGB uint8 throughout (the repo's frame convention);
  ``save`` converts to BGR at the file boundary.
* the palette is generated (golden-ratio hue walk, fixed seed) instead of
  a hex table — deterministic, unlimited classes, perceptually spaced.
"""
from __future__ import annotations

import math
from pathlib import Path

import numpy as np


def _hsv2rgb(h: float, s: float, v: float) -> tuple[int, int, int]:
    i = int(h * 6.0) % 6
    f = h * 6.0 - int(h * 6.0)
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    r, g, b = ((v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q))[i]
    return int(r * 255), int(g * 255), int(b * 255)


class Colors:
    """Deterministic class palette (reference ``utils/plotting.py:20``).

    A golden-ratio hue walk at two saturation/value tiers gives visually
    distinct neighbours for any class count; index i always maps to the
    same color. ``pose_palette`` colors keypoint groups and limbs.
    """

    def __init__(self, n: int = 40):
        phi = (math.sqrt(5) - 1) / 2
        self.palette = [
            _hsv2rgb((0.04 + i * phi) % 1.0, 0.75 if i % 2 else 0.95,
                     0.95 if i % 3 else 0.80)
            for i in range(n)
        ]
        self.n = len(self.palette)
        self.pose_palette = np.array(
            [_hsv2rgb(h / 20.0, 0.85, 0.95) for h in range(20)], dtype=np.uint8)

    def __call__(self, i, bgr: bool = False):
        c = self.palette[int(i) % self.n]
        return (c[2], c[1], c[0]) if bgr else c


colors = Colors()

# COCO 17-keypoint skeleton: limb index pairs (public COCO convention,
# reference Annotator.__init__ skeleton table)
COCO_SKELETON = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]
# keypoint/limb color group ids (head vs left limb vs right limb)
_KPT_COLOR_ID = [16, 16, 16, 16, 16, 9, 9, 9, 9, 9, 9, 0, 0, 0, 0, 0, 0]
_LIMB_COLOR_ID = [0, 0, 0, 0, 9, 9, 9, 9, 9, 9, 9, 9, 16, 16, 16, 16, 16, 16, 16]


class Annotator:
    """Draw detection/segmentation/pose/solution overlays on an RGB frame.

    Reference: ``utils/plotting.py:158``. The image passed in is copied;
    ``result()`` returns the annotated array.
    """

    def __init__(self, im: np.ndarray, line_width: int | None = None,
                 font_scale: float | None = None):
        self.im = np.ascontiguousarray(im).copy()
        if self.im.dtype != np.uint8:
            self.im = (np.clip(self.im, 0, 1) * 255).astype(np.uint8)
        self.h, self.w = self.im.shape[:2]
        self.lw = line_width or max(round((self.h + self.w) / 2 * 0.003), 2)
        self.fs = font_scale or self.lw / 3
        self.tf = max(self.lw - 1, 1)  # text thickness

    # -- core ----------------------------------------------------------

    def box_label(self, box, label: str = "", color=(128, 128, 128),
                  txt_color=(255, 255, 255), rotated: bool = False):
        """Labeled box; ``rotated=True`` takes a (4, 2) corner array
        (reference :352)."""
        import cv2

        color = tuple(int(c) for c in color)
        if rotated:
            pts = np.asarray(box, np.int32).reshape(-1, 2)
            cv2.polylines(self.im, [pts], True, color, self.lw)
            p1 = (int(pts[:, 0].min()), int(pts[:, 1].min()))
        else:
            p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
            cv2.rectangle(self.im, p1, p2, color, self.lw, cv2.LINE_AA)
        if label:
            tw, th = cv2.getTextSize(str(label), 0, self.fs, self.tf)[0]
            outside = p1[1] - th - 3 >= 0
            p3 = (p1[0] + tw, p1[1] - th - 3 if outside else p1[1] + th + 3)
            cv2.rectangle(self.im, p1, p3, color, -1, cv2.LINE_AA)
            cv2.putText(self.im, str(label),
                        (p1[0], p1[1] - 2 if outside else p1[1] + th + 2),
                        0, self.fs, txt_color, self.tf, cv2.LINE_AA)

    def masks(self, masks: np.ndarray, colors_, alpha: float = 0.5):
        """Alpha-blend instance masks. ``masks`` (N, h, w) float/bool in
        mask space; resized to the frame if needed (reference :416, numpy
        instead of the im_gpu einsum)."""
        import cv2

        if len(masks) == 0:
            return
        masks = np.asarray(masks)
        if masks.shape[1:] != (self.h, self.w):
            masks = np.stack([
                cv2.resize(m.astype(np.float32), (self.w, self.h)) for m in masks])
        on = masks > 0.5  # (N, H, W)
        cols = np.asarray([tuple(int(x) for x in c) for c in colors_], np.float32)
        # per-pixel: sum of active mask colors, mean-weighted, alpha-blended
        cnt = on.sum(0)  # (H, W)
        colored = np.tensordot(on.astype(np.float32), cols, axes=(0, 0))  # (H, W, 3)
        sel = cnt > 0
        blend = self.im.astype(np.float32)
        blend[sel] = (1 - alpha) * blend[sel] + alpha * colored[sel] / cnt[sel, None]
        self.im = blend.astype(np.uint8)

    def kpts(self, kpts: np.ndarray, radius: int | None = None,
             kpt_line: bool = True, conf_thres: float = 0.25):
        """One instance's keypoints (K, 2|3) + COCO skeleton limbs when
        K == 17 (reference :452)."""
        import cv2

        kpts = np.asarray(kpts)
        radius = radius or max(self.lw, 2)
        nk = len(kpts)
        is_pose = nk == 17
        for ki, k in enumerate(kpts):
            if len(k) >= 3 and k[2] < conf_thres:
                continue
            if k[0] <= 0 and k[1] <= 0:
                continue
            c = (self.pose_color(_KPT_COLOR_ID[ki]) if is_pose
                 else (0, 255, 0))
            cv2.circle(self.im, (int(k[0]), int(k[1])), radius, c, -1, cv2.LINE_AA)
        if kpt_line and is_pose:
            for li, (a, b) in enumerate(COCO_SKELETON):
                ka, kb = kpts[a], kpts[b]
                if len(ka) >= 3 and (ka[2] < conf_thres or kb[2] < conf_thres):
                    continue
                if (ka[0] <= 0 and ka[1] <= 0) or (kb[0] <= 0 and kb[1] <= 0):
                    continue
                cv2.line(self.im, (int(ka[0]), int(ka[1])), (int(kb[0]), int(kb[1])),
                         self.pose_color(_LIMB_COLOR_ID[li]), max(self.lw // 2, 1),
                         cv2.LINE_AA)

    @staticmethod
    def pose_color(i: int):
        return tuple(int(x) for x in colors.pose_palette[i % len(colors.pose_palette)])

    def rectangle(self, xy, fill=None, outline=None, width: int = 1):
        import cv2

        p1, p2 = (int(xy[0]), int(xy[1])), (int(xy[2]), int(xy[3]))
        if fill is not None:
            cv2.rectangle(self.im, p1, p2, tuple(int(c) for c in fill), -1)
        if outline is not None:
            cv2.rectangle(self.im, p1, p2, tuple(int(c) for c in outline), width)

    def text(self, xy, text: str, txt_color=(255, 255, 255), box_style: bool = False,
             bg_color=(0, 0, 0)):
        import cv2

        x, y = int(xy[0]), int(xy[1])
        if box_style:
            tw, th = cv2.getTextSize(str(text), 0, self.fs, self.tf)[0]
            cv2.rectangle(self.im, (x - 2, y - th - 4), (x + tw + 2, y + 4),
                          tuple(int(c) for c in bg_color), -1)
        cv2.putText(self.im, str(text), (x, y), 0, self.fs, txt_color, self.tf,
                    cv2.LINE_AA)

    def circle_label(self, box, label: str = "", color=(128, 128, 128),
                     txt_color=(255, 255, 255), margin: int = 2):
        """Circled label at a box center (reference :274)."""
        import cv2

        cx, cy = int((box[0] + box[2]) / 2), int((box[1] + box[3]) / 2)
        tw, th = cv2.getTextSize(str(label), 0, 0.15 * self.fs * 3, self.tf)[0]
        radius = int((max(tw, th)) / 2 + margin) + self.tf
        cv2.circle(self.im, (cx, cy), radius, tuple(int(c) for c in color), -1)
        cv2.putText(self.im, str(label), (cx - tw // 2, cy + th // 2), 0,
                    0.15 * self.fs * 3, txt_color, self.tf, cv2.LINE_AA)

    def text_label(self, box, label: str = "", color=(128, 128, 128),
                   txt_color=(255, 255, 255), margin: int = 5):
        """Rectangle-backed label at a box center (reference :315)."""
        import cv2

        cx, cy = int((box[0] + box[2]) / 2), int((box[1] + box[3]) / 2)
        tw, th = cv2.getTextSize(str(label), 0, self.fs, self.tf)[0]
        cv2.rectangle(self.im, (cx - tw // 2 - margin, cy - th // 2 - margin),
                      (cx + tw // 2 + margin, cy + th // 2 + margin),
                      tuple(int(c) for c in color), -1)
        cv2.putText(self.im, str(label), (cx - tw // 2, cy + th // 2), 0, self.fs,
                    txt_color, self.tf, cv2.LINE_AA)

    # -- solution helpers (reference :594-933) ---------------------------

    def draw_region(self, reg_pts, color=(0, 255, 0), thickness: int = 5):
        import cv2

        pts = np.asarray(reg_pts, np.int32).reshape(-1, 2)
        if len(pts) == 2:  # a counting line
            cv2.line(self.im, tuple(pts[0]), tuple(pts[1]), color, thickness)
        else:
            cv2.polylines(self.im, [pts], True, color, thickness)

    def draw_centroid_and_tracks(self, track, color=(255, 0, 255), thickness: int = 2):
        """Track trail polyline + current centroid (reference :609)."""
        import cv2

        pts = np.asarray(track, np.int32).reshape(-1, 1, 2)
        cv2.polylines(self.im, [pts], False, color, thickness)
        cv2.circle(self.im, tuple(pts[-1][0]), thickness * 2, color, -1)

    def queue_counts_display(self, label: str, points=None,
                             region_color=(255, 255, 255), txt_color=(0, 0, 0)):
        """Queue count centered in the region polygon (reference :622)."""
        pts = np.asarray(points, np.float32).reshape(-1, 2)
        cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
        self.text((cx, cy), label, txt_color=txt_color, box_style=True,
                  bg_color=region_color)

    def display_analytics(self, rows: dict, txt_color=(255, 255, 255),
                          bg_color=(40, 40, 40), margin: int = 10):
        """Stacked key/value overlay in the top-right corner (reference :686)."""
        import cv2

        y = margin + 20
        for k, v in rows.items():
            s = f"{k}: {v}"
            tw, th = cv2.getTextSize(s, 0, self.fs, self.tf)[0]
            x = self.w - tw - margin
            cv2.rectangle(self.im, (x - 4, y - th - 4), (x + tw + 4, y + 4),
                          tuple(int(c) for c in bg_color), -1)
            cv2.putText(self.im, s, (x, y), 0, self.fs, txt_color, self.tf, cv2.LINE_AA)
            y += th + margin

    def plot_angle_and_count_and_stage(self, angle, count, stage, center_kpt,
                                       color=(104, 31, 17), txt_color=(255, 255, 255)):
        """Workout monitor overlay at a joint (reference :790)."""
        x, y = int(center_kpt[0]), int(center_kpt[1])
        for i, s in enumerate((f"{float(angle):.0f} deg", f"reps {count}", f"{stage}")):
            self.text((x, y + i * int(22 * self.fs * 3 / 2)), s, txt_color=txt_color,
                      box_style=True, bg_color=color)

    def seg_bbox(self, mask_xy, mask_color=(255, 0, 255), label: str | None = None,
                 txt_color=(255, 255, 255)):
        """Segment contour outline + optional label (reference :818)."""
        import cv2

        pts = np.asarray(mask_xy, np.int32).reshape(-1, 1, 2)
        cv2.polylines(self.im, [pts], True, mask_color, self.lw)
        if label:
            cx, cy = pts[:, 0, 0].mean(), pts[:, 0, 1].mean()
            self.text((cx, cy), label, txt_color=txt_color, box_style=True,
                      bg_color=mask_color)

    def plot_distance_and_line(self, distance_m: float, centroids,
                               line_color=(104, 31, 17), centroid_color=(255, 0, 255)):
        """Distance text + line between two object centroids (reference :879)."""
        import cv2

        (x1, y1), (x2, y2) = (tuple(int(v) for v in c) for c in centroids)
        cv2.line(self.im, (x1, y1), (x2, y2), line_color, self.lw)
        for c in ((x1, y1), (x2, y2)):
            cv2.circle(self.im, c, self.lw * 2, centroid_color, -1)
        self.text((20, 40), f"distance: {distance_m:.2f} m", box_style=True,
                  bg_color=line_color)

    def visioneye(self, box, center_point, color=(235, 219, 11),
                  pin_color=(255, 0, 255)):
        """Eye-point to object-center mapping line (reference :915)."""
        import cv2

        cx, cy = int((box[0] + box[2]) / 2), int((box[1] + box[3]) / 2)
        cp = (int(center_point[0]), int(center_point[1]))
        cv2.circle(self.im, cp, self.lw * 2, pin_color, -1)
        cv2.circle(self.im, (cx, cy), self.lw * 2, color, -1)
        cv2.line(self.im, cp, (cx, cy), color, self.lw)

    def sweep_annotator(self, line_x: int = 0, line_y: int = 0, label: str | None = None,
                        color=(221, 0, 186), txt_color=(255, 255, 255)):
        """Vertical sweep line for the sweep/line-scan demo (reference :845)."""
        import cv2

        cv2.line(self.im, (int(line_x), 0), (int(line_x), int(line_y or self.h)),
                 color, self.lw)
        if label:
            self.text((line_x + 5, (line_y or self.h) // 2), label,
                      txt_color=txt_color, box_style=True, bg_color=color)

    # -- io --------------------------------------------------------------

    def result(self) -> np.ndarray:
        return self.im

    def save(self, filename: str | Path = "image.jpg"):
        import cv2

        Path(filename).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(filename), cv2.cvtColor(self.im, cv2.COLOR_RGB2BGR))
        return Path(filename)


def save_one_box(xyxy, im: np.ndarray, file: str | Path = "im.jpg",
                 gain: float = 1.02, pad: int = 10, square: bool = False,
                 save: bool = True) -> np.ndarray:
    """Crop a gained/padded box out of an image (reference :987)."""
    import cv2

    b = np.asarray(xyxy, np.float32).reshape(-1, 4)[0]
    cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
    w, h = (b[2] - b[0]) * gain + pad, (b[3] - b[1]) * gain + pad
    if square:
        w = h = max(w, h)
    x1, y1 = max(int(cx - w / 2), 0), max(int(cy - h / 2), 0)
    x2, y2 = min(int(cx + w / 2), im.shape[1]), min(int(cy + h / 2), im.shape[0])
    crop = im[y1:y2, x1:x2]
    if save:
        Path(file).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(file), cv2.cvtColor(crop, cv2.COLOR_RGB2BGR))
    return crop
