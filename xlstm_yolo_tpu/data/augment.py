"""Host-side augmentation pipeline (numpy + cv2).

Mirrors the reference train-time transform order (``data/augment.py:2280-2344``,
v8_transforms): Mosaic -> RandomPerspective (with letterbox pre-placement) ->
RandomHSV -> RandomFlip; eval uses LetterBox only. MixUp and CopyPaste hooks
included. Output is always fixed-shape: (imgsz, imgsz, 3) uint8 + padded
label slots, so the device side never sees ragged data.

Labels flow through as (n, 5) float32 = (cls, x1, y1, x2, y2) in pixels of
the current canvas.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import cv2
import numpy as np


def letterbox(img: np.ndarray, new_shape: int | tuple, labels: np.ndarray | None = None,
              scaleup: bool = True, pad_value: int = 114):
    """Aspect-preserving resize + pad (reference data/augment.py:1479 LetterBox)."""
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    h, w = img.shape[:2]
    r = min(new_shape[0] / h, new_shape[1] / w)
    if not scaleup:
        r = min(r, 1.0)
    nh, nw = round(h * r), round(w * r)
    pad_h, pad_w = new_shape[0] - nh, new_shape[1] - nw
    top, left = pad_h // 2, pad_w // 2
    if (nh, nw) != (h, w):
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    out = np.full((*new_shape, img.shape[2] if img.ndim == 3 else 1), pad_value, img.dtype)
    out[top : top + nh, left : left + nw] = img
    if labels is not None and len(labels):
        labels = labels.copy()
        labels[:, 1:5] = labels[:, 1:5] * r
        labels[:, [1, 3]] += left
        labels[:, [2, 4]] += top
    return out, labels, (r, left, top)


def random_hsv(img: np.ndarray, hgain: float = 0.015, sgain: float = 0.7, vgain: float = 0.4,
               rng: np.random.Generator | None = None) -> np.ndarray:
    """HSV jitter (reference RandomHSV, data/augment.py:1303)."""
    rng = rng or np.random.default_rng()
    if hgain == sgain == vgain == 0:
        return img
    r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    x = np.arange(0, 256, dtype=r.dtype)
    lut_h = ((x * r[0]) % 180).astype(img.dtype)
    lut_s = np.clip(x * r[1], 0, 255).astype(img.dtype)
    lut_v = np.clip(x * r[2], 0, 255).astype(img.dtype)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v)))
    return cv2.cvtColor(im_hsv, cv2.COLOR_HSV2RGB)


def random_flip(img: np.ndarray, labels: np.ndarray, fliplr: float = 0.5, flipud: float = 0.0,
                rng: np.random.Generator | None = None):
    """Horizontal/vertical flip (reference RandomFlip, data/augment.py:1385)."""
    rng = rng or np.random.default_rng()
    h, w = img.shape[:2]
    if fliplr and rng.random() < fliplr:
        img = np.ascontiguousarray(img[:, ::-1])
        if len(labels):
            x1 = labels[:, 1].copy()
            labels[:, 1] = w - labels[:, 3]
            labels[:, 3] = w - x1
    if flipud and rng.random() < flipud:
        img = np.ascontiguousarray(img[::-1])
        if len(labels):
            y1 = labels[:, 2].copy()
            labels[:, 2] = h - labels[:, 4]
            labels[:, 4] = h - y1
    return img, labels


def random_perspective(img: np.ndarray, labels: np.ndarray, degrees: float = 0.0,
                       translate: float = 0.1, scale: float = 0.5, shear: float = 0.0,
                       perspective: float = 0.0, border: tuple = (0, 0),
                       rng: np.random.Generator | None = None):
    """Affine/perspective warp with box transform + candidate filtering
    (reference RandomPerspective, data/augment.py:952)."""
    rng = rng or np.random.default_rng()
    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height

    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(width, height), borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(width, height), borderValue=(114, 114, 114))

    if len(labels):
        n = len(labels)
        xy = np.ones((n * 4, 3))
        boxes = labels[:, 1:5]
        xy[:, :2] = boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)  # corners
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        keep = _box_candidates(boxes.T * s, new.T)
        labels = labels[keep]
        labels[:, 1:5] = new[keep]
    return img, labels


def _box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
    """Filter degenerate warped boxes (reference data/augment.py box_candidates)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def mosaic4(images: list, labels_list: list, imgsz: int, rng: np.random.Generator | None = None):
    """4-image mosaic on a 2x2 canvas of size 2*imgsz (reference Mosaic,
    data/augment.py:490)."""
    rng = rng or np.random.default_rng()
    s = imgsz
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    canvas = np.full((s * 2, s * 2, 3), 114, np.uint8)
    out_labels = []
    for i, (img, labels) in enumerate(zip(images, labels_list)):
        h, w = img.shape[:2]
        r = min(s / h, s / w)
        nh, nw = int(h * r), int(w * r)
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if i == 0:
            x1a, y1a, x2a, y2a = max(xc - nw, 0), max(yc - nh, 0), xc, yc
            x1b, y1b = nw - (x2a - x1a), nh - (y2a - y1a)
        elif i == 1:
            x1a, y1a, x2a, y2a = xc, max(yc - nh, 0), min(xc + nw, s * 2), yc
            x1b, y1b = 0, nh - (y2a - y1a)
        elif i == 2:
            x1a, y1a, x2a, y2a = max(xc - nw, 0), yc, xc, min(s * 2, yc + nh)
            x1b, y1b = nw - (x2a - x1a), 0
        else:
            x1a, y1a, x2a, y2a = xc, yc, min(xc + nw, s * 2), min(s * 2, yc + nh)
            x1b, y1b = 0, 0
        canvas[y1a:y2a, x1a:x2a] = img[y1b : y1b + (y2a - y1a), x1b : x1b + (x2a - x1a)]
        if len(labels):
            lb = labels.copy()
            lb[:, 1:5] = lb[:, 1:5] * r
            lb[:, [1, 3]] += x1a - x1b
            lb[:, [2, 4]] += y1a - y1b
            out_labels.append(lb)
    labels = np.concatenate(out_labels, 0) if out_labels else np.zeros((0, 5), np.float32)
    np.clip(labels[:, 1:5:2], 0, 2 * s, out=labels[:, 1:5:2])
    np.clip(labels[:, 2:5:2], 0, 2 * s, out=labels[:, 2:5:2])
    return canvas, labels


def mixup(img1, labels1, img2, labels2, rng: np.random.Generator | None = None):
    """Beta(32, 32) image blend (reference MixUp, data/augment.py:867)."""
    rng = rng or np.random.default_rng()
    r = rng.beta(32.0, 32.0)
    img = (img1.astype(np.float32) * r + img2.astype(np.float32) * (1 - r)).astype(np.uint8)
    return img, np.concatenate([labels1, labels2], 0)


def _shift_points(extra: dict, scale: float, dx: float, dy: float) -> dict:
    """Scale+translate every point set in a task-extra dict."""
    out = {}
    if "segments" in extra:
        out["segments"] = [p * scale + np.asarray([dx, dy], np.float32) for p in extra["segments"]]
    if "keypoints" in extra:
        k = extra["keypoints"].copy()
        k[..., 0] = k[..., 0] * scale + dx
        k[..., 1] = k[..., 1] * scale + dy
        out["keypoints"] = k
    if "corners" in extra:
        out["corners"] = extra["corners"] * scale + np.asarray([dx, dy], np.float32)
    return out


def _cat_extras(extras: list) -> dict:
    out = {}
    keys = set().union(*[e.keys() for e in extras]) if extras else set()
    if "segments" in keys:
        out["segments"] = [p for e in extras for p in e.get("segments", [])]
    if "keypoints" in keys:
        ks = [e["keypoints"] for e in extras if "keypoints" in e and len(e["keypoints"])]
        out["keypoints"] = np.concatenate(ks, 0) if ks else np.zeros((0, 1, 3), np.float32)
    if "corners" in keys:
        cs = [e["corners"] for e in extras if "corners" in e and len(e["corners"])]
        out["corners"] = np.concatenate(cs, 0) if cs else np.zeros((0, 4, 2), np.float32)
    return out


def mosaic4_points(samples: list, imgsz: int, rng: np.random.Generator | None = None):
    """4-image mosaic carrying point annotations (segments / keypoints / obb
    corners) alongside the boxes — the point-task extension of mosaic4.

    samples: list of 4 (img, labels (n, 5) px, extra dict).
    Returns (canvas 2s x 2s, labels, extra) in canvas pixels.
    """
    rng = rng or np.random.default_rng()
    s = imgsz
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    canvas = np.full((s * 2, s * 2, 3), 114, np.uint8)
    out_labels, out_extras = [], []
    for i, (img, labels, extra) in enumerate(samples):
        h, w = img.shape[:2]
        r = min(s / h, s / w)
        nh, nw = int(h * r), int(w * r)
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if i == 0:
            x1a, y1a, x2a, y2a = max(xc - nw, 0), max(yc - nh, 0), xc, yc
            x1b, y1b = nw - (x2a - x1a), nh - (y2a - y1a)
        elif i == 1:
            x1a, y1a, x2a, y2a = xc, max(yc - nh, 0), min(xc + nw, s * 2), yc
            x1b, y1b = 0, nh - (y2a - y1a)
        elif i == 2:
            x1a, y1a, x2a, y2a = max(xc - nw, 0), yc, xc, min(s * 2, yc + nh)
            x1b, y1b = nw - (x2a - x1a), 0
        else:
            x1a, y1a, x2a, y2a = xc, yc, min(xc + nw, s * 2), min(s * 2, yc + nh)
            x1b, y1b = 0, 0
        canvas[y1a:y2a, x1a:x2a] = img[y1b : y1b + (y2a - y1a), x1b : x1b + (x2a - x1a)]
        dx, dy = x1a - x1b, y1a - y1b
        if len(labels):
            lb = labels.copy()
            lb[:, 1:5] = lb[:, 1:5] * r
            lb[:, [1, 3]] += dx
            lb[:, [2, 4]] += dy
            out_labels.append(lb)
            out_extras.append(_shift_points(extra, r, dx, dy))
    labels = np.concatenate(out_labels, 0) if out_labels else np.zeros((0, 5), np.float32)
    extra = _cat_extras(out_extras)
    np.clip(labels[:, 1:5:2], 0, 2 * s, out=labels[:, 1:5:2])
    np.clip(labels[:, 2:5:2], 0, 2 * s, out=labels[:, 2:5:2])
    return canvas, labels, extra


def copy_paste_flip(img: np.ndarray, labels: np.ndarray, segments: list, p: float = 0.5,
                    rng: np.random.Generator | None = None):
    """Copy-paste augmentation, "flip" mode (reference CopyPaste,
    data/augment.py:1636): paste horizontally-mirrored instances whose boxes
    don't collide with existing ones."""
    rng = rng or np.random.default_rng()
    if not len(labels) or p <= 0:
        return img, labels, segments
    h, w = img.shape[:2]
    n = max(1, round(len(labels) * p))
    new_labels, new_segments = [], []
    im2 = img[:, ::-1]  # mirrored source
    for i in rng.permutation(len(labels))[:n]:
        box = labels[i, 1:5].copy()
        fbox = np.asarray([w - box[2], box[1], w - box[0], box[3]], np.float32)
        # reject if the mirrored box overlaps any existing box strongly
        x1 = np.maximum(fbox[0], labels[:, 1])
        y1 = np.maximum(fbox[1], labels[:, 2])
        x2 = np.minimum(fbox[2], labels[:, 3])
        y2 = np.minimum(fbox[3], labels[:, 4])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area = np.clip((fbox[2] - fbox[0]) * (fbox[3] - fbox[1]), 1e-6, None)
        if (inter / area).max() > 0.3:
            continue
        poly = segments[i]
        fpoly = np.stack([w - poly[:, 0], poly[:, 1]], -1)
        mask = np.zeros((h, w), np.uint8)
        cv2.fillPoly(mask, [fpoly.astype(np.int32)], 1)
        img = np.where(mask[..., None] > 0, im2, img)
        new_labels.append(np.concatenate([[labels[i, 0]], fbox]))
        new_segments.append(fpoly)
    if new_labels:
        labels = np.concatenate([labels, np.stack(new_labels)], 0)
        segments = list(segments) + new_segments
    return img, labels, segments


class Albumentations:
    """Optional albumentations hook (reference data/augment.py:1737): a small
    image-only pipeline (blur / median blur / grayscale / CLAHE at ~1%
    probability each). Spatially invariant, so boxes/points pass through
    unchanged — same subset the reference uses by default. Inert when the
    package is missing (import-gated like every reference integration)."""

    def __init__(self, p: float = 1.0):
        self.p = p
        self.transform = None
        try:
            import albumentations as Alb

            self.transform = Alb.Compose([
                Alb.Blur(p=0.01),
                Alb.MedianBlur(p=0.01),
                Alb.ToGray(p=0.01),
                Alb.CLAHE(p=0.01),
            ])
        except Exception:  # ImportError or version incompatibilities
            self.transform = None

    def __call__(self, img: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
        if self.transform is None:
            return img
        r = rng.random() if rng is not None else np.random.random()
        if r > self.p:
            return img
        return self.transform(image=img)["image"]
