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


def mosaic9_points(samples: list, imgsz: int, rng: np.random.Generator | None = None):
    """9-image mosaic (reference ``_mosaic9``, data/augment.py:716): base
    image centered on a 3s x 3s canvas, eight neighbours packed around it
    (each aligned to the previously placed tile), then the center 2s x 2s
    region is cropped — so the return contract matches ``mosaic4_points``:
    (canvas 2s x 2s, labels px, extra dict).

    samples: list of 9 (img, labels (n, 5) px, extra dict).
    """
    rng = rng or np.random.default_rng()
    s = imgsz
    canvas = np.full((s * 3, s * 3, 3), 114, np.uint8)
    out_labels, out_extras = [], []
    h0 = w0 = hp = wp = 0
    for i, (img, labels, extra) in enumerate(samples):
        h, w = img.shape[:2]
        r = min(s / h, s / w)
        nh, nw = int(h * r), int(w * r)
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if i == 0:  # center
            h0, w0 = nh, nw
            c = s, s, s + nw, s + nh
        elif i == 1:  # top
            c = s, s - nh, s + nw, s
        elif i == 2:  # top right
            c = s + wp, s - nh, s + wp + nw, s
        elif i == 3:  # right
            c = s + w0, s, s + w0 + nw, s + nh
        elif i == 4:  # bottom right
            c = s + w0, s + hp, s + w0 + nw, s + hp + nh
        elif i == 5:  # bottom
            c = s + w0 - nw, s + h0, s + w0, s + h0 + nh
        elif i == 6:  # bottom left
            c = s + w0 - wp - nw, s + h0, s + w0 - wp, s + h0 + nh
        elif i == 7:  # left
            c = s - nw, s + h0 - nh, s, s + h0
        else:  # top left
            c = s - nw, s + h0 - hp - nh, s, s + h0 - hp
        padw, padh = c[:2]
        x1, y1, x2, y2 = (max(v, 0) for v in c)
        x2, y2 = min(x2, 3 * s), min(y2, 3 * s)
        canvas[y1:y2, x1:x2] = img[y1 - padh: y2 - padh, x1 - padw: x2 - padw]
        hp, wp = nh, nw
        if len(labels):
            lb = labels.copy()
            lb[:, 1:5] *= r
            lb[:, [1, 3]] += padw
            lb[:, [2, 4]] += padh
            out_labels.append(lb)
            out_extras.append(_shift_points(extra, r, padw, padh))
    # crop the center 2s x 2s (the reference's [-border:border] with
    # border = -s//2 on the 3s canvas -> a random-free center crop at s//2)
    off = s // 2
    canvas = canvas[off: off + 2 * s, off: off + 2 * s]
    labels = np.concatenate(out_labels, 0) if out_labels else np.zeros((0, 5), np.float32)
    labels[:, [1, 3]] -= off
    labels[:, [2, 4]] -= off
    extra = _cat_extras([_shift_points(e, 1.0, -off, -off) for e in out_extras])
    np.clip(labels[:, 1:5:2], 0, 2 * s, out=labels[:, 1:5:2])
    np.clip(labels[:, 2:5:2], 0, 2 * s, out=labels[:, 2:5:2])
    return canvas, labels, extra


def mosaic3_points(samples: list, imgsz: int, rng: np.random.Generator | None = None):
    """3-image horizontal mosaic (reference ``_mosaic3``, data/augment.py:596):
    base centered, one image right, one left, on a 3s canvas; center 2s x 2s
    cropped. Returns (canvas 2s x 2s, labels px, extra dict)."""
    rng = rng or np.random.default_rng()
    s = imgsz
    canvas = np.full((s * 3, s * 3, 3), 114, np.uint8)
    out_labels, out_extras = [], []
    h0 = w0 = 0
    for i, (img, labels, extra) in enumerate(samples):
        h, w = img.shape[:2]
        r = min(s / h, s / w)
        nh, nw = int(h * r), int(w * r)
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if i == 0:  # center
            h0, w0 = nh, nw
            c = s, s, s + nw, s + nh
        elif i == 1:  # right
            c = s + w0, s, s + w0 + nw, s + nh
        else:  # left
            c = s - nw, s + h0 - nh, s, s + h0
        padw, padh = c[:2]
        x1, y1, x2, y2 = (max(v, 0) for v in c)
        x2, y2 = min(x2, 3 * s), min(y2, 3 * s)
        canvas[y1:y2, x1:x2] = img[y1 - padh: y2 - padh, x1 - padw: x2 - padw]
        if len(labels):
            lb = labels.copy()
            lb[:, 1:5] *= r
            lb[:, [1, 3]] += padw
            lb[:, [2, 4]] += padh
            out_labels.append(lb)
            out_extras.append(_shift_points(extra, r, padw, padh))
    off = s // 2
    canvas = canvas[off: off + 2 * s, off: off + 2 * s]
    labels = np.concatenate(out_labels, 0) if out_labels else np.zeros((0, 5), np.float32)
    labels[:, [1, 3]] -= off
    labels[:, [2, 4]] -= off
    extra = _cat_extras([_shift_points(e, 1.0, -off, -off) for e in out_extras])
    np.clip(labels[:, 1:5:2], 0, 2 * s, out=labels[:, 1:5:2])
    np.clip(labels[:, 2:5:2], 0, 2 * s, out=labels[:, 2:5:2])
    return canvas, labels, extra


def copy_paste_mix(img: np.ndarray, labels: np.ndarray, segments: list,
                   img2: np.ndarray, labels2: np.ndarray, segments2: list,
                   p: float = 0.5, rng: np.random.Generator | None = None):
    """Cross-image copy-paste ("mixup" mode of reference CopyPaste,
    data/augment.py:1636; Ghiasi et al., arXiv:2012.07177): paste segment
    instances from a SECOND image onto this one. Donor instances whose boxes
    intersect any existing box with ioa >= 0.30 are rejected; the least-
    overlapping ``round(p * n)`` of the rest are pasted (pixels masked from
    the donor image, resized to this image's shape).
    """
    rng = rng or np.random.default_rng()
    if not len(labels2) or not segments2 or p <= 0:
        return img, labels, segments
    h, w = img.shape[:2]
    h2, w2 = img2.shape[:2]
    if (h2, w2) != (h, w):
        sx, sy = w / w2, h / h2
        img2 = cv2.resize(img2, (w, h), interpolation=cv2.INTER_LINEAR)
        labels2 = labels2.copy()
        labels2[:, [1, 3]] *= sx
        labels2[:, [2, 4]] *= sy
        segments2 = [np.stack([pg[:, 0] * sx, pg[:, 1] * sy], -1) for pg in segments2]
    # ioa of each donor box over every existing box
    if len(labels):
        x1 = np.maximum(labels2[:, 1:2], labels[None, :, 1])
        y1 = np.maximum(labels2[:, 2:3], labels[None, :, 2])
        x2 = np.minimum(labels2[:, 3:4], labels[None, :, 3])
        y2 = np.minimum(labels2[:, 4:5], labels[None, :, 4])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area2 = np.clip((labels2[:, 3] - labels2[:, 1])
                        * (labels2[:, 4] - labels2[:, 2]), 1e-6, None)
        ioa = inter / area2[:, None]  # (N2, N1)
        eligible = np.nonzero((ioa < 0.30).all(1))[0]
        eligible = eligible[np.argsort(ioa.max(1)[eligible])]
    else:
        eligible = np.arange(len(labels2))
    take = eligible[: round(p * len(eligible))]
    if not len(take):
        return img, labels, segments
    mask = np.zeros((h, w), np.uint8)
    for j in take:
        cv2.fillPoly(mask, [segments2[j].astype(np.int32)], 1)
    img = np.where(mask[..., None] > 0, img2, img)
    labels = np.concatenate([labels, labels2[take]], 0) if len(labels) else labels2[take]
    segments = list(segments) + [segments2[j] for j in take]
    return img, labels, segments


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


# ---------------------------------------------------------------------------
# Classification transforms (reference data/augment.py:2348 classify_transforms
# and :2405 classify_augmentations). numpy/cv2-native: images are uint8 RGB
# HWC throughout; normalization happens later on-device.
# ---------------------------------------------------------------------------


def classify_eval_transform(img: np.ndarray, size: int, crop_fraction: float = 1.0,
                            interpolation=cv2.INTER_LINEAR) -> np.ndarray:
    """Eval-time classify preproc (reference classify_transforms,
    data/augment.py:2348): resize the SHORT edge to ``size / crop_fraction``
    (aspect preserved), then center-crop ``size`` x ``size``."""
    h, w = img.shape[:2]
    scale_size = math.floor(size / crop_fraction)
    r = scale_size / min(h, w)
    nh, nw = max(scale_size, int(round(h * r))), max(scale_size, int(round(w * r)))
    img = cv2.resize(img, (nw, nh), interpolation=interpolation)
    y0, x0 = (nh - size) // 2, (nw - size) // 2
    return np.ascontiguousarray(img[y0: y0 + size, x0: x0 + size])


def random_resized_crop(img: np.ndarray, size: int, scale=(0.08, 1.0),
                        ratio=(3 / 4, 4 / 3), rng: np.random.Generator | None = None,
                        interpolation=cv2.INTER_LINEAR) -> np.ndarray:
    """torchvision ``RandomResizedCrop`` algorithm (used by reference
    classify_augmentations, data/augment.py:2461): 10 attempts at a random
    area in ``scale``·A and log-uniform aspect in ``ratio``; fallback =
    ratio-clamped center crop."""
    rng = rng or np.random.default_rng()
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = area * rng.uniform(*scale)
        ar = math.exp(rng.uniform(math.log(ratio[0]), math.log(ratio[1])))
        cw = int(round(math.sqrt(target * ar)))
        ch = int(round(math.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = int(rng.integers(0, w - cw + 1))
            y0 = int(rng.integers(0, h - ch + 1))
            crop = img[y0: y0 + ch, x0: x0 + cw]
            return cv2.resize(crop, (size, size), interpolation=interpolation)
    # fallback: largest ratio-valid center crop
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    x0, y0 = (w - cw) // 2, (h - ch) // 2
    return cv2.resize(img[y0: y0 + ch, x0: x0 + cw], (size, size),
                      interpolation=interpolation)


def _blend(img1: np.ndarray, img2: np.ndarray, factor: float) -> np.ndarray:
    """PIL-style enhance blend: out = img2 + factor * (img1 - img2)."""
    out = img2.astype(np.float32) + factor * (img1.astype(np.float32) - img2.astype(np.float32))
    return np.clip(out, 0, 255).astype(np.uint8)


def _autocontrast(img: np.ndarray) -> np.ndarray:
    out = img.copy()
    for c in range(img.shape[2]):
        ch = img[..., c]
        lo, hi = int(ch.min()), int(ch.max())
        if hi > lo:
            lut = np.clip((np.arange(256, dtype=np.float32) - lo) * (255.0 / (hi - lo)), 0, 255)
            out[..., c] = lut.astype(np.uint8)[ch]
    return out


def _equalize(img: np.ndarray) -> np.ndarray:
    return np.stack([cv2.equalizeHist(img[..., c]) for c in range(img.shape[2])], -1)


def _rand_augment_op(img: np.ndarray, op: str, mag: float, rng) -> np.ndarray:
    """One RandAugment op at signed magnitude ``mag`` in [0, 1] of its max
    (torchvision RandAugment op space / magnitude schedule)."""
    h, w = img.shape[:2]
    sign = -1.0 if rng.random() < 0.5 else 1.0
    border = (114, 114, 114)
    if op == "Identity":
        return img
    if op == "ShearX" or op == "ShearY":
        s = sign * mag * 0.3
        M = np.float32([[1, s if op == "ShearX" else 0, 0],
                        [s if op == "ShearY" else 0, 1, 0]])
        return cv2.warpAffine(img, M, (w, h), borderValue=border)
    if op == "TranslateX" or op == "TranslateY":
        t = sign * mag * 150.0 / 331.0 * (w if op == "TranslateX" else h)
        M = np.float32([[1, 0, t if op == "TranslateX" else 0],
                        [0, 1, t if op == "TranslateY" else 0]])
        return cv2.warpAffine(img, M, (w, h), borderValue=border)
    if op == "Rotate":
        M = cv2.getRotationMatrix2D((w / 2, h / 2), sign * mag * 30.0, 1.0)
        return cv2.warpAffine(img, M, (w, h), borderValue=border)
    if op == "Brightness":
        return _blend(img, np.zeros_like(img), 1.0 + sign * mag * 0.9)
    if op == "Color":
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[..., None].repeat(3, -1)
        return _blend(img, gray, 1.0 + sign * mag * 0.9)
    if op == "Contrast":
        mean = np.full_like(img, int(cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).mean()))
        return _blend(img, mean, 1.0 + sign * mag * 0.9)
    if op == "Sharpness":
        blur = cv2.GaussianBlur(img, (3, 3), 0)
        return _blend(img, blur, 1.0 + sign * mag * 0.9)
    if op == "Posterize":
        bits = 8 - int(round(mag * 4))
        lut = (np.arange(256, dtype=np.uint8) >> (8 - bits)) << (8 - bits)
        return lut[img]
    if op == "Solarize":
        thr = 255.0 - mag * 255.0
        return np.where(img >= thr, 255 - img, img)
    if op == "AutoContrast":
        return _autocontrast(img)
    if op == "Equalize":
        return _equalize(img)
    return img


_RA_OPS = ("Identity", "ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate",
           "Brightness", "Color", "Contrast", "Sharpness", "Posterize",
           "Solarize", "AutoContrast", "Equalize")


def rand_augment(img: np.ndarray, rng: np.random.Generator | None = None,
                 num_ops: int = 2, magnitude: int = 9) -> np.ndarray:
    """RandAugment (Cubuk et al. 2019; torchvision T.RandAugment defaults
    N=2, M=9 of 30) over the 14-op space — the reference's
    ``auto_augment='randaugment'`` policy (data/augment.py:2472)."""
    rng = rng or np.random.default_rng()
    mag = magnitude / 30.0
    for _ in range(num_ops):
        op = _RA_OPS[int(rng.integers(len(_RA_OPS)))]
        img = _rand_augment_op(img, op, mag, rng)
    return img


def augmix(img: np.ndarray, rng: np.random.Generator | None = None,
           severity: int = 3, mixture_width: int = 3, alpha: float = 1.0) -> np.ndarray:
    """AugMix (Hendrycks et al. 2020; torchvision T.AugMix) — the reference's
    ``auto_augment='augmix'`` policy: Dirichlet-weighted mix of augmented
    chains, skip-connected to the original with a Beta weight."""
    rng = rng or np.random.default_rng()
    ws = rng.dirichlet([alpha] * mixture_width).astype(np.float32)
    m = float(rng.beta(alpha, alpha))
    mag = severity / 10.0
    mix = np.zeros(img.shape, np.float32)
    # AugMix uses only color/geometry ops that don't include contrast-hurting
    # ones; the torchvision op set minus Identity works here
    ops = [o for o in _RA_OPS if o != "Identity"]
    for i in range(mixture_width):
        aug = img.copy()
        for _ in range(int(rng.integers(1, 4))):
            aug = _rand_augment_op(aug, ops[int(rng.integers(len(ops)))], mag, rng)
        mix += ws[i] * aug.astype(np.float32)
    out = (1 - m) * img.astype(np.float32) + m * mix
    return np.clip(out, 0, 255).astype(np.uint8)


def autoaugment_imagenet(img: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
    """AutoAugment ImageNet policy (Cubuk et al. 2018) — the reference's
    ``auto_augment='autoaugment'``: one sampled (op, p, mag) pair chain from
    the published 25-subpolicy table."""
    rng = rng or np.random.default_rng()
    # (op, probability, magnitude-index/10) pairs; subset of the ImageNet policy
    policy = [
        (("Posterize", 0.4, 8 / 10), ("Rotate", 0.6, 9 / 10)),
        (("Solarize", 0.6, 5 / 10), ("AutoContrast", 0.6, 0)),
        (("Equalize", 0.8, 0), ("Equalize", 0.6, 0)),
        (("Posterize", 0.6, 7 / 10), ("Posterize", 0.6, 6 / 10)),
        (("Equalize", 0.4, 0), ("Solarize", 0.2, 4 / 10)),
        (("Equalize", 0.4, 0), ("Rotate", 0.8, 8 / 10)),
        (("Solarize", 0.6, 3 / 10), ("Equalize", 0.6, 0)),
        (("Posterize", 0.8, 5 / 10), ("Equalize", 1.0, 0)),
        (("Rotate", 0.2, 3 / 10), ("Solarize", 0.6, 8 / 10)),
        (("Equalize", 0.6, 0), ("Posterize", 0.4, 6 / 10)),
        (("Rotate", 0.8, 8 / 10), ("Color", 0.4, 0)),
        (("Rotate", 0.4, 9 / 10), ("Equalize", 0.6, 0)),
        (("Equalize", 0.0, 0), ("Equalize", 0.8, 0)),
        (("Color", 0.6, 4 / 10), ("Contrast", 1.0, 8 / 10)),
        (("Color", 0.8, 8 / 10), ("Solarize", 0.8, 7 / 10)),
        (("Sharpness", 0.4, 7 / 10), ("Invert", 0.6, 0)),
        (("ShearX", 0.6, 5 / 10), ("Equalize", 1.0, 0)),
        (("Color", 0.4, 0), ("Equalize", 0.6, 0)),
    ]
    sub = policy[int(rng.integers(len(policy)))]
    for op, p, mag in sub:
        if rng.random() < p:
            if op == "Invert":
                img = 255 - img
            else:
                img = _rand_augment_op(img, op, mag, rng)
    return img


def random_erasing(img: np.ndarray, p: float = 0.4, scale=(0.02, 0.33),
                   ratio=(0.3, 3.3), rng: np.random.Generator | None = None) -> np.ndarray:
    """RandomErasing (Zhong et al. 2017; torchvision T.RandomErasing — the
    reference applies it post-normalize with value=0, data/augment.py:2502;
    on uint8 pre-normalize the equivalent fill is the ImageNet mean 124/116/104)."""
    rng = rng or np.random.default_rng()
    if rng.random() >= p:
        return img
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target = area * rng.uniform(*scale)
        ar = math.exp(rng.uniform(math.log(ratio[0]), math.log(ratio[1])))
        eh = int(round(math.sqrt(target / ar)))
        ew = int(round(math.sqrt(target * ar)))
        if eh < h and ew < w:
            y0 = int(rng.integers(0, h - eh + 1))
            x0 = int(rng.integers(0, w - ew + 1))
            img = img.copy()
            img[y0: y0 + eh, x0: x0 + ew] = (124, 116, 104)
            return img
    return img


def color_jitter(img: np.ndarray, brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.4, hue: float = 0.015,
                 rng: np.random.Generator | None = None) -> np.ndarray:
    """torchvision ColorJitter equivalent (reference uses it when auto_augment
    is off, data/augment.py:2497): random-order brightness/contrast/saturation
    factor blends + hue rotation."""
    rng = rng or np.random.default_rng()
    order = rng.permutation(4)
    for t in order:
        if t == 0 and brightness > 0:
            img = _blend(img, np.zeros_like(img), rng.uniform(max(0, 1 - brightness), 1 + brightness))
        elif t == 1 and contrast > 0:
            mean = np.full_like(img, int(cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).mean()))
            img = _blend(img, mean, rng.uniform(max(0, 1 - contrast), 1 + contrast))
        elif t == 2 and saturation > 0:
            gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[..., None].repeat(3, -1)
            img = _blend(img, gray, rng.uniform(max(0, 1 - saturation), 1 + saturation))
        elif t == 3 and hue > 0:
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
            shift = rng.uniform(-hue, hue) * 180
            hsv[..., 0] = (hsv[..., 0].astype(np.int32) + int(shift)) % 180
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    return img


def classify_train_transform(img: np.ndarray, size: int, rng: np.random.Generator,
                             scale=(0.08, 1.0), hflip: float = 0.5, vflip: float = 0.0,
                             auto_augment: str | None = "randaugment",
                             hsv_h: float = 0.015, hsv_s: float = 0.4, hsv_v: float = 0.4,
                             erasing: float = 0.0,
                             force_color_jitter: bool = False) -> np.ndarray:
    """Train-time classify pipeline (reference classify_augmentations,
    data/augment.py:2405): RandomResizedCrop -> flips -> auto-augment policy
    (color jitter when no policy) -> RandomErasing."""
    img = random_resized_crop(img, size, scale=scale, rng=rng)
    if hflip > 0 and rng.random() < hflip:
        img = np.ascontiguousarray(img[:, ::-1])
    if vflip > 0 and rng.random() < vflip:
        img = np.ascontiguousarray(img[::-1])
    jitter = force_color_jitter or not auto_augment
    if auto_augment == "randaugment":
        img = rand_augment(img, rng)
    elif auto_augment == "augmix":
        img = augmix(img, rng)
    elif auto_augment == "autoaugment":
        img = autoaugment_imagenet(img, rng)
    if jitter:
        img = color_jitter(img, brightness=hsv_v, contrast=hsv_v,
                           saturation=hsv_s, hue=hsv_h, rng=rng)
    if erasing > 0:
        img = random_erasing(img, p=erasing, rng=rng)
    return img
