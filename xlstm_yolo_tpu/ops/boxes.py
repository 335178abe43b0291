"""Box geometry ops, pure jnp, fully vectorized and static-shape.

TPU-native re-design of the box utilities the reference keeps in
``utils/ops.py:412-658`` and ``utils/metrics.py:74-276`` (IoU family).
Everything here is jit-safe: no data-dependent shapes, no host syncs.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

EPS = 1e-7


# ---------------------------------------------------------------------------
# format conversions (reference: utils/ops.py xywh2xyxy & friends)
# ---------------------------------------------------------------------------

def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2) on the last axis."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h) on the last axis."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def xywhn2xyxy(x: jnp.ndarray, w: float, h: float, padw: float = 0.0, padh: float = 0.0) -> jnp.ndarray:
    """Normalized (cx,cy,w,h) -> pixel (x1,y1,x2,y2)."""
    scale = jnp.asarray([w, h, w, h], dtype=x.dtype)
    pad = jnp.asarray([padw, padh, padw, padh], dtype=x.dtype)
    return xywh2xyxy(x * scale) + pad


def xyxy2xywhn(x: jnp.ndarray, w: float, h: float) -> jnp.ndarray:
    """Pixel (x1,y1,x2,y2) -> normalized (cx,cy,w,h)."""
    scale = jnp.asarray([w, h, w, h], dtype=x.dtype)
    return xyxy2xywh(x) / scale


def ltwh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    l, t, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([l, t, l + w, t + h], axis=-1)


def xyxy2ltwh(x: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def clip_boxes(boxes: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Clip xyxy boxes to image shape (h, w)."""
    h, w = shape
    lo = jnp.zeros((4,), dtype=boxes.dtype)
    hi = jnp.asarray([w, h, w, h], dtype=boxes.dtype)
    return jnp.clip(boxes, lo, hi)


def scale_boxes(
    boxes: jnp.ndarray,
    from_shape: tuple[int, int],
    to_shape: tuple[int, int],
    padded: bool = True,
) -> jnp.ndarray:
    """Rescale xyxy boxes from a letterboxed ``from_shape`` back to ``to_shape``.

    Mirrors reference ``utils/ops.py:92`` (scale_boxes): gain = min ratio,
    symmetric padding removed, then clipped to the target image.
    """
    gain = min(from_shape[0] / to_shape[0], from_shape[1] / to_shape[1])
    pad_w = round((from_shape[1] - to_shape[1] * gain) / 2 - 0.1)
    pad_h = round((from_shape[0] - to_shape[0] * gain) / 2 - 0.1)
    if padded:
        pad = jnp.asarray([pad_w, pad_h, pad_w, pad_h], dtype=boxes.dtype)
        boxes = boxes - pad
    boxes = boxes / gain
    return clip_boxes(boxes, to_shape)


# ---------------------------------------------------------------------------
# IoU family (reference: utils/metrics.py:74-276)
# ---------------------------------------------------------------------------

def box_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Pairwise IoU between (..., M, 4) and (..., N, 4) xyxy boxes -> (..., M, N)."""
    a = a[..., :, None, :]
    b = b[..., None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter + eps)


def bbox_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    eps: float = EPS,
) -> jnp.ndarray:
    """Elementwise IoU / GIoU / DIoU / CIoU over broadcastable boxes.

    Matches the math of reference ``utils/metrics.py:74`` (bbox_iou): CIoU adds
    center-distance and aspect-ratio penalty with the alpha trade-off term
    (alpha computed without gradient in the reference; under jax we use
    ``lax.stop_gradient`` for the same effect).
    """
    import jax

    if xywh:
        b1 = xywh2xyxy(box1)
        b2 = xywh2xyxy(box2)
    else:
        b1, b2 = box1, box2
    b1x1, b1y1, b1x2, b1y2 = jnp.split(b1, 4, axis=-1)
    b2x1, b2y1, b2x2, b2y2 = jnp.split(b2, 4, axis=-1)
    w1, h1 = b1x2 - b1x1, (b1y2 - b1y1) + eps
    w2, h2 = b2x2 - b2x1, (b2y2 - b2y1) + eps

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (GIoU or DIoU or CIoU):
        return iou.squeeze(-1)

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    if CIoU or DIoU:
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
        if CIoU:
            v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            alpha = v / (v - iou + (1 + eps))
            alpha = jax.lax.stop_gradient(alpha)
            out = iou - (rho2 / c2 + v * alpha)
        else:
            out = iou - rho2 / c2
        return out.squeeze(-1)
    c_area = cw * ch + eps
    return (iou - (c_area - union) / c_area).squeeze(-1)


def probiou(obb1: jnp.ndarray, obb2: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Probabilistic IoU between oriented boxes (cx, cy, w, h, angle).

    Gaussian-distribution distance form, reference ``utils/metrics.py:198``.
    Elementwise over broadcastable inputs.
    """
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _covariance(obb1)
    a2, b2, c2 = _covariance(obb2)

    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / (
        (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    ) * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps) * 0.5
    t3 = jnp.log(
        ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
        / (4 * jnp.sqrt(jnp.clip(a1 * b1 - c1**2, 0, None) * jnp.clip(a2 * b2 - c2**2, 0, None)) + eps)
        + eps
    ) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    return 1 - hd


def batch_probiou(obb1: jnp.ndarray, obb2: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Pairwise probiou: (M, 5) x (N, 5) -> (M, N)."""
    return probiou(obb1[..., :, None, :], obb2[..., None, :, :], eps=eps)


def _covariance(obb: jnp.ndarray):
    """Gaussian covariance terms (a, b, c) of an oriented box."""
    w, h, r = obb[..., 2], obb[..., 3], obb[..., 4]
    a = (w**2) / 12.0
    b = (h**2) / 12.0
    cos, sin = jnp.cos(r), jnp.sin(r)
    cov_a = a * cos**2 + b * sin**2
    cov_b = a * sin**2 + b * cos**2
    cov_c = (a - b) * cos * sin
    return cov_a, cov_b, cov_c
