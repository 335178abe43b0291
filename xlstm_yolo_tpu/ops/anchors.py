"""Anchor-free grid utilities + distribution-focal decode.

TPU-native equivalents of reference ``utils/tal.py:333-385`` (make_anchors,
dist2bbox, bbox2dist, dist2rbox) and the DFL integral decode used by the
Detect head (reference ``nn/modules/block.py:78``, ``nn/modules/head.py:100-131``).

All shapes are static: anchor grids are computed from python-int feature map
sizes at trace time, so under jit they are compile-time constants.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def make_anchors(feat_shapes, strides, grid_cell_offset: float = 0.5, dtype=jnp.float32):
    """Anchor centers + stride tensor from feature map shapes.

    Args:
        feat_shapes: sequence of (h, w) python ints per detection scale.
        strides: sequence of python numbers, one per scale.

    Returns:
        anchor_points: (sum(h*w), 2) in grid units (x, y).
        stride_tensor: (sum(h*w), 1).
    """
    anchor_points, stride_tensor = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + grid_cell_offset
        sy = jnp.arange(h, dtype=dtype) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        stride_tensor.append(jnp.full((h * w, 1), s, dtype=dtype))
    return jnp.concatenate(anchor_points), jnp.concatenate(stride_tensor)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray, xywh: bool = True, axis: int = -1) -> jnp.ndarray:
    """(l, t, r, b) distances + anchor centers -> boxes (xywh or xyxy)."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points: jnp.ndarray, bbox: jnp.ndarray, reg_max: float) -> jnp.ndarray:
    """xyxy boxes -> (l, t, r, b) distances, clipped to reg_max - 0.01."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1), 0, reg_max - 0.01
    )


def dist2rbox(pred_dist: jnp.ndarray, pred_angle: jnp.ndarray, anchor_points: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Decode rotated boxes from (l, t, r, b) + angle. Reference utils/tal.py:365."""
    lt, rb = jnp.split(pred_dist, 2, axis=axis)
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    xf, yf = jnp.split((rb - lt) / 2, 2, axis=axis)
    x, y = xf * cos - yf * sin, xf * sin + yf * cos
    xy = jnp.concatenate([x, y], axis=axis) + anchor_points
    return jnp.concatenate([xy, lt + rb], axis=axis)


def _dfl_group_mats(reg_max: int):
    """(4*reg_max, 4) group-sum and bin-weighted-sum matrices for the
    64-lane DFL layout (side g occupies lanes [g*reg_max, (g+1)*reg_max))."""
    G = np.zeros((4 * reg_max, 4), np.float32)
    P = np.zeros((4 * reg_max, 4), np.float32)
    for g in range(4):
        for j in range(reg_max):
            G[g * reg_max + j, g] = 1.0
            P[g * reg_max + j, g] = float(j)
    return jnp.asarray(G), jnp.asarray(P)


def dfl_decode(pred_dist: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Distribution Focal Loss integral decode.

    Args:
        pred_dist: (..., 4 * reg_max) raw logits.
    Returns:
        (..., 4) expected distances: softmax over each reg_max bin group,
        dotted with the bin index vector (reference ``nn/modules/block.py:78``).

    Kept in the 64-lane layout: a reshape to (..., 4, reg_max) puts reg_max
    on the lane axis (padded 16 -> 128, 8x the bytes) — at B128 that relayout
    made the decode cost 8.3 ms (tools/infer_profile.py). The per-group
    softmax is instead two thin matmuls: a shared row max cancels inside
    each group's exp-ratio.
    """
    x = pred_dist.astype(jnp.float32)
    c = jnp.max(x, axis=-1, keepdims=True)  # any per-row constant cancels
    e = jnp.exp(x - c)
    G, P = _dfl_group_mats(reg_max)
    if pred_dist.dtype == jnp.bfloat16:
        # bf16 model path: materialize the exp operand in bf16 (the (.., 64)
        # plane is 275 MB fp32 at B128 — this chip's effective HBM bandwidth
        # is ~60 GB/s, tools: /tmp bw probe r5, so bytes are the cost);
        # accumulate the thin dots in fp32
        e = e.astype(jnp.bfloat16)
        num = jnp.dot(e, P.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        den = jnp.dot(e, G.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return num / den
    return (e @ P) / (e @ G)
