"""Detection losses, jnp, static-shape (padded GT layout).

Re-design of reference ``utils/loss.py`` (v8DetectionLoss :157, BboxLoss :91,
DFLoss :65). GT labels arrive pre-padded as (b, n_max, 5) = (cls, x1, y1, x2,
y2) in *pixel* units with a validity mask — the collate step pads instead of
concatenating ragged labels, which is exactly the layout the reference's own
``preprocess`` builds internally (utils/loss.py:180-195).

Loss gains follow cfg defaults: box 7.5, cls 0.5, dfl 1.5. Total is scaled by
batch size like the reference (loss.sum() * batch_size).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..ops.anchors import bbox2dist, dfl_decode, dist2bbox, make_anchors
from ..ops.boxes import bbox_iou
from . import tal


class DetectionLossOut(NamedTuple):
    total: jnp.ndarray
    box: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray


def _bce_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross-entropy with logits (sum-none)."""
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def df_loss(pred_dist: jnp.ndarray, target: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Distribution focal loss (reference utils/loss.py:65-88).

    Args:
        pred_dist: (..., 4, reg_max) logits; target: (..., 4) continuous in
            [0, reg_max-1].
    Returns:
        (...,) mean over the 4 sides.
    """
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist.astype(jnp.float32), axis=-1)
    ce_l = -jnp.take_along_axis(logp, jnp.clip(tl, 0, reg_max - 1)[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, jnp.clip(tr, 0, reg_max - 1)[..., None], axis=-1)[..., 0]
    return jnp.mean(ce_l * wl + ce_r * wr, axis=-1)


def detection_loss(
    raw_maps: Sequence[jnp.ndarray],  # per-scale (B, H, W, 4*reg_max + nc)
    targets: jnp.ndarray,  # (B, n_max, 5) = cls, xyxy pixels
    target_mask: jnp.ndarray,  # (B, n_max) bool
    strides: Sequence[float],
    nc: int,
    reg_max: int = 16,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    tal_topk: int = 10,
) -> DetectionLossOut:
    """v8 detection loss: BCE cls + CIoU box + DFL, TAL-assigned."""
    b = raw_maps[0].shape[0]
    feat_shapes = [m.shape[1:3] for m in raw_maps]
    anchors, stride_t = make_anchors(feat_shapes, strides)  # (N,2), (N,1)

    x = jnp.concatenate([m.reshape(b, -1, m.shape[-1]) for m in raw_maps], axis=1)
    pred_dist_logits = x[..., : 4 * reg_max].astype(jnp.float32)  # (b, N, 64)
    pred_scores_logits = x[..., 4 * reg_max :].astype(jnp.float32)  # (b, N, nc)

    pred_dist = dfl_decode(pred_dist_logits, reg_max)  # (b, N, 4)
    pred_bboxes = dist2bbox(pred_dist, anchors, xywh=False)  # grid units xyxy

    gt_labels = targets[..., :1]
    gt_bboxes = targets[..., 1:5]  # pixel xyxy

    # The reference runs assignment in pixel units (pred boxes scaled by
    # stride) and divides the assigned targets by stride afterwards
    # (utils/loss.py:224-244). Do the same.
    pred_bboxes_px = pred_bboxes * stride_t[None]
    anchors_px = anchors * stride_t  # (N, 2) pixel centers

    _, target_bboxes, target_scores, fg_mask, _ = tal.assign(
        jax.nn.sigmoid(pred_scores_logits),
        pred_bboxes_px,
        anchors_px,
        gt_labels,
        gt_bboxes,
        target_mask[..., None],
        topk=tal_topk,
        num_classes=nc,
    )

    target_scores_sum = jnp.maximum(jnp.sum(target_scores), 1.0)

    # cls loss
    loss_cls = jnp.sum(_bce_logits(pred_scores_logits, target_scores)) / target_scores_sum

    # box + dfl, masked to foreground
    target_bboxes_g = target_bboxes / stride_t[None]
    fg = fg_mask.astype(jnp.float32)
    weight = jnp.sum(target_scores, axis=-1) * fg  # (b, N)

    iou = bbox_iou(pred_bboxes, target_bboxes_g, xywh=False, CIoU=True)
    loss_box = jnp.sum((1.0 - iou) * weight) / target_scores_sum

    target_ltrb = bbox2dist(anchors, target_bboxes_g, reg_max)
    dfl = df_loss(pred_dist_logits.reshape(b, -1, 4, reg_max), target_ltrb, reg_max)
    loss_dfl = jnp.sum(dfl * weight) / target_scores_sum

    box = loss_box * box_gain
    cls = loss_cls * cls_gain
    dfl_l = loss_dfl * dfl_gain
    total = (box + cls + dfl_l) * b
    return DetectionLossOut(total=total, box=box, cls=cls, dfl=dfl_l)


def classification_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy classify loss (reference v8ClassificationLoss)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
