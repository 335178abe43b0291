"""Task-Aligned assignment, fully vectorized jnp (static shapes).

Re-design of reference ``utils/tal.py:14-330`` (TaskAlignedAssigner). The
reference operates on padded (bs, n_max_boxes, ...) tensors already — we keep
that layout end-to-end, so there is no CPU fallback or dynamic shape anywhere
(the reference needs an OOM fallback at tal.py:75-80; on TPU the whole
assignment is a handful of fused elementwise ops + one (b, n_max, n_anchors)
IoU tensor).

Alpha/beta defaults follow the fork (alpha=0.5, beta=6.0 from utils/loss.py:176).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou


def select_candidates_in_gts(xy_centers: jnp.ndarray, gt_bboxes: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Anchors whose center lies inside each GT box.

    Args:
        xy_centers: (n_anchors, 2); gt_bboxes: (b, n_max, 4) xyxy.
    Returns:
        (b, n_max, n_anchors) bool.
    """
    lt = gt_bboxes[..., None, :2]  # (b, n_max, 1, 2)
    rb = gt_bboxes[..., None, 2:]
    deltas = jnp.concatenate(
        [xy_centers[None, None] - lt, rb - xy_centers[None, None]], axis=-1
    )  # (b, n_max, n_anchors, 4)
    return jnp.min(deltas, axis=-1) > eps


def topk_positive_mask(candidate_metric: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k-by-metric membership mask over the last axis, positives only.

    Computed as a kth-value THRESHOLD: k-1 fused max+suppress passes find the
    kth-largest metric per row; membership is then one comparison. This
    replaces the reference shape lax.top_k (a full sort on TPU) + scatter-add
    one-hot, which together dominated the whole train step at B128
    (tools/train_step_profile.py: loss overhead 225 of 312 ms). Exact for
    distinct positive metrics; a positive tie at the kth value admits both
    anchors where the reference breaks it by index — measure-zero with
    real-valued metrics, and select_highest_overlaps resolves
    multi-assignment downstream anyway.

    The gate is strictly-positive, NOT "> eps": the reference's eps auto-mask
    is dead code — its caller passes topk_mask=mask_gt (tal.py:126), so
    candidates stay positive however small the align metric gets. An eps gate
    extinguishes assignment when predictions degrade (metric ~1e-21 for
    collapsed scores x tiny IoU^6), turning "predict background everywhere"
    into a stable training attractor (box/dfl grads vanish). ">0" keeps the
    in-GT restriction (candidate_metric arrives masked) while matching the
    reference's keep-alive behavior.
    """
    # k-1 max+suppress passes in plain XLA. An XProf device-lane trace
    # (tools/xprof_step.py, round 5) showed XLA fuses this chain to ~2 ms at
    # B128 while a hand-written single-HBM-pass Pallas kernel
    # (kernels/topk_pallas.py, kept for the record) ran at 2-7 GB/s — 15 ms
    # — because its in-VMEM lane-axis max iterations are VPU-serial. The
    # earlier wall-clock timings that motivated the kernel were inflated by
    # ~25 ms of axon relay readback latency per measurement.
    v = candidate_metric
    for _ in range(k - 1):
        row_max = jnp.max(v, axis=-1, keepdims=True)
        v = jnp.where(v >= row_max, -jnp.inf, v)
    kth = jnp.maximum(jnp.max(v, axis=-1, keepdims=True), 0.0)
    return ((candidate_metric >= kth) & (candidate_metric > 0.0)).astype(candidate_metric.dtype)


def select_highest_overlaps(mask_pos: jnp.ndarray, overlaps: jnp.ndarray, n_max_boxes: int):
    """Resolve anchors matched to multiple GTs: keep the highest-IoU GT.

    Args:
        mask_pos: (b, n_max, n_anchors) float/bool; overlaps same shape.
    Returns:
        target_gt_idx (b, n_anchors), fg_mask (b, n_anchors), mask_pos resolved.
    """
    fg_count = jnp.sum(mask_pos, axis=-2)  # (b, n_anchors)
    multi = fg_count > 1
    best_gt = jnp.argmax(jnp.where(mask_pos > 0, overlaps, -1.0), axis=-2)  # (b, n_anchors)
    onehot_best = jax.nn.one_hot(best_gt, n_max_boxes, axis=-2, dtype=mask_pos.dtype)
    mask_pos = jnp.where(multi[:, None, :], onehot_best * (fg_count[:, None, :] > 0), mask_pos)
    fg_mask = jnp.sum(mask_pos, axis=-2) > 0
    target_gt_idx = jnp.argmax(mask_pos, axis=-2)
    return target_gt_idx, fg_mask, mask_pos


@partial(jax.jit, static_argnames=("topk", "num_classes", "alpha", "beta",
                                   "scores_are_logits"))
def assign(
    pd_scores: jnp.ndarray,  # (b, n_anchors, nc) sigmoid scores (or logits)
    pd_bboxes: jnp.ndarray,  # (b, n_anchors, 4) xyxy (grid units)
    anc_points: jnp.ndarray,  # (n_anchors, 2)
    gt_labels: jnp.ndarray,  # (b, n_max, 1) int
    gt_bboxes: jnp.ndarray,  # (b, n_max, 4) xyxy (grid units)
    mask_gt: jnp.ndarray,  # (b, n_max, 1) bool/float — valid GT slots
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
    scores_are_logits: bool = False,
):
    """Task-aligned one-stage assignment.

    Returns:
        target_labels (b, n_anchors) int, target_bboxes (b, n_anchors, 4),
        target_scores (b, n_anchors, nc), fg_mask (b, n_anchors) bool,
        target_gt_idx (b, n_anchors) int.
    """
    # assignment is a no-grad operation: the reference detaches predictions
    # before every assigner call (utils/loss.py:228 pred_scores.detach(),
    # pred_bboxes.detach()). Without this, gradients flow through the
    # target side (targets ∝ score^α · IoU^β) and gradient descent learns to
    # SUPPRESS the targets — all loss terms fall to ~0 while the model
    # detects nothing (verified: 240 matched SGD steps, torch reaches
    # eval scores 0.92-0.998, un-detached jax collapses to 1e-4).
    pd_scores = jax.lax.stop_gradient(pd_scores)
    pd_bboxes = jax.lax.stop_gradient(pd_bboxes)
    b, n_anchors, nc = pd_scores.shape
    n_max = gt_bboxes.shape[1]
    # every (b, n_max, n_anchors)-sized tensor below is materialized in the
    # MODEL's compute dtype (bf16 under the AMP train step, fp32 in parity
    # tests) — at B128 each such plane is 137 MB fp32 and this chip's
    # effective HBM bandwidth is ~60 GB/s, so bytes dominate the assign cost.
    # bf16 shares fp32's exponent range (no underflow of score^a * iou^b);
    # only ranking ties shift, which select_highest_overlaps resolves anyway.
    dt = pd_scores.dtype
    mask_gt = mask_gt.astype(dt)[..., 0]  # (b, n_max)

    # --- alignment metric: score(gt class)^alpha * ciou^beta -----------------
    gt_cls = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, nc - 1)  # (b, n_max)
    # scores of each anchor at each gt's class, as a one-hot MXU contraction
    # over nc: (b, n_max, nc) @ (b, n_anchors, nc) -> (b, n_max, n_anchors).
    # The take_along_axis form needed a (b, nc, n_anchors) transpose copy +
    # a per-element gather (8.0 of the 21.5 ms assign, tools/loss_profile.py)
    oh = jax.nn.one_hot(gt_cls, nc, dtype=dt)
    bbox_scores = jnp.einsum("bmc,bac->bma", oh, pd_scores,
                             preferred_element_type=jnp.float32).astype(dt)
    if scores_are_logits:
        # one-hot selection is exact (0/1 weights pick one logit), and
        # sigmoid(select(logits)) == select(sigmoid(logits)) — applying it
        # AFTER the contraction skips materializing the full
        # (b, n_anchors, nc) sigmoid plane (344 MB fp32 / 172 MB bf16 at
        # B128) that existed only to be row-selected here
        bbox_scores = jax.nn.sigmoid(bbox_scores)
    overlaps = jnp.clip(
        bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, CIoU=True), 0.0, None
    ).astype(dt)  # (b, n_max, n_anchors)
    # integer/half powers computed as multiplies/sqrt — jnp.power's exp·log
    # lowering is a transcendental per element on a (b, n_max, n_anchors)
    # tensor (defaults: alpha 0.5, beta 6.0)
    bs_c = jnp.clip(bbox_scores, eps, None)
    pow_s = jnp.sqrt(bs_c) if alpha == 0.5 else jnp.power(bs_c, alpha)
    if beta == 6.0:
        o2 = overlaps * overlaps
        pow_o = o2 * o2 * o2
    else:
        pow_o = jnp.power(overlaps, beta)
    align_metric = pow_s * pow_o

    # --- candidate selection --------------------------------------------------
    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes).astype(dt)
    candidate_metric = align_metric * mask_in_gts * mask_gt[..., None]

    # top-k per GT among candidates (reference select_topk_candidates),
    # computed as a kth-value THRESHOLD: k-1 fused max+suppress passes find
    # the kth-largest metric per (b, gt); membership is then one comparison.
    # This replaces lax.top_k (a full sort on TPU) + a scatter-add — together
    # they dominated the whole train step at B128 (tools/train_step_profile).
    # Exact for distinct positive metrics; a positive tie at the kth value
    # admits both anchors where the reference breaks it by index —
    # measure-zero with real-valued metrics, and downstream
    # select_highest_overlaps resolves multi-assignment anyway.
    mask_topk = topk_positive_mask(candidate_metric, min(topk, n_anchors))

    mask_pos = mask_topk * mask_in_gts * mask_gt[..., None]

    target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(mask_pos, overlaps, n_max)

    # --- build targets ---------------------------------------------------------
    # per-anchor GT gathers as one-hot MXU contractions: XLA lowers
    # take_along_axis to a gather custom-call that ran at 2-7 GB/s — 15.1 ms
    # of the 118 ms step at B128 (tools/xprof_step.py round 5). One-hot rows
    # are exact 0/1 selectors, n_max is tiny (32), so the contraction is
    # exact and effectively free on the MXU.
    # fp32 one-hot: the gathered PAYLOADS (pixel boxes, class ids) must not
    # quantize to bf16 — fp32 selection is exact for both
    oh_idx = jax.nn.one_hot(target_gt_idx, n_max, dtype=jnp.float32)
    target_labels = jnp.einsum(
        "bam,bm->ba", oh_idx, gt_cls.astype(jnp.float32),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    target_bboxes = jnp.einsum(
        "bam,bmc->bac", oh_idx, gt_bboxes.astype(jnp.float32),
        preferred_element_type=jnp.float32)
    target_scores = jax.nn.one_hot(target_labels, nc, dtype=dt)
    target_scores = target_scores * fg_mask[..., None].astype(dt)

    # normalize: per-GT max alignment scaled by per-GT max IoU (reference
    # tal.py:108-116); the per-GT maxima and the final ratio run fp32 —
    # (b, n_max, 1)-sized, so the upcast costs nothing
    align_metric = align_metric * mask_pos
    pos_align_max = jnp.max(align_metric, axis=-1, keepdims=True).astype(jnp.float32)
    pos_overlap_max = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True).astype(jnp.float32)
    norm_align = align_metric.astype(jnp.float32) * (
        pos_overlap_max / (pos_align_max + eps))  # (b, n_max, n_anchors)
    norm_per_anchor = jnp.max(norm_align, axis=-2)  # (b, n_anchors)
    target_scores = target_scores * norm_per_anchor[..., None].astype(dt)

    return target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx


# ---------------------------------------------------------------------------
# rotated-box variant (reference RotatedTaskAlignedAssigner, utils/tal.py:298)
# ---------------------------------------------------------------------------

def rbox_corners(rbox: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) = cx, cy, w, h, angle -> (..., 4, 2) corner points."""
    cx, cy, w, h, a = (rbox[..., i] for i in range(5))
    cos, sin = jnp.cos(a), jnp.sin(a)
    dx1, dy1 = (w / 2) * cos, (w / 2) * sin
    dx2, dy2 = -(h / 2) * sin, (h / 2) * cos
    p1 = jnp.stack([cx + dx1 + dx2, cy + dy1 + dy2], -1)
    p2 = jnp.stack([cx + dx1 - dx2, cy + dy1 - dy2], -1)
    p3 = jnp.stack([cx - dx1 - dx2, cy - dy1 - dy2], -1)
    p4 = jnp.stack([cx - dx1 + dx2, cy - dy1 + dy2], -1)
    return jnp.stack([p1, p2, p3, p4], axis=-2)


def select_candidates_in_rotated_gts(xy_centers: jnp.ndarray, gt_rboxes: jnp.ndarray) -> jnp.ndarray:
    """Anchors inside rotated GT boxes via the cross-product test
    (reference RotatedTaskAlignedAssigner.select_candidates_in_gts).

    Args:
        xy_centers (n_anchors, 2); gt_rboxes (b, n_max, 5).
    Returns:
        (b, n_max, n_anchors) bool.
    """
    corners = rbox_corners(gt_rboxes)  # (b, n_max, 4, 2)
    a, b_, _, d = (corners[..., i, :] for i in range(4))
    ab = b_ - a
    ad = d - a
    ap = xy_centers[None, None, :, :] - a[..., None, :]  # (b, n_max, n_anchors, 2)
    norm_ab = jnp.sum(ab * ab, axis=-1, keepdims=True)
    norm_ad = jnp.sum(ad * ad, axis=-1, keepdims=True)
    ap_dot_ab = jnp.sum(ap * ab[..., None, :], axis=-1)
    ap_dot_ad = jnp.sum(ap * ad[..., None, :], axis=-1)
    return (
        (ap_dot_ab >= 0) & (ap_dot_ab <= norm_ab) & (ap_dot_ad >= 0) & (ap_dot_ad <= norm_ad)
    )


@partial(jax.jit, static_argnames=("topk", "num_classes", "alpha", "beta"))
def assign_rotated(
    pd_scores: jnp.ndarray,  # (b, n_anchors, nc)
    pd_rboxes: jnp.ndarray,  # (b, n_anchors, 5) cx cy w h angle (pixel units)
    anc_points: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_rboxes: jnp.ndarray,  # (b, n_max, 5)
    mask_gt: jnp.ndarray,
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
):
    """Rotated TAL: align metric uses probiou, candidates use the rotated
    point-in-box test. Same output contract as assign() with 5-dim boxes."""
    from ..ops.boxes import probiou

    # no-grad, like assign() (reference detaches before every assigner call)
    pd_scores = jax.lax.stop_gradient(pd_scores)
    pd_rboxes = jax.lax.stop_gradient(pd_rboxes)
    b, n_anchors, nc = pd_scores.shape
    n_max = gt_rboxes.shape[1]
    mask_gt = mask_gt.astype(jnp.float32)[..., 0]

    gt_cls = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, nc - 1)
    oh = jax.nn.one_hot(gt_cls, nc, dtype=pd_scores.dtype)  # MXU gather (see assign)
    bbox_scores = jnp.einsum("bmc,bac->bma", oh, pd_scores,
                             preferred_element_type=jnp.float32)
    overlaps = jnp.clip(
        probiou(gt_rboxes[:, :, None, :], pd_rboxes[:, None, :, :]), 0.0, None
    )
    align_metric = jnp.power(jnp.clip(bbox_scores, eps, None), alpha) * jnp.power(overlaps, beta)

    mask_in_gts = select_candidates_in_rotated_gts(anc_points, gt_rboxes).astype(jnp.float32)
    candidate_metric = align_metric * mask_in_gts * mask_gt[..., None]
    mask_topk = topk_positive_mask(candidate_metric, min(topk, n_anchors))
    mask_pos = mask_topk * mask_in_gts * mask_gt[..., None]

    target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(mask_pos, overlaps, n_max)
    # one-hot MXU gathers (see assign): TPU gather custom-calls run at
    # single-digit GB/s; fp32 one-hot selection is exact
    oh_idx = jax.nn.one_hot(target_gt_idx, n_max, dtype=jnp.float32)
    target_labels = jnp.einsum(
        "bam,bm->ba", oh_idx, gt_cls.astype(jnp.float32),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    target_rboxes = jnp.einsum(
        "bam,bmc->bac", oh_idx, gt_rboxes.astype(jnp.float32),
        preferred_element_type=jnp.float32)
    target_scores = jax.nn.one_hot(target_labels, nc, dtype=jnp.float32)
    target_scores = target_scores * fg_mask[..., None].astype(jnp.float32)

    align_metric = align_metric * mask_pos
    pos_align_max = jnp.max(align_metric, axis=-1, keepdims=True)
    pos_overlap_max = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
    norm_align = align_metric * pos_overlap_max / (pos_align_max + eps)
    target_scores = target_scores * jnp.max(norm_align, axis=-2)[..., None]

    return target_labels, target_rboxes, target_scores, fg_mask, target_gt_idx
