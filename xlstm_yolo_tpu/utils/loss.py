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
import numpy as np

from ..ops.anchors import bbox2dist, dfl_decode, dist2bbox, make_anchors
from ..ops.boxes import bbox_iou
from . import tal


class DetectionLossOut(NamedTuple):
    total: jnp.ndarray
    box: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray


def _bce_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross-entropy with logits (sum-none).

    Element math upcasts to fp32 in-register (fuses into the surrounding
    pass — no fp32 materialization of bf16 inputs) so downstream reductions
    accumulate fp32 whatever dtype the model streams in."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def df_loss(pred_dist: jnp.ndarray, target: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Distribution focal loss (reference utils/loss.py:65-88).

    Args:
        pred_dist: (..., 4 * reg_max) RAW logits in the natural lane layout;
            target: (..., 4) continuous in [0, reg_max-1).
    Returns:
        (...,) mean over the 4 sides.

    TPU notes (tools/loss_profile.py, B128): the original
    (..., 4, reg_max)-shaped form cost 169 ms — the reshape pads reg_max=16
    lanes to 128 (8x bytes) and the two take_along_axis gathers select
    lanes per element. Here everything stays 64-lane: the left/right bin
    weights ARE the hat function max(0, 1 - |bin - t|) (targets are clipped
    to reg_max-1-0.01 upstream, so the right tap never clamps), and the
    per-group log-sum-exp reduces through a thin group matmul with a shared
    row shift that cancels.
    """
    from ..ops.anchors import _dfl_group_mats

    x = pred_dist.astype(jnp.float32)
    G, _ = _dfl_group_mats(reg_max)
    # R: (4, 4*reg_max) broadcast of each side's target across its lanes
    R = G.T
    t64 = target @ R  # (..., 4*reg_max)
    bins = jnp.tile(jnp.arange(reg_max, dtype=jnp.float32), 4)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(bins - t64))  # wl/wr hat weights
    c = jnp.max(x, axis=-1, keepdims=True)
    if pred_dist.dtype == jnp.bfloat16:
        # bf16 model path: the two (.., 64)-wide dot operands are the only
        # big materializations here — keep them bf16 (fp32 accumulate); see
        # dfl_decode for the bandwidth rationale
        Gb = G.astype(jnp.bfloat16)
        e = jnp.exp(x - c).astype(jnp.bfloat16)
        lse = jnp.log(jnp.dot(e, Gb, preferred_element_type=jnp.float32))
        wx = (w * (x - c)).astype(jnp.bfloat16)
        ce = -jnp.dot(wx, Gb, preferred_element_type=jnp.float32) + lse
    else:
        lse = jnp.log((jnp.exp(x - c) @ G))  # (..., 4), + c cancels below
        # CE_g = -(sum_j w_j (x_j - c)) + lse_g   (sum_j w_j = 1 per group)
        ce = -((w * (x - c)) @ G) + lse
    return jnp.mean(ce, axis=-1)


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
    from ..nn.heads import map_shape, split_maps

    b = map_shape(raw_maps[0])[0]
    feat_shapes = [map_shape(m)[1:3] for m in raw_maps]
    anchors, stride_t = make_anchors(feat_shapes, strides)  # (N,2), (N,1)

    # big (b, N, ·) planes stay in the MODEL's compute dtype (bf16 under the
    # production AMP step, fp32 in the parity tests) and the box/cls streams
    # stay SEPARATE (split_maps) — no 144-wide concat + unaligned slices.
    # Reductions/decodes accumulate fp32.
    pred_dist_logits, pred_scores_logits = split_maps(raw_maps, reg_max)

    pred_dist = dfl_decode(pred_dist_logits, reg_max).astype(jnp.float32)  # (b, N, 4)
    pred_bboxes = dist2bbox(pred_dist, anchors, xywh=False)  # grid units xyxy

    gt_labels = targets[..., :1]
    gt_bboxes = targets[..., 1:5]  # pixel xyxy

    # The reference runs assignment in pixel units (pred boxes scaled by
    # stride) and divides the assigned targets by stride afterwards
    # (utils/loss.py:224-244). Do the same.
    pred_bboxes_px = pred_bboxes * stride_t[None]
    anchors_px = anchors * stride_t  # (N, 2) pixel centers

    _, target_bboxes, target_scores, fg_mask, _ = tal.assign(
        pred_scores_logits,  # sigmoid applied inside, after class selection
        pred_bboxes_px,
        anchors_px,
        gt_labels,
        gt_bboxes,
        target_mask[..., None],
        topk=tal_topk,
        num_classes=nc,
        scores_are_logits=True,
    )

    target_scores_sum = jnp.maximum(jnp.sum(target_scores, dtype=jnp.float32), 1.0)

    # cls loss
    loss_cls = jnp.sum(_bce_logits(pred_scores_logits, target_scores)) / target_scores_sum

    # box + dfl, masked to foreground
    target_bboxes_g = target_bboxes / stride_t[None]
    fg = fg_mask.astype(jnp.float32)
    weight = jnp.sum(target_scores, axis=-1, dtype=jnp.float32) * fg  # (b, N)

    iou = bbox_iou(pred_bboxes, target_bboxes_g, xywh=False, CIoU=True)
    loss_box = jnp.sum((1.0 - iou) * weight) / target_scores_sum

    target_ltrb = bbox2dist(anchors, target_bboxes_g, reg_max - 1)
    dfl = df_loss(pred_dist_logits, target_ltrb, reg_max)
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


# ---------------------------------------------------------------------------
# segmentation (reference v8SegmentationLoss, utils/loss.py:263-443)
# ---------------------------------------------------------------------------

class SegmentationLossOut(NamedTuple):
    total: jnp.ndarray
    box: jnp.ndarray
    seg: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray


def _detection_core(raw_maps, targets, target_mask, strides, nc, reg_max, tal_topk=10):
    """Shared TAL + cls/box/dfl computation; returns the pieces the task
    losses compose (mirrors the duplicated block in every v8*Loss)."""
    from ..nn.heads import map_shape, split_maps

    b = map_shape(raw_maps[0])[0]
    feat_shapes = [map_shape(m)[1:3] for m in raw_maps]
    anchors, stride_t = make_anchors(feat_shapes, strides)
    pred_dist_logits, pred_scores_logits = split_maps(raw_maps, reg_max)
    pred_dist = dfl_decode(pred_dist_logits, reg_max).astype(jnp.float32)
    pred_bboxes = dist2bbox(pred_dist, anchors, xywh=False)

    _, target_bboxes, target_scores, fg_mask, target_gt_idx = tal.assign(
        pred_scores_logits, pred_bboxes * stride_t[None], anchors * stride_t,
        targets[..., :1], targets[..., 1:5], target_mask[..., None],
        topk=tal_topk, num_classes=nc, scores_are_logits=True,
    )
    tss = jnp.maximum(jnp.sum(target_scores, dtype=jnp.float32), 1.0)
    loss_cls = jnp.sum(_bce_logits(pred_scores_logits, target_scores)) / tss

    tb_g = target_bboxes / stride_t[None]
    fg = fg_mask.astype(jnp.float32)
    weight = jnp.sum(target_scores, axis=-1, dtype=jnp.float32) * fg
    iou = bbox_iou(pred_bboxes, tb_g, xywh=False, CIoU=True)
    loss_box = jnp.sum((1.0 - iou) * weight) / tss
    target_ltrb = bbox2dist(anchors, tb_g, reg_max - 1)
    dfl = df_loss(pred_dist_logits, target_ltrb, reg_max)
    loss_dfl = jnp.sum(dfl * weight) / tss
    return dict(
        loss_cls=loss_cls, loss_box=loss_box, loss_dfl=loss_dfl, fg_mask=fg_mask,
        target_gt_idx=target_gt_idx, target_bboxes=target_bboxes, target_scores=target_scores,
        anchors=anchors, stride_t=stride_t, tss=tss, pred_bboxes=pred_bboxes,
    )


def segmentation_loss(
    out: dict,  # {"det": [...], "coefs": [...], "proto": (B, Hm, Wm, nm)}
    batch: dict,  # + "masks": (B, Hm, Wm) int overlap-encoded (0=bg, i+1=instance)
    strides: Sequence[float],
    nc: int,
    reg_max: int = 16,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    mask_topk: int = 32,
) -> SegmentationLossOut:
    """Detection loss + prototype-mask BCE.

    Static-shape adaptation of reference calculate_segmentation_loss
    (utils/loss.py:383-443): instead of looping over the ragged set of
    foreground anchors, the top ``mask_topk`` anchors per image (by assigned
    score) get their masks evaluated — padded slots carry zero weight.
    GT masks use the reference's overlap encoding (instance index per pixel).
    """
    core = _detection_core(out["det"], batch["cls_boxes"], batch["mask"], strides, nc, reg_max)
    b = out["proto"].shape[0]
    proto = out["proto"].astype(jnp.float32)  # (B, Hm, Wm, nm)
    hm, wm, nm = proto.shape[1], proto.shape[2], proto.shape[3]
    coefs = jnp.concatenate(
        [m.reshape(b, -1, m.shape[-1]) for m in out["coefs"]], axis=1
    ).astype(jnp.float32)  # (B, N, nm)

    fg = core["fg_mask"].astype(jnp.float32)
    weight_all = jnp.sum(core["target_scores"], axis=-1) * fg  # (B, N)
    k = min(mask_topk, weight_all.shape[1])
    top_w, top_idx = jax.lax.top_k(weight_all, k)  # (B, K)
    sel_valid = (jnp.take_along_axis(fg, top_idx, axis=1) > 0) & (top_w > 0)

    sel_coefs = jnp.take_along_axis(coefs, top_idx[..., None], axis=1)  # (B, K, nm)
    sel_gt_idx = jnp.take_along_axis(core["target_gt_idx"], top_idx, axis=1)  # (B, K)
    sel_boxes = jnp.take_along_axis(core["target_bboxes"], top_idx[..., None], axis=1)  # (B, K, 4) px

    # predicted masks (B, K, Hm, Wm)
    pred_masks = jnp.einsum("bkn,bhwn->bkhw", sel_coefs, proto, preferred_element_type=jnp.float32)
    gt_masks = (batch["masks"][:, None, :, :] == (sel_gt_idx + 1)[..., None, None]).astype(jnp.float32)

    # crop to the gt box in mask coords; normalize by box area (reference
    # single_mask_loss, utils/loss.py:354-377)
    from ..nn.heads import map_shape

    img_h = map_shape(out["det"][0])[1] * strides[0]
    img_w = map_shape(out["det"][0])[2] * strides[0]
    sx, sy = wm / img_w, hm / img_h
    mx1, my1, mx2, my2 = (sel_boxes[..., 0] * sx, sel_boxes[..., 1] * sy,
                          sel_boxes[..., 2] * sx, sel_boxes[..., 3] * sy)
    gx = jnp.arange(wm, dtype=jnp.float32)[None, None, None, :]
    gy = jnp.arange(hm, dtype=jnp.float32)[None, None, :, None]
    in_box = (
        (gx >= mx1[..., None, None]) & (gx < mx2[..., None, None])
        & (gy >= my1[..., None, None]) & (gy < my2[..., None, None])
    ).astype(jnp.float32)

    bce = _bce_logits(pred_masks, gt_masks) * in_box
    area = jnp.clip((mx2 - mx1) * (my2 - my1) / (wm * hm), 1e-4, None)  # normalized area
    per_anchor = jnp.mean(bce, axis=(2, 3)) / area  # (B, K)
    n_fg = jnp.maximum(jnp.sum(sel_valid), 1.0)
    loss_seg = jnp.sum(per_anchor * sel_valid) / n_fg

    box = core["loss_box"] * box_gain
    seg = loss_seg * box_gain
    cls = core["loss_cls"] * cls_gain
    dfl_l = core["loss_dfl"] * dfl_gain
    total = (box + seg + cls + dfl_l) * b
    return SegmentationLossOut(total, box, seg, cls, dfl_l)


# ---------------------------------------------------------------------------
# pose (reference v8PoseLoss + KeypointLoss, utils/loss.py:140,446-590)
# ---------------------------------------------------------------------------

OKS_SIGMA = (
    np.array([26, 25, 25, 35, 35, 79, 79, 72, 72, 62, 62, 107, 107, 87, 87, 89, 89]) / 1000.0
)


class PoseLossOut(NamedTuple):
    total: jnp.ndarray
    box: jnp.ndarray
    pose: jnp.ndarray
    kobj: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray


def pose_loss(
    out: dict,  # {"det": [...], "kpts": [...]}
    batch: dict,  # + "keypoints": (B, max_labels, K, 3) pixel xy + visibility
    strides: Sequence[float],
    nc: int,
    kpt_shape: tuple = (17, 3),
    reg_max: int = 16,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    pose_gain: float = 12.0,
    kobj_gain: float = 1.0,
) -> PoseLossOut:
    from ..nn.heads import map_shape

    core = _detection_core(out["det"], batch["cls_boxes"], batch["mask"], strides, nc, reg_max)
    b = map_shape(out["det"][0])[0]
    nk, nd = kpt_shape
    kmaps = jnp.concatenate(
        [m.reshape(b, -1, m.shape[-1]) for m in out["kpts"]], axis=1
    ).astype(jnp.float32)  # (B, N, nk*nd)
    n_anchors = kmaps.shape[1]
    pk = kmaps.reshape(b, n_anchors, nk, nd)
    anchors, stride_t = core["anchors"], core["stride_t"]
    # decode to pixels (reference kpts_decode, utils/loss.py:568)
    xy = (pk[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * stride_t[None, :, None, :]

    gt_k = batch["keypoints"].astype(jnp.float32)  # (B, M, nk, 3|2) pixels
    # one-hot MXU gather (TPU gather custom-calls run at single-digit GB/s
    # — tools/xprof_step.py; the (B, N, nk, 3) output makes this the worst
    # offender in the pose step): exact fp32 selection per anchor
    oh_idx = jax.nn.one_hot(core["target_gt_idx"], gt_k.shape[1], dtype=jnp.float32)
    sel_k = jnp.einsum("bam,bmkc->bakc", oh_idx, gt_k,
                       preferred_element_type=jnp.float32)  # (B, N, nk, ·)
    vis = (sel_k[..., 2] > 0).astype(jnp.float32) if nd == 3 and gt_k.shape[-1] > 2 else jnp.ones(sel_k.shape[:-1])

    tb = core["target_bboxes"]  # pixels
    area = jnp.clip((tb[..., 2] - tb[..., 0]) * (tb[..., 3] - tb[..., 1]), 1e-9, None)[..., None]
    sigmas = jnp.asarray(OKS_SIGMA if nk == 17 else np.ones(nk) / nk, jnp.float32)
    d2 = jnp.sum((xy - sel_k[..., :2]) ** 2, axis=-1)  # (B, N, nk)
    e = d2 / (2 * sigmas[None, None]) ** 2 / (area + 1e-9) / 2.0
    kpt_mask = vis * core["fg_mask"][..., None].astype(jnp.float32)
    kpt_loss_factor = kpt_mask.shape[-1] / (jnp.sum(kpt_mask, axis=-1, keepdims=True) + 1e-9)
    loss_pose = jnp.sum(kpt_loss_factor * (1 - jnp.exp(-e)) * kpt_mask) / jnp.maximum(
        jnp.sum(core["fg_mask"]), 1.0
    )
    if nd == 3:
        kobj_logits = pk[..., 2]
        loss_kobj = jnp.sum(
            _bce_logits(kobj_logits, vis) * core["fg_mask"][..., None]
        ) / jnp.maximum(jnp.sum(core["fg_mask"]) * nk, 1.0)
    else:
        loss_kobj = jnp.float32(0.0)

    box = core["loss_box"] * box_gain
    pose = loss_pose * pose_gain
    kobj = loss_kobj * kobj_gain
    cls = core["loss_cls"] * cls_gain
    dfl_l = core["loss_dfl"] * dfl_gain
    total = (box + pose + kobj + cls + dfl_l) * b
    return PoseLossOut(total, box, pose, kobj, cls, dfl_l)


# ---------------------------------------------------------------------------
# oriented boxes (reference v8OBBLoss, utils/loss.py:612-743)
# ---------------------------------------------------------------------------

class OBBLossOut(NamedTuple):
    total: jnp.ndarray
    box: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray


def obb_loss(
    out: dict,  # {"det": [...], "angle": [...]}
    batch: dict,  # "cls_boxes": (B, M, 6) = cls, cx, cy, w, h, angle (pixels)
    strides: Sequence[float],
    nc: int,
    reg_max: int = 16,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
) -> OBBLossOut:
    import math as _math

    from ..ops.anchors import dist2rbox
    from ..ops.boxes import probiou

    from ..nn.heads import map_shape, split_maps

    raw_maps = out["det"]
    b = map_shape(raw_maps[0])[0]
    feat_shapes = [map_shape(m)[1:3] for m in raw_maps]
    anchors, stride_t = make_anchors(feat_shapes, strides)
    pred_dist_logits, pred_scores_logits = split_maps(raw_maps, reg_max)
    angle_logits = jnp.concatenate(
        [m.reshape(b, -1, m.shape[-1]) for m in out["angle"]], axis=1
    ).astype(jnp.float32)
    pred_angle = (jax.nn.sigmoid(angle_logits) - 0.25) * _math.pi  # (B, N, 1)

    pred_dist = dfl_decode(pred_dist_logits, reg_max).astype(jnp.float32)
    pred_rbox = dist2rbox(pred_dist, pred_angle, anchors)  # (B, N, 4) cxcywh grid units

    gt = batch["cls_boxes"]
    gt_rbox = gt[..., 1:6]  # cx cy w h angle, pixels

    _, target_rbox, target_scores, fg_mask, _ = tal.assign_rotated(
        jax.nn.sigmoid(pred_scores_logits),
        jnp.concatenate([pred_rbox * stride_t[None], pred_angle], -1),
        anchors * stride_t,
        gt[..., :1], gt_rbox, batch["mask"][..., None],
        num_classes=nc,
    )
    tss = jnp.maximum(jnp.sum(target_scores, dtype=jnp.float32), 1.0)
    loss_cls = jnp.sum(_bce_logits(pred_scores_logits, target_scores)) / tss

    fg = fg_mask.astype(jnp.float32)
    weight = jnp.sum(target_scores, axis=-1, dtype=jnp.float32) * fg
    t_scaled = jnp.concatenate([target_rbox[..., :4] / stride_t[None], target_rbox[..., 4:5]], -1)
    iou = probiou(jnp.concatenate([pred_rbox, pred_angle], -1), t_scaled)
    loss_box = jnp.sum((1.0 - iou) * weight) / tss

    # dfl on the axis-aligned ltrb of the rotated target (reference
    # RotatedBboxLoss -> bbox2dist of xywh2xyxy(target))
    txy, twh = t_scaled[..., :2], t_scaled[..., 2:4]
    t_xyxy = jnp.concatenate([txy - twh / 2, txy + twh / 2], -1)
    target_ltrb = bbox2dist(anchors, t_xyxy, reg_max - 1)
    dfl = df_loss(pred_dist_logits, target_ltrb, reg_max)
    loss_dfl = jnp.sum(dfl * weight) / tss

    box = loss_box * box_gain
    cls = loss_cls * cls_gain
    dfl_l = loss_dfl * dfl_gain
    total = (box + cls + dfl_l) * b
    return OBBLossOut(total, box, cls, dfl_l)
