"""RT-DETR — real-time detection transformer (reference ``models/rtdetr/`` +
``nn/modules/transformer.py`` + ``nn/modules/block.py`` HGStem/HGBlock).

NMS-free detector: HGNetv2-style backbone, AIFI transformer encoder on P5,
a deformable-attention decoder refining a top-k query set, Hungarian-matched
loss (reference ``models/utils/loss.py:13`` DETRLoss,
``models/utils/ops.py:12`` HungarianMatcher). TPU notes:
  * everything static-shape: queries fixed at num_queries; GT padded;
  * the Hungarian assignment runs on host through ``jax.pure_callback``
    (it returns indices only, so no gradients flow through it — same role
    as the reference's scipy call inside the loss);
  * deformable attention's grid_sample becomes a manual bilinear gather;
  * contrastive denoising (reference models/utils/ops.py:150 get_cdn_group)
    uses a STATIC number of denoising slots (2 * n_max * num_group) with a
    validity mask instead of the reference's per-batch dynamic group count,
    so the train step never retraces.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .modules import ConvBN


# ---------------------------------------------------------------------------
# backbone blocks (reference block.py HGStem / HGBlock)
# ---------------------------------------------------------------------------

class HGStem(nn.Module):
    """PPHGNetV2 stem: 5 convs + maxpool (reference block.py HGStem)."""

    cm: int
    c2: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.cm, 3, 2, act="relu", name="stem1")(x, train)
        x2 = ConvBN(self.cm // 2, 2, 1, p=0, act="relu", name="stem2a")(
            jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0))), train)
        x2 = ConvBN(self.cm, 2, 1, p=0, act="relu", name="stem2b")(
            jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0))), train)
        x1 = nn.max_pool(x, (2, 2), strides=(1, 1), padding=((0, 1), (0, 1)))
        x = jnp.concatenate([x1, x2], axis=-1)
        x = ConvBN(self.cm, 3, 2, act="relu", name="stem3")(x, train)
        return ConvBN(self.c2, 1, 1, act="relu", name="stem4")(x, train)


class HGBlock(nn.Module):
    """PPHGNetV2 block: n chained convs, concat, squeeze/excite convs
    (reference block.py HGBlock)."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ys = [x]
        for i in range(self.n):
            if self.lightconv:
                # LightConv (reference conv.py): 1x1 (no act) + depthwise k
                z = ConvBN(self.cm, 1, 1, act=False, name=f"m{i}_cv1")(ys[-1], train)
                z = ConvBN(self.cm, self.k, 1, g=self.cm, act="relu",
                           name=f"m{i}_cv2")(z, train)
                ys.append(z)
            else:
                ys.append(ConvBN(self.cm, self.k, 1, act="relu", name=f"m{i}")(ys[-1], train))
        y = jnp.concatenate(ys, axis=-1)
        y = ConvBN(self.c2 // 2, 1, 1, act="relu", name="sc")(y, train)
        y = ConvBN(self.c2, 1, 1, act="relu", name="ec")(y, train)
        return y + x if self.shortcut and x.shape[-1] == self.c2 else y


# ---------------------------------------------------------------------------
# AIFI encoder (reference transformer.py AIFI)
# ---------------------------------------------------------------------------

class AIFI(nn.Module):
    """Single transformer encoder layer over the flattened P5 map with 2D
    sincos position embedding."""

    c: int
    num_heads: int = 8
    cm: int = 1024

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        pos = _sincos_2d(h, w, c).astype(seq.dtype)
        q = k = seq + pos[None]
        attn = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, dtype=seq.dtype,
                                               name="mha")(q, k, seq)
        seq = nn.LayerNorm(name="norm1")(seq + attn)
        ff = nn.Dense(self.cm, dtype=seq.dtype, name="fc1")(seq)
        ff = nn.Dense(self.c, dtype=seq.dtype, name="fc2")(nn.gelu(ff))
        seq = nn.LayerNorm(name="norm2")(seq + ff)
        return seq.reshape(b, h, w, c)


def _sincos_2d(h: int, w: int, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """2D sincos pos embedding (reference AIFI.build_2d_sincos_position_embedding)."""
    gw, gh = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32),
                          indexing="xy")
    pos_dim = dim // 4
    omega = 1.0 / (temperature ** (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim))
    out_w = gw.reshape(-1)[:, None] * omega[None]
    out_h = gh.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate(
        [jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], axis=1
    )


# ---------------------------------------------------------------------------
# deformable attention (reference transformer.py MSDeformAttn)
# ---------------------------------------------------------------------------

def deform_sample(value: jnp.ndarray, shapes: Sequence, locs: jnp.ndarray,
                  weights: jnp.ndarray) -> jnp.ndarray:
    """Multi-scale deformable sampling.

    value: (B, L_total, NH, DH) flattened per-level features
    shapes: list of (h, w) per level (python ints)
    locs: (B, Q, NH, n_levels, n_points, 2) normalized [0, 1] xy
    weights: (B, Q, NH, n_levels * n_points)
    -> (B, Q, NH * DH)
    """
    b, _, nh, dh = value.shape
    q = locs.shape[1]
    n_points = locs.shape[4]
    out = []
    start = 0
    for li, (h, w) in enumerate(shapes):
        v = value[:, start : start + h * w].reshape(b, h, w, nh, dh)
        start += h * w
        xy = locs[:, :, :, li]  # (B, Q, NH, P, 2)
        fx = xy[..., 0] * w - 0.5
        fy = xy[..., 1] * h - 0.5
        x0 = jnp.clip(jnp.floor(fx), 0, w - 1).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(fy), 0, h - 1).astype(jnp.int32)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        ax = jnp.clip(fx - x0, 0.0, 1.0)[..., None]
        ay = jnp.clip(fy - y0, 0.0, 1.0)[..., None]

        def gather(yy, xx):
            # v: (B, H, W, NH, DH); indices (B, Q, NH, P)
            flat = v.reshape(b, h * w, nh, dh)
            idx = yy * w + xx  # (B, Q, NH, P)
            bidx = jnp.arange(b)[:, None, None, None]
            hidx = jnp.arange(nh)[None, None, :, None]
            return flat[bidx, idx, hidx]  # (B, Q, NH, P, DH)

        p00, p01 = gather(y0, x0), gather(y0, x1)
        p10, p11 = gather(y1, x0), gather(y1, x1)
        top = p00 + ax * (p01 - p00)
        bot = p10 + ax * (p11 - p10)
        out.append(top + ay * (bot - top))  # (B, Q, NH, P, DH)
    samples = jnp.concatenate(out, axis=3)  # (B, Q, NH, L*P, DH)
    w_ = weights.reshape(b, q, nh, -1, 1)
    return jnp.sum(samples * w_, axis=3).reshape(b, q, nh * dh)


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention (reference transformer.py MSDeformAttn)."""

    c: int
    num_heads: int = 8
    n_levels: int = 3
    n_points: int = 4

    @nn.compact
    def __call__(self, query, ref_points, value, shapes):
        """query (B, Q, C); ref_points (B, Q, 4) normalized cxcywh;
        value (B, L_total, C); shapes list of (h, w)."""
        b, q, c = query.shape
        nh, nl, npnt = self.num_heads, self.n_levels, self.n_points
        v = nn.Dense(self.c, dtype=value.dtype, name="value_proj")(value)
        v = v.reshape(b, -1, nh, c // nh)
        offsets = nn.Dense(nh * nl * npnt * 2, kernel_init=nn.initializers.zeros,
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(b, q, nh, nl, npnt, 2)
        weights = nn.Dense(nh * nl * npnt, kernel_init=nn.initializers.zeros,
                           name="attention_weights")(query)
        weights = jax.nn.softmax(weights.reshape(b, q, nh, nl * npnt).astype(jnp.float32), -1)
        weights = weights.astype(query.dtype)
        # sampling locations around reference box centers, scaled by box size
        centers = ref_points[:, :, None, None, None, :2]
        wh = ref_points[:, :, None, None, None, 2:]
        locs = centers + offsets / npnt * wh * 0.5
        out = deform_sample(v, shapes, locs, weights)
        return nn.Dense(self.c, dtype=query.dtype, name="output_proj")(out)


class DeformableDecoderLayer(nn.Module):
    """Self-attn + cross deformable attn + FFN (reference
    DeformableTransformerDecoderLayer)."""

    c: int
    num_heads: int = 8
    n_levels: int = 3
    n_points: int = 4
    cm: int = 1024

    @nn.compact
    def __call__(self, x, ref_points, value, shapes, query_pos, attn_mask=None):
        q = k = x + query_pos
        sa = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, dtype=x.dtype,
                                             name="self_attn")(q, k, x, mask=attn_mask)
        x = nn.LayerNorm(name="norm1")(x + sa)
        ca = MSDeformAttn(self.c, self.num_heads, self.n_levels, self.n_points,
                          name="cross_attn")(x + query_pos, ref_points, value, shapes)
        x = nn.LayerNorm(name="norm2")(x + ca)
        ff = nn.Dense(self.c, dtype=x.dtype, name="fc2")(
            nn.relu(nn.Dense(self.cm, dtype=x.dtype, name="fc1")(x)))
        return nn.LayerNorm(name="norm3")(x + ff)


class MLPHead(nn.Module):
    hidden: int
    out: int
    layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=x.dtype, name=f"l{i}")(x))
        return nn.Dense(self.out, name=f"l{self.layers - 1}")(x)


def get_cdn_group(gt_cls, gt_cxcywh, mask, nc: int, key,
                  num_group: int = 3, cls_noise_ratio: float = 0.5,
                  box_noise_scale: float = 1.0):
    """Contrastive-denoising query groups (reference models/utils/ops.py:150).

    gt_cls (B, M) int; gt_cxcywh (B, M, 4) normalized; mask (B, M) validity.
    Builds ``num_group`` groups of 2*M slots each — first M positive (small
    noise, reconstruct the GT), second M negative (box shifted outward,
    classify as background). Returns
      dn_cls (B, D) int, dn_box (B, D, 4), dn_pos (B, D) 1.0 on positive
      valid slots, dn_valid (B, D), dn_gt_idx (B, D) gt slot per dn slot.
    All shapes static: D = 2 * M * num_group.
    """
    b, m = gt_cls.shape
    d = 2 * m * num_group
    k1, k2, k3, k4 = jax.random.split(key, 4)

    rep = lambda x: jnp.tile(x, (1, 2 * num_group) + (1,) * (x.ndim - 2))
    cls = rep(gt_cls)          # (B, D)
    box = rep(gt_cxcywh)       # (B, D, 4)
    valid = rep(mask)          # (B, D)
    gt_idx = jnp.tile(jnp.arange(m), 2 * num_group)[None].repeat(b, 0)
    # negative-half indicator: slots [M:2M) of each group
    neg = jnp.tile(jnp.concatenate([jnp.zeros(m), jnp.ones(m)]), num_group)[None]

    # class noise: flip a random subset to random classes (pos + neg alike)
    flip = jax.random.uniform(k1, (b, d)) < (cls_noise_ratio * 0.5)
    rand_cls = jax.random.randint(k2, (b, d), 0, nc)
    dn_cls = jnp.where(flip, rand_cls, cls)

    # box noise: jitter within ±0.5 wh for positives, (0.5, 1.5] wh for negatives
    wh = jnp.concatenate([box[..., 2:], box[..., 2:]], -1)  # (B, D, 4) w,h,w,h
    sign = jax.random.randint(k3, (b, d, 4), 0, 2) * 2.0 - 1.0
    u = jax.random.uniform(k4, (b, d, 4))
    scale = jnp.where(neg[..., None] > 0, u + 1.0, u)  # neg pushed outside the box
    xyxy = jnp.concatenate([box[..., :2] - box[..., 2:] / 2,
                            box[..., :2] + box[..., 2:] / 2], -1)
    xyxy = xyxy + sign * scale * (wh / 2) * box_noise_scale
    xyxy = jnp.clip(xyxy, 0.0, 1.0)
    dn_box = jnp.concatenate([(xyxy[..., :2] + xyxy[..., 2:]) / 2,
                              jnp.abs(xyxy[..., 2:] - xyxy[..., :2])], -1)

    dn_pos = valid * (1.0 - neg)
    return dn_cls, dn_box, dn_pos, valid, gt_idx


def cdn_attn_mask(num_dn: int, num_group: int, nq: int) -> jnp.ndarray:
    """(1, 1, D+nq, D+nq) bool self-attention mask: matching queries never see
    dn slots; each dn group sees only itself (+ matching queries)."""
    total = num_dn + nq
    gsz = num_dn // num_group
    allow = jnp.zeros((total, total), bool)
    allow = allow.at[num_dn:, num_dn:].set(True)  # matching <-> matching
    allow = allow.at[:num_dn, num_dn:].set(True)  # dn -> matching
    for g in range(num_group):
        s = g * gsz
        allow = allow.at[s : s + gsz, s : s + gsz].set(True)
    return allow[None, None]


class RTDETRDecoder(nn.Module):
    """Top-k query selection + iterative box refinement decoder
    (reference head.py RTDETRDecoder)."""

    nc: int = 80
    ch: tuple = ()
    hd: int = 256
    nq: int = 300
    ndl: int = 6
    nh: int = 8
    ndp: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False, dn=None):
        """dn (training only): (dn_cls (B,D) int, dn_box (B,D,4) cxcywh
        normalized, num_group) from :func:`get_cdn_group`; prepends D
        denoising queries with a group-blocking self-attention mask and
        returns their predictions under ``dn_boxes``/``dn_scores``."""
        b = feats[0].shape[0]
        shapes = [f.shape[1:3] for f in feats]
        # project each level to hd channels and flatten
        proj = [
            ConvBN(self.hd, 1, act=False, name=f"input_proj{i}")(f, train)
            for i, f in enumerate(feats)
        ]
        value = jnp.concatenate([p.reshape(b, -1, self.hd) for p in proj], axis=1)

        # anchors for every position/level (normalized cxcywh priors)
        anchors, valid_mask = _build_anchors(shapes, dtype=value.dtype)
        # enc_output bottleneck (Linear + LayerNorm) before query selection
        # (reference head.py RTDETRDecoder self.enc_output)
        features = nn.LayerNorm(name="enc_output_norm")(
            nn.Dense(self.hd, name="enc_output")(value * valid_mask))

        enc_scores = nn.Dense(self.nc, name="enc_score_head")(features)  # (B, L, nc)
        enc_boxes_delta = MLPHead(self.hd, 4, name="enc_bbox_head")(features)
        enc_boxes = jax.nn.sigmoid(enc_boxes_delta + _inv_sigmoid(anchors))  # (B, L, 4)

        # top-k query selection by max class score (clamped for tiny inputs)
        nq = min(self.nq, enc_scores.shape[1])
        topv, topi = jax.lax.top_k(jnp.max(enc_scores, axis=-1), nq)  # (B, nq)
        ref = jnp.take_along_axis(enc_boxes, topi[..., None], axis=1)  # (B, nq, 4)
        tgt = jnp.take_along_axis(features, topi[..., None], axis=1)  # (B, nq, hd)
        if train:
            # reference detaches the selected queries in training (:556-559)
            ref = jax.lax.stop_gradient(ref)
            tgt = jax.lax.stop_gradient(tgt)

        num_dn, attn_mask = 0, None
        if dn is not None:
            dn_cls, dn_box, num_group = dn
            num_dn = dn_cls.shape[1]
            dn_tgt = nn.Embed(self.nc, self.hd, name="denoising_class_embed")(dn_cls)
            tgt = jnp.concatenate([dn_tgt.astype(tgt.dtype), tgt], axis=1)
            ref = jnp.concatenate([dn_box.astype(ref.dtype), ref], axis=1)
            attn_mask = cdn_attn_mask(num_dn, num_group, nq)

        dec_out_b, dec_out_s = [], []
        x = tgt
        # ONE query_pos MLP shared by all decoder layers (reference
        # self.query_pos_head — not per-layer)
        query_pos_head = MLPHead(2 * self.hd, self.hd, 2, name="query_pos_head")
        for li in range(self.ndl):
            query_pos = query_pos_head(ref)
            x = DeformableDecoderLayer(self.hd, self.nh, len(feats), self.ndp,
                                       name=f"layer{li}")(x, ref, value, shapes, query_pos,
                                                          attn_mask)
            delta = MLPHead(self.hd, 4, name=f"bbox_head{li}")(x)
            ref = jax.nn.sigmoid(delta + _inv_sigmoid(ref))
            scores = nn.Dense(self.nc, name=f"score_head{li}")(x)
            dec_out_b.append(ref)
            dec_out_s.append(scores)
            ref = jax.lax.stop_gradient(ref)

        out = {
            "boxes": dec_out_b[-1][:, num_dn:],  # (B, nq, 4) normalized cxcywh
            "scores": dec_out_s[-1][:, num_dn:],  # (B, nq, nc) logits
            "aux_boxes": (jnp.stack(dec_out_b[:-1])[:, :, num_dn:]
                          if self.ndl > 1 else None),
            "aux_scores": (jnp.stack(dec_out_s[:-1])[:, :, num_dn:]
                           if self.ndl > 1 else None),
            "enc_boxes": enc_boxes,
            "enc_scores": enc_scores,
        }
        if num_dn:
            out["dn_boxes"] = dec_out_b[-1][:, :num_dn]
            out["dn_scores"] = dec_out_s[-1][:, :num_dn]
        return out


def _inv_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def _build_anchors(shapes, grid_size: float = 0.05, dtype=jnp.float32):
    anchors = []
    for i, (h, w) in enumerate(shapes):
        sy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        sx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        wh = jnp.full((h * w, 2), grid_size * (2.0**i), jnp.float32)
        anchors.append(jnp.concatenate([jnp.stack([gx, gy], -1).reshape(-1, 2), wh], -1))
    anchors = jnp.concatenate(anchors)[None]  # (1, L, 4)
    valid = ((anchors > 0.01) & (anchors < 0.99)).all(-1, keepdims=True)
    return anchors.astype(dtype), valid.astype(dtype)


# ---------------------------------------------------------------------------
# Hungarian-matched loss (reference models/utils/loss.py + ops.py)
# ---------------------------------------------------------------------------

def _host_hungarian(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Host callback: per-image Hungarian assignment on the padded cost.

    cost: (B, nq, n_max); n_valid: (B,) actual GT counts.
    Returns (B, n_max) int32: for each GT slot, the matched query index
    (or -1 for padding slots).
    """
    from scipy.optimize import linear_sum_assignment

    b, nq, n_max = cost.shape
    out = -np.ones((b, n_max), np.int32)
    for bi in range(b):
        n = int(n_valid[bi])
        if n == 0:
            continue
        rows, cols = linear_sum_assignment(cost[bi, :, :n])
        out[bi, cols] = rows.astype(np.int32)
    return out


def rtdetr_loss(out: dict, batch: dict, nc: int, imgsz: float,
                cls_gain: float = 1.0, l1_gain: float = 5.0, giou_gain: float = 2.0):
    """DETR loss: Hungarian matching + varifocal-style cls + L1 + GIoU
    (reference DETRLoss, models/utils/loss.py:13). Aux decoder layers and the
    encoder output share the same matcher (one call per output set)."""
    from ..ops.boxes import bbox_iou

    gt = batch["cls_boxes"]  # (B, M, 5) cls + xyxy pixels
    mask = batch["mask"].astype(jnp.float32)  # (B, M)
    n_valid = jnp.sum(mask, axis=1).astype(jnp.int32)
    gt_cls = gt[..., 0].astype(jnp.int32)
    gt_xyxy_n = gt[..., 1:5] / imgsz  # normalized
    gt_cxcywh = jnp.concatenate([
        (gt_xyxy_n[..., :2] + gt_xyxy_n[..., 2:]) / 2,
        gt_xyxy_n[..., 2:] - gt_xyxy_n[..., :2],
    ], -1)

    def one_level(boxes, scores):
        b, nq, _ = scores.shape
        m = gt.shape[1]
        prob = jax.nn.sigmoid(scores.astype(jnp.float32))
        cost_cls = -jnp.take_along_axis(
            prob, jnp.broadcast_to(gt_cls[:, None, :], (b, nq, m)), axis=-1
        )  # (B, nq, M): -p(class of gt j) at query i
        l1 = jnp.sum(jnp.abs(boxes[:, :, None, :] - gt_cxcywh[:, None, :, :]), -1)
        giou = bbox_iou(boxes[:, :, None, :], gt_cxcywh[:, None, :, :], xywh=True, GIoU=True)
        cost = cls_gain * cost_cls + l1_gain * l1 + giou_gain * (1 - giou)
        cost = jnp.where(mask[:, None, :] > 0, cost, 1e6)

        match = jax.pure_callback(
            _host_hungarian,
            jax.ShapeDtypeStruct((b, m), jnp.int32),
            jax.lax.stop_gradient(cost), n_valid, vmap_method="sequential",
        )  # (B, M) query index per gt (-1 pad); assignment is non-differentiable
        match_safe = jnp.clip(match, 0, nq - 1)
        matched_boxes = jnp.take_along_axis(boxes, match_safe[..., None], axis=1)  # (B, M, 4)

        l1_loss = jnp.sum(jnp.abs(matched_boxes - gt_cxcywh), -1)
        giou_loss = 1 - bbox_iou(matched_boxes, gt_cxcywh, xywh=True, GIoU=True)
        n_total = jnp.maximum(jnp.sum(mask), 1.0)
        box_loss = jnp.sum((l1_gain * l1_loss + giou_gain * giou_loss) * mask) / n_total

        # classification: VarifocalLoss with IoU-scaled targets (reference
        # DETRLoss._get_loss_class + VarifocalLoss, models/utils/loss.py:95
        # and utils/loss.py:16: gt_score = IoU(matched pred.detach(), gt);
        # weight = 0.75*p^2*(1-label) + gt_score*label; mean over queries,
        # sum, scaled by nq / num_gts). Scatter uses a dummy slot nq so
        # padded GT rows never clobber a real query.
        idx = jnp.where(mask > 0, match_safe, nq).astype(jnp.int32)  # (B, M)
        tq = jnp.full((b, nq + 1), nc, jnp.int32)
        tq = jax.vmap(lambda t, i, c: t.at[i].set(c))(tq, idx, gt_cls)
        iou_m = jnp.clip(
            bbox_iou(jax.lax.stop_gradient(matched_boxes), gt_cxcywh, xywh=True), 0.0, None
        )  # (B, M)
        gt_q = jnp.zeros((b, nq + 1), jnp.float32)
        gt_q = jax.vmap(lambda t, i, s: t.at[i].set(s))(gt_q, idx, iou_m)
        one_hot_q = jax.nn.one_hot(tq[:, :nq], nc + 1)[..., :nc]  # bg -> zero row
        gt_sc = gt_q[:, :nq, None] * one_hot_q
        logits = scores.astype(jnp.float32)
        ps = jax.nn.sigmoid(logits)
        w = 0.75 * ps * ps * (1.0 - one_hot_q) + gt_sc * one_hot_q
        bce = jnp.clip(logits, 0, None) - logits * gt_sc + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        cls_loss = cls_gain * jnp.sum(jnp.mean(bce * w, axis=1)) * nq / n_total
        return box_loss, cls_loss

    box_l, cls_l = one_level(out["boxes"], out["scores"])
    total = box_l + cls_l
    aux_terms = 0.0
    if out.get("aux_boxes") is not None:
        for i in range(out["aux_boxes"].shape[0]):
            bl, cl = one_level(out["aux_boxes"][i], out["aux_scores"][i])
            aux_terms = aux_terms + bl + cl
    total = total + aux_terms
    return total, {"box": box_l, "cls": cls_l, "aux": aux_terms}


def cdn_loss(out: dict, dn_meta: tuple, batch: dict, nc: int, imgsz: float,
             cls_gain: float = 1.0, l1_gain: float = 5.0, giou_gain: float = 2.0):
    """Denoising loss (reference RTDETRDetectionLoss, models/utils/loss.py:291):
    dn slots have a KNOWN gt assignment (identity via dn_gt_idx), so no
    Hungarian matching — positives reconstruct their GT box + class,
    negatives are classified as background."""
    from ..ops.boxes import bbox_iou

    if "dn_boxes" not in out:
        return 0.0, {}
    dn_pos, dn_valid, dn_gt_idx = dn_meta
    gt = batch["cls_boxes"]
    gt_cls = gt[..., 0].astype(jnp.int32)
    gt_xyxy_n = gt[..., 1:5] / imgsz
    gt_cxcywh = jnp.concatenate([
        (gt_xyxy_n[..., :2] + gt_xyxy_n[..., 2:]) / 2,
        gt_xyxy_n[..., 2:] - gt_xyxy_n[..., :2],
    ], -1)

    boxes, scores = out["dn_boxes"], out["dn_scores"].astype(jnp.float32)
    tgt_box = jnp.take_along_axis(gt_cxcywh, dn_gt_idx[..., None], axis=1)
    tgt_cls_idx = jnp.take_along_axis(gt_cls, dn_gt_idx, axis=1)

    l1 = jnp.sum(jnp.abs(boxes - tgt_box), -1)
    giou = 1 - bbox_iou(boxes, tgt_box, xywh=True, GIoU=True)
    n_pos = jnp.maximum(jnp.sum(dn_pos), 1.0)
    box_loss = jnp.sum((l1_gain * l1 + giou_gain * giou) * dn_pos) / n_pos

    # VarifocalLoss like the main branch (reference routes dn through the
    # same _get_loss_class): positives target their GT class at IoU score,
    # negatives (and padded slots, masked by dn_valid) are background
    nq_dn = scores.shape[1]
    tq = jnp.where(dn_pos > 0, tgt_cls_idx, nc)
    one_hot_q = jax.nn.one_hot(tq, nc + 1)[..., :nc]
    iou_dn = jnp.clip(bbox_iou(jax.lax.stop_gradient(boxes), tgt_box, xywh=True), 0.0, None)
    gt_sc = (iou_dn * dn_pos)[..., None] * one_hot_q
    ps = jax.nn.sigmoid(scores)
    w = (0.75 * ps * ps * (1.0 - one_hot_q) + gt_sc * one_hot_q) * dn_valid[..., None]
    bce = jnp.clip(scores, 0, None) - scores * gt_sc + jnp.log1p(jnp.exp(-jnp.abs(scores)))
    cls_loss = cls_gain * jnp.sum(jnp.mean(bce * w, axis=1)) * nq_dn / n_pos
    return box_loss + cls_loss, {"dn_box": box_loss, "dn_cls": cls_loss}


def rtdetr_postprocess(out: dict, imgsz: float, max_det: int = 300):
    """NMS-free postprocess (reference RTDETRValidator.postprocess): scores
    are per-class sigmoid; top-k over (query, class) pairs."""
    boxes = out["boxes"] * imgsz  # normalized cxcywh -> pixels
    scores = jax.nn.sigmoid(out["scores"].astype(jnp.float32))
    b, nq, nc = scores.shape
    flat = scores.reshape(b, nq * nc)
    k = min(max_det, nq * nc)
    topv, topi = jax.lax.top_k(flat, k)
    qi = topi // nc
    ci = (topi % nc).astype(jnp.float32)
    sel = jnp.take_along_axis(boxes, qi[..., None], axis=1)
    x1y1 = sel[..., :2] - sel[..., 2:] / 2
    x2y2 = sel[..., :2] + sel[..., 2:] / 2
    return jnp.concatenate([x1y1, x2y2, topv[..., None], ci[..., None]], -1)  # (B, k, 6)
