"""Detection-family heads (anchor-free, DFL box regression).

Re-design of reference ``nn/modules/head.py``: the head module emits raw
per-scale maps only (clean for the loss path); decoding to (B, N, 4+nc)
boxes is a standalone pure function (``decode_detections``), always
static-shape, so the predict path is head-raw -> decode -> fixed-shape NMS
with no python branching inside jit.

Layout: feature maps are NHWC; raw head output per scale is
(B, H, W, 4*reg_max + nc). Channel c2/c3 widths and bias initialization
mirror reference ``nn/modules/head.py:21-99``.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.anchors import dfl_decode, dist2bbox, dist2rbox, make_anchors
from .modules import ConvBN, DWConv


def _cls_bias_init(nc: int, stride: float):
    val = math.log(5 / nc / (640 / stride) ** 2)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, val, dtype)

    return init


def _box_bias_init(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


class Detect(nn.Module):
    """Anchor-free decoupled detect head (reference head.py:21).

    Call with a list of ``nl`` feature maps; returns a list of raw maps
    (B, H, W, 4*reg_max + nc). ``strides`` are only used for bias init.
    """

    nc: int = 80
    ch: tuple = ()
    reg_max: int = 16
    strides: tuple = (8, 16, 32)
    # False for yolo11/yolo12 graphs (reference nn/tasks.py:1191): the cls
    # branch becomes two DWConv+1x1 pairs instead of two full 3x3 convs
    legacy: bool = True

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            s = self.strides[i] if i < len(self.strides) else 8 * 2**i
            b = ConvBN(c2, 3, name=f"cv2_{i}_0")(x, train)
            b = ConvBN(c2, 3, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, bias_init=_box_bias_init, name=f"cv2_{i}_2")(b)
            if self.legacy:
                c = ConvBN(c3, 3, name=f"cv3_{i}_0")(x, train)
                c = ConvBN(c3, 3, name=f"cv3_{i}_1")(c, train)
            else:
                cx = x.shape[-1]
                c = ConvBN(cx, 3, g=cx, name=f"cv3_{i}_0_0")(x, train)
                c = ConvBN(c3, 1, name=f"cv3_{i}_0_1")(c, train)
                c = ConvBN(c3, 3, g=c3, name=f"cv3_{i}_1_0")(c, train)
                c = ConvBN(c3, 1, name=f"cv3_{i}_1_1")(c, train)
            c = nn.Conv(
                self.nc, (1, 1), use_bias=True, bias_init=_cls_bias_init(self.nc, s), name=f"cv3_{i}_2"
            )(c)
            # box and cls stay SEPARATE streams (see split_maps): the
            # reference concatenates here (head.py:53) only because torch's
            # loss slices it back apart; on TPU the concat + unaligned
            # re-slicing cost ~5 ms/step of relayout copies at B128
            outs.append((b, c))
        return outs


class Segment(nn.Module):
    """Segmentation head: Detect + mask-coefficient branch + prototype net
    (reference head.py:175)."""

    nc: int = 80
    nm: int = 32
    npr: int = 256
    ch: tuple = ()
    reg_max: int = 16
    strides: tuple = (8, 16, 32)
    legacy: bool = True

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        det = Detect(self.nc, self.ch, self.reg_max, self.strides, legacy=self.legacy, name="detect")(feats, train)
        # prototypes from the highest-resolution map (reference block.py Proto:
        # conv -> LEARNED 2x2 ConvTranspose upsample -> conv -> conv)
        p = ConvBN(self.npr, 3, name="proto_cv1")(feats[0], train)
        p = nn.ConvTranspose(self.npr, (2, 2), strides=(2, 2), padding="VALID",
                             use_bias=True, dtype=p.dtype, name="proto_up")(p)
        p = ConvBN(self.npr, 3, name="proto_cv2")(p, train)
        proto = ConvBN(self.nm, 1, name="proto_cv3")(p, train)
        c4 = max(self.ch[0] // 4, self.nm)
        coefs = []
        for i, x in enumerate(feats):
            y = ConvBN(c4, 3, name=f"cv4_{i}_0")(x, train)
            y = ConvBN(c4, 3, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(self.nm, (1, 1), name=f"cv4_{i}_2")(y)
            coefs.append(y)
        return {"det": det, "coefs": coefs, "proto": proto}


class Pose(nn.Module):
    """Pose head: Detect + keypoint branch (reference head.py:230)."""

    nc: int = 1
    kpt_shape: tuple = (17, 3)
    ch: tuple = ()
    reg_max: int = 16
    strides: tuple = (8, 16, 32)
    legacy: bool = True

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        det = Detect(self.nc, self.ch, self.reg_max, self.strides, legacy=self.legacy, name="detect")(feats, train)
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        kpts = []
        for i, x in enumerate(feats):
            y = ConvBN(c4, 3, name=f"cv4_{i}_0")(x, train)
            y = ConvBN(c4, 3, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(nk, (1, 1), name=f"cv4_{i}_2")(y)
            kpts.append(y)
        return {"det": det, "kpts": kpts}


class OBB(nn.Module):
    """Oriented-box head: Detect + angle branch (reference head.py:200)."""

    nc: int = 15
    ne: int = 1
    ch: tuple = ()
    reg_max: int = 16
    strides: tuple = (8, 16, 32)
    legacy: bool = True

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        det = Detect(self.nc, self.ch, self.reg_max, self.strides, legacy=self.legacy, name="detect")(feats, train)
        c4 = max(self.ch[0] // 4, self.ne)
        angles = []
        for i, x in enumerate(feats):
            y = ConvBN(c4, 3, name=f"cv4_{i}_0")(x, train)
            y = ConvBN(c4, 3, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(self.ne, (1, 1), name=f"cv4_{i}_2")(y)
            angles.append(y)
        return {"det": det, "angle": angles}


# ---------------------------------------------------------------------------
# decode (pure functions, static shape)
# ---------------------------------------------------------------------------

def flatten_maps(maps: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """List of (B, H, W, C) -> (B, sum(H*W), C)."""
    return jnp.concatenate([m.reshape(m.shape[0], -1, m.shape[-1]) for m in maps], axis=1)


def map_shape(m) -> tuple:
    """Shape of a per-scale det map that may be a (box, cls) pair."""
    return (m[0] if isinstance(m, (tuple, list)) else m).shape


def split_maps(raw_maps: Sequence, reg_max: int = 16):
    """Per-scale raw det maps -> (dist (B,N,4*reg_max), cls (B,N,nc)).

    Accepts per-scale (box_map, cls_map) TUPLES — the Detect head's native
    output, where box and cls come from separate conv branches — or legacy
    single (B, H, W, 4*reg_max + nc) arrays. Keeping the two streams
    separate end-to-end removes a 144-wide channel concat plus two
    lane-UNALIGNED slices per consumer (~5 ms/step of 'data formatting'
    copies at B128 in the round-5 XProf trace, tools/xprof_step.py)."""
    if isinstance(raw_maps[0], (tuple, list)):
        dist = jnp.concatenate(
            [bm.reshape(bm.shape[0], -1, bm.shape[-1]) for bm, _ in raw_maps], axis=1)
        cls = jnp.concatenate(
            [cm.reshape(cm.shape[0], -1, cm.shape[-1]) for _, cm in raw_maps], axis=1)
        return dist, cls
    x = flatten_maps(raw_maps)
    return x[..., : 4 * reg_max], x[..., 4 * reg_max :]


def decode_detections(
    raw_maps: Sequence[jnp.ndarray],
    strides: Sequence[float],
    nc: int,
    reg_max: int = 16,
) -> jnp.ndarray:
    """Raw per-scale maps -> (B, N, 4 + nc): xywh pixel boxes + sigmoid scores.

    Mirrors reference ``Detect._inference`` (head.py:100-131): DFL integral
    decode, dist2bbox around the anchor grid, scaled by stride; class logits
    through sigmoid.
    """
    feat_shapes = [map_shape(m)[1:3] for m in raw_maps]
    anchors, stride_t = make_anchors(feat_shapes, strides)
    box_logits, cls_logits = split_maps(raw_maps, reg_max)
    dist = dfl_decode(box_logits, reg_max)
    boxes = dist2bbox(dist, anchors, xywh=True) * stride_t
    return jnp.concatenate([boxes, jax.nn.sigmoid(cls_logits.astype(jnp.float32))], axis=-1)


def decode_obb(
    raw_maps: Sequence[jnp.ndarray],
    angle_maps: Sequence[jnp.ndarray],
    strides: Sequence[float],
    nc: int,
    reg_max: int = 16,
) -> jnp.ndarray:
    """OBB decode -> (B, N, 4 + nc + 1): (cx, cy, w, h) + scores + angle.

    Angle activation: (sigmoid - 0.25) * pi (reference head.py OBB.forward).
    """
    feat_shapes = [map_shape(m)[1:3] for m in raw_maps]
    anchors, stride_t = make_anchors(feat_shapes, strides)
    angle = (jax.nn.sigmoid(flatten_maps(angle_maps)) - 0.25) * math.pi
    box_logits, cls_logits = split_maps(raw_maps, reg_max)
    dist = dfl_decode(box_logits, reg_max)
    rbox = dist2rbox(dist, angle, anchors) * stride_t
    return jnp.concatenate([rbox, jax.nn.sigmoid(cls_logits.astype(jnp.float32)), angle], axis=-1)


def decode_keypoints(
    kpt_maps: Sequence[jnp.ndarray],
    strides: Sequence[float],
    kpt_shape: tuple = (17, 3),
) -> jnp.ndarray:
    """Keypoint decode -> (B, N, nk*3) pixel coords (reference head.py kpts_decode)."""
    feat_shapes = [m.shape[1:3] for m in kpt_maps]
    anchors, stride_t = make_anchors(feat_shapes, strides)
    y = flatten_maps(kpt_maps)
    b, n, _ = y.shape
    nk, nd = kpt_shape
    y = y.reshape(b, n, nk, nd)
    xy = (y[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * stride_t[None, :, None, :]
    if nd == 3:
        vis = jax.nn.sigmoid(y[..., 2:3])
        y = jnp.concatenate([xy, vis], axis=-1)
    else:
        y = xy
    return y.reshape(b, n, nk * nd)


class v10Detect(nn.Module):
    """YOLOv10 end-to-end head (reference head.py v10Detect): a one2many
    branch (NMS-trained the usual way) plus a one2one branch (top-1 TAL,
    NMS-free inference). cv3 uses the lightweight depthwise structure."""

    nc: int = 80
    ch: tuple = ()
    reg_max: int = 16
    strides: tuple = (8, 16, 32)

    def _branch(self, feats, tag: str, train: bool):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            s = self.strides[i] if i < len(self.strides) else 8 * 2**i
            b = ConvBN(c2, 3, name=f"{tag}_cv2_{i}_0")(x, train)
            b = ConvBN(c2, 3, name=f"{tag}_cv2_{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, bias_init=_box_bias_init,
                        name=f"{tag}_cv2_{i}_2")(b)
            # lightweight cls branch: dw3x3+pw per stage (reference v10Detect)
            c = ConvBN(x.shape[-1], 3, g=x.shape[-1], name=f"{tag}_cv3_{i}_0dw")(x, train)
            c = ConvBN(c3, 1, name=f"{tag}_cv3_{i}_0pw")(c, train)
            c = ConvBN(c3, 3, g=c3, name=f"{tag}_cv3_{i}_1dw")(c, train)
            c = ConvBN(c3, 1, name=f"{tag}_cv3_{i}_1pw")(c, train)
            c = nn.Conv(self.nc, (1, 1), use_bias=True,
                        bias_init=_cls_bias_init(self.nc, s), name=f"{tag}_cv3_{i}_2")(c)
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs

    @nn.compact
    def __call__(self, feats, train: bool = False):
        one2one = self._branch(feats, "one2one", train)
        if train or self.is_initializing():  # both branches must exist in params
            one2many = self._branch(feats, "one2many", train)
            return {"one2one": one2one, "one2many": one2many}
        return {"one2one": one2one}


def v10_postprocess(cands: jnp.ndarray, max_det: int = 300) -> jnp.ndarray:
    """NMS-free top-k over (anchor, class) pairs (reference head.py
    v10Detect/Detect.postprocess :151-172). cands: (B, N, 4+nc) xywh+scores.
    Returns (B, max_det, 6) xyxy conf cls."""
    from ..ops.boxes import xywh2xyxy

    b, n, no = cands.shape
    nc = no - 4
    scores = cands[..., 4:]
    flat = scores.reshape(b, n * nc)
    k = min(max_det, n * nc)
    topv, topi = jax.lax.top_k(flat, k)
    anchor = topi // nc
    cls = (topi % nc).astype(jnp.float32)
    boxes = jnp.take_along_axis(cands[..., :4], anchor[..., None], axis=1)
    return jnp.concatenate([xywh2xyxy(boxes), topv[..., None], cls[..., None]], -1)
