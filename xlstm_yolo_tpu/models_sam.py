"""SAM — promptable segmentation (reference ``models/sam/``: build.py,
modules/encoders.py ImageEncoderViT, PromptEncoder, MaskDecoder, predict.py).

Inference-only in the reference too; here the full architecture in flax:
  * ImageEncoderViT — patch embed + windowed/global attention blocks + neck
  * PromptEncoder   — point/box prompts -> sparse embeddings; dense no-mask
    embedding; random-Fourier positional encoding
  * MaskDecoder     — two-way transformer (token->image and image->token
    attention), mask tokens, IoU prediction head
  * SAMPredictor    — set_image / predict(points, boxes) flow

Weights must be converted from released SAM checkpoints
(utils/torch_import.py handles the tensor mapping conventions); the
architecture is exercised end-to-end with random weights in tests.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLPBlock(nn.Module):
    dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.mlp_dim, dtype=x.dtype)(x)
        return nn.Dense(self.dim, dtype=x.dtype)(nn.gelu(h))


def _get_rel_pos(rel_pos: jnp.ndarray, q_size: int, k_size: int) -> jnp.ndarray:
    """Slice/interpolate decomposed relative position embeddings
    (reference models/sam/modules/utils.py get_rel_pos)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos[None], (1, max_rel_dist, rel_pos.shape[-1]), method="linear")[0]
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class REAttention(nn.Module):
    """SAM ViT attention: fused qkv projection + decomposed relative position
    embeddings (reference models/sam/modules/blocks.py REAttention :1009,
    add_decomposed_rel_pos in modules/utils.py:238). Structured to accept real
    SAM checkpoint weights (qkv / proj / rel_pos_h / rel_pos_w)."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: tuple = (14, 14)

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        qkv = nn.Dense(3 * c, dtype=x.dtype, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, NH, S, hd)
        attn = (q * hd ** -0.5) @ jnp.swapaxes(k, -1, -2)  # (B, NH, S, S)
        if self.use_rel_pos:
            rph = self.param("rel_pos_h", nn.initializers.zeros,
                             (2 * self.input_size[0] - 1, hd))
            rpw = self.param("rel_pos_w", nn.initializers.zeros,
                             (2 * self.input_size[1] - 1, hd))
            Rh = _get_rel_pos(rph.astype(x.dtype), h, h)  # (h, h, hd)
            Rw = _get_rel_pos(rpw.astype(x.dtype), w, w)
            r_q = q.reshape(b, nh, h, w, hd)
            rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
            rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
            attn = (attn.reshape(b, nh, h, w, h, w)
                    + rel_h[..., :, None] + rel_w[..., None, :]
                    ).reshape(b, nh, h * w, h * w)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        y = (attn @ v).reshape(b, nh, h, w, hd).transpose(0, 2, 3, 1, 4)
        return nn.Dense(c, dtype=x.dtype, name="proj")(y.reshape(b, h, w, c))


class ViTBlock(nn.Module):
    """Transformer block with optional window attention (reference
    models/sam/modules/blocks.py Block :881)."""

    dim: int
    num_heads: int
    window_size: int = 0
    mlp_ratio: float = 4.0
    use_rel_pos: bool = True
    global_size: tuple = (64, 64)

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        ws = self.window_size
        if ws > 0:
            pad_h = (ws - h % ws) % ws
            pad_w = (ws - w % ws) % ws
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            hp, wp = h + pad_h, w + pad_w
            x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(-1, ws, ws, c)
        x = REAttention(
            self.dim, self.num_heads, use_rel_pos=self.use_rel_pos,
            input_size=(ws, ws) if ws > 0 else self.global_size, name="attn")(x)
        if ws > 0:
            x = x.reshape(b, hp // ws, wp // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b, hp, wp, c)[:, :h, :w]
        x = shortcut + x
        return x + MLPBlock(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(name="norm2")(x)
        )


class ImageEncoderViT(nn.Module):
    """ViT image encoder + neck to 256ch (reference encoders.py:ImageEncoderViT)."""

    img_size: int = 1024
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    window_size: int = 14
    global_attn_indexes: tuple = (2, 5, 8, 11)
    out_chans: int = 256

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) in [0, 1]
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), name="patch_embed")(x)
        h, w = x.shape[1:3]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.img_size // self.patch_size, self.img_size // self.patch_size, self.dim))
        if pos.shape[1:3] != (h, w):
            pos = jax.image.resize(pos, (1, h, w, self.dim), method="bicubic")
        x = x + pos
        gs = (self.img_size // self.patch_size, self.img_size // self.patch_size)
        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = ViTBlock(self.dim, self.num_heads, window_size=ws,
                         global_size=gs, name=f"block{i}")(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck0")(x)
        x = nn.LayerNorm(name="neck_ln0")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="neck1")(x)
        return nn.LayerNorm(name="neck_ln1")(x)  # (B, H/16, W/16, 256)


class PromptEncoder(nn.Module):
    """Point/box prompts -> embeddings (reference encoders.py PromptEncoder)."""

    embed_dim: int = 256

    def setup(self):
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, self.embed_dim // 2)
        )
        # 0: negative point, 1: positive point, 2: box corner 1, 3: box corner 2
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim)
        )
        self.not_a_point = self.param("not_a_point", nn.initializers.normal(1.0), (self.embed_dim,))
        self.no_mask_embed = self.param("no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,))

    def pe_encode(self, coords_01: jnp.ndarray) -> jnp.ndarray:
        """Random-Fourier positional encoding of [0,1] coords (..., 2)."""
        x = (2.0 * coords_01 - 1.0) @ self.pe_gaussian * (2 * jnp.pi)
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)

    def dense_pe(self, h: int, w: int) -> jnp.ndarray:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        return self.pe_encode(jnp.stack([gx, gy], -1))  # (H, W, C)

    def __call__(self, points=None, labels=None, boxes=None, img_size: float = 1024.0):
        """points (B, P, 2) px + labels (B, P) {1 pos, 0 neg, -1 pad};
        boxes (B, 2, 2) px corners. Returns sparse (B, T, C) + dense flag."""
        sparse = []
        if points is not None:
            pe = self.pe_encode(points / img_size)
            lab = labels[..., None]
            pe = jnp.where(lab == 1, pe + self.point_embeddings[1], pe)
            pe = jnp.where(lab == 0, pe + self.point_embeddings[0], pe)
            pe = jnp.where(lab == -1, self.not_a_point[None, None], pe)
            sparse.append(pe)
        if boxes is not None:
            pe = self.pe_encode(boxes / img_size)  # (B, 2, C)
            pe = pe + jnp.stack([self.point_embeddings[2], self.point_embeddings[3]])[None]
            sparse.append(pe)
        sparse = jnp.concatenate(sparse, axis=1) if sparse else jnp.zeros((1, 0, self.embed_dim))
        return sparse


class TwoWayAttentionBlock(nn.Module):
    """token<->image cross attention block (reference modules/transformer.py)."""

    dim: int
    num_heads: int = 8
    mlp_dim: int = 2048

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        attn = nn.MultiHeadDotProductAttention(self.num_heads, dtype=queries.dtype, name="self_attn")
        q = queries + query_pe
        queries = nn.LayerNorm(name="n1")(queries + attn(q, q, queries))
        cattn = nn.MultiHeadDotProductAttention(self.num_heads, dtype=queries.dtype, name="t2i")
        queries = nn.LayerNorm(name="n2")(
            queries + cattn(queries + query_pe, keys + key_pe, keys)
        )
        queries = nn.LayerNorm(name="n3")(queries + MLPBlock(self.dim, self.mlp_dim, name="mlp")(queries))
        iattn = nn.MultiHeadDotProductAttention(self.num_heads, dtype=queries.dtype, name="i2t")
        keys = nn.LayerNorm(name="n4")(keys + iattn(keys + key_pe, queries + query_pe, queries))
        return queries, keys


class MaskDecoder(nn.Module):
    """Two-way transformer + mask tokens + IoU head (reference
    modules/decoders.py MaskDecoder)."""

    dim: int = 256
    num_multimask: int = 3
    depth: int = 2

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse_prompt, dense_prompt):
        """image_embed (B, H, W, C); image_pe (H, W, C); sparse (B, T, C);
        dense (B, H, W, C). Returns (masks (B, M, 4H, 4W), iou (B, M))."""
        b, h, w, c = image_embed.shape
        n_tokens = self.num_multimask + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, c))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (n_tokens, c))
        tokens = jnp.concatenate([iou_token, mask_tokens])[None].repeat(b, 0)
        tokens = jnp.concatenate([tokens, sparse_prompt], axis=1)

        src = (image_embed + dense_prompt).reshape(b, h * w, c)
        pos = image_pe.reshape(1, h * w, c).repeat(b, 0)
        queries = tokens
        qpe = tokens
        for i in range(self.depth):
            queries, src = TwoWayAttentionBlock(c, name=f"block{i}")(queries, src, qpe, pos)
        fattn = nn.MultiHeadDotProductAttention(8, dtype=queries.dtype, name="final_t2i")
        queries = nn.LayerNorm(name="final_norm")(
            queries + fattn(queries + qpe, src + pos, src)
        )

        iou_out = queries[:, 0]
        mask_out = queries[:, 1 : 1 + n_tokens]  # (B, M, C)

        # upscale image features 4x (two transposed convs)
        up = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), name="up1")(src.reshape(b, h, w, c))
        up = nn.gelu(nn.LayerNorm(name="up_ln")(up))
        up = nn.gelu(nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2), name="up2")(up))

        hyper = []
        for m in range(n_tokens):
            hyper.append(MLPBlock(c // 8, c, name=f"hyper{m}")(mask_out[:, m]))
        hyper = jnp.stack(hyper, 1)  # (B, M, C/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)
        iou = nn.Dense(n_tokens, name="iou_head")(iou_out)
        return masks, iou


class SAM(nn.Module):
    """Full SAM model (reference models/sam/modules/sam.py)."""

    img_size: int = 1024
    encoder_dim: int = 768
    encoder_depth: int = 12

    def setup(self):
        self.image_encoder = ImageEncoderViT(
            img_size=self.img_size, dim=self.encoder_dim, depth=self.encoder_depth,
            num_heads=max(1, self.encoder_dim // 64),
        )
        self.prompt_encoder = PromptEncoder()
        self.mask_decoder = MaskDecoder()

    def encode_image(self, x):
        return self.image_encoder(x)

    def __call__(self, x, points=None, labels=None, boxes=None):
        emb = self.image_encoder(x)
        return self.decode(emb, points, labels, boxes)

    def decode(self, emb, points=None, labels=None, boxes=None):
        h, w = emb.shape[1:3]
        sparse = self.prompt_encoder(points, labels, boxes, img_size=float(self.img_size))
        dense = jnp.broadcast_to(
            self.prompt_encoder.no_mask_embed[None, None, None], emb.shape
        )
        image_pe = self.prompt_encoder.dense_pe(h, w)
        return self.mask_decoder(emb, image_pe, sparse, dense)


class SAMPredictor:
    """set_image / predict flow (reference models/sam/predict.py:37)."""

    def __init__(self, model: SAM | None = None, variables: dict | None = None,
                 img_size: int = 1024):
        self.model = model or SAM(img_size=img_size)
        self.variables = variables
        self.img_size = img_size
        self._embed = None
        self._orig_shape = None
        self._encode = jax.jit(lambda v, x: self.model.apply(v, x, method=self.model.encode_image))
        self._decode = jax.jit(
            lambda v, emb, p, l, bx: self.model.apply(v, emb, p, l, bx, method=self.model.decode)
        )

    def set_image(self, img: np.ndarray):
        """img: HWC uint8 RGB; letterboxed to the model size."""
        from .data.augment import letterbox

        self._orig_shape = img.shape[:2]
        lb, _, (r, px, py) = letterbox(img, self.img_size)
        self._meta = (r, px, py)
        x = jnp.asarray(lb, jnp.float32)[None] / 255.0
        self._embed = self._encode(self.variables, x)
        return self

    def predict(self, points=None, point_labels=None, boxes=None, multimask_output: bool = True):
        """points (P, 2)/boxes (4,) in ORIGINAL image pixels. Returns
        (masks (M, H, W) bool at original resolution, iou (M,))."""
        import cv2

        assert self._embed is not None, "call set_image first"
        r, px, py = self._meta
        p = l = bx = None
        if points is not None:
            p = (np.asarray(points, np.float32) * r + [px, py])[None]
            l = np.asarray(point_labels if point_labels is not None else np.ones(len(points)))[None]
        if boxes is not None:
            b = np.asarray(boxes, np.float32).reshape(2, 2) * r + [px, py]
            bx = b[None]
        masks, iou = self._decode(self.variables, self._embed, p, l, bx)
        masks = np.asarray(masks[0])  # (M, h4, w4)
        out = []
        oh, ow = self._orig_shape
        for m in masks:
            full = cv2.resize(m, (self.img_size, self.img_size), interpolation=cv2.INTER_LINEAR)
            crop = full[int(py) : self.img_size - int(py) or None, int(px) : self.img_size - int(px) or None]
            out.append(cv2.resize(crop, (ow, oh), interpolation=cv2.INTER_LINEAR) > 0)
        sel = slice(None) if multimask_output else slice(0, 1)
        return np.stack(out)[sel], np.asarray(iou[0])[sel]


# ---------------------------------------------------------------------------
# Automatic mask generation ("segment everything") — reference
# models/sam/predict.py:297-437 (Predictor.generate) + models/sam/amg.py
# helpers. TPU design: the point grid is processed in FIXED-size batches
# through ONE jitted decode that also does the conf/stability filtering and
# mask->box reduction on device (validity flags instead of ragged filtering);
# the host only runs the greedy NMS and final mask uncropping.
# ---------------------------------------------------------------------------

def build_point_grid(n_per_side: int) -> np.ndarray:
    """Uniform (n^2, 2) grid in [0,1]^2 (reference amg.py:62)."""
    offset = 1 / (2 * n_per_side)
    side = np.linspace(offset, 1 - offset, n_per_side)
    px = np.tile(side[None, :], (n_per_side, 1))
    py = np.tile(side[:, None], (1, n_per_side))
    return np.stack([px, py], -1).reshape(-1, 2)


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> list:
    """Per-crop-layer point grids (reference amg.py:71)."""
    return [build_point_grid(max(1, int(n_per_side / (scale_per_layer ** i))))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size: tuple, n_layers: int,
                        overlap_ratio: float) -> tuple:
    """Layered overlapping crop boxes in xyxy (reference amg.py:76)."""
    import math

    crop_boxes, layer_idxs = [[0, 0, im_size[1], im_size[0]]], [0]
    im_h, im_w = im_size
    short_side = min(im_h, im_w)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_side))
        cw, chh = crop_len(im_w, n_side, overlap), crop_len(im_h, n_side, overlap)
        for x0 in (int((cw - overlap) * i) for i in range(n_side)):
            for y0 in (int((chh - overlap) * j) for j in range(n_side)):
                crop_boxes.append([x0, y0, min(x0 + cw, im_w), min(y0 + chh, im_h)])
                layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def _masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """(N, h, w) bool -> (N, 4) xyxy in mask pixels; zeros for empty masks
    (reference amg.py batched_mask_to_box)."""
    n, h, w = masks.shape
    any_col = jnp.any(masks, axis=1)  # (N, w)
    any_row = jnp.any(masks, axis=2)  # (N, h)
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    x1 = jnp.min(jnp.where(any_col, xs, w), axis=1)
    x2 = jnp.max(jnp.where(any_col, xs, -1), axis=1) + 1
    y1 = jnp.min(jnp.where(any_row, ys, h), axis=1)
    y2 = jnp.max(jnp.where(any_row, ys, -1), axis=1) + 1
    empty = ~jnp.any(any_col, axis=1)
    box = jnp.stack([x1, y1, x2, y2], 1).astype(jnp.float32)
    return jnp.where(empty[:, None], 0.0, box)


def _greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> np.ndarray:
    """Host greedy NMS; returns kept indices (score order)."""
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(a + b - inter, 1e-9)
        order = rest[iou <= iou_thres]
    return np.asarray(keep, np.int64)


class SAMAutoMaskGenerator:
    """Grid-prompted "segment everything" on top of a SAMPredictor
    (reference Predictor.generate, models/sam/predict.py:297)."""

    def __init__(self, predictor: SAMPredictor, points_stride: int = 32,
                 points_batch_size: int = 64, conf_thres: float = 0.88,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 0.95,
                 iou_thres: float = 0.7, crop_nms_thresh: float = 0.7,
                 mask_threshold: float = 0.0):
        self.p = predictor
        self.points_stride = points_stride
        self.points_batch_size = points_batch_size
        self.conf_thres = conf_thres
        self.stab_thresh = stability_score_thresh
        self.stab_offset = stability_score_offset
        self.iou_thres = iou_thres
        self.crop_nms_thresh = crop_nms_thresh
        self.mask_threshold = mask_threshold
        model = predictor.model

        def batch_fn(variables, emb, pts, labels):
            """One fixed-size point batch: decode + filter + boxes, on device."""
            embb = jnp.broadcast_to(emb, (pts.shape[0],) + emb.shape[1:])
            masks, iou = model.apply(variables, embb, pts, labels, None,
                                     method=model.decode)
            n, m, mh, mw = masks.shape
            masks = masks.reshape(n * m, mh, mw)
            iou = iou.reshape(n * m)
            t = self.mask_threshold
            pos = (masks > (t + self.stab_offset)).sum((1, 2))
            neg = (masks > (t - self.stab_offset)).sum((1, 2))
            stab = pos / jnp.maximum(neg, 1)
            binm = masks > t
            boxes = _masks_to_boxes(binm)
            keep = ((iou > self.conf_thres) & (stab > self.stab_thresh)
                    & jnp.any(binm, axis=(1, 2)))
            return binm, iou, boxes, keep

        self._batch_fn = jax.jit(batch_fn)

    def generate(self, img: np.ndarray, crop_n_layers: int = 0,
                 crop_overlap_ratio: float = 512 / 1500,
                 crop_downscale_factor: int = 1, point_grids=None):
        """img: HWC uint8 RGB. Returns (masks (N, H, W) bool in original
        image space, scores (N,), boxes (N, 4) xyxy original pixels)."""
        import cv2

        p = self.p
        oh, ow = img.shape[:2]
        S = p.img_size
        # operate in the letterboxed square like SAMPredictor.predict
        from .data.augment import letterbox

        lb, _, (r, px, py) = letterbox(img, S)
        crop_regions, layer_idxs = generate_crop_boxes((S, S), crop_n_layers,
                                                       crop_overlap_ratio)
        if point_grids is None:
            point_grids = build_all_layer_point_grids(
                self.points_stride, crop_n_layers, crop_downscale_factor)

        all_masks, all_scores, all_boxes, region_areas = [], [], [], []
        for region, layer in zip(crop_regions, layer_idxs):
            x1, y1, x2, y2 = region
            cw, chh = x2 - x1, y2 - y1
            crop = lb[y1:y2, x1:x2]
            if (chh, cw) != (S, S):
                crop = cv2.resize(crop, (S, S), interpolation=cv2.INTER_LINEAR)
            emb = p._encode(p.variables, jnp.asarray(crop, jnp.float32)[None] / 255.0)
            pts01 = point_grids[layer]  # [0,1]^2 of the crop
            pts = (pts01 * S).astype(np.float32)  # crop-resized pixel coords
            bs = self.points_batch_size
            n_pad = (-len(pts)) % bs
            pts_pad = np.concatenate([pts, np.zeros((n_pad, 2), np.float32)])
            valid_pt = np.concatenate([np.ones(len(pts), bool), np.zeros(n_pad, bool)])
            keep_masks, keep_scores, keep_boxes = [], [], []
            for b0 in range(0, len(pts_pad), bs):
                pb = jnp.asarray(pts_pad[b0:b0 + bs])[:, None, :]  # (bs, 1, 2)
                lab = jnp.ones((bs, 1), jnp.float32)
                binm, iou, boxes, keep = self._batch_fn(p.variables, emb, pb, lab)
                # M masks per point: expand point validity over the mask axis
                keep = np.asarray(keep) & np.repeat(
                    valid_pt[b0:b0 + bs], binm.shape[0] // bs)
                if not keep.any():
                    continue
                keep_masks.append(np.asarray(binm)[keep])
                keep_scores.append(np.asarray(iou)[keep])
                keep_boxes.append(np.asarray(boxes)[keep])
            if not keep_masks:
                continue
            masks = np.concatenate(keep_masks)
            scores = np.concatenate(keep_scores)
            mh, mw = masks.shape[1:]
            # mask-space boxes -> letterbox pixels of the crop, then uncrop
            boxes = np.concatenate(keep_boxes) * np.asarray(
                [cw / mw, chh / mh, cw / mw, chh / mh], np.float32)
            boxes += np.asarray([x1, y1, x1, y1], np.float32)
            if (chh, cw) != (S, S):
                # drop boxes touching the crop edge but not the image edge
                # (reference amg.py is_box_near_crop_edge, atol 20)
                near_crop = ((np.abs(boxes[:, 0] - x1) < 20) | (np.abs(boxes[:, 1] - y1) < 20)
                             | (np.abs(boxes[:, 2] - x2) < 20) | (np.abs(boxes[:, 3] - y2) < 20))
                near_img = ((boxes[:, 0] < 20) | (boxes[:, 1] < 20)
                            | (boxes[:, 2] > S - 20) | (boxes[:, 3] > S - 20))
                ok = ~(near_crop & ~near_img)
                masks, scores, boxes = masks[ok], scores[ok], boxes[ok]
                if not len(masks):
                    continue
            # per-crop NMS
            k = _greedy_nms(boxes, scores, self.iou_thres)
            all_masks.append((masks[k], region))
            all_scores.append(scores[k])
            all_boxes.append(boxes[k])
            region_areas.append(np.full(len(k), cw * chh, np.float32))

        if not all_scores:
            return (np.zeros((0, oh, ow), bool), np.zeros(0, np.float32),
                    np.zeros((0, 4), np.float32))
        scores = np.concatenate(all_scores)
        boxes = np.concatenate(all_boxes)
        areas = np.concatenate(region_areas)
        flat = [(m, reg) for ms, reg in all_masks for m in ms]
        if len(crop_regions) > 1:
            k = _greedy_nms(boxes, 1.0 / areas, self.crop_nms_thresh)
            scores, boxes = scores[k], boxes[k]
            flat = [flat[i] for i in k]

        # reconstruct masks in the original image space
        out_masks = np.zeros((len(flat), oh, ow), bool)
        canvas = np.zeros((S, S), np.float32)
        for i, (m, (cx1, cy1, cx2, cy2)) in enumerate(flat):
            canvas[:] = 0
            mm = cv2.resize(m.astype(np.float32), (cx2 - cx1, cy2 - cy1),
                            interpolation=cv2.INTER_LINEAR)
            canvas[cy1:cy2, cx1:cx2] = mm
            crop = canvas[int(py): S - int(py) or None, int(px): S - int(px) or None]
            out_masks[i] = cv2.resize(crop, (ow, oh),
                                      interpolation=cv2.INTER_LINEAR) > 0.5
        # boxes letterbox -> original pixels
        boxes = boxes.copy()
        boxes[:, [0, 2]] = np.clip((boxes[:, [0, 2]] - px) / r, 0, ow)
        boxes[:, [1, 3]] = np.clip((boxes[:, [1, 3]] - py) / r, 0, oh)
        return out_masks, scores, boxes
