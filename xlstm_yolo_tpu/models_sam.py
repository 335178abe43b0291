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


class ViTBlock(nn.Module):
    """Transformer block with optional window attention (reference
    encoders.py Block)."""

    dim: int
    num_heads: int
    window_size: int = 0
    mlp_ratio: float = 4.0

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
        bb, hh, wwh, _ = x.shape
        seq = x.reshape(bb, hh * wwh, c)
        attn = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, dtype=x.dtype,
                                               name="attn")(seq, seq, seq)
        x = attn.reshape(bb, hh, wwh, c)
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
        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = ViTBlock(self.dim, self.num_heads, window_size=ws, name=f"block{i}")(x)
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
