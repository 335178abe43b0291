"""Extended ViL model family — flax.

Covers the remaining fork subsystems (SURVEY.md §2.4):
  * ViLLayerLarge / mLSTMVisionBlock — the xLSTM-7B-structured vision layer
    (reference ``mlstm_large.py:135`` mLSTMLayerVision: qk_dim_factor 0.5,
    o-gate, soft-capped gates, optional recurrent (C, n, m) state carry)
  * fusion MLP registry (reference ``vision_lstm2.py:1621-1764``):
    baseline/geglu/swiglu/rgblock/convmlp/lora/mixer/crossattn/film
  * FusionViLLayer — ViL as a two-stream fusion op with pluggable MLP
    (reference ``vision_lstm2.py:1776`` / ``fusion_vil.py:157``)
  * HierarchicalVisionLSTM — swin-style stages with PatchMerge downsampling
    and MultiScaleFusion (reference ``vision_lstm_hierarchical.py:224``)
  * VisionLSTM2 — the standalone ViL classifier (reference
    ``vision_lstm2.py:1444``): patch embed -> N ViLBlockPairs -> norm ->
    pooling (to_image / bilateral_avg / bilateral_flatten) -> head
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..kernels.mlstm_native import mlstm_chunkwise, soft_cap
from .vil import (
    MultiHeadLayerNorm,
    RMSNorm,
    SequenceConv2d,
    ViLBlockPair,
    VitPatchEmbed,
    VitPosEmbed2d,
)


class ViLLayerLarge(nn.Module):
    """xLSTM-7B-style vision mixing layer (reference mLSTMLayerVision,
    mlstm_large.py:135): conv(x) -> silu -> q, k (reduced qk_dim);
    v + o-gate from raw x; soft-capped i/f gates; mLSTM; per-head norm;
    sigmoid(o) * h; out projection. Supports carried (C, n, m) state."""

    dim: int
    num_heads: int = 4
    qk_dim_factor: float = 0.5
    v_dim_factor: float = 1.0
    gate_soft_cap: float = 15.0
    chunk_size: int = 64
    use_bias: bool = False
    seqlens: tuple | None = None

    @nn.compact
    def __call__(self, x, initial_state=None, return_last_state: bool = False):
        B, S, D = x.shape
        qk_dim = int(D * self.qk_dim_factor)
        v_dim = int(D * self.v_dim_factor)
        NH = self.num_heads

        conv_act = nn.silu(SequenceConv2d(v_dim, 3, seqlens=self.seqlens, name="conv")(x))
        q = nn.Dense(qk_dim, use_bias=self.use_bias, dtype=x.dtype, name="q")(conv_act)
        k = nn.Dense(qk_dim, use_bias=self.use_bias, dtype=x.dtype, name="k")(conv_act)
        v = nn.Dense(v_dim, use_bias=self.use_bias, dtype=x.dtype, name="v")(x)
        o_preact = nn.Dense(v_dim, use_bias=self.use_bias, dtype=x.dtype, name="ogate_preact")(x)
        i_preact = soft_cap(nn.Dense(NH, name="igate_preact")(x), self.gate_soft_cap)
        f_preact = soft_cap(nn.Dense(NH, name="fgate_preact")(x), self.gate_soft_cap)

        qh = q.reshape(B, S, NH, -1).transpose(0, 2, 1, 3)
        kh = k.reshape(B, S, NH, -1).transpose(0, 2, 1, 3)
        vh = v.reshape(B, S, NH, -1).transpose(0, 2, 1, 3)
        out = mlstm_chunkwise(
            qh, kh, vh, i_preact.transpose(0, 2, 1), f_preact.transpose(0, 2, 1),
            chunk_size=min(self.chunk_size, S), initial_state=initial_state,
            return_last_state=return_last_state,
        )
        h, last = out if return_last_state else (out, None)
        # xlstm_large-family norm: weight stored directly (init ones), not
        # the ViL fork's residual 1+w convention (xlstm_large/components.py:49)
        h = MultiHeadLayerNorm(num_heads=NH, with_bias=self.use_bias, eps=1e-6,
                               residual=False, name="multihead_norm")(h.astype(x.dtype))
        h = h.transpose(0, 2, 1, 3).reshape(B, S, v_dim)
        y = nn.sigmoid(o_preact) * h
        y = nn.Dense(D, use_bias=self.use_bias, dtype=x.dtype, name="out_proj")(y)
        if return_last_state:
            return y, last
        return y


class mLSTMVisionBlock(nn.Module):
    """Pre-norm block around ViLLayerLarge + SwiGLU FFN (reference
    mlstm_large.py:355 mLSTMBlock)."""

    dim: int
    num_heads: int = 4
    ffn_proj_factor: float = 2.6667
    chunk_size: int = 64
    seqlens: tuple | None = None

    @nn.compact
    def __call__(self, x):
        h = RMSNorm(name="norm_mlstm")(x)
        x = x + ViLLayerLarge(self.dim, self.num_heads, chunk_size=self.chunk_size,
                              seqlens=self.seqlens, name="mlstm_layer")(h)
        h = RMSNorm(name="norm_ffn")(x)
        up = int(self.ffn_proj_factor * self.dim // 64 * 64) or self.dim
        g = nn.Dense(2 * up, use_bias=False, dtype=x.dtype, name="ffn_up")(h)
        a, b = jnp.split(g, 2, axis=-1)
        h = nn.Dense(self.dim, use_bias=False, dtype=x.dtype, name="ffn_down")(nn.silu(a) * b)
        return x + h


# ---------------------------------------------------------------------------
# fusion MLP registry (reference vision_lstm2.py:1754)
# ---------------------------------------------------------------------------

class MLPBaseline(nn.Module):
    dim: int
    hidden: int | None = None

    @nn.compact
    def __call__(self, x, ctx=None):
        h = self.hidden or 4 * self.dim
        y = nn.Dense(h, dtype=x.dtype)(x)
        return nn.Dense(self.dim, dtype=x.dtype)(nn.gelu(y))


class GEGLU(nn.Module):
    dim: int
    hidden: int | None = None

    @nn.compact
    def __call__(self, x, ctx=None):
        h = self.hidden or 4 * self.dim
        a, b = jnp.split(nn.Dense(2 * h, dtype=x.dtype)(x), 2, axis=-1)
        return nn.Dense(self.dim, dtype=x.dtype)(nn.gelu(a) * b)


class SwiGLUMLP(nn.Module):
    dim: int
    hidden: int | None = None

    @nn.compact
    def __call__(self, x, ctx=None):
        h = self.hidden or 4 * self.dim
        a, b = jnp.split(nn.Dense(2 * h, dtype=x.dtype)(x), 2, axis=-1)
        return nn.Dense(self.dim, dtype=x.dtype)(nn.silu(a) * b)


class RGBlockMLP(nn.Module):
    """Token-grid gated conv MLP; x is (B, S, D) with square grid."""

    dim: int
    hidden: int | None = None

    @nn.compact
    def __call__(self, x, ctx=None):
        import math

        b, s, d = x.shape
        hw = int(math.isqrt(s))
        h = (self.hidden or 4 * self.dim) * 2 // 3
        img = x.reshape(b, hw, hw, d)
        y = nn.Conv(h * 2, (1, 1), dtype=x.dtype)(img)
        a, v = jnp.split(y, 2, axis=-1)
        dw = nn.Conv(h, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=h, dtype=x.dtype)(a)
        y = nn.gelu(dw + a) * v
        y = nn.Conv(self.dim, (1, 1), dtype=x.dtype)(y)
        return y.reshape(b, s, d)


class ConvMLP(nn.Module):
    dim: int
    hidden: int | None = None

    @nn.compact
    def __call__(self, x, ctx=None):
        import math

        b, s, d = x.shape
        hw = int(math.isqrt(s))
        h = self.hidden or 4 * self.dim
        img = x.reshape(b, hw, hw, d)
        y = nn.gelu(nn.Conv(h, (1, 1), dtype=x.dtype)(img))
        y = nn.gelu(nn.Conv(h, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=h, dtype=x.dtype)(y))
        y = nn.Conv(self.dim, (1, 1), dtype=x.dtype)(y)
        return y.reshape(b, s, d)


class LoRAMLP(nn.Module):
    dim: int
    hidden: int | None = None
    rank: int = 16

    @nn.compact
    def __call__(self, x, ctx=None):
        r = min(self.rank, self.hidden or 4 * self.dim)
        return nn.Dense(self.dim, dtype=x.dtype)(nn.relu(nn.Dense(r, dtype=x.dtype)(x)))


class MLPMixer(nn.Module):
    dim: int
    seq_len: int = 64
    hidden: int | None = None

    @nn.compact
    def __call__(self, x, ctx=None):
        h = self.hidden or 4 * self.dim
        y = nn.LayerNorm()(x)
        y = jnp.swapaxes(nn.Dense(self.seq_len, dtype=x.dtype)(jnp.swapaxes(y, 1, 2)), 1, 2)
        z = nn.LayerNorm()(y)
        z = nn.Dense(self.dim, dtype=x.dtype)(nn.gelu(nn.Dense(h, dtype=x.dtype)(z)))
        return z


class CrossAttentionMLP(nn.Module):
    dim: int
    hidden: int | None = None

    @nn.compact
    def __call__(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        h = self.hidden or 4 * self.dim
        q = nn.Dense(self.dim, dtype=x.dtype)(x)
        k = nn.Dense(self.dim, dtype=x.dtype)(ctx)
        v = nn.Dense(h, dtype=x.dtype)(ctx)
        attn = jax.nn.softmax(
            (q @ jnp.swapaxes(k, -2, -1) / (self.dim**0.5)).astype(jnp.float32), axis=-1
        ).astype(x.dtype)
        return nn.Dense(self.dim, dtype=x.dtype)(attn @ v)


class FiLMMLP(nn.Module):
    dim: int
    hidden: int | None = None

    @nn.compact
    def __call__(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        h = self.hidden or 4 * self.dim
        gamma = nn.Dense(self.dim, dtype=x.dtype)(ctx)
        beta = nn.Dense(self.dim, dtype=x.dtype)(ctx)
        y = nn.Dense(self.dim, dtype=x.dtype)(nn.gelu(nn.Dense(h, dtype=x.dtype)(x)))
        return y * gamma + beta


MLP_REGISTRY = {
    "baseline": MLPBaseline,
    "geglu": GEGLU,
    "swiglu": SwiGLUMLP,
    "rgblock": RGBlockMLP,
    "convmlp": ConvMLP,
    "lora": LoRAMLP,
    "mixer": MLPMixer,
    "crossattn": CrossAttentionMLP,
    "film": FiLMMLP,
}


class FusionViLLayer(nn.Module):
    """ViL mixing + pluggable MLP fusion op (reference vision_lstm2.py:1776).
    Call with (x, ctx=None): crossattn/film MLPs consume the second stream."""

    dim: int
    mlp_type: str = "baseline"
    use_mlp: bool = True
    use_skip: bool = True
    qkv_block_size: int = 16
    chunk_size: int = 64
    seqlens: tuple | None = None
    seq_len: int = 64

    @nn.compact
    def __call__(self, x, ctx=None):
        y = ViLBlockPair(dim=self.dim, qkv_block_size=self.qkv_block_size,
                         seqlens=self.seqlens, chunk_size=self.chunk_size, name="vil")(x)
        if self.use_mlp:
            cls = MLP_REGISTRY[self.mlp_type]
            kwargs = {"dim": self.dim}
            if self.mlp_type == "mixer":
                kwargs["seq_len"] = self.seq_len
            h = RMSNorm(name="mlp_norm")(y)
            m = cls(**kwargs, name=f"mlp_{self.mlp_type}")(h, ctx)
            y = y + m if self.use_skip else m
        return y


class HierarchicalVisionLSTM(nn.Module):
    """Swin-style hierarchical ViL (reference vision_lstm_hierarchical.py:224):
    patch embed -> per-stage ViLBlockPair groups with PatchMerge downsampling
    between stages; optional MultiScaleFusion of stage outputs; returns the
    per-stage feature maps (B, h_i, w_i, dim_i)."""

    dims: tuple = (96, 192, 384)
    depths: tuple = (2, 2, 4)
    patch_size: int = 4
    qkv_block_size: int = 16
    chunk_size: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = VitPatchEmbed(self.dims[0], self.patch_size, name="patch_embed")(x)
        h, w = x.shape[1:3]
        x = VitPosEmbed2d(self.dims[0], (h, w), name="pos_embed")(x)
        outs = []
        seq = x.reshape(x.shape[0], -1, x.shape[-1])
        for si, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            for bi in range(depth):
                seq = ViLBlockPair(dim=dim, qkv_block_size=self.qkv_block_size,
                                   seqlens=(h, w), chunk_size=self.chunk_size,
                                   name=f"s{si}b{bi}")(seq)
            outs.append(seq.reshape(seq.shape[0], h, w, dim))
            if si < len(self.dims) - 1:
                # PatchMerge: 2x2 window flatten + linear to next dim
                b, s, d = seq.shape
                m = seq.reshape(b, h // 2, 2, w // 2, 2, d).transpose(0, 1, 3, 2, 4, 5)
                m = m.reshape(b, (h // 2) * (w // 2), 4 * d)
                seq = nn.Dense(self.dims[si + 1], dtype=seq.dtype, name=f"merge{si}")(m)
                seq = nn.LayerNorm(name=f"merge_norm{si}")(seq)
                h, w = h // 2, w // 2
        return outs


class VisionLSTM2(nn.Module):
    """Standalone ViL model (reference vision_lstm2.py:1444): classifier or
    feature extractor with the reference's pooling modes."""

    dim: int = 192
    depth: int = 12
    patch_size: int = 16
    output_shape: tuple = (1000,)
    mode: str = "classifier"  # "classifier" | "features"
    pooling: str = "bilateral_flatten"  # to_image | bilateral_avg | bilateral_flatten
    qkv_block_size: int = 4
    chunk_size: int = 64
    bidirectional: bool = False
    drop_path_rate: float = 0.0  # stochastic depth (reference drop_path_rate)
    drop_path_decay: bool = True  # linspace 0 -> rate over depth

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = VitPatchEmbed(self.dim, self.patch_size, name="patch_embed")(x)
        h, w = x.shape[1:3]
        x = VitPosEmbed2d(self.dim, (h, w), name="pos_embed")(x)
        b = x.shape[0]
        seq = x.reshape(b, h * w, self.dim)
        if self.drop_path_decay and self.depth > 1:
            dprs = [self.drop_path_rate * i / (self.depth - 1) for i in range(self.depth)]
        else:
            dprs = [self.drop_path_rate] * self.depth
        for i in range(self.depth):
            seq = ViLBlockPair(dim=self.dim, qkv_block_size=self.qkv_block_size,
                               seqlens=(h, w), chunk_size=self.chunk_size,
                               bidirectional=self.bidirectional,
                               drop_path=dprs[i], name=f"block{i}")(seq)
        seq = nn.LayerNorm(name="norm")(seq)
        if self.pooling == "to_image":
            out = seq.reshape(b, h, w, self.dim)
        elif self.pooling == "bilateral_avg":
            out = (seq[:, 0] + seq[:, -1]) / 2
        elif self.pooling == "bilateral_flatten":
            out = jnp.concatenate([seq[:, 0], seq[:, -1]], axis=-1)
        else:
            raise ValueError(f"unknown pooling {self.pooling!r}")
        if self.mode == "classifier":
            return nn.Dense(self.output_shape[0], name="head")(out)
        return out


class VisionTransformer(nn.Module):
    """Plain ViT classifier baseline (reference vision_transformer.py:8 wraps
    torch-hub; here a native flax implementation for apples-to-apples
    ViL-vs-ViT comparisons)."""

    dim: int = 192
    depth: int = 12
    num_heads: int = 3
    patch_size: int = 16
    num_classes: int = 1000
    mlp_ratio: float = 4.0
    mode: str = "classifier"  # classifier | features

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = VitPatchEmbed(self.dim, self.patch_size, name="patch_embed")(x)
        b, h, w, d = x.shape
        x = VitPosEmbed2d(self.dim, (h, w), name="pos_embed")(x)
        seq = x.reshape(b, h * w, d)
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02), (1, 1, d))
        seq = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), seq], axis=1)
        for i in range(self.depth):
            y = nn.LayerNorm(name=f"norm1_{i}")(seq)
            y = nn.MultiHeadDotProductAttention(self.num_heads, dtype=seq.dtype,
                                                name=f"attn_{i}")(y, y, y)
            seq = seq + y
            y = nn.LayerNorm(name=f"norm2_{i}")(seq)
            y = nn.Dense(int(d * self.mlp_ratio), dtype=seq.dtype, name=f"mlp1_{i}")(y)
            y = nn.Dense(d, dtype=seq.dtype, name=f"mlp2_{i}")(nn.gelu(y))
            seq = seq + y
        seq = nn.LayerNorm(name="norm")(seq)
        if self.mode == "features":
            return seq[:, 1:].reshape(b, h, w, d)
        return nn.Dense(self.num_classes, name="head")(seq[:, 0])
