"""xLSTM block stack + LM model — flax equivalents of the vendored NXAI
xLSTM library (reference ``nn/modules/vision_lstm/xlstm/``):

  * CausalConv1d (+ streaming step)        — components/conv.py:24
  * sLSTMLayer (conv -> headwise gates -> scan cell -> group norm)
                                            — blocks/slstm/layer.py:33
  * mLSTMLayer1d (causal-conv mLSTM mixing layer)
                                            — blocks/mlstm/layer.py:39
  * GatedFeedForward                        — components/feedforward.py:49
  * xLSTMBlock (pre-norm mLSTM-or-sLSTM + optional FFN)
                                            — blocks/xlstm_block.py:43
  * xLSTMBlockStack (slstm_at placement)    — xlstm_block_stack.py:77
  * xLSTMLMModel                            — xlstm_lm_model.py:22

The sLSTM recurrence runs through ``kernels/slstm.py`` (the TPU-native
replacement for the reference's CUDA kernel); the mLSTM uses the chunkwise
kernels shared with the ViL path.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..kernels.slstm import powerlaw_blockdependent_bias, slstm_scan
from .vil import LayerNorm, LinearHeadwiseExpand, MatrixLSTMCell, MultiHeadLayerNorm, small_init, wang_init


def _round_up_proj(dim: int, factor: float, multiple: int = 64) -> int:
    """Up-projection width: ceil to a multiple of 64 (reference
    utils.py:12 UpProjConfigMixin, round_proj_up_dim_up=True)."""
    return int(math.ceil(dim * factor / multiple) * multiple)


class CausalConv1d(nn.Module):
    """Depthwise causal conv over time (reference components/conv.py:24)."""

    feature_dim: int
    kernel_size: int = 4

    @nn.compact
    def __call__(self, x):  # (B, S, D)
        if self.kernel_size == 0:
            return x
        pad = self.kernel_size - 1
        xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        return nn.Conv(
            self.feature_dim, (self.kernel_size,), padding="VALID",
            feature_group_count=self.feature_dim, dtype=x.dtype, name="conv",
        )(xp)


class sLSTMLayer(nn.Module):
    """conv -> headwise i/f gates (conv'd x), z/o gates (raw x) -> sLSTM scan
    -> per-head group norm (reference blocks/slstm/layer.py:33)."""

    embedding_dim: int
    num_heads: int = 4
    conv1d_kernel_size: int = 4
    block_idx: int = 0
    num_blocks: int = 1

    @nn.compact
    def __call__(self, x, initial_state=None, return_last_state: bool = False):
        B, S, D = x.shape
        NH = self.num_heads
        DH = D // NH
        if self.conv1d_kernel_size > 0:
            x_conv = nn.silu(CausalConv1d(D, self.conv1d_kernel_size, name="conv1d")(x))
        else:
            x_conv = x
        i = LinearHeadwiseExpand(D, NH, use_bias=False, name="igate")(x_conv)
        f = LinearHeadwiseExpand(D, NH, use_bias=False, name="fgate")(x_conv)
        z = LinearHeadwiseExpand(D, NH, use_bias=False, name="zgate")(x)
        o = LinearHeadwiseExpand(D, NH, use_bias=False, name="ogate")(x)
        wx = jnp.stack(
            [g.reshape(B, S, NH, DH) for g in (i, f, z, o)], axis=3
        )  # (B, S, NH, 4, DH)

        r = self.param("recurrent_kernel", nn.initializers.zeros, (NH, DH, 4, DH))
        bidx, nblk = self.block_idx, self.num_blocks

        def bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            fb = powerlaw_blockdependent_bias(NH, DH, bidx, nblk)
            return b.at[:, 1, :].set(fb)

        bias = self.param("bias", bias_init, (NH, 4, DH))

        # fused Pallas kernel on TPU (VMEM-resident states, wall-clock parity
        # with the scan — the chain is latency-bound); the lax.scan form on
        # other backends and for explicit state carry
        from ..kernels.slstm_pallas import slstm_scan_pallas

        out = slstm_scan_pallas(wx, r, bias, initial_state=initial_state,
                                return_last_state=return_last_state)
        y, last = out if return_last_state else (out, None)
        y = y.transpose(0, 2, 1, 3)  # (B, NH, S, DH)
        y = MultiHeadLayerNorm(num_heads=NH, with_bias=False, eps=1e-5, name="group_norm")(y)
        y = y.transpose(0, 2, 1, 3).reshape(B, S, D).astype(x.dtype)
        if return_last_state:
            return y, last
        return y


class mLSTMLayer1d(nn.Module):
    """Causal mLSTM mixing layer for 1D sequences (reference
    blocks/mlstm/layer.py:39): proj_up -> split -> causal conv -> headwise
    q, k (conv'd), v (raw) -> mLSTM cell -> skip + gate -> proj_down.

    Projection head count is ``inner // qkv_proj_blocksize`` (block-diagonal
    qkv, reference layer.py:52) while the CELL runs its own ``num_heads``
    (default 4, reference mLSTMLayerConfig.num_heads / cell.py:30) — the two
    are independent knobs in the reference and must not be conflated."""

    embedding_dim: int
    num_heads: int = 4
    expansion: float = 2.0
    qkv_proj_blocksize: int = 4
    conv1d_kernel_size: int = 4
    chunk_size: int = 64
    num_blocks: int = 1

    @nn.compact
    def __call__(self, x):  # (B, S, D)
        D = self.embedding_dim
        inner = _round_up_proj(D, self.expansion)  # ceil to 64 (utils.py:20)
        NP = inner // self.qkv_proj_blocksize  # projection (block-diag) heads
        y = nn.Dense(2 * inner, use_bias=False, kernel_init=small_init(D), dtype=x.dtype,
                     name="proj_up")(x)
        x_m, z = jnp.split(y, 2, axis=-1)
        conv_act = nn.silu(CausalConv1d(inner, self.conv1d_kernel_size, name="conv1d")(x_m))
        q = LinearHeadwiseExpand(inner, NP, use_bias=False, name="q_proj")(conv_act)
        k = LinearHeadwiseExpand(inner, NP, use_bias=False, name="k_proj")(conv_act)
        v = LinearHeadwiseExpand(inner, NP, use_bias=False, name="v_proj")(x_m)
        # cell: 4 wide heads (DH = inner/4), norm without bias, igate bias
        # ~ N(0, 0.1) — the vendored-library inits (cell.py:133-140), which
        # differ from the ViL fork's (-10 igate, norm bias)
        h = MatrixLSTMCell(dim=inner, num_heads=self.num_heads, chunk_size=self.chunk_size,
                           norm_bias=False, norm_eps=1e-5, igate_init="xlstm",
                           name="mlstm_cell")(q, k, v)
        skip = self.param("learnable_skip", nn.initializers.ones, (inner,))
        h = h + skip.astype(h.dtype) * conv_act
        h = h * nn.silu(z)
        return nn.Dense(D, use_bias=False, kernel_init=wang_init(D, self.num_blocks),
                        dtype=x.dtype, name="proj_down")(h)


class GatedFeedForward(nn.Module):
    """Gated FFN (reference components/feedforward.py:49). Default activation
    is gelu (FeedForwardConfig.act_fn, feedforward.py:34); "swish" gives the
    SwiGLU form."""

    embedding_dim: int
    proj_factor: float = 1.3
    num_blocks: int = 1
    act_fn: str = "gelu"

    @nn.compact
    def __call__(self, x):
        act = {"gelu": nn.gelu, "relu": nn.relu, "swish": nn.silu,
               "sigmoid": nn.sigmoid, "selu": nn.selu,
               "relu^2": lambda v: jnp.square(nn.relu(v))}[self.act_fn]
        up = _round_up_proj(self.embedding_dim, self.proj_factor)
        gu = nn.Dense(2 * up, use_bias=False, kernel_init=small_init(self.embedding_dim),
                      dtype=x.dtype, name="proj_up")(x)
        g, u = jnp.split(gu, 2, axis=-1)
        return nn.Dense(self.embedding_dim, use_bias=False,
                        kernel_init=wang_init(self.embedding_dim, self.num_blocks),
                        dtype=x.dtype, name="proj_down")(act(g) * u)


class xLSTMBlock(nn.Module):
    """Pre-norm residual block: mLSTM or sLSTM + optional FFN
    (reference blocks/xlstm_block.py:43)."""

    embedding_dim: int
    kind: str = "mlstm"  # "mlstm" | "slstm"
    num_heads: int = 4
    conv1d_kernel_size: int = 4
    qkv_proj_blocksize: int = 4
    chunk_size: int = 64
    ffn_proj_factor: float = 0.0  # 0 disables the FFN (mLSTM blocks usually omit it)
    block_idx: int = 0
    num_blocks: int = 1

    @nn.compact
    def __call__(self, x):
        # pre-norms are LayerNorm (weight, no bias, residual 1+w) in the
        # vendored library (blocks/xlstm_block.py:58) — not RMSNorm
        h = LayerNorm(name="norm_xlstm")(x)
        if self.kind == "mlstm":
            h = mLSTMLayer1d(self.embedding_dim, num_heads=self.num_heads,
                             qkv_proj_blocksize=self.qkv_proj_blocksize,
                             conv1d_kernel_size=self.conv1d_kernel_size,
                             chunk_size=self.chunk_size, num_blocks=self.num_blocks,
                             name="xlstm")(h)
        else:
            h = sLSTMLayer(self.embedding_dim, num_heads=self.num_heads,
                           conv1d_kernel_size=self.conv1d_kernel_size,
                           block_idx=self.block_idx, num_blocks=self.num_blocks,
                           name="xlstm")(h)
        x = x + h
        if self.ffn_proj_factor > 0:
            h = LayerNorm(name="norm_ffn")(x)
            h = GatedFeedForward(self.embedding_dim, self.ffn_proj_factor,
                                 num_blocks=self.num_blocks, name="ffn")(h)
            x = x + h
        return x


class xLSTMBlockStack(nn.Module):
    """Stack with sLSTM placement list (reference xlstm_block_stack.py:77)."""

    embedding_dim: int
    num_blocks: int = 6
    slstm_at: tuple = ()  # block indices that are sLSTM; rest mLSTM
    num_heads: int = 4
    qkv_proj_blocksize: int = 4
    conv1d_kernel_size: int = 4
    chunk_size: int = 64
    ffn_proj_factor: float = 1.3
    add_post_norm: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            kind = "slstm" if i in self.slstm_at else "mlstm"
            x = xLSTMBlock(
                self.embedding_dim, kind=kind, num_heads=self.num_heads,
                conv1d_kernel_size=self.conv1d_kernel_size,
                qkv_proj_blocksize=self.qkv_proj_blocksize, chunk_size=self.chunk_size,
                ffn_proj_factor=self.ffn_proj_factor if kind == "slstm" else 0.0,
                block_idx=i, num_blocks=self.num_blocks, name=f"block{i}",
            )(x)
        if self.add_post_norm:
            # post_blocks_norm is LayerNorm (xlstm_block_stack.py:86)
            x = LayerNorm(name="post_norm")(x)
        return x


class xLSTMLMModel(nn.Module):
    """Token embedding -> block stack -> tied/untied LM head
    (reference xlstm_lm_model.py:22)."""

    vocab_size: int
    embedding_dim: int = 128
    num_blocks: int = 6
    slstm_at: tuple = ()
    num_heads: int = 4
    chunk_size: int = 64
    tie_weights: bool = False

    @nn.compact
    def __call__(self, tokens):  # (B, S) int
        emb = nn.Embed(self.vocab_size, self.embedding_dim, name="embedding")
        x = emb(tokens)
        x = xLSTMBlockStack(
            self.embedding_dim, num_blocks=self.num_blocks, slstm_at=self.slstm_at,
            num_heads=self.num_heads, chunk_size=self.chunk_size, name="stack",
        )(x)
        if self.tie_weights:
            return x @ emb.embedding.T
        return nn.Dense(self.vocab_size, use_bias=False, name="lm_head")(x)


def generate(model: xLSTMLMModel, variables: dict, prompt, max_new_tokens: int = 20,
             temperature: float = 0.0, rng=None):
    """Greedy/sampled autoregressive generation (reference
    xlstm_large/generate.py prefill+step; here a full re-forward per token —
    O(n·S) with the chunkwise kernel, fine for short continuations)."""
    import numpy as np

    tokens = list(np.asarray(prompt).reshape(-1).tolist())
    fwd = jax.jit(model.apply)
    for i in range(max_new_tokens):
        logits = fwd(variables, jnp.asarray([tokens]))[0, -1]
        if temperature > 0:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            rng, sub = jax.random.split(rng)
            nxt = int(jax.random.categorical(sub, logits / temperature))
        else:
            nxt = int(jnp.argmax(logits))
        tokens.append(nxt)
    return tokens
