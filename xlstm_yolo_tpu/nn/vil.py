"""Vision-LSTM (ViL / mLSTM) backbone subsystem — flax, TPU-native.

Re-design of the reference's core fork content:
  * ``nn/modules/vision_lstm/vision_lstm2.py`` — ViLLayer (:386), ViLBlock
    (:684), ViLBlockPair (:1393), MatrixLSTMCell (:802), LinearHeadwiseExpand
    (:987), MultiHeadLayerNorm (:1309)
  * ``nn/modules/vision_lstm/vision_lstm_util.py`` — VitPatchEmbed (:155),
    VitPosEmbed (:226), SequenceConv2d (:96)
  * ``nn/modules/vision_lstm/vision_lstm_hierarchical.py`` — PatchMerge (:44),
    MultiScaleFusion (:70)
  * YAML wrapper blocks from ``nn/modules/block.py:1187-2363``

The mLSTM recurrence dispatches to the chunkwise backends in
``kernels/`` (native jnp scan or the Pallas TPU kernel) instead of the
external Triton ``mlstm_kernels`` package the reference requires.

Layout notes (TPU-native divergences from the torch reference, preserved
behavior otherwise):
  * image tensors are NHWC, so ``SequenceToImage`` emits (B, H, W, D);
  * sequence blocks accept any (B, ..., D) and flatten to (B, S, D) like the
    reference wrappers do;
  * ``MatrixLSTMCell`` applies the multi-head outnorm and returns (B, S, D)
    — the original ViL behavior. (The fork comments the norm out and returns
    the raw backend layout, vision_lstm2.py:951-956; our config exposes
    ``use_outnorm`` for strict-quirk parity.)

Fork quirks preserved by default:
  * ViLBlockPair executes only the forward traversal (vision_lstm2.py:1438);
    set ``bidirectional=True`` for the full pair.
  * ViLLayer owns an FFN but skips it in forward (vision_lstm2.py:466-511).
  * i-gate bias init −10, f-gate bias linspace 3→6 (vision_lstm2.py:958-966).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..kernels.mlstm_native import mlstm_chunkwise
from .modules import ConvBN


def _flatten_tokens(x: jnp.ndarray) -> jnp.ndarray:
    """(B, ..., D) -> (B, S, D)."""
    return x.reshape(x.shape[0], -1, x.shape[-1])


def small_init(dim: int):
    """NXAI small init: std = sqrt(2 / (5 * dim)) (xlstm components/init.py)."""
    std = math.sqrt(2.0 / (5.0 * dim))
    return nn.initializers.normal(stddev=std)


def wang_init(dim: int, num_blocks: int):
    """Wang init for residual-out projections (xlstm components/init.py)."""
    std = 2.0 / max(num_blocks, 1) / math.sqrt(dim)
    return nn.initializers.normal(stddev=std)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    with_scale: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        if self.with_scale:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            y = y * scale
        return y.astype(dtype)


class LayerNorm(nn.Module):
    """LayerNorm with the torch reference's residual-weight convention
    (vision_lstm2.py:1262 / xlstm components/ln.py:8): the stored ``scale``
    initializes to ZERO and the effective weight is ``1 + scale``, so torch
    checkpoints transfer verbatim. ``residual=False`` gives the plain
    init-ones semantics (xlstm_large components.py:49 stores weight
    directly)."""

    eps: float = 1e-5
    with_bias: bool = False
    residual: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        init = nn.initializers.zeros if self.residual else nn.initializers.ones
        scale = self.param("scale", init, (x.shape[-1],))
        y = y * ((1.0 + scale) if self.residual else scale)
        if self.with_bias:
            y = y + self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return y.astype(dtype)


class MultiHeadLayerNorm(nn.Module):
    """Per-head LayerNorm over DH of a (B, NH, S, DH) tensor, with a single
    (NH*DH,) affine — the reference's group-norm trick (vision_lstm2.py:1309).

    ``residual=True`` (default) keeps the torch convention of the ViL fork
    and the vendored xlstm library (components/ln.py:30 ``weight_proxy =
    1 + weight``, init zeros): the stored ``scale`` transfers verbatim from
    those checkpoints. xlstm_large-family norms store the weight directly
    (xlstm_large/components.py:49, init ones) — pass ``residual=False``."""

    num_heads: int
    # default matches the ViL fork's cell outnorm (vision_lstm2.py:812
    # eps=1e-3); the vendored xlstm library uses 1e-5 (components/ln.py:16)
    # — pass eps explicitly on those paths
    eps: float = 1e-3
    with_bias: bool = True
    transposed: bool = False  # input is (B, NH, DH, S); normalize over DH
    residual: bool = True

    @nn.compact
    def __call__(self, x):  # (B, NH, S, DH) or (B, NH, DH, S) if transposed
        dtype = x.dtype
        nh = self.num_heads
        dh = x.shape[2] if self.transposed else x.shape[3]
        axis = 2 if self.transposed else 3
        shp = (1, nh, dh, 1) if self.transposed else (1, nh, 1, dh)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axis, keepdims=True)
        var = jnp.var(xf, axis=axis, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        init = nn.initializers.zeros if self.residual else nn.initializers.ones
        weight = self.param("scale", init, (nh * dh,)).reshape(shp)
        y = y * ((1.0 + weight) if self.residual else weight)
        if self.with_bias:
            bias = self.param("bias", nn.initializers.zeros, (nh * dh,)).reshape(shp)
            y = y + bias
        return y.astype(dtype)


class LinearHeadwiseExpand(nn.Module):
    """Block-diagonal per-head projection (reference vision_lstm2.py:987):
    weight (NH, DH, DH) applied headwise — much cheaper than a dense dim×dim."""

    dim: int
    num_heads: int
    use_bias: bool = True
    transpose_out: bool = False  # emit (B, NH, DH, S) — the mLSTM kernel layout

    @nn.compact
    def __call__(self, x):  # (..., dim)
        dh = self.dim // self.num_heads
        w = self.param("weight", nn.initializers.normal(stddev=math.sqrt(2.0 / 5.0 / dh)),
                       (self.num_heads, dh, dh))
        xs = x.reshape(*x.shape[:-1], self.num_heads, dh)
        if self.transpose_out:
            # transposed output layout folds the kernel-entry relayout into
            # this dot's output indexing — no separate HBM transpose pass
            y = jnp.einsum("bsnd,nod->bnos", xs, w.astype(x.dtype))
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros, (self.dim,))
                y = y + b.astype(x.dtype).reshape(self.num_heads, dh, 1)
            return y  # (B, NH, DH, S)
        y = jnp.einsum("...nd,nod->...no", xs, w.astype(x.dtype))
        y = y.reshape(*x.shape[:-1], self.dim)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.dim,))
            y = y + b.astype(x.dtype)
        return y


class _HeadwiseParams(nn.Module):
    """Parameter-only twin of LinearHeadwiseExpand (same names, shapes and
    init) for paths that consume the weights directly — the fused ViL cell
    kernel applies the projection on-chip."""

    dim: int
    num_heads: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        dh = self.dim // self.num_heads
        w = self.param("weight", nn.initializers.normal(stddev=math.sqrt(2.0 / 5.0 / dh)),
                       (self.num_heads, dh, dh))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.dim,))
        else:
            b = jnp.zeros((self.dim,), w.dtype)
        return w, b


class _DenseParams(nn.Module):
    """Parameter-only twin of nn.Dense (same names, shapes and init) for the
    block-fused TPU path, which applies proj_down inside the kernel."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.xavier_uniform(),
                       (self.in_features, self.features))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
        else:
            b = jnp.zeros((self.features,), k.dtype)
        return k, b


class _RMSNormParams(nn.Module):
    """Parameter-only twin of RMSNorm (same name/init) for the layer-fused
    TPU path, which applies the norm inside the kernel."""

    features: int

    @nn.compact
    def __call__(self):
        return self.param("scale", nn.initializers.ones, (self.features,))


class _MHLNParams(nn.Module):
    """Parameter-only twin of MultiHeadLayerNorm (same names and init);
    returns the EFFECTIVE affine (1+w under the residual convention) for
    paths that apply the norm inside a kernel."""

    features: int
    with_bias: bool = True
    residual: bool = True

    @nn.compact
    def __call__(self):
        init = nn.initializers.zeros if self.residual else nn.initializers.ones
        w = self.param("scale", init, (self.features,))
        eff = (1.0 + w) if self.residual else w
        if self.with_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
        else:
            b = jnp.zeros((self.features,), w.dtype)
        return eff, b


class SequenceConv2d(nn.Module):
    """Conv2d over the token grid of a (B, S, D) sequence
    (reference vision_lstm_util.py:96). NHWC internally — no transposes."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | None = None
    groups: int = 1
    use_bias: bool = True
    seqlens: tuple | None = None

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        if self.seqlens is None:
            h = w = int(round(math.sqrt(s)))
        else:
            h, w = self.seqlens
        pad = self.kernel_size // 2 if self.padding is None else self.padding
        img = x.reshape(b, h, w, d)
        y = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=x.dtype,
            name="conv",
        )(img)
        return y.reshape(b, -1, self.out_channels)


class DropPath(nn.Module):
    """Stochastic depth over the residual branch (reference
    vision_lstm_util.py:302): drops the whole branch per sample with prob
    ``rate`` and rescales survivors. Needs a "dropout" rng when active."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate <= 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, mask_shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class SequenceConv3d(nn.Module):
    """Conv3d over the (T, H, W) token grid of a (B, S, D) sequence
    (reference vision_lstm_util.py:133) — video-token variant."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    seqlens: tuple | None = None  # (T, H, W)

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        assert self.seqlens is not None and len(self.seqlens) == 3, \
            "SequenceConv3d needs seqlens=(T, H, W)"
        t, h, w = self.seqlens
        pad = self.kernel_size // 2
        img = x.reshape(b, t, h, w, d)
        y = nn.Conv(
            self.out_channels, (self.kernel_size,) * 3, strides=(self.stride,) * 3,
            padding=((pad, pad),) * 3, feature_group_count=self.groups,
            use_bias=self.use_bias, dtype=x.dtype, name="conv",
        )(img)
        return y.reshape(b, -1, self.out_channels)


class _GateProj(nn.Module):
    """Gate preactivation projection over cat(q, k, v) — parameter-identical
    to the reference's single ``nn.Dense`` over the concatenation (kernel
    (3*D, NH), bias (NH,)), but computed as three split dots so the 3x-wide
    concat tensor is never materialized in HBM (measured 5.4 -> 3.4 ms at
    ViL-P3/b128). In the transposed layout the dots contract (NH, DH)
    directly from the kernel-layout operands and emit (B, NH, S)."""

    features: int
    bias_init: object = nn.initializers.zeros
    dim: int = 0  # required only for return_params (no input to infer from)

    @nn.compact
    def __call__(self, q, k, v, transposed: bool = False, return_params: bool = False):
        if return_params:
            d = self.dim
            w = self.param("kernel", nn.initializers.zeros, (3 * d, self.features))
            bias = self.param("bias", self.bias_init, (self.features,))
            return w, bias
        if transposed:
            d = q.shape[1] * q.shape[2]
        else:
            d = q.shape[-1]
        w = self.param("kernel", nn.initializers.zeros, (3 * d, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        if transposed:
            nh_in, dh = q.shape[1], q.shape[2]
            rs = lambda wm: wm.reshape(nh_in, dh, self.features).astype(q.dtype)
            y = (jnp.einsum("bnos,noh->bhs", q, rs(w[:d]), preferred_element_type=jnp.float32)
                 + jnp.einsum("bnos,noh->bhs", k, rs(w[d:2 * d]), preferred_element_type=jnp.float32)
                 + jnp.einsum("bnos,noh->bhs", v, rs(w[2 * d:]), preferred_element_type=jnp.float32))
            return y + bias.astype(y.dtype).reshape(1, self.features, 1)  # (B, NH, S)
        wq, wk, wv = w[:d].astype(q.dtype), w[d:2 * d].astype(q.dtype), w[2 * d:].astype(q.dtype)
        return q @ wq + k @ wk + v @ wv + bias.astype(q.dtype)  # (B, S, NH)


class MatrixLSTMCell(nn.Module):
    """mLSTM cell with matrix memory (reference vision_lstm2.py:802).

    Input q/k/v: (B, S, D). Gate preactivations come from a Linear over
    cat(q, k, v). Dispatches to the chunkwise kernel (Pallas on TPU, jnp
    scan elsewhere). Output: (B, S, D) after per-head outnorm.
    """

    dim: int
    num_heads: int
    chunk_size: int = 64
    igate_act: str = "exp"  # "exp" (canonical xLSTM) | "sigmoid" ("siging" variant)
    use_outnorm: bool = True
    norm_bias: bool = True
    norm_eps: float = 1e-3  # fork cell outnorm eps; xlstm library uses 1e-5
    backend: str = "auto"  # auto | pallas | native
    # i-gate bias init: "vil" = constant -10 (ViL fork, vision_lstm2.py:834);
    # "xlstm" = N(0, 0.1) (vendored library, blocks/mlstm/cell.py:140)
    igate_init: str = "vil"

    @nn.compact
    def __call__(self, q, k, v, transposed: bool = False, fused=None,
                 fused_block=None, fused_layer=None):
        """q/k/v: (B, S, D) natural, or (B, NH, DH, S) when ``transposed``
        (the mLSTM kernel layout, as emitted by LinearHeadwiseExpand's
        ``transpose_out`` — the zero-relayout TPU fast path).

        ``fused``: (conv_act, x_mlstm, wq, bq, wk, bk, wv, bv) — the fully
        fused TPU path: headwise projections + gate dots + chunkwise mLSTM
        run in ONE Pallas kernel (q/k/v never exist in HBM); q/k/v args are
        ignored.

        ``fused_block``: (conv_act, x_mlstm, z, x_res, wq, bq, wk, bk, wv,
        bv, skip, wd, bd) — the v2 whole-branch kernel: everything in
        ``fused`` PLUS outnorm, learnable skip, SiLU output gate, proj_down
        and the residual, returning the final (B, S, DIM) layer output.

        ``fused_layer``: (x, conv_act, rms_scale, wu, bu, wq, bq, wk, bk,
        wv, bv, skip, wd, bd) — the v3 layer kernel: v2 PLUS the pre-norm
        and proj_up recomputed in-kernel from x (which doubles as the
        residual); only x and conv_act are streamed."""
        nh = self.num_heads
        if self.igate_init == "xlstm":
            gate_bias_i = nn.initializers.normal(stddev=0.1)
        else:
            gate_bias_i = lambda key, shape, dtype=jnp.float32: jnp.full(shape, -10.0, dtype)
        gate_bias_f = lambda key, shape, dtype=jnp.float32: jnp.linspace(3.0, 6.0, shape[0], dtype=dtype)

        if fused_layer is not None:
            xs, conv_act, nrm, wu, bu_, wq, bq_, wk, bk_, wv, bv_, skip, wd, bd_ = fused_layer
            d = conv_act.shape[-1]
            wgi, bgi = _GateProj(nh, bias_init=gate_bias_i, dim=d,
                                 name="igate")(None, None, None, return_params=True)
            wgf, bgf = _GateProj(nh, bias_init=gate_bias_f, dim=d,
                                 name="fgate")(None, None, None, return_params=True)
            if self.use_outnorm:
                nsc, nbi = _MHLNParams(d, with_bias=self.norm_bias, name="outnorm")()
            else:
                nsc = jnp.ones((d,), jnp.float32)
                nbi = jnp.zeros((d,), jnp.float32)
            from ..kernels.mlstm_pallas import mlstm_vil_layer_fused_pallas

            out = mlstm_vil_layer_fused_pallas(
                xs, conv_act, nrm, wu, bu_, wq, bq_, wk, bk_, wv, bv_,
                wgi, bgi, wgf, bgf, nsc, nbi, skip, wd, bd_, nh,
                chunk_size=self.chunk_size, igate_act=self.igate_act,
                norm_eps=self.norm_eps)
            return out.astype(conv_act.dtype)

        if fused_block is not None:
            conv_act, x_mlstm, z, x_res, wq, bq_, wk, bk_, wv, bv_, skip, wd, bd_ = fused_block
            d = conv_act.shape[-1]
            wgi, bgi = _GateProj(nh, bias_init=gate_bias_i, dim=d,
                                 name="igate")(None, None, None, return_params=True)
            wgf, bgf = _GateProj(nh, bias_init=gate_bias_f, dim=d,
                                 name="fgate")(None, None, None, return_params=True)
            if self.use_outnorm:
                nsc, nbi = _MHLNParams(d, with_bias=self.norm_bias, name="outnorm")()
            else:
                nsc = jnp.ones((d,), jnp.float32)
                nbi = jnp.zeros((d,), jnp.float32)
            from ..kernels.mlstm_pallas import mlstm_vil_block_fused_pallas

            out = mlstm_vil_block_fused_pallas(
                conv_act, x_mlstm, z, x_res, wq, bq_, wk, bk_, wv, bv_,
                wgi, bgi, wgf, bgf, nsc, nbi, skip, wd, bd_, nh,
                chunk_size=self.chunk_size, igate_act=self.igate_act,
                norm_eps=self.norm_eps)
            return out.astype(conv_act.dtype)

        if fused is not None:
            conv_act, x_mlstm, wq, bq_, wk, bk_, wv, bv_ = fused
            d = conv_act.shape[-1]
            wgi, bgi = _GateProj(nh, bias_init=gate_bias_i, dim=d,
                                 name="igate")(None, None, None, return_params=True)
            wgf, bgf = _GateProj(nh, bias_init=gate_bias_f, dim=d,
                                 name="fgate")(None, None, None, return_params=True)
            from ..kernels.mlstm_pallas import mlstm_vil_fused_pallas

            h = mlstm_vil_fused_pallas(
                conv_act, x_mlstm, wq, bq_, wk, bk_, wv, bv_, wgi, bgi, wgf, bgf,
                nh, chunk_size=self.chunk_size, igate_act=self.igate_act)
            h = h.astype(conv_act.dtype)  # (B, NH, DH, S)
            if self.use_outnorm:
                h = MultiHeadLayerNorm(num_heads=nh, with_bias=self.norm_bias, eps=self.norm_eps,
                                       transposed=True, name="outnorm")(h)
            b, s = conv_act.shape[0], conv_act.shape[1]
            return h.transpose(0, 3, 1, 2).reshape(b, s, d)

        # gates init: f bias linspace 3->6, i bias -10, zero weights (fork init)
        igate = _GateProj(nh, bias_init=gate_bias_i, name="igate")(q, k, v, transposed)
        fgate = _GateProj(nh, bias_init=gate_bias_f, name="fgate")(q, k, v, transposed)

        if transposed:
            b, _, dh, s = q.shape
            d = nh * dh
            i_pre, f_pre = igate, fgate  # already (B, NH, S)
            from ..kernels.mlstm_pallas import mlstm_chunkwise_pallas_t

            h = mlstm_chunkwise_pallas_t(q, k, v, i_pre, f_pre,
                                         chunk_size=self.chunk_size,
                                         igate_act=self.igate_act)
            h = h.astype(q.dtype)
            if self.use_outnorm:
                h = MultiHeadLayerNorm(num_heads=nh, with_bias=self.norm_bias, eps=self.norm_eps,
                                       transposed=True, name="outnorm")(h)
            # the single relayout back to the natural activation layout
            return h.transpose(0, 3, 1, 2).reshape(b, s, d)

        b, s, d = q.shape
        dh = d // nh
        qh = q.reshape(b, s, nh, dh).transpose(0, 2, 1, 3)
        kh = k.reshape(b, s, nh, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(b, s, nh, dh).transpose(0, 2, 1, 3)
        i_pre = igate.transpose(0, 2, 1)  # (B, NH, S)
        f_pre = fgate.transpose(0, 2, 1)

        backend = self.backend
        if backend == "auto":
            # the fused row-resident Pallas kernel beats XLA's batched-einsum
            # form on TPU (1.75-2.4x at ViL stage sizes — mlstm_pallas.py);
            # elsewhere the native form wins (pallas would be interpreted).
            backend = "pallas" if jax.default_backend() == "tpu" else "native"
        if backend == "pallas":
            from ..kernels.mlstm_pallas import mlstm_chunkwise_pallas

            # the kernel pads S to a chunk multiple internally; keep the
            # configured chunk so lane slices stay 128-aligned
            h = mlstm_chunkwise_pallas(qh, kh, vh, i_pre, f_pre,
                                       chunk_size=self.chunk_size, igate_act=self.igate_act)
        else:
            cs = min(self.chunk_size, s)
            while s % cs != 0:
                cs //= 2
            h = mlstm_chunkwise(qh, kh, vh, i_pre, f_pre, chunk_size=cs, igate_act=self.igate_act)
        h = h.astype(q.dtype)

        if self.use_outnorm:
            h = MultiHeadLayerNorm(num_heads=nh, with_bias=self.norm_bias, eps=self.norm_eps, name="outnorm")(h)
        return h.transpose(0, 2, 1, 3).reshape(b, s, d)


class FeedForward(nn.Module):
    """SwiGLU feed-forward (reference vision_lstm2.py:159): fused gate/up
    projection, silu(gate) * up, down projection with wang init."""

    dim: int
    proj_factor: float = 2.6667
    round_up_to: int = 64
    use_bias: bool = True
    num_blocks: int = 1

    @nn.compact
    def __call__(self, x):
        up_dim = int(self.proj_factor * self.dim)
        up_dim = ((up_dim + self.round_up_to - 1) // self.round_up_to) * self.round_up_to
        gu = nn.Dense(2 * up_dim, use_bias=self.use_bias, kernel_init=small_init(self.dim),
                      dtype=x.dtype, name="proj_up")(x)
        gate, up = jnp.split(gu, 2, axis=-1)
        y = nn.silu(gate) * up
        return nn.Dense(self.dim, use_bias=self.use_bias,
                        kernel_init=wang_init(self.dim, self.num_blocks), dtype=x.dtype,
                        name="proj_down")(y)


class ViLLayer(nn.Module):
    """The ViL mixing layer (reference vision_lstm2.py:386-511).

    x -> RMSNorm -> (flip if backward direction) -> proj_up -> split(x_mlstm, z)
      -> depthwise SequenceConv2d + SiLU -> headwise q, k (of conv) & v (raw)
      -> MatrixLSTMCell -> +learnable_skip*conv_act -> *SiLU(z) -> proj_down
      -> flip back -> +residual.
    The FFN exists in the reference but is skipped in forward (fork quirk).
    """

    dim: int
    direction: str = "forward"  # "forward" | "backward"
    expansion: int = 2
    qkv_block_size: int = 4
    proj_bias: bool = True
    conv_kind: str = "2d"
    conv_kernel_size: int = 3
    seqlens: tuple | None = None
    chunk_size: int = 64
    igate_act: str = "exp"
    mlstm_backend: str = "auto"
    use_outnorm: bool = True
    drop_path: float = 0.0  # stochastic depth; active only with a "dropout" rng

    @nn.compact
    def __call__(self, x):  # (B, S, D)
        inner = self.expansion * self.dim
        num_heads = inner // self.qkv_block_size
        residual = x
        # On TPU the whole layer (minus the spatial conv) runs as ONE Pallas
        # program; elsewhere everything stays in the natural (B, S, D) layout.
        backend = self.mlstm_backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "native"
        tp = backend == "pallas"
        if tp and (self.drop_path == 0.0 or not self.has_rng("dropout")):
            # v3 layer-fused kernel: RMSNorm + proj_up + projections + gates
            # + mLSTM + outnorm + skip + output gate + proj_down + residual
            # in ONE program — only the depthwise SequenceConv2d (spatial
            # halo) stays in XLA. Norm/proj_up params come from twins; the
            # XLA side computes just the x_mlstm half that feeds the conv.
            # (drop_path must be inactive — the residual is added in-kernel)
            nrm = _RMSNormParams(self.dim, name="norm")()
            wu, bu_ = _DenseParams(self.dim, 2 * inner, self.proj_bias, name="proj_up")()
            xs = x if self.direction != "backward" else x[:, ::-1]
            xf32 = xs.astype(jnp.float32)
            yn = (xf32 * jax.lax.rsqrt(jnp.mean(xf32 * xf32, axis=-1, keepdims=True) + 1e-6)
                  * nrm).astype(x.dtype)
            xm = yn @ wu[:, :inner].astype(x.dtype)
            if self.proj_bias:
                xm = xm + bu_[:inner].astype(x.dtype)
            conv_act = nn.silu(
                SequenceConv2d(inner, self.conv_kernel_size, groups=inner,
                               seqlens=self.seqlens, name="conv")(xm))
            wq, bq_ = _HeadwiseParams(inner, num_heads, self.proj_bias, name="q_proj")()
            wk, bk_ = _HeadwiseParams(inner, num_heads, self.proj_bias, name="k_proj")()
            wv, bv_ = _HeadwiseParams(inner, num_heads, self.proj_bias, name="v_proj")()
            skip = self.param("learnable_skip", nn.initializers.ones, (inner,))
            wd, bd_ = _DenseParams(inner, self.dim, self.proj_bias, name="proj_down")()
            out = MatrixLSTMCell(
                dim=inner, num_heads=num_heads, chunk_size=self.chunk_size,
                igate_act=self.igate_act, backend=backend,
                use_outnorm=self.use_outnorm, name="mlstm_cell",
            )(None, None, None, fused_layer=(xs, conv_act, nrm, wu, bu_, wq, bq_,
                                             wk, bk_, wv, bv_, skip, wd, bd_))
            if self.direction == "backward":
                out = out[:, ::-1]
            return out

        y = RMSNorm(eps=1e-6, name="norm")(x)
        if self.direction == "backward":
            y = y[:, ::-1]
        y = nn.Dense(2 * inner, use_bias=self.proj_bias, kernel_init=nn.initializers.xavier_uniform(),
                     dtype=x.dtype, name="proj_up")(y)
        x_mlstm, z = jnp.split(y, 2, axis=-1)

        conv_act = nn.silu(
            SequenceConv2d(
                inner, self.conv_kernel_size, groups=inner, seqlens=self.seqlens, name="conv"
            )(x_mlstm)
        )
        if tp:
            # fully fused cell: projections + gates + mLSTM in one kernel;
            # q/k/v never materialize in HBM
            wq, bq_ = _HeadwiseParams(inner, num_heads, self.proj_bias, name="q_proj")()
            wk, bk_ = _HeadwiseParams(inner, num_heads, self.proj_bias, name="k_proj")()
            wv, bv_ = _HeadwiseParams(inner, num_heads, self.proj_bias, name="v_proj")()
            h = MatrixLSTMCell(
                dim=inner, num_heads=num_heads, chunk_size=self.chunk_size,
                igate_act=self.igate_act, backend=backend,
                use_outnorm=self.use_outnorm, name="mlstm_cell",
            )(None, None, None, fused=(conv_act, x_mlstm, wq, bq_, wk, bk_, wv, bv_))
        else:
            q = LinearHeadwiseExpand(inner, num_heads, use_bias=self.proj_bias,
                                     name="q_proj")(conv_act)
            k = LinearHeadwiseExpand(inner, num_heads, use_bias=self.proj_bias,
                                     name="k_proj")(conv_act)
            v = LinearHeadwiseExpand(inner, num_heads, use_bias=self.proj_bias,
                                     name="v_proj")(x_mlstm)

            h = MatrixLSTMCell(
                dim=inner, num_heads=num_heads, chunk_size=self.chunk_size,
                igate_act=self.igate_act, backend=backend,
                use_outnorm=self.use_outnorm, name="mlstm_cell",
            )(q, k, v)

        skip = self.param("learnable_skip", nn.initializers.ones, (inner,))
        h = h + skip.astype(h.dtype) * conv_act
        h = h * nn.silu(z)
        out = nn.Dense(self.dim, use_bias=self.proj_bias, kernel_init=nn.initializers.xavier_uniform(),
                       dtype=x.dtype, name="proj_down")(h)
        if self.direction == "backward":
            out = out[:, ::-1]
        if self.drop_path > 0.0:
            out = DropPath(self.drop_path, name="drop_path")(
                out, deterministic=not self.has_rng("dropout"))
        return residual + out


class ViLBlock(nn.Module):
    """One direction of a ViL block — the ViLLayer carries its own norm and
    residual, so the block is a passthrough (reference vision_lstm2.py:729)."""

    dim: int
    direction: str = "forward"
    qkv_block_size: int = 4
    seqlens: tuple | None = None
    chunk_size: int = 64
    conv_kernel_size: int = 3
    igate_act: str = "exp"
    mlstm_backend: str = "auto"
    use_outnorm: bool = True
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x):
        return ViLLayer(
            dim=self.dim, direction=self.direction, qkv_block_size=self.qkv_block_size,
            seqlens=self.seqlens, chunk_size=self.chunk_size,
            conv_kernel_size=self.conv_kernel_size, igate_act=self.igate_act,
            mlstm_backend=self.mlstm_backend, use_outnorm=self.use_outnorm,
            drop_path=self.drop_path, name="layer",
        )(x)


class ViLBlockPair(nn.Module):
    """Forward + backward traversal pair (reference vision_lstm2.py:1393).

    The fork only executes the forward direction (:1438-1441); that is the
    default. ``bidirectional=True`` restores the original ViL behavior
    (backward block applied to the forward output).
    """

    dim: int
    qkv_block_size: int = 16
    seqlens: tuple | None = None
    chunk_size: int = 64
    conv_kernel_size: int = 3
    igate_act: str = "exp"
    bidirectional: bool = False
    mlstm_backend: str = "auto"
    use_outnorm: bool = True
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x):  # (B, S, D) or (B, ..., D)
        shp = x.shape
        x = _flatten_tokens(x)
        kw = dict(
            dim=self.dim, qkv_block_size=self.qkv_block_size, seqlens=self.seqlens,
            chunk_size=self.chunk_size, conv_kernel_size=self.conv_kernel_size,
            igate_act=self.igate_act, mlstm_backend=self.mlstm_backend,
            use_outnorm=self.use_outnorm, drop_path=self.drop_path,
        )
        y = ViLBlock(direction="forward", name="fwd", **kw)(x)
        if self.bidirectional:
            y = ViLBlock(direction="backward", name="bwd", **kw)(y)
        return y.reshape(shp)


class VitPatchEmbed(nn.Module):
    """Strided-conv patch embedding (reference vision_lstm_util.py:155).
    (B, H, W, C) -> (B, H/P, W/P, dim)."""

    dim: int
    patch_size: int = 16

    @nn.compact
    def __call__(self, x):
        # rank decides dimensionality like the reference's ndim arg:
        # (B, L, C) -> 1d, (B, H, W, C) -> 2d, (B, T, H, W, C) -> 3d video
        nd = x.ndim - 2
        ps = (self.patch_size,) * nd if isinstance(self.patch_size, int) \
            else tuple(self.patch_size)
        if nd != 2:
            return nn.Conv(
                self.dim, ps, strides=ps, padding="VALID",
                kernel_init=nn.initializers.xavier_uniform(), dtype=x.dtype,
                name="proj",
            )(x)
        return nn.Conv(
            self.dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            kernel_init=nn.initializers.xavier_uniform(), dtype=x.dtype, name="proj",
        )(x)


class VitPosEmbed2d(nn.Module):
    """Learnable 2D pos embed with bicubic resize for new grids
    (reference vision_lstm_util.py:226-298)."""

    dim: int
    seqlens: tuple = (14, 14)

    @nn.compact
    def __call__(self, x):  # (B, H, W, D)
        h, w = self.seqlens
        pe = self.param("embed", nn.initializers.truncated_normal(stddev=0.02), (1, h, w, self.dim))
        if x.shape[1:3] != (h, w):
            pe = jax.image.resize(pe, (1, x.shape[1], x.shape[2], self.dim), method="bicubic")
        return x + pe.astype(x.dtype)


class VitPosEmbed1d(nn.Module):
    """Learnable 1D pos embed with linear resize (reference
    vision_lstm_util.py VitPosEmbed, ndim=1)."""

    dim: int
    seqlens: tuple = (196,)

    @nn.compact
    def __call__(self, x):  # (B, L, D)
        (l,) = self.seqlens
        pe = self.param("embed", nn.initializers.truncated_normal(stddev=0.02),
                        (1, l, self.dim))
        if x.shape[1] != l:
            pe = jax.image.resize(pe, (1, x.shape[1], self.dim), method="linear")
        return x + pe.astype(x.dtype)


class VitPosEmbed3d(nn.Module):
    """Learnable 3D (video) pos embed with trilinear resize (reference
    vision_lstm_util.py VitPosEmbed, ndim=3)."""

    dim: int
    seqlens: tuple = (8, 14, 14)

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, D)
        t, h, w = self.seqlens
        pe = self.param("embed", nn.initializers.truncated_normal(stddev=0.02),
                        (1, t, h, w, self.dim))
        if x.shape[1:4] != (t, h, w):
            pe = jax.image.resize(pe, (1, *x.shape[1:4], self.dim), method="trilinear")
        return x + pe.astype(x.dtype)


class VisionLSTMBackbone(nn.Module):
    """Full ViL backbone emitting multi-scale partials
    (reference block.py:1913 ``VisionLSTM``): patch embed -> pos embed ->
    N ViLBlockPairs, collecting normed outputs at ``output_indices`` as
    (B, h, w, dim) images, final output appended last.
    """

    dim: int
    depth: int = 12
    patch_size: int = 16
    resolution: tuple = (224, 224)
    output_indices: tuple = ()
    qkv_block_size: int = 16
    chunk_size: int = 64
    igate_act: str = "exp"
    bidirectional: bool = False
    mlstm_backend: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = VitPatchEmbed(self.dim, self.patch_size, name="patch_embed")(x)
        seqlens = (x.shape[1], x.shape[2])
        x = VitPosEmbed2d(self.dim, seqlens, name="pos_embed")(x)
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        outs = []
        norm = nn.LayerNorm(name="norm")
        for i in range(self.depth):
            x = ViLBlockPair(
                dim=self.dim, qkv_block_size=self.qkv_block_size, seqlens=seqlens,
                chunk_size=self.chunk_size, igate_act=self.igate_act,
                bidirectional=self.bidirectional, mlstm_backend=self.mlstm_backend,
                name=f"block{i}",
            )(x)
            if i in self.output_indices:
                outs.append(norm(x).reshape(b, h, w, d))
        outs.append(norm(x).reshape(b, h, w, d))
        return outs
