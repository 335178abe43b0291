"""SAM2 — memory-based video object segmentation (reference
``models/sam/modules/``: encoders.py:378-760 (MemoryEncoder, ImageEncoder,
FpnNeck, Hiera), memory_attention.py (MemoryAttention[Layer]),
sam.py:105-1009 (SAM2Model, num_maskmem ring), predict.py:623,815
(SAM2Predictor, SAM2VideoPredictor); MobileSAM tiny encoder
tiny_encoder.py).

TPU-first design notes (not a port):
  * The reference keeps a python dict of per-frame memories and concatenates
    a variable number of them before cross-attention (sam.py:619-694). Here
    the memory bank is a FIXED-SIZE ring buffer of ``num_maskmem`` slots with
    a validity mask, so the per-frame track step is ONE jitted static-shape
    function — no retrace as the video progresses, no host sync.
  * Hiera stages use global attention at low resolution and windowed
    attention early, all expressed as reshapes + batched MHA so XLA tiles
    them onto the MXU.
  * Temporal position of each memory is encoded with a learned
    ``maskmem_tpos_enc`` table (sam.py:273) gathered by slot age.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .models_sam import MLPBlock, MaskDecoder, PromptEncoder


# ---------------------------------------------------------------------------
# Hiera trunk (reference encoders.py:645-760)
# ---------------------------------------------------------------------------


def _bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Dense (n_out, n_in) interpolation matrix reproducing torch
    F.interpolate(mode='bicubic', align_corners=False) exactly (cubic
    convolution a=-0.75, border-replicate taps) — jax.image.resize uses a
    different cubic kernel, which broke Hiera pos-embed parity."""
    a = -0.75
    scale = n_in / n_out
    W = np.zeros((n_out, n_in), np.float64)
    for o in range(n_out):
        src = (o + 0.5) * scale - 0.5
        f = int(np.floor(src))
        t = src - f
        offs = np.array([-1, 0, 1, 2])
        xs = np.abs(offs - t)
        w = np.where(
            xs <= 1, (a + 2) * xs**3 - (a + 3) * xs**2 + 1,
            np.where(xs < 2, a * xs**3 - 5 * a * xs**2 + 8 * a * xs - 4 * a, 0.0))
        for k, off in enumerate(offs):
            W[o, int(np.clip(f + off, 0, n_in - 1))] += w[k]
    return W.astype(np.float32)


def _bicubic_resize_torch(x, oh: int, ow: int):
    """(1, h, w, c) -> (1, oh, ow, c) with torch-bicubic semantics."""
    Wh = jnp.asarray(_bicubic_matrix(x.shape[1], oh))
    Ww = jnp.asarray(_bicubic_matrix(x.shape[2], ow))
    y = jnp.einsum("Oh,bhwc->bOwc", Wh, x)
    return jnp.einsum("Ow,bhwc->bhOc", Ww, y)


def _window_partition(x, ws):
    b, h, w, c = x.shape
    pad_h, pad_w = (ws - h % ws) % ws, (ws - w % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c), (hp, wp)


def _window_unpartition(x, ws, hw_pad, hw):
    hp, wp = hw_pad
    h, w = hw
    b = x.shape[0] // (hp // ws * (wp // ws))
    c = x.shape[-1]
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp, wp, c)[:, :h, :w]


class _HieraMSA(nn.Module):
    """MultiScaleAttention (reference blocks.py:503): packed qkv, query
    2x2-maxpooled AFTER the projection on stage-change blocks, SDPA, proj."""

    dim_out: int
    num_heads: int
    q_stride: int = 0  # 0 = no query pooling

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, _ = x.shape
        dh = self.dim_out // self.num_heads
        qkv = nn.Dense(3 * self.dim_out, name="qkv")(x.reshape(b, h * w, -1))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_stride:
            s = self.q_stride
            q = nn.max_pool(q.reshape(b, h, w, -1), (s, s), strides=(s, s))
            h, w = q.shape[1:3]
            q = q.reshape(b, h * w, self.num_heads, dh)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(dh).astype(x.dtype)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, h * w, self.dim_out)
        return nn.Dense(self.dim_out, name="proj")(o).reshape(b, h, w, self.dim_out)


class HieraBlock(nn.Module):
    """MultiScaleBlock (reference blocks.py:583): pre-LN windowed/global MSA
    with optional 2x2 query pooling at stage changes (dim-change shortcut =
    pooled linear proj of the NORMALIZED input), then LN + 2-layer GELU MLP.
    On q-pool blocks the window shrinks by the stride and attention still
    runs windowed (reference forward, blocks.py:683-700)."""

    dim: int
    dim_out: int
    num_heads: int
    window_size: int = 0  # 0 => global attention
    q_stride: int = 0

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.dim != self.dim_out:
            p = nn.Dense(self.dim_out, name="proj")(x)
            if self.q_stride:
                s = self.q_stride
                p = nn.max_pool(p, (s, s), strides=(s, s))
            shortcut = p
        ws = self.window_size
        if ws > 0:
            H, W = x.shape[1:3]
            x, pad_hw = _window_partition(x, ws)
        x = _HieraMSA(self.dim_out, self.num_heads, q_stride=self.q_stride,
                      name="attn")(x)
        if self.q_stride:
            ws = ws // self.q_stride
            H, W = shortcut.shape[1:3]
            pad_h = (ws - H % ws) % ws if ws else 0
            pad_w = (ws - W % ws) % ws if ws else 0
            pad_hw = (H + pad_h, W + pad_w)
        if self.window_size > 0:
            x = _window_unpartition(x, ws, pad_hw, (H, W))
        x = shortcut + x
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(self.dim_out * 4, name="mlp0")(h)
        h = nn.Dense(self.dim_out, name="mlp1")(jax.nn.gelu(h, approximate=False))
        return x + h


class Hiera(nn.Module):
    """Hierarchical ViT trunk (reference encoders.py:645-760), exact
    reference semantics so real SAM2 checkpoints map tensor-for-tensor
    (utils/torch_import.py:sam2_hiera_params):

      * flat block list; q-pool at the FIRST block of stages 2..4 (up to
        ``q_pool`` of them), dim/heads x2 at each stage change;
      * per-stage window spec that LAGS by one block (the first block of a
        new stage keeps the previous stage's window);
      * ``global_att_blocks`` run global attention (window 0);
      * pos embed = bicubic background (14x14 default) + tiled window
        component (arXiv:2311.05613).
    """

    embed_dim: int = 96
    num_heads: int = 1
    stages: tuple = (1, 2, 7, 2)
    window_spec: tuple = (8, 4, 14, 7)
    global_att_blocks: tuple = (5, 7, 9)  # sam2.1-tiny defaults
    q_pool: int = 3
    q_stride: int = 2
    bkg_pos_size: tuple = (14, 14)

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) -> per-stage maps, strides 4/8/16/32
        x = nn.Conv(self.embed_dim, (7, 7), strides=(4, 4), padding=((3, 3), (3, 3)),
                    name="patch_embed")(x)
        h, w = x.shape[1:3]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, *self.bkg_pos_size, self.embed_dim))
        pos_win = self.param("pos_embed_window", nn.initializers.normal(0.02),
                             (1, self.window_spec[0], self.window_spec[0], self.embed_dim))
        pe = _bicubic_resize_torch(pos, h, w)
        pe = pe + jnp.tile(pos_win, (1, h // pos_win.shape[1], w // pos_win.shape[2], 1))
        x = x + pe

        stage_ends = [sum(self.stages[: i + 1]) - 1 for i in range(len(self.stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]][: self.q_pool]
        outs = []
        dim, heads, cur_stage = self.embed_dim, self.num_heads, 1
        for i in range(sum(self.stages)):
            window_size = self.window_spec[cur_stage - 1]  # lags by a block
            if self.global_att_blocks and i in self.global_att_blocks:
                window_size = 0
            dim_out = dim
            if i - 1 in stage_ends:
                dim_out = dim * 2
                heads *= 2
                cur_stage += 1
            x = HieraBlock(dim, dim_out, heads, window_size=window_size,
                           q_stride=self.q_stride if i in q_pool_blocks else 0,
                           name=f"b{i}")(x)
            dim = dim_out
            if i in stage_ends:
                outs.append(x)
        return outs


class FpnNeck(nn.Module):
    """Top-down FPN producing d_model-ch maps per scale
    (reference encoders.py:501)."""

    d_model: int = 256

    @nn.compact
    def __call__(self, feats):  # list coarse->fine ordering preserved from Hiera
        lat = [
            nn.Conv(self.d_model, (1, 1), name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        out = [None] * len(lat)
        prev = None
        for i in reversed(range(len(lat))):
            top = lat[i]
            if prev is not None:
                prev = jax.image.resize(prev, top.shape, method="nearest")
                top = top + prev
            prev = top
            out[i] = top
        return out


def sine_pe_2d(h: int, w: int, dim: int) -> jnp.ndarray:
    """Sine positional embedding (reference sam2 position_encoding)."""
    half = dim // 2
    freq = jnp.exp(-jnp.log(10000.0) * (jnp.arange(half // 2) / (half // 2)))
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * freq[None]
    xs = jnp.arange(w, dtype=jnp.float32)[:, None] * freq[None]
    pe_y = jnp.concatenate([jnp.sin(ys), jnp.cos(ys)], -1)  # (H, half)
    pe_x = jnp.concatenate([jnp.sin(xs), jnp.cos(xs)], -1)  # (W, half)
    pe = jnp.concatenate(
        [jnp.broadcast_to(pe_y[:, None], (h, w, half)),
         jnp.broadcast_to(pe_x[None], (h, w, half))], -1)
    return pe  # (H, W, dim)


# ---------------------------------------------------------------------------
# Memory machinery (reference memory_attention.py, encoders.py:378)
# ---------------------------------------------------------------------------


class MemoryAttentionLayer(nn.Module):
    """self-attn on current-frame tokens + cross-attn into the memory bank +
    FFN (reference memory_attention.py:12)."""

    dim: int = 256
    num_heads: int = 8
    kv_dim: int = 64

    @nn.compact
    def __call__(self, x, x_pe, mem, mem_pe, mem_mask):
        # x (B, S, C); mem (B, M, Ckv); mem_mask (B, M) True=valid
        sa = nn.MultiHeadDotProductAttention(self.num_heads, dtype=x.dtype, name="self_attn")
        q = x + x_pe
        x = nn.LayerNorm(name="n1")(x + sa(q, q, x))
        memk = nn.Dense(self.dim, name="mem_proj")(mem + mem_pe)
        attn_mask = jnp.broadcast_to(
            mem_mask[:, None, None, :], (x.shape[0], 1, x.shape[1], mem_mask.shape[1])
        )
        ca = nn.MultiHeadDotProductAttention(self.num_heads, dtype=x.dtype, name="cross_attn")
        x = nn.LayerNorm(name="n2")(x + ca(x + x_pe, memk, memk, mask=attn_mask))
        return nn.LayerNorm(name="n3")(x + MLPBlock(self.dim, self.dim * 8, name="mlp")(x))


class MemoryAttention(nn.Module):
    """Stack of memory-attention layers (reference memory_attention.py:140)."""

    dim: int = 256
    depth: int = 4

    @nn.compact
    def __call__(self, x, x_pe, mem, mem_pe, mem_mask):
        for i in range(self.depth):
            x = MemoryAttentionLayer(self.dim, name=f"layer{i}")(x, x_pe, mem, mem_pe, mem_mask)
        return nn.LayerNorm(name="norm")(x)


class MemoryEncoder(nn.Module):
    """Fuse pixel features with the predicted mask into a compact memory
    (reference encoders.py:378: mask downsampler + conv fuser -> mem_dim)."""

    mem_dim: int = 64

    @nn.compact
    def __call__(self, feat, mask):
        # feat (B, H, W, C) stride-16 features; mask (B, 4H, 4W) logits
        m = jax.nn.sigmoid(mask)[..., None]
        for i, ch in enumerate((4, 16, 64)):
            m = nn.gelu(nn.LayerNorm(name=f"ds_ln{i}")(
                nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        name=f"ds{i}")(m)))
        m = jax.image.resize(m, (*feat.shape[:3], m.shape[-1]), "nearest")
        x = nn.Conv(feat.shape[-1], (1, 1), name="feat_proj")(feat) + \
            nn.Conv(feat.shape[-1], (1, 1), name="mask_proj")(m)
        for i in range(2):  # conv fuser
            h = nn.Conv(x.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=x.shape[-1], name=f"fuse_dw{i}")(x)
            h = nn.Conv(x.shape[-1], (1, 1), name=f"fuse_pw{i}")(nn.LayerNorm(name=f"fuse_ln{i}")(h))
            x = x + h
        return nn.Conv(self.mem_dim, (1, 1), name="out_proj")(x)  # (B, H, W, mem_dim)


# ---------------------------------------------------------------------------
# SAM2 model (reference sam.py:105)
# ---------------------------------------------------------------------------


class SAM2(nn.Module):
    """SAM2: Hiera image encoder + memory-conditioned mask decoding.

    The memory bank is a fixed ring buffer of ``num_maskmem`` encoded frames
    (reference sam.py:145 num_maskmem=7 — 1 conditioning + 6 recent)."""

    img_size: int = 512
    d_model: int = 256
    mem_dim: int = 64
    num_maskmem: int = 7
    embed_dim: int = 96

    def setup(self):
        self.trunk = Hiera(embed_dim=self.embed_dim)
        self.neck = FpnNeck(self.d_model)
        self.prompt_encoder = PromptEncoder(embed_dim=self.d_model)
        self.mask_decoder = MaskDecoder(dim=self.d_model)
        self.memory_attention = MemoryAttention(self.d_model)
        self.memory_encoder = MemoryEncoder(self.mem_dim)
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", nn.initializers.zeros, (self.num_maskmem, self.mem_dim)
        )
        self.no_mem_embed = self.param(
            "no_mem_embed", nn.initializers.normal(0.02), (self.d_model,)
        )

    def encode_image(self, x):
        """(B,H,W,3) -> stride-16 feature map (B, H/16, W/16, d_model)."""
        return self.neck(self.trunk(x))[2]

    def _condition(self, feat, mem_bank, mem_age, mem_valid):
        """Cross-attend current features into the memory bank.

        feat (B, h, w, C); mem_bank (B, M, h*w, mem_dim); mem_age (B, M)
        int age index into tpos table; mem_valid (B, M) bool."""
        b, h, w, c = feat.shape
        m = mem_bank.shape[1]
        x = feat.reshape(b, h * w, c)
        x_pe = sine_pe_2d(h, w, c).reshape(1, h * w, c)
        tpos = jnp.take(self.maskmem_tpos_enc, jnp.clip(mem_age, 0, self.num_maskmem - 1), axis=0)
        mem = (mem_bank + tpos[:, :, None, :]).reshape(b, m * h * w, self.mem_dim)
        mem_pe = jnp.broadcast_to(
            sine_pe_2d(h, w, self.mem_dim).reshape(1, 1, h * w, self.mem_dim),
            (b, m, h * w, self.mem_dim)).reshape(b, m * h * w, self.mem_dim)
        mask = jnp.repeat(mem_valid, h * w, axis=1)
        any_mem = jnp.any(mem_valid, axis=1, keepdims=True)
        cond = self.memory_attention(x, x_pe, mem, mem_pe, mask)
        x = jnp.where(any_mem[..., None], cond, x + self.no_mem_embed)
        return x.reshape(b, h, w, c)

    def decode(self, feat, points=None, labels=None, boxes=None):
        h, w = feat.shape[1:3]
        sparse = self.prompt_encoder(points, labels, boxes, img_size=float(self.img_size))
        dense = jnp.broadcast_to(self.prompt_encoder.no_mask_embed[None, None, None], feat.shape)
        pe = self.prompt_encoder.dense_pe(h, w)
        return self.mask_decoder(feat, pe, sparse, dense)

    def __call__(self, x, points=None, labels=None, boxes=None):
        return self.decode(self.encode_image(x), points, labels, boxes)

    def track_step(self, x, mem_bank, mem_age, mem_valid, points=None, labels=None):
        """One video frame: encode, condition on memory, decode, encode new
        memory (reference sam.py:914 track_step).  Returns
        (masks, iou, new_memory (B, h*w, mem_dim))."""
        feat = self.encode_image(x)
        cond = self._condition(feat, mem_bank, mem_age, mem_valid)
        masks, iou = self.decode(cond, points, labels)
        best = jnp.argmax(iou, axis=-1)
        sel = jnp.take_along_axis(masks, best[:, None, None, None], axis=1)[:, 0]
        sel = jax.image.resize(sel, (x.shape[0], feat.shape[1] * 4, feat.shape[2] * 4), "bilinear")
        new_mem = self.memory_encoder(feat, sel)
        b, h, w, _ = new_mem.shape
        return masks, iou, new_mem.reshape(b, h * w, self.mem_dim)


class SAM2Predictor:
    """Static-image SAM2 prompting (reference predict.py:623) — same
    set_image/predict flow as SAMPredictor but over the Hiera encoder."""

    def __init__(self, model: SAM2 | None = None, variables: dict | None = None,
                 img_size: int = 512):
        from .models_sam import SAMPredictor

        self.model = model or SAM2(img_size=img_size)
        inner = SAMPredictor.__new__(SAMPredictor)
        inner.model = self.model
        inner.variables = variables
        inner.img_size = img_size
        inner._embed = None
        inner._orig_shape = None
        inner._encode = jax.jit(
            lambda v, x: self.model.apply(v, x, method=self.model.encode_image))
        inner._decode = jax.jit(
            lambda v, emb, p, l, bx: self.model.apply(v, emb, p, l, bx, method=self.model.decode))
        self._inner = inner

    def set_image(self, img):
        self._inner.set_image(img)
        return self

    def predict(self, **kw):
        return self._inner.predict(**kw)


class SAM2VideoPredictor:
    """Streaming video predictor with a jitted fixed-shape track step
    (reference predict.py:815 SAM2VideoPredictor).

    Usage: ``p.init_state(); p.add_prompt(frame0, points=...); for f in
    frames: mask = p.track(f)``."""

    def __init__(self, model: SAM2 | None = None, variables: dict | None = None,
                 img_size: int = 512):
        self.model = model or SAM2(img_size=img_size)
        self.img_size = img_size
        self.variables = variables
        if variables is None:
            x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
            hw = (img_size // 16) ** 2
            self.variables = self.model.init(
                jax.random.PRNGKey(0), x,
                jnp.zeros((1, self.model.num_maskmem, hw, self.model.mem_dim)),
                jnp.zeros((1, self.model.num_maskmem), jnp.int32),
                jnp.zeros((1, self.model.num_maskmem), bool), None, None,
                method=self.model.track_step)
        self._step = jax.jit(
            lambda v, x, bank, age, valid, p, l: self.model.apply(
                v, x, bank, age, valid, p, l, method=self.model.track_step)
        )
        self._state = None

    def init_state(self, batch: int = 1):
        m = self.model.num_maskmem
        hw = (self.img_size // 16) ** 2
        self._state = dict(
            bank=jnp.zeros((batch, m, hw, self.model.mem_dim), jnp.float32),
            age=jnp.zeros((batch, m), jnp.int32),
            valid=jnp.zeros((batch, m), bool),
            ptr=0,
        )
        return self

    def _prep(self, frame: np.ndarray) -> jnp.ndarray:
        import cv2

        f = cv2.resize(frame, (self.img_size, self.img_size))
        return jnp.asarray(f, jnp.float32)[None] / 255.0

    def track(self, frame: np.ndarray, points=None, point_labels=None):
        """Track into the next frame; points given only on prompt frames.
        Returns the best mask (H, W) float logits at model resolution / 4."""
        assert self._state is not None, "call init_state first"
        s = self._state
        p = l = None
        if points is not None:
            scale = self.img_size / max(frame.shape[:2])
            p = jnp.asarray(np.asarray(points, np.float32) * scale)[None]
            l = jnp.asarray(
                np.asarray(point_labels if point_labels is not None else np.ones(len(points))))[None]
        masks, iou, new_mem = self._step(self.variables, self._prep(frame),
                                         s["bank"], s["age"], s["valid"], p, l)
        # ring-buffer update (slot 0 = conditioning frame, kept forever)
        ptr = 1 + (s["ptr"] % (self.model.num_maskmem - 1)) if bool(s["valid"][0, 0]) else 0
        s["bank"] = s["bank"].at[:, ptr].set(new_mem)
        s["age"] = jnp.minimum(s["age"] + 1, self.model.num_maskmem - 1).at[:, ptr].set(0)
        s["valid"] = s["valid"].at[:, ptr].set(True)
        s["ptr"] = s["ptr"] + 1 if ptr != 0 else 0
        best = int(np.argmax(np.asarray(iou[0])))
        return np.asarray(masks[0, best])


# ---------------------------------------------------------------------------
# MobileSAM tiny encoder (reference models/sam/modules/tiny_encoder.py)
# ---------------------------------------------------------------------------


class TinyViTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        shortcut = x
        xw, hw_pad = _window_partition(x, self.window_size)
        seq = xw.reshape(xw.shape[0], self.window_size ** 2, c)
        seq = nn.MultiHeadDotProductAttention(self.num_heads, dtype=x.dtype, name="attn")(
            nn.LayerNorm(name="ln")(seq), seq, seq)
        x = shortcut + _window_unpartition(
            seq.reshape(-1, self.window_size, self.window_size, c), self.window_size, hw_pad, (h, w))
        # local conv (depthwise) instead of a second attention — TinyViT style
        loc = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c, name="local_conv")(x)
        x = x + loc
        return x + MLPBlock(c, c * 4, name="mlp")(nn.LayerNorm(name="ln2")(x))


class TinyViT(nn.Module):
    """MobileSAM image encoder: conv stem + 3 attention stages + SAM neck
    (reference tiny_encoder.py: TinyViT)."""

    dims: tuple = (64, 128, 160)
    depths: tuple = (2, 2, 4)
    num_heads: tuple = (2, 4, 5)
    out_chans: int = 256

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) -> (B, H/16, W/16, 256)
        x = nn.gelu(nn.Conv(self.dims[0] // 2, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name="stem0")(x))
        x = nn.Conv(self.dims[0], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name="stem1")(x)
        for si, (dim, depth, heads) in enumerate(zip(self.dims, self.depths, self.num_heads)):
            if si > 0:
                x = nn.Conv(dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            name=f"down{si}")(x)
            for bi in range(depth):
                x = TinyViTBlock(dim, heads, name=f"s{si}b{bi}")(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck0")(x)
        x = nn.LayerNorm(name="neck_ln0")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="neck1")(x)
        return nn.LayerNorm(name="neck_ln1")(x)


def build_sam(variant: str = "vit_b", img_size: int = 1024):
    """Factory mirroring reference models/sam/build.py:23-121."""
    from .models_sam import SAM

    if variant in ("vit_b", "vit_l", "vit_h"):
        dim, depth = {"vit_b": (768, 12), "vit_l": (1024, 24), "vit_h": (1280, 32)}[variant]
        return SAM(img_size=img_size, encoder_dim=dim, encoder_depth=depth)
    if variant == "mobile_sam":
        return SAM(img_size=img_size, encoder_dim=256, encoder_depth=2)
    if variant.startswith("sam2"):
        return SAM2(img_size=img_size)
    raise ValueError(f"unknown SAM variant {variant!r}")
