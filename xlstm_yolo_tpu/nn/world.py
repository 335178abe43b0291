"""YOLOWorld blocks — open-vocabulary detection (reference
``models/yolo/world/`` + ``nn/tasks.py:737`` WorldModel + ``nn/modules/
block.py`` C2fAttn/MaxSigmoidAttnBlock + ``nn/modules/head.py`` WorldDetect,
ContrastiveHead).

Class logits are similarities between image features and text embeddings.
The text encoder is external (precomputed embeddings — the reference calls
CLIP at runtime; a zero-egress deployment embeds the vocabulary offline).
The graph compiler threads the embeddings to every ``needs_guide`` module
via GraphModel's ``guide`` argument.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import Bottleneck, ConvBN



class ContrastiveHead(nn.Module):
    """Region-text similarity logits (reference nn/modules/head.py
    ContrastiveHead): cosine(image feature, text embedding) * logit_scale + bias."""

    @nn.compact
    def __call__(self, x, txt):  # x (B, H, W, C); txt (B, nt, C)
        bias = self.param("bias", nn.initializers.constant(-10.0), ())
        logit_scale = self.param("logit_scale", nn.initializers.constant(1.0 / 0.07), ())
        if txt.shape[0] == 1 and x.shape[0] > 1:
            txt = jnp.broadcast_to(txt, (x.shape[0], *txt.shape[1:]))
        xn = x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6, None)
        tn = txt / jnp.clip(jnp.linalg.norm(txt, axis=-1, keepdims=True), 1e-6, None)
        sim = jnp.einsum("bhwc,btc->bhwt", xn, tn)
        return sim * logit_scale + bias


class BNContrastiveHead(nn.Module):
    """Contrastive head normalizing image features with BatchNorm instead of
    l2 (reference block.py:560, used by YOLO-Worldv2): bias init -10,
    logit_scale init -1 (exp'd)."""

    @nn.compact
    def __call__(self, x, txt, train: bool = False):  # x (B,H,W,C); txt (B,nt,C)
        bias = self.param("bias", nn.initializers.constant(-10.0), ())
        logit_scale = self.param("logit_scale", nn.initializers.constant(-1.0), ())
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, name="norm")(x)
        if txt.shape[0] == 1 and x.shape[0] > 1:
            txt = jnp.broadcast_to(txt, (x.shape[0], *txt.shape[1:]))
        tn = txt / jnp.clip(jnp.linalg.norm(txt, axis=-1, keepdims=True), 1e-6, None)
        sim = jnp.einsum("bhwc,btc->bhwt", x, tn.astype(x.dtype))
        return sim * jnp.exp(logit_scale) + bias


def _adaptive_max_pool(x, k: int):
    """Torch AdaptiveMaxPool2d((k, k)) semantics, NHWC, static shapes."""
    b, h, w, c = x.shape
    rows = []
    for i in range(k):
        cols = []
        r0, r1 = (i * h) // k, -((-(i + 1) * h) // k)
        for j in range(k):
            c0, c1 = (j * w) // k, -((-(j + 1) * w) // k)
            cols.append(jnp.max(x[:, r0:r1, c0:c1], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, k, k, C)


class ImagePoolingAttn(nn.Module):
    """Image-aware text enhancement (reference block.py:496): each FPN level
    is pooled to k x k patches, the text embeddings cross-attend to them and
    the attended features are added back into the text. The graph replaces
    the running guide with this module's output (``updates_guide``)."""

    ec: int = 256
    ct: int = 512
    nh: int = 8
    k: int = 3
    use_scale: bool = False
    needs_guide = True
    updates_guide = True

    @nn.compact
    def __call__(self, feats, text, train: bool = False):
        bs = feats[0].shape[0]
        if text.shape[0] == 1 and bs > 1:
            text = jnp.broadcast_to(text, (bs, *text.shape[1:]))
        patches = []
        for i, f in enumerate(feats):
            p = nn.Conv(self.ec, (1, 1), name=f"proj{i}")(f)
            patches.append(_adaptive_max_pool(p, self.k).reshape(bs, self.k * self.k, self.ec))
        xp = jnp.concatenate(patches, axis=1)  # (B, nf*k*k, ec)
        q = nn.Dense(self.ec, name="query")(nn.LayerNorm(name="q_ln")(text))
        kk = nn.Dense(self.ec, name="key")(nn.LayerNorm(name="k_ln")(xp))
        vv = nn.Dense(self.ec, name="value")(nn.LayerNorm(name="v_ln")(xp))
        hc = self.ec // self.nh
        qh = q.reshape(bs, -1, self.nh, hc)
        kh = kk.reshape(bs, -1, self.nh, hc)
        vh = vv.reshape(bs, -1, self.nh, hc)
        aw = jnp.einsum("bnmc,bkmc->bmnk", qh, kh) / (hc ** 0.5)
        aw = jax.nn.softmax(aw, axis=-1)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, vh).reshape(bs, -1, self.ec)
        out = nn.Dense(self.ct, name="proj")(out)
        scale = self.param("scale", nn.initializers.zeros, ()) if self.use_scale else 1.0
        return text + out * scale


class MaxSigmoidAttnBlock(nn.Module):
    """Text-guided spatial attention (reference block.py MaxSigmoidAttnBlock)."""

    c2: int
    nh: int = 1
    ec: int = 128

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        b, h, w, c = x.shape
        embed = ConvBN(self.ec, 1, act=False, name="ec")(x, train) if c != self.ec else x
        gl = nn.Dense(self.ec, name="gl")(guide)  # (B|1, nt, ec)
        if gl.shape[0] == 1 and b > 1:
            gl = jnp.broadcast_to(gl, (b, *gl.shape[1:]))
        e = embed.reshape(b, h, w, self.nh, self.ec // self.nh)
        g = gl.reshape(b, -1, self.nh, self.ec // self.nh)
        aw = jnp.einsum("bhwnd,btnd->bhwnt", e, g)
        aw = jnp.max(aw, axis=-1) / (self.ec // self.nh) ** 0.5  # (B, H, W, nh)
        bias = self.param("bias", nn.initializers.zeros, (self.nh,))
        aw = jax.nn.sigmoid(aw + bias) * 2.0
        pf = ConvBN(self.c2, 3, act=False, name="proj_conv")(x, train)
        pf = pf.reshape(b, h, w, self.nh, self.c2 // self.nh) * aw[..., None]
        return pf.reshape(b, h, w, self.c2)


class C2fAttn(nn.Module):
    """C2f with a text-guided attention branch (reference block.py C2fAttn)."""

    c2: int
    n: int = 1
    ec: int = 128
    nh: int = 1
    needs_guide = True

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        c = int(self.c2 * 0.5)
        y = ConvBN(2 * c, 1, 1, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(Bottleneck(c, True, 1, k=(3, 3), e=1.0, name=f"m{i}")(ys[-1], train))
        ys.append(MaxSigmoidAttnBlock(c, self.nh, self.ec, name="attn")(ys[-1], guide, train))
        return ConvBN(self.c2, 1, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class WorldDetectHead(nn.Module):
    """Open-vocab detect head: box branch like Detect, cls logits from
    ContrastiveHead against the text embeddings (reference head.py WorldDetect)."""

    embed_dim: int = 512
    ch: tuple = ()
    reg_max: int = 16
    with_bn: bool = False  # Worldv2: BNContrastiveHead instead of cosine
    needs_guide = True

    @nn.compact
    def __call__(self, feats, txt_feats, train: bool = False):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], self.embed_dim)
        outs = []
        for i, x in enumerate(feats):
            b = ConvBN(c2, 3, name=f"cv2_{i}_0")(x, train)
            b = ConvBN(c2, 3, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), name=f"cv2_{i}_2")(b)
            e = ConvBN(c3, 3, name=f"cv4_{i}_0")(x, train)
            e = ConvBN(self.embed_dim, 1, act=False, name=f"cv4_{i}_1")(e, train)
            if self.with_bn:
                cls = BNContrastiveHead(name=f"cv4_{i}_attn")(e, txt_feats, train=train)
            else:
                cls = ContrastiveHead(name=f"cv4_{i}_attn")(e, txt_feats)
            outs.append(jnp.concatenate([b, cls], axis=-1))
        return outs
