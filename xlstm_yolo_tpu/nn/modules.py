"""Conv/block module zoo — flax.linen, NHWC layout (TPU-native).

Re-designs the reference module zoo (``nn/modules/conv.py``,
``nn/modules/block.py:1-1186``) for XLA: NHWC activations (TPU conv layout),
BatchNorm through linen with a mutable ``batch_stats`` collection (under
SPMD jit a mean over the sharded batch axis is a *global* mean, so this is
sync-BN for free), SiLU default activation, and inference-time Conv+BN
folding done as a pure pytree transform (see ``fuse.py``) instead of module
surgery.

Every module takes/returns (B, H, W, C) unless stated. ``train: bool`` is
threaded through ``__call__`` for BN mode.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    """Same-padding for odd kernels (reference nn/modules/conv.py:autopad)."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


class ConvBN(nn.Module):
    """Conv2d + BatchNorm + activation. The reference ``Conv`` (conv.py:38-58)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: bool | str = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = x.dtype
        pad = autopad(self.k, self.p, self.d)
        x = nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            dtype=dt,
            name="conv",
        )(x)
        # BN statistics in fp32, activations back to the compute dtype —
        # otherwise one fp32 BN output promotes every downstream conv to fp32
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=jnp.float32, name="bn"
        )(x).astype(dt)
        return _act(x, self.act)


def _act(x, act):
    if act is True or act == "silu":
        return nn.silu(x)
    if act is False or act is None or act == "identity":
        return x
    if act == "relu":
        return nn.relu(x)
    if act == "sigmoid":
        return nn.sigmoid(x)
    if act == "gelu":
        return nn.gelu(x)
    raise ValueError(f"unknown act {act!r}")


class DWConv(nn.Module):
    """Depthwise conv: groups = gcd(c1, c2). Positional args follow the
    reference's DWConv(c1, c2, k, s, d, act) (conv.py:75) so YAML rows like
    rt-detr's ``[128, 3, 2, 1, False]`` resolve identically."""

    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: bool | str = True
    p: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math

        dt = x.dtype
        g = math.gcd(x.shape[-1], self.c2)
        pad = autopad(self.k, self.p, self.d)
        y = nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            dtype=dt,
            name="conv",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=jnp.float32, name="bn"
        )(y).astype(dt)
        return _act(y, self.act)


class Bottleneck(nn.Module):
    """Standard bottleneck (reference block.py Bottleneck)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBN(c_, self.k[0], 1, name="cv1")(x, train)
        y = ConvBN(self.c2, self.k[1], 1, g=self.g, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class C2f(nn.Module):
    """CSP bottleneck, 2 convs, fast (reference block.py C2f)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(
                Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m{i}")(ys[-1], train)
            )
        return ConvBN(self.c2, 1, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference block.py C3)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, k=(1, 3), e=1.0, name=f"m{i}")(a, train)
        b = ConvBN(c_, 1, 1, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class C3k2(nn.Module):
    """YOLO11 block: C2f whose inner blocks are C3k or Bottleneck (block.py C3k2)."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            if self.c3k:
                ys.append(C3k(c, 2, self.shortcut, self.g, name=f"m{i}")(ys[-1], train))
            else:
                # C3k2's inner bottleneck keeps the default e=0.5 (C2f uses 1.0)
                ys.append(Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=0.5, name=f"m{i}")(ys[-1], train))
        return ConvBN(self.c2, 1, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class C3k(nn.Module):
    """C3 with configurable kernel (block.py C3k)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, k=(self.k, self.k), e=1.0, name=f"m{i}")(a, train)
        b = ConvBN(c_, 1, 1, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling, fast (reference block.py SPPF): 3 chained maxpools."""

    c2: int
    k: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, 1, name="cv1")(x, train)
        p = self.k // 2
        outs = [y]
        for _ in range(3):
            outs.append(
                nn.max_pool(
                    outs[-1], (self.k, self.k), strides=(1, 1), padding=((p, p), (p, p))
                )
            )
        return ConvBN(self.c2, 1, 1, name="cv2")(jnp.concatenate(outs, axis=-1), train)


class Concat(nn.Module):
    """Concatenate a list of tensors along channels."""

    axis: int = -1

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        return jnp.concatenate(list(xs), axis=self.axis)


class Upsample(nn.Module):
    """Nearest-neighbor 2x upsample (torch nn.Upsample equivalent).

    Nearest mode uses broadcast+reshape (pure data movement XLA handles as a
    cheap copy) instead of jax.image.resize's gather."""

    scale: int = 2
    mode: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s = self.scale
        if self.mode == "nearest":
            y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, s, w, s, c))
            return y.reshape(b, h * s, w * s, c)
        return jax.image.resize(x, (b, h * s, w * s, c), method="bilinear")


class MaxPool(nn.Module):
    k: int = 2
    s: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2 if self.k % 2 == 1 else 0
        return nn.max_pool(x, (self.k, self.k), strides=(self.s, self.s), padding=((p, p), (p, p)))


class ZeroPad2d(nn.Module):
    """Explicit spatial zero padding (torch nn.ZeroPad2d in the reference's
    yolov3-tiny YAML); padding = (left, right, top, bottom)."""

    padding: tuple = (0, 0, 0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        l, r, t, b = self.padding
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class Attention(nn.Module):
    """Multi-head self-attention over the spatial grid with positional conv
    (reference block.py Attention used by PSA/C2PSA)."""

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        nh_kd = key_dim * self.num_heads
        hsz = self.dim + nh_kd * 2
        qkv = ConvBN(hsz, 1, act=False, name="qkv")(x, train)
        qkv = qkv.reshape(b, n, self.num_heads, key_dim * 2 + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, key_dim * 2], axis=-1)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.float32(key_dim)
        )
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h, w, self.dim)
        pe = ConvBN(self.dim, 3, 1, g=self.dim, act=False, name="pe")(
            v.reshape(b, h, w, self.num_heads * head_dim), train
        )
        return ConvBN(self.dim, 1, act=False, name="proj")(y + pe, train)


class PSABlock(nn.Module):
    """Attention + MLP with residuals (reference block.py PSABlock)."""

    c: int
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Attention(self.c, self.num_heads, self.attn_ratio, name="attn")(x, train)
        x = x + y if self.shortcut else y
        y = ConvBN(self.c * 2, 1, name="ffn0")(x, train)
        y = ConvBN(self.c, 1, act=False, name="ffn1")(y, train)
        return x + y if self.shortcut else y


class C2PSA(nn.Module):
    """CSP wrapper around PSABlocks (reference block.py C2PSA, YOLO11)."""

    c2: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, name="cv1")(x, train)
        a, b_ = jnp.split(y, [c], axis=-1)
        for i in range(self.n):
            b_ = PSABlock(c, attn_ratio=0.5, num_heads=max(1, c // 64), name=f"m{i}")(b_, train)
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate([a, b_], axis=-1), train)


class SCDown(nn.Module):
    """Separable conv downsample (reference block.py SCDown, v10)."""

    c2: int
    k: int = 3
    s: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c2, 1, 1, name="cv1")(x, train)
        return ConvBN(self.c2, self.k, self.s, g=self.c2, act=False, name="cv2")(y, train)


class ADown(nn.Module):
    """v9 downsample: avgpool+conv branch and maxpool+conv branch."""

    c2: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2 // 2
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding=((0, 1), (0, 1)))
        x1, x2 = jnp.split(x, 2, axis=-1)
        x1 = ConvBN(c, 3, 2, name="cv1")(x1, train)
        x2 = nn.max_pool(x2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x2 = ConvBN(c, 1, 1, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], axis=-1)


class AConv(nn.Module):
    """v9-t/s downsample: 2x2 stride-1 avgpool then strided conv
    (reference block.py AConv)."""

    c2: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding=((0, 1), (0, 1)))
        return ConvBN(self.c2, 3, 2, name="cv1")(x, train)


class Identity(nn.Module):
    """Pass-through (torch nn.Identity / v9's Silence placeholder layer)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


class Focus(nn.Module):
    """Space-to-depth stem (reference conv.py Focus)."""

    c2: int
    k: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]],
            axis=-1,
        )
        return ConvBN(self.c2, self.k, 1, name="conv")(x, train)


class GhostConv(nn.Module):
    """Ghost convolution (reference conv.py GhostConv)."""

    c2: int
    k: int = 1
    s: int = 1
    act: bool | str = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = ConvBN(c_, self.k, self.s, act=self.act, name="cv1")(x, train)
        y2 = ConvBN(c_, 5, 1, g=c_, act=self.act, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class Index(nn.Module):
    """Select one tensor from a list input (reference conv.py Index)."""

    index: int = 0

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return xs[self.index]


class Classify(nn.Module):
    """Classification head: conv -> GAP -> dropout -> linear (reference head.py Classify)."""

    nc: int
    c_: int = 1280

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.c_, 1, 1, name="conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.nc, name="linear")(x)
        return x


class RepConv(nn.Module):
    """Re-parameterizable conv: 3x3 + 1x1 branches summed (train form;
    deploy fuse folds them — reference nn/modules/conv.py RepConv)."""

    c2: int
    k: int = 3
    s: int = 1
    act: bool | str = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y1 = ConvBN(self.c2, self.k, self.s, act=False, name="conv1")(x, train)
        y2 = ConvBN(self.c2, 1, self.s, act=False, name="conv2")(x, train)
        return _act(y1 + y2, self.act)


class RepBottleneck(nn.Module):
    """Bottleneck with a RepConv first conv (reference block.py RepBottleneck)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = RepConv(c_, 3, 1, name="cv1")(x, train)
        y = ConvBN(self.c2, 3, 1, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class RepC3(nn.Module):
    """RT-DETR FPN block (reference block.py RepC3): n chained RepConvs on
    one branch, 1x1 shortcut branch, summed then projected."""

    c2: int
    n: int = 3
    e: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference block.py RepC3: cv1/cv2 project to c2 (not c_); the
        # RepConv chain runs at c_; cv3 (c_ -> c2) exists only when c_ != c2
        c_ = int(self.c2 * self.e)
        a = ConvBN(self.c2, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = RepConv(c_, 3, name=f"m{i}")(a, train)
        b = ConvBN(self.c2, 1, 1, name="cv2")(x, train)
        y = a + b
        if c_ != self.c2:
            y = ConvBN(self.c2, 1, 1, name="cv3")(y, train)
        return y


class RepCSP(nn.Module):
    """C3 with RepBottlenecks (reference block.py RepCSP)."""

    c2: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = RepBottleneck(c_, True, e=1.0, name=f"m{i}")(a, train)
        b = ConvBN(c_, 1, 1, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, name="cv3")(jnp.concatenate([a, b], -1), train)


class RepNCSPELAN4(nn.Module):
    """YOLOv9 ELAN block (reference block.py RepNCSPELAN4).
    YAML args: [c2, c3, c4, n]."""

    c2: int
    c3: int = 64
    c4: int = 32
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c3, 1, 1, name="cv1")(x, train)
        y1, y2 = jnp.split(y, 2, axis=-1)
        y3 = RepCSP(self.c4, self.n, name="csp1")(y2, train)
        y3 = ConvBN(self.c4, 3, 1, name="cv2")(y3, train)
        y4 = RepCSP(self.c4, self.n, name="csp2")(y3, train)
        y4 = ConvBN(self.c4, 3, 1, name="cv3")(y4, train)
        return ConvBN(self.c2, 1, 1, name="cv4")(jnp.concatenate([y1, y2, y3, y4], -1), train)


class RepVGGDW(nn.Module):
    """Large-kernel depthwise pair (reference block.py RepVGGDW): 7x7 DW +
    3x3 DW branches summed, SiLU; fusable at deploy."""

    c: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = ConvBN(self.c, 7, 1, g=self.c, act=False, name="conv")(x, train)
        b = ConvBN(self.c, 3, 1, g=self.c, act=False, name="conv1")(x, train)
        return nn.silu(a + b)


class CIB(nn.Module):
    """Cheap inverted block (reference block.py CIB, YOLOv10)."""

    c2: int
    shortcut: bool = True
    lk: bool = False  # large-kernel RepVGGDW middle conv (v10 deep stages)
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = ConvBN(c1, 3, 1, g=c1, name="cv0")(x, train)
        y = ConvBN(2 * c_, 1, 1, name="cv1")(y, train)
        if self.lk:
            y = RepVGGDW(2 * c_, name="cv2lk")(y, train)
        else:
            y = ConvBN(2 * c_, 3, 1, g=2 * c_, name="cv2")(y, train)
        y = ConvBN(self.c2, 1, 1, name="cv3")(y, train)
        y = ConvBN(self.c2, 3, 1, g=self.c2, act=False, name="cv4")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C2fCIB(nn.Module):
    """C2f with CIB inner blocks (reference block.py C2fCIB, YOLOv10)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    lk: bool = False
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            # C2fCIB builds its CIBs at full expansion (reference block.py:
            # CIB(self.c, self.c, shortcut, e=1.0, lk=lk))
            ys.append(CIB(c, self.shortcut, lk=self.lk, e=1.0, name=f"m{i}")(ys[-1], train))
        return ConvBN(self.c2, 1, 1, name="cv2")(jnp.concatenate(ys, -1), train)


class PSA(nn.Module):
    """Position-sensitive attention block (reference block.py PSA, YOLOv10)."""

    c2: int
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        b = b + Attention(c, num_heads=max(1, c // 64), attn_ratio=0.5, name="attn")(b, train)
        ff = ConvBN(c * 2, 1, name="ffn0")(b, train)
        b = b + ConvBN(c, 1, act=False, name="ffn1")(ff, train)
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate([a, b], -1), train)


class AAttn(nn.Module):
    """Area attention (reference block.py AAttn, YOLOv12): full attention
    within `area` horizontal strips of the feature map."""

    dim: int
    num_heads: int = 8
    area: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = ConvBN(self.dim * 3, 1, act=False, name="qkv")(x, train)
        n = h * w
        area = self.area if (n % self.area == 0) else 1
        qkv = qkv.reshape(b * area, n // area, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn / (head_dim**0.5), axis=-1).astype(v.dtype)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h, w, self.dim)
        pe = ConvBN(self.dim, 7, 1, g=self.dim, act=False, name="pe")(
            v.reshape(b, h, w, self.dim), train)
        return ConvBN(self.dim, 1, act=False, name="proj")(y + pe, train)


class ABlock(nn.Module):
    """Area-attention block + MLP (reference block.py ABlock)."""

    dim: int
    num_heads: int = 8
    mlp_ratio: float = 1.2
    area: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + AAttn(self.dim, self.num_heads, self.area, name="attn")(x, train)
        h = ConvBN(int(self.dim * self.mlp_ratio), 1, name="mlp0")(x, train)
        return x + ConvBN(self.dim, 1, act=False, name="mlp1")(h, train)


class A2C2f(nn.Module):
    """YOLOv12 area-attention CSP block (reference block.py A2C2f).
    YAML args: [c2, n, a2, area, residual]."""

    c2: int
    n: int = 1
    a2: bool = True
    area: int = 1
    residual: bool = False
    e: float = 0.5
    mlp_ratio: float = 2.0  # A2C2f passes 2.0 to its ABlocks (block.py:1469)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(c, 1, 1, name="cv1")(x, train)
        ys = [y]
        area = self.area if self.area and self.area > 0 else 1
        for i in range(self.n):
            if self.a2:
                z = ABlock(c, max(1, c // 32), mlp_ratio=self.mlp_ratio,
                           area=area, name=f"m{i}a")(ys[-1], train)
                z = ABlock(c, max(1, c // 32), mlp_ratio=self.mlp_ratio,
                           area=area, name=f"m{i}b")(z, train)
            else:
                z = C3k(c, 2, True, name=f"m{i}")(ys[-1], train)
            ys.append(z)
        out = ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(ys, -1), train)
        if self.residual and self.a2 and x.shape[-1] == self.c2:
            gamma = self.param("gamma", nn.initializers.constant(0.01), (self.c2,))
            out = x + gamma.astype(out.dtype) * out
        return out


class ChannelAttention(nn.Module):
    """Squeeze-excite style channel attention (reference conv.py ChannelAttention)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=x.dtype, name="fc")(pooled)
        return x * nn.sigmoid(w)


class SpatialAttention(nn.Module):
    """Spatial attention over channel-pooled maps (reference conv.py SpatialAttention)."""

    k: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.concatenate(
            [jnp.mean(x, axis=-1, keepdims=True), jnp.max(x, axis=-1, keepdims=True)], -1
        )
        p = self.k // 2
        w = nn.Conv(1, (self.k, self.k), padding=((p, p), (p, p)), dtype=x.dtype, name="conv")(pooled)
        return x * nn.sigmoid(w)


class CBAM(nn.Module):
    """Convolutional block attention module (reference conv.py CBAM)."""

    c2: int = 0  # unused; kept for YAML arg parity
    k: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelAttention(name="channel")(x, train)
        return SpatialAttention(self.k, name="spatial")(x, train)


class ConvTransposeBN(nn.Module):
    """Transposed conv + BN + act (reference conv.py ConvTranspose)."""

    c2: int
    k: int = 2
    s: int = 2
    act: bool | str = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = x.dtype
        y = nn.ConvTranspose(self.c2, (self.k, self.k), strides=(self.s, self.s),
                             use_bias=False, dtype=dt, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=jnp.float32, name="bn")(y).astype(dt)
        return _act(y, self.act)


class Conv2(nn.Module):
    """RepConv-style Conv with a parallel 1x1 branch fused at inference
    (reference conv.py Conv2)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: bool | str = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = x.dtype
        pad = autopad(self.k, None, 1)
        a = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=((pad, pad), (pad, pad)), feature_group_count=self.g,
                    use_bias=False, dtype=dt, name="conv")(x)
        b = nn.Conv(self.c2, (1, 1), strides=(self.s, self.s), padding="VALID",
                    feature_group_count=self.g, use_bias=False, dtype=dt, name="cv2")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=jnp.float32, name="bn")(a + b).astype(dt)
        return _act(y, self.act)


class LightConv(nn.Module):
    """1x1 conv + depthwise conv (reference conv.py LightConv)."""

    c2: int
    k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c2, 1, act=False, name="conv1")(x, train)
        return DWConv(self.c2, self.k, act="relu", name="conv2")(y, train)


class RepVGGDW(nn.Module):
    """Depthwise RepVGG block: 7x7 dw + 3x3 dw branches (reference block.py
    RepVGGDW, used by v10 CIB at large width)."""

    c2: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = DWConv(self.c2, 7, 1, act=False, name="conv")(x, train)
        b = DWConv(self.c2, 3, 1, act=False, name="conv1")(x, train)
        return nn.silu(a + b)


class C1(nn.Module):
    """CSP bottleneck with 1 conv (reference block.py C1)."""

    c2: int
    n: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c2, 1, 1, name="cv1")(x, train)
        z = y
        for i in range(self.n):
            z = ConvBN(self.c2, 3, 1, name=f"m{i}")(z, train)
        return z + y


class C2(nn.Module):
    """CSP bottleneck with 2 convs (reference block.py C2)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            a = Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m{i}")(a, train)
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class C2fPSA(nn.Module):
    """C2f with PSA attention blocks as the inner modules (reference
    block.py C2fPSA)."""

    c2: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, name="cv1")(x, train)
        ys = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            ys.append(PSABlock(c, name=f"m{i}")(ys[-1], train))
        return ConvBN(self.c2, 1, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class SPP(nn.Module):
    """Spatial pyramid pooling, parallel kernels (reference block.py SPP)."""

    c2: int
    k: tuple = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, 1, name="cv1")(x, train)
        outs = [y]
        for ki in self.k:
            p = ki // 2
            outs.append(nn.max_pool(y, (ki, ki), strides=(1, 1), padding=((p, p), (p, p))))
        return ConvBN(self.c2, 1, 1, name="cv2")(jnp.concatenate(outs, axis=-1), train)


class SPPELAN(nn.Module):
    """SPP-ELAN (reference block.py SPPELAN, YOLOv9)."""

    c2: int
    c3: int = 0
    k: int = 5

    @classmethod
    def parse(cls, args, channels, fs, width=1.0, **kw):
        from .graph import make_divisible

        c2 = make_divisible(args[0] * width, 8)
        c3 = make_divisible(args[1] * width, 8) if len(args) > 1 else 0
        return c2, [c2, c3, *args[2:]], {}

    @nn.compact
    def __call__(self, x, train: bool = False):
        c3 = self.c3 or self.c2 // 2
        y = ConvBN(c3, 1, 1, name="cv1")(x, train)
        outs = [y]
        p = self.k // 2
        for _ in range(3):
            outs.append(nn.max_pool(outs[-1], (self.k, self.k), strides=(1, 1),
                                    padding=((p, p), (p, p))))
        return ConvBN(self.c2, 1, 1, name="cv5")(jnp.concatenate(outs, axis=-1), train)


class ELAN1(nn.Module):
    """Basic ELAN (reference block.py ELAN1, YOLOv9-t)."""

    c2: int
    c3: int = 0
    c4: int = 0

    @classmethod
    def parse(cls, args, channels, fs, width=1.0, **kw):
        from .graph import make_divisible

        scaled = [make_divisible(a * width, 8) for a in args[:3]]
        return scaled[0], scaled, {}

    @nn.compact
    def __call__(self, x, train: bool = False):
        c3 = self.c3 or self.c2 // 2
        c4 = self.c4 or c3 // 2
        y = ConvBN(c3, 1, 1, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        c = ConvBN(c4, 3, 1, name="cv2")(b, train)
        d = ConvBN(c4, 3, 1, name="cv3")(c, train)
        return ConvBN(self.c2, 1, 1, name="cv4")(
            jnp.concatenate([a, b, c, d], axis=-1), train)


class ResNetBlock(nn.Module):
    """ResNet bottleneck block (reference block.py ResNetBlock)."""

    c2: int
    s: int = 1
    e: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        c3 = self.e * self.c2
        y = ConvBN(self.c2, 1, 1, act="relu", name="cv1")(x, train)
        y = ConvBN(self.c2, 3, self.s, act="relu", name="cv2")(y, train)
        y = ConvBN(c3, 1, act=False, name="cv3")(y, train)
        if self.s != 1 or x.shape[-1] != c3:
            x = ConvBN(c3, 1, self.s, act=False, name="shortcut")(x, train)
        return nn.relu(x + y)


class ResNetLayer(nn.Module):
    """ResNet stage (reference block.py ResNetLayer): stem (is_first) or n
    ResNetBlocks."""

    c2: int
    s: int = 1
    is_first: bool = False
    n: int = 1
    e: int = 4

    @classmethod
    def parse(cls, args, channels, fs, width=1.0, **kw):
        # YAML row: [c2, s, is_first, n] (reference passes c1 first; ours is implicit)
        c2 = int(args[0])
        s = int(args[1]) if len(args) > 1 else 1
        is_first = bool(args[2]) if len(args) > 2 else False
        n = int(args[3]) if len(args) > 3 else 1
        out = c2 if is_first else 4 * c2
        return out, [c2, s, is_first, n], {}

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.is_first:
            y = ConvBN(self.c2, 7, 2, p=3, act="relu", name="stem")(x, train)
            return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        y = ResNetBlock(self.c2, self.s, self.e, name="b0")(x, train)
        for i in range(1, self.n):
            y = ResNetBlock(self.c2, 1, self.e, name=f"b{i}")(y, train)
        return y


class BasicResBlock(nn.Module):
    """ResNet basic block (two 3x3 convs, expansion 1) — the resnet18/34
    block shape torchvision uses; consumed by TorchVision below."""

    c2: int
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c2, 3, self.s, act="relu", name="conv1")(x, train)
        y = ConvBN(self.c2, 3, 1, act=False, name="conv2")(y, train)
        if self.s != 1 or x.shape[-1] != self.c2:
            x = ConvBN(self.c2, 1, self.s, act=False, name="down")(x, train)
        return nn.relu(x + y)


class TorchVision(nn.Module):
    """TPU-native stand-in for the reference's TorchVision wrapper
    (block.py:1135): builds the named torchvision topology in flax instead of
    loading torch modules. The resnet family is supported; ``truncate=2`` with
    ``unwrap=True`` (the YAML zoo's only use) drops avgpool+fc, leaving the
    P5/32 feature map. Pretrained weights are not auto-downloaded (zero
    egress) — import a checkpoint via utils/torch_import.py instead."""

    c2: int
    model: str = "resnet18"
    weights: str | None = "DEFAULT"
    unwrap: bool = True
    truncate: int = 2
    split: bool = False

    _CFG = {
        "resnet18": ((2, 2, 2, 2), False),
        "resnet34": ((3, 4, 6, 3), False),
        "resnet50": ((3, 4, 6, 3), True),
        "resnet101": ((3, 4, 23, 3), True),
        "resnet152": ((3, 8, 36, 3), True),
    }

    @classmethod
    def parse(cls, args, channels, fs, width=1.0, **kw):
        # YAML row: [c2, model, weights, unwrap, truncate] — c2 unscaled
        return int(args[0]), list(args), {}

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.model not in self._CFG:
            raise NotImplementedError(
                f"TorchVision stand-in supports {sorted(self._CFG)}, got {self.model!r}")
        if self.split or not self.unwrap or self.truncate != 2:
            raise NotImplementedError(
                "TorchVision stand-in supports unwrap=True, truncate=2, split=False")
        blocks, bottleneck = self._CFG[self.model]
        y = ConvBN(64, 7, 2, p=3, act="relu", name="stem")(x, train)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        c = 64
        for si, n in enumerate(blocks):
            for bi in range(n):
                s = 2 if (si > 0 and bi == 0) else 1
                if bottleneck:
                    y = ResNetBlock(c, s, 4, name=f"s{si}b{bi}")(y, train)
                else:
                    y = BasicResBlock(c, s, name=f"s{si}b{bi}")(y, train)
            c *= 2
        return y


class CBLinear(nn.Module):
    """Split a feature map into per-branch channel groups (reference
    block.py CBLinear, YOLOv9 dual-branch)."""

    c2s: tuple
    k: int = 1
    s: int = 1

    @classmethod
    def parse(cls, args, channels, fs, width=1.0, **kw):
        from .graph import make_divisible

        c2s = tuple(make_divisible(c * width, 8) for c in args[0])
        # list output: record the tuple; only CBFuse consumes it
        return c2s, [c2s, *args[1:]], {}

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, None, 1)
        y = nn.Conv(sum(self.c2s), (self.k, self.k), strides=(self.s, self.s),
                    padding=((pad, pad), (pad, pad)), dtype=x.dtype, name="conv")(x)
        sizes, acc = [], 0
        for c in self.c2s[:-1]:
            acc += c
            sizes.append(acc)
        return list(jnp.split(y, sizes, axis=-1))


class CBFuse(nn.Module):
    """Fuse CBLinear outputs by resize + sum (reference block.py CBFuse)."""

    idx: tuple = ()

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        c2 = channels[fs[-1] + 1]  # target feature sets the output width
        return c2, [], {"idx": tuple(args[0]) if args else ()}

    @nn.compact
    def __call__(self, xs, train: bool = False):
        # xs: list of inputs; last is the target-resolution feature, earlier
        # entries are lists from CBLinear picked by self.idx
        target = xs[-1]
        h, w = target.shape[1:3]
        acc = target
        for i, x in enumerate(xs[:-1]):
            sel = x[self.idx[i]] if isinstance(x, (list, tuple)) else x
            acc = acc + jax.image.resize(sel, (sel.shape[0], h, w, sel.shape[-1]), "nearest")
        return acc


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference block.py GhostBottleneck)."""

    c2: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, name="g1")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, name="dw")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, name="g2")(y, train)
        if self.s == 2:
            x = ConvBN(self.c2, 1, 1, act=False, name="sc2")(
                DWConv(x.shape[-1], self.k, self.s, act=False, name="sc1")(x, train), train)
        return x + y if x.shape == y.shape else y


class C3Ghost(nn.Module):
    """C3 with GhostBottlenecks (reference block.py C3Ghost)."""

    c2: int
    n: int = 1
    shortcut: bool = True  # positional parity with C3's YAML row; unused here
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = GhostBottleneck(c_, name=f"m{i}")(a, train)
        b = ConvBN(c_, 1, 1, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class C3x(nn.Module):
    """C3 with cross convolutions (1x3 + 3x1) (reference block.py C3x)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = x.dtype
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            h = nn.Conv(c_, (1, 3), padding=((0, 0), (1, 1)), use_bias=False,
                        dtype=dt, name=f"m{i}a")(a)
            h = nn.Conv(c_, (3, 1), padding=((1, 1), (0, 0)), use_bias=False,
                        dtype=dt, name=f"m{i}b")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                             epsilon=1e-3, dtype=jnp.float32, name=f"m{i}bn")(h).astype(dt)
            h = nn.silu(h)
            a = a + h if self.shortcut else h
        b = ConvBN(c_, 1, 1, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class BottleneckCSP(nn.Module):
    """Original CSP bottleneck (reference block.py BottleneckCSP, YOLOv5-era)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = x.dtype
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, e=1.0, name=f"m{i}")(a, train)
        a = nn.Conv(c_, (1, 1), use_bias=False, dtype=dt, name="cv3")(a)
        b = nn.Conv(c_, (1, 1), use_bias=False, dtype=dt, name="cv2")(x)
        y = jnp.concatenate([a, b], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=jnp.float32, name="bn")(y).astype(dt)
        return ConvBN(self.c2, 1, 1, name="cv4")(nn.silu(y), train)
