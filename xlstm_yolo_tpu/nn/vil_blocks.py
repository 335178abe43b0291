"""YAML-graph wrapper blocks for the ViL subsystem.

Mirrors the reference's graph adapters in ``nn/modules/block.py:1187-2363``
(ViLBlockPairBlock :1769, SequenceToImage :1863, VitPatchEmbedBlock :1602,
VisionLSTM :1913, VisionClueMerge :1969, PatchMerging :2043, PatchMerger
:2352, ViLLayerNormBlock :2211, ViLFusionBlock :2230, FeatureSplitIndex
:1294, SequenceConv2dBlock :1510, PatchMergeBlock :1885, MultiScaleFusionBlock
:1902) with the same YAML arg conventions, so user model YAMLs written for
the reference drop in. Differences: image tensors are NHWC (SequenceToImage
emits (B, H, W, D)), and each class carries a ``parse`` rule so the graph
compiler can resolve channels statically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import vil as V
from .modules import ConvBN
from .graph import register


def _cfg(config) -> dict:
    """Config may arrive as a dict (YAML) or a hashable tuple of pairs."""
    if config is None:
        return {}
    if isinstance(config, dict):
        return dict(config)
    return {k: (list(v) if isinstance(v, tuple) and k in ("seqlens", "resolution", "output_indices") else v)
            for k, v in config}


def _t(x):
    return tuple(x) if isinstance(x, (list, tuple)) else x


class _Custom:
    """Mixin tag: graph compiler calls cls.parse(args, channels, fs, ...)."""

    @classmethod
    def parse(cls, args, channels, fs, nc=80, width=1.0, depth=1.0, n=1, **kw):  # pragma: no cover
        raise NotImplementedError


class ViLBlockPairBlock(nn.Module, _Custom):
    """Workhorse token-mixing block. YAML: [c1, c2, config]
    (config keys: seqlens, chunk_size, qkv_block_size, conv_kernel_size,
    bidirectional, igate_act). Accepts (B, S, D) or (B, H, W, D); for image
    inputs the token grid is inferred from the shape, so — unlike the
    reference, which requires static seqlens in the config — the same YAML
    works at any resolution."""

    c2: int
    config: tuple = ()
    n: int = 1
    # pipeline parallelism (set by TaskModel.enable_pipeline, not YAML):
    # pp_stages > 1 switches the n pairs to a STACKED param layout
    # ("pairs": leading axis n) and runs them as a GPipe pipeline over the
    # mesh's pp axis (n/pp pairs per rank). pp_mesh is the trainer mesh;
    # without it (or with non-divisible shapes) the stacked params apply
    # sequentially — identical math, so eval/stride-probe need no mesh.
    pp_stages: int = 0
    pp_microbatches: int = 0
    pp_mesh: object = None

    @classmethod
    def parse(cls, args, channels, fs, n=1, width=1.0, max_ch=float("inf"), **kw):
        from .graph import make_divisible

        # reference convention: args = [c1, c2, config] (nn/tasks.py:1212)
        if len(args) >= 2 and isinstance(args[1], int):
            c2, config = args[1], (args[2] if len(args) > 2 else {})
        else:
            c2, config = args[0], (args[1] if len(args) > 1 else {})
        # max_channels cap like the Conv path (scales like vil_yolo "l"
        # cap at 512 — without it the ViL dim diverges from its input)
        c2 = make_divisible(min(c2, max_ch) * width, 8)
        return c2, [c2], {"config": config, "n": n}

    def _pair_kwargs(self, seqlens):
        cfg = _cfg(self.config)
        return dict(
            dim=self.c2,
            qkv_block_size=int(cfg.get("qkv_block_size", 16)),
            seqlens=seqlens,
            chunk_size=int(cfg.get("chunk_size", 256)),
            conv_kernel_size=int(cfg.get("conv_kernel_size", 3)),
            igate_act=str(cfg.get("igate_act", "exp")),
            bidirectional=bool(cfg.get("bidirectional", False)),
            mlstm_backend=str(cfg.get("backend", "auto")),
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = _cfg(self.config)
        shp = x.shape
        seqlens = _t(cfg.get("seqlens")) if cfg.get("seqlens") else None
        if x.ndim >= 4:
            seqlens = tuple(x.shape[1:-1])
        x = x.reshape(x.shape[0], -1, x.shape[-1])
        if self.pp_stages > 1:
            x = self._call_pipelined(x, seqlens)
        else:
            for i in range(self.n):
                x = V.ViLBlockPair(**self._pair_kwargs(seqlens), name=f"pair{i}")(x)
        return x.reshape(shp)

    def _call_pipelined(self, x, seqlens):
        from ..parallel.pipeline import pipeline_apply_nested

        pp = self.pp_stages
        if self.n % pp:
            raise ValueError(
                f"pipeline over pp={pp} needs the pair count ({self.n}) "
                f"divisible — use a scale with n % pp == 0 blocks per stage")
        pair = V.ViLBlockPair(**self._pair_kwargs(seqlens), parent=None)

        def init_stacked(rng):
            dummy = jnp.zeros((1,) + x.shape[1:], x.dtype)
            trees = [pair.init(jax.random.fold_in(rng, i), dummy)["params"]
                     for i in range(self.n)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

        stacked = self.param("pairs", init_stacked)

        def apply_one(ptree, a):
            return pair.apply({"params": ptree}, a)

        mesh = self.pp_mesh
        M = self.pp_microbatches or pp
        piped = (mesh is not None and getattr(mesh, "shape", {}).get("pp", 1) == pp)
        if piped:
            # local (per-dp-rank) batch must divide into microbatches
            dp = mesh.shape.get("dp", 1)
            piped = x.shape[0] % (dp * M) == 0
        if piped:
            per_stage = self.n // pp
            grouped = jax.tree.map(
                lambda p: p.reshape((pp, per_stage) + p.shape[1:]), stacked)

            def stage_fn(pslice, a):
                for k in range(per_stage):
                    a = apply_one(jax.tree.map(lambda p: p[k], pslice), a)
                return a

            return pipeline_apply_nested(mesh, stage_fn, grouped, x,
                                         num_microbatches=M)
        # sequential fallback: same parameters, same math (eval, stride
        # probe, meshless contexts, tail batches)
        for i in range(self.n):
            x = apply_one(jax.tree.map(lambda p: p[i], stacked), x)
        return x


class SequenceToImage(nn.Module, _Custom):
    """(B, S, D) -> (B, H, W, D) (NHWC; reference emits NCHW). YAML: [h, w]."""

    seqlens: tuple

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        seq = args[0] if len(args) == 1 and isinstance(args[0], (list, tuple)) else args
        c1 = channels[fs[0] + 1]
        return c1, [], {"seqlens": tuple(seq)}

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, s, d = x.shape
        h, w = self.seqlens
        assert s == h * w, f"sequence length {s} != {h}*{w}"
        return x.reshape(b, h, w, d)


class ImageToSequence(nn.Module, _Custom):
    """(B, H, W, D) -> (B, S, D). New convenience block (the reference
    flattens inside each wrapper; an explicit block makes YAMLs clearer)."""

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        return channels[fs[0] + 1], [], {}

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x.reshape(x.shape[0], -1, x.shape[-1])


class PermuteBlock(nn.Module, _Custom):
    """(B, S, D) -> (B, H, W, D) grid view (reference block.py:1753)."""

    seqlens: tuple

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        seq = args[0] if len(args) == 1 and isinstance(args[0], (list, tuple)) else args
        return channels[fs[0] + 1], [], {"seqlens": tuple(seq)}

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, s, d = x.shape
        h, w = self.seqlens
        return x.reshape(b, h, w, d)


class FeatureSplitIndex(nn.Module, _Custom):
    """Pick element i of a list output (reference block.py:1294). YAML: [i]."""

    index: int

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        return channels[fs[0] + 1], [], {"index": int(args[0])}

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return xs[self.index]


class VitPatchEmbedBlock(nn.Module, _Custom):
    """Patch embed with explicit resolution. YAML: [c1, c2, resolution, patch_size]."""

    dim: int
    patch_size: int = 16

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        # accept [c1, c2, resolution, patch] or [c2, resolution, patch]
        if len(args) >= 4:
            c2, patch = args[1], args[3]
        else:
            c2, patch = args[0], args[2] if len(args) > 2 else 16
        if isinstance(patch, (list, tuple)):
            patch = patch[0]
        return c2, [c2], {"patch_size": int(patch)}

    @nn.compact
    def __call__(self, x, train: bool = False):
        return V.VitPatchEmbed(self.dim, self.patch_size, name="embed")(x)


class VitPosEmbedBlock(nn.Module, _Custom):
    """Learnable pos-embed on a (B, H, W, D) grid. YAML: [c1, c2, seqlens]."""

    dim: int
    seqlens: tuple = (14, 14)

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        c1 = channels[fs[0] + 1]
        seq = None
        for a in args:
            if isinstance(a, (list, tuple)):
                seq = tuple(a)
        return c1, [c1], {"seqlens": seq or (14, 14)}

    @nn.compact
    def __call__(self, x, train: bool = False):
        return V.VitPosEmbed2d(self.dim, self.seqlens, name="embed")(x)


class FlattenPosEmbedBlock(nn.Module, _Custom):
    """Pos-embed on flattened (B, S, D) tokens (reference block.py:1707).
    YAML: [c1, c2, seqlen]."""

    dim: int
    seqlen: int

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        c1 = channels[fs[0] + 1]
        seqlen = next((a for a in args if isinstance(a, int) and a != c1), args[-1])
        return c1, [c1], {"seqlen": int(seqlen)}

    @nn.compact
    def __call__(self, x, train: bool = False):
        pe = self.param("embed", nn.initializers.truncated_normal(stddev=0.02),
                        (1, self.seqlen, self.dim))
        return x + pe.astype(x.dtype)


class SequenceConv2dBlock(nn.Module, _Custom):
    """Strided SequenceConv2d token-space downsample (reference block.py:1510).
    YAML: [c1, c2, k, s, config{seqlens}]."""

    c2: int
    k: int = 3
    s: int = 2
    config: tuple = ()

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        c2, k, s = args[1], args[2], args[3]
        config = args[4] if len(args) > 4 else {}
        return c2, [c2, k, s], {"config": config}

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = _cfg(self.config)
        seqlens = _t(cfg.get("seqlens"))
        pad = self.k // 2 if self.s > 1 else 0
        return V.SequenceConv2d(self.c2, self.k, self.s, padding=pad, seqlens=seqlens, name="conv")(x)


class PatchMergeBlock(nn.Module, _Custom):
    """Hierarchical patch merge (reference vision_lstm_hierarchical.py:44):
    merge_factor² window flatten + Linear + LayerNorm over tokens.
    YAML: [input_seqlens, merge_factor, in_dim, out_dim]."""

    seqlens: tuple
    merge_factor: int
    out_dim: int

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        seqlens, mf, in_dim, out_dim = args
        return out_dim, [], {"seqlens": tuple(seqlens), "merge_factor": int(mf), "out_dim": int(out_dim)}

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, s, d = x.shape
        h, w = self.seqlens
        m = self.merge_factor
        x = x.reshape(b, h // m, m, w // m, m, d).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, (h // m) * (w // m), m * m * d)
        x = nn.Dense(self.out_dim, dtype=x.dtype, name="proj")(x)
        return nn.LayerNorm(name="norm")(x)


class PatchMerging(nn.Module, _Custom):
    """SWIN 2x2 patch merging: 4C -> 2C linear + RMSNorm (reference
    block.py:2043). Operates on (B, S, D) with square grid, or (B, H, W, D).
    YAML: [c1]."""

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        c1 = channels[fs[0] + 1]
        return 2 * c1, [], {}

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math

        if x.ndim == 3:
            b, s, d = x.shape
            h = w = int(round(math.sqrt(s)))
            x = x.reshape(b, h, w, d)
            back_to_seq = True
        else:
            b, h, w, d = x.shape
            back_to_seq = False
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        x = V.RMSNorm(name="norm")(x)
        x = nn.Dense(2 * d, use_bias=False, dtype=x.dtype, name="reduction")(x)
        if back_to_seq:
            x = x.reshape(b, -1, 2 * d)
        return x


class VisionClueMerge(nn.Module, _Custom):
    """VMamba-style space-to-depth 2x2 merge + 1x1 Conv-BN-SiLU in token space
    (reference block.py:1969). YAML: [dim, out_dim, config{seqlens}]."""

    out_dim: int
    config: tuple = ()

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        out_dim = args[1]
        config = args[2] if len(args) > 2 else {}
        return out_dim, [out_dim], {"config": config}

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = _cfg(self.config)
        b, s, d = x.shape
        h, w = _t(cfg.get("seqlens")) or (int(s**0.5), int(s**0.5))
        img = x.reshape(b, h, w, d)
        y = jnp.concatenate(
            [img[:, ::2, ::2], img[:, 1::2, ::2], img[:, ::2, 1::2], img[:, 1::2, 1::2]], axis=-1
        )
        y = ConvBN(self.out_dim, 1, 1, name="pw")(y, train)
        return y.reshape(b, (h // 2) * (w // 2), self.out_dim)


class PatchMerger(nn.Module, _Custom):
    """Learned token-count reduction via query attention (reference
    block.py:2352, the later/winning definition). YAML: [dim, num_tokens_out]."""

    num_tokens_out: int

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        c1 = channels[fs[0] + 1]
        n_out = args[1] if len(args) > 1 else args[0]
        return c1, [], {"num_tokens_out": int(n_out)}

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, s, d = x.shape
        x = nn.LayerNorm(name="norm")(x)
        queries = self.param("queries", nn.initializers.normal(1.0), (self.num_tokens_out, d))
        sim = jnp.einsum("md,bnd->bmn", queries.astype(x.dtype), x) * (d**-0.5)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(x.dtype)
        return jnp.einsum("bmn,bnd->bmd", attn, x)


class ViLLayerNormBlock(nn.Module, _Custom):
    """LayerNorm wrapper (reference block.py:2211). YAML: [dim]."""

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        return channels[fs[0] + 1], [], {}

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.LayerNorm(use_bias=False, name="ln")(x)


class MultiScaleFusionBlock(nn.Module, _Custom):
    """Fuse pooled high-res tokens into low-res tokens (reference
    vision_lstm_hierarchical.py:70). Two inputs: [high_res, low_res].
    YAML: [high_res_dim, low_res_dim, fused_dim]."""

    fused_dim: int

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        return int(args[2]), [], {"fused_dim": int(args[2])}

    @nn.compact
    def __call__(self, xs, train: bool = False):
        high, low = xs
        high = high.reshape(high.shape[0], -1, high.shape[-1])
        low = low.reshape(low.shape[0], -1, low.shape[-1])
        pooled = jnp.mean(high, axis=1, keepdims=True)
        pooled = jnp.broadcast_to(pooled, (low.shape[0], low.shape[1], pooled.shape[-1]))
        fused = jnp.concatenate([pooled, low], axis=-1)
        return nn.Dense(self.fused_dim, dtype=low.dtype, name="proj")(fused)


class RGBlock(nn.Module):
    """Gated conv MLP (reference block.py:2167): fc1 -> split(x, v) ->
    gelu(dwconv(x) + x) * v -> fc2. NHWC."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hid = int(2 * self.hidden / 3)
        y = nn.Conv(hid * 2, (1, 1), dtype=x.dtype, name="fc1")(x)
        a, v = jnp.split(y, 2, axis=-1)
        dw = nn.Conv(hid, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=hid,
                     dtype=x.dtype, name="dwconv")(a)
        y = nn.gelu(dw + a) * v
        return nn.Conv(self.out, (1, 1), dtype=x.dtype, name="fc2")(y)


class LSBlock(nn.Module):
    """Local spatial block (reference block.py:2190): dwconv3 -> BN -> 1x1 ->
    gelu -> 1x1, residual. NHWC."""

    hidden: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=self.hidden,
                    dtype=x.dtype, name="fc1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=jnp.float32, name="norm")(y).astype(x.dtype)
        y = nn.Conv(self.hidden, (1, 1), dtype=x.dtype, name="fc2")(y)
        y = nn.gelu(y)
        y = nn.Conv(self.hidden, (1, 1), dtype=x.dtype, name="fc3")(y)
        return x + y


class ViLFusionBlock(nn.Module, _Custom):
    """XSSBlock-style fusion (reference block.py:2230): Conv in_proj ->
    LSBlock -> n x ViLBlockPair in token space (+residual) -> RGBlock MLP
    (+residual). Image in, image out (NHWC). YAML: [c1, c2, config, n]."""

    c2: int
    config: tuple = ()
    n: int = 1

    @classmethod
    def parse(cls, args, channels, fs, nc=80, width=1.0, depth=1.0, **kw):
        c2 = args[1]
        config = args[2] if len(args) > 2 else {}
        n = args[3] if len(args) > 3 else 1
        return c2, [c2], {"config": config, "n": int(n)}

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = _cfg(self.config)
        c1 = x.shape[-1]
        if c1 != self.c2:
            x = ConvBN(self.c2, 1, 1, name="in_proj")(x, train)
        x_local = LSBlock(self.c2, name="ls")(x, train)
        b, h, w, d = x_local.shape
        seq = x_local.reshape(b, h * w, d)
        y = seq
        for i in range(self.n):
            y = V.ViLBlockPair(
                dim=self.c2,
                qkv_block_size=int(cfg.get("qkv_block_size", 16)),
                seqlens=(h, w),
                chunk_size=int(cfg.get("chunk_size", 256)),
                igate_act=str(cfg.get("igate_act", "exp")),
                bidirectional=bool(cfg.get("bidirectional", False)),
                name=f"vil{i}",
            )(y)
        seq = seq + y
        x = x + seq.reshape(b, h, w, d)
        mlp_ratio = float(cfg.get("mlp_ratio") or 4.0)
        if mlp_ratio > 0:
            x = x + RGBlock(int(self.c2 * mlp_ratio), self.c2, name="mlp")(x, train)
        return x


class VisionLSTMBlock(nn.Module, _Custom):
    """Whole ViL backbone as one YAML row returning multi-scale partials
    (reference block.py:1913 ``VisionLSTM``).
    YAML: [c1, dim, config{depth, resolution, patch_size, output_indices}]."""

    dim: int
    config: tuple = ()

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        # accept [c1, dim, config] or [dim, config]
        if len(args) >= 2 and isinstance(args[1], int):
            dim, config = args[1], (args[2] if len(args) > 2 else {})
        else:
            dim, config = args[0], (args[1] if len(args) > 1 else {})
        return dim, [dim], {"config": config}

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = _cfg(self.config)
        return V.VisionLSTMBackbone(
            dim=self.dim,
            depth=int(cfg.get("depth", 12)),
            patch_size=int(cfg.get("patch_size", 16)),
            resolution=_t(cfg.get("resolution", (224, 224))),
            output_indices=_t(cfg.get("output_indices", ())) or (),
            qkv_block_size=int(cfg.get("qkv_block_size", 16)),
            chunk_size=int(cfg.get("chunk_size", 64)),
            igate_act=str(cfg.get("igate_act", "exp")),
            bidirectional=bool(cfg.get("bidirectional", False)),
            mlstm_backend=str(cfg.get("backend", "auto")),
            name="backbone",
        )(x, train)


class FusionViLLayerBlock(nn.Module, _Custom):
    """Graph adapter for FusionViLLayer (reference YAML:
    [-1, 1, FusionViLLayerBlock, [dim, {mlp_type, seq_len, use_mlp}]])."""

    dim: int
    config: tuple = ()

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        dim = args[1] if len(args) >= 2 and isinstance(args[1], int) else args[0]
        config = next((a for a in args if isinstance(a, (dict, tuple)) and not isinstance(a, int)), {})
        return dim, [dim], {"config": config}

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .vil_extra import FusionViLLayer

        cfg = _cfg(self.config)
        shp = x.shape
        seqlens = tuple(x.shape[1:-1]) if x.ndim >= 4 else _t(cfg.get("seqlens"))
        x = x.reshape(x.shape[0], -1, x.shape[-1])
        y = FusionViLLayer(
            dim=self.dim, mlp_type=str(cfg.get("mlp_type", "baseline")),
            use_mlp=bool(cfg.get("use_mlp", True)), seqlens=seqlens,
            chunk_size=int(cfg.get("chunk_size", 64)),
            qkv_block_size=int(cfg.get("qkv_block_size", 16)),
            seq_len=int(cfg.get("seq_len", x.shape[1])), name="fusion",
        )(x)
        return y.reshape(shp)


class mLSTMVisionBlockWrap(nn.Module, _Custom):
    """Graph adapter for the xLSTM-7B-style vision block (reference
    VilLayerUpdated, mlstm_large.py:411). YAML: [c1, dim, {num_heads, chunk_size}]."""

    dim: int
    config: tuple = ()

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        dim = args[1] if len(args) >= 2 and isinstance(args[1], int) else args[0]
        config = next((a for a in args if isinstance(a, (dict, tuple)) and not isinstance(a, int)), {})
        return dim, [dim], {"config": config}

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .vil_extra import mLSTMVisionBlock

        cfg = _cfg(self.config)
        shp = x.shape
        seqlens = tuple(x.shape[1:-1]) if x.ndim >= 4 else _t(cfg.get("seqlens"))
        x = x.reshape(x.shape[0], -1, x.shape[-1])
        y = mLSTMVisionBlock(
            dim=self.dim, num_heads=int(cfg.get("num_heads", 4)),
            chunk_size=int(cfg.get("chunk_size", 64)), seqlens=seqlens, name="block",
        )(x)
        return y.reshape(shp)


class MoEFFNBlock(nn.Module, _Custom):
    """Mixture-of-Experts FFN as a YAML graph block (ep-shardable).

    YAML: ``[-1, 1, MoEFFN, [num_experts, top_k]]`` — a channel-preserving
    token FFN with top-k routing (parallel/moe.py). Under a mesh with ep > 1
    the expert weights shard over the ep axis (parallel/mesh.py rule) and XLA
    partitions the dispatch einsums. The Switch aux loss is sown into the
    "losses" collection and added by TaskModel.loss (hyp.moe_aux). A
    capability the reference lacks (no MoE in its zoo)."""

    c2: int
    num_experts: int = 4
    top_k: int = 1

    @classmethod
    def parse(cls, args, channels, fs, **kw):
        c1 = channels[fs[0] + 1]
        return c1, [c1], {"num_experts": int(args[0]) if args else 4,
                          "top_k": int(args[1]) if len(args) > 1 else 1}

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..parallel.moe import MoEFeedForward

        shp = x.shape
        tokens = x.reshape(x.shape[0], -1, x.shape[-1])
        y = MoEFeedForward(dim=self.c2, num_experts=self.num_experts,
                           top_k=self.top_k, name="moe")(tokens)
        return (tokens + y).reshape(shp)  # residual FFN


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------
for _name, _cls in [
    ("ViLBlockPairBlock", ViLBlockPairBlock),
    ("MoEFFN", MoEFFNBlock),
    ("SequenceToImage", SequenceToImage),
    ("ImageToSequence", ImageToSequence),
    ("PermuteBlock", PermuteBlock),
    ("FeatureSplitIndex", FeatureSplitIndex),
    ("VitPatchEmbedBlock", VitPatchEmbedBlock),
    ("VitPosEmbedBlock", VitPosEmbedBlock),
    ("FlattenPosEmbedBlock", FlattenPosEmbedBlock),
    ("SequenceConv2dBlock", SequenceConv2dBlock),
    ("PatchMergeBlock", PatchMergeBlock),
    ("PatchMerging", PatchMerging),
    ("VisionClueMerge", VisionClueMerge),
    ("PatchMerger", PatchMerger),
    ("ViLLayerNormBlock", ViLLayerNormBlock),
    ("MultiScaleFusionBlock", MultiScaleFusionBlock),
    ("ViLFusionBlock", ViLFusionBlock),
    ("VisionLSTM", VisionLSTMBlock),
    ("FusionViLLayerBlock", FusionViLLayerBlock),
    ("VilLayerUpdated", mLSTMVisionBlockWrap),
    ("mLSTMVisionBlock", mLSTMVisionBlockWrap),
]:
    register(_name, _cls, "custom")
