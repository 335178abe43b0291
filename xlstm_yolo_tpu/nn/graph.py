"""YAML model graph -> flax module compiler.

TPU-native re-design of reference ``nn/tasks.py:1071-1278`` (parse_model) and
``BaseModel._predict_once`` (:152-180). The YAML format is kept compatible
with Ultralytics model YAMLs: ``backbone``/``head`` lists of
``[from, repeats, module, args]`` rows plus ``nc``/``scales``. Parsing
resolves channels statically (same make_divisible width scaling and depth
rounding as the reference) and produces a tuple of hashable LayerSpecs; the
``GraphModel`` linen module replays the graph with a save-list cache — the
whole graph is traced once under jit, so the reference's per-layer python
hot loop disappears into one XLA program.

Strides are computed symbolically via ``jax.eval_shape`` on a dummy input
(cost-free abstract eval) instead of the reference's real dummy forward at
s=512 (``nn/tasks.py:353-362``).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import heads as H
from . import modules as M

# registry: name -> (module_cls, kind)
# kind controls channel/arg resolution in parse():
#   "conv"   : args[0] is c2 (width-scaled); module gets c2 first
#   "csp"    : like conv but repeats n is inserted (depth-scaled)
#   "plain"  : args passed through, c2 = c1
#   "concat" : c2 = sum of input channels
#   "index"  : c2 = channels of selected element (list input)
#   "head"   : detection-family head, consumes list of taps
REGISTRY: dict[str, tuple[Any, str]] = {}


def register(name: str, cls: Any, kind: str) -> None:
    REGISTRY[name] = (cls, kind)


for _n, _c, _k in [
    ("Conv", M.ConvBN, "conv"),
    ("DWConv", M.DWConv, "conv"),
    ("Focus", M.Focus, "conv"),
    ("GhostConv", M.GhostConv, "conv"),
    ("SCDown", M.SCDown, "conv"),
    ("ADown", M.ADown, "conv"),
    ("AConv", M.AConv, "conv"),
    ("nn.Identity", M.Identity, "plain"),
    ("Silence", M.Identity, "plain"),
    ("Bottleneck", M.Bottleneck, "conv"),
    ("C2f", M.C2f, "csp"),
    ("C3", M.C3, "csp"),
    ("C3k2", M.C3k2, "csp"),
    ("C2PSA", M.C2PSA, "csp"),
    ("C2fCIB", M.C2fCIB, "csp"),
    ("A2C2f", M.A2C2f, "csp"),
    ("PSA", M.PSA, "conv"),
    ("RepConv", M.RepConv, "conv"),
    ("RepNCSPELAN4", M.RepNCSPELAN4, "elan"),
    ("Conv2", M.Conv2, "conv"),
    ("LightConv", M.LightConv, "conv"),
    ("RepVGGDW", M.RepVGGDW, "conv"),
    ("C1", M.C1, "csp"),
    ("C2", M.C2, "csp"),
    ("C2fPSA", M.C2fPSA, "csp"),
    ("C3Ghost", M.C3Ghost, "csp"),
    ("C3x", M.C3x, "csp"),
    ("BottleneckCSP", M.BottleneckCSP, "csp"),
    ("GhostBottleneck", M.GhostBottleneck, "conv"),
    ("SPP", M.SPP, "conv"),
    ("RepC3", M.RepC3, "csp"),
    ("SPPELAN", M.SPPELAN, "custom"),
    ("ELAN1", M.ELAN1, "custom"),
    ("ResNetLayer", M.ResNetLayer, "custom"),
    ("TorchVision", M.TorchVision, "custom"),
    ("CBLinear", M.CBLinear, "custom"),
    ("CBFuse", M.CBFuse, "custom"),
    ("CBAM", M.CBAM, "plain"),
    ("ChannelAttention", M.ChannelAttention, "plain"),
    ("SpatialAttention", M.SpatialAttention, "plain"),
    ("ConvTranspose", M.ConvTransposeBN, "conv"),
    ("SPPF", M.SPPF, "conv"),
    ("Concat", M.Concat, "concat"),
    ("Index", M.Index, "index"),
    ("nn.Upsample", M.Upsample, "plain"),
    ("Upsample", M.Upsample, "plain"),
    ("MaxPool", M.MaxPool, "plain"),
    ("nn.MaxPool2d", M.MaxPool, "plain"),
    ("nn.ZeroPad2d", M.ZeroPad2d, "plain"),
    ("Detect", H.Detect, "head"),
    ("v10Detect", H.v10Detect, "head"),
    ("Segment", H.Segment, "head"),
    ("Pose", H.Pose, "head"),
    ("OBB", H.OBB, "head"),
    ("Classify", M.Classify, "head"),
]:
    register(_n, _c, _k)


def _register_rtdetr():
    from . import rtdetr as R

    register("HGStem", R.HGStem, "hg")
    register("HGBlock", R.HGBlock, "hg")
    register("AIFI", R.AIFI, "plain_args")
    register("RTDETRDecoder", R.RTDETRDecoder, "head")


_register_rtdetr()


def _register_world():
    from . import world as W

    register("C2fAttn", W.C2fAttn, "world")
    register("WorldDetect", W.WorldDetectHead, "head")
    register("ImagePoolingAttn", W.ImagePoolingAttn, "world_pool")


_register_world()


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round channels up to the nearest multiple (reference utils/ops.py make_divisible)."""
    return int(math.ceil(x / divisor) * divisor)


@dataclass(frozen=True)
class LayerSpec:
    i: int
    f: tuple  # from indices (len 1 = single input)
    name: str
    args: tuple = ()
    kwargs: tuple = ()  # tuple of (k, v) pairs, hashable
    c2: int = 0
    n: int = 1  # module-level repeats (non-CSP rows with n > 1)

    def build(self) -> nn.Module:
        if self.n > 1:
            return Repeat(self.name, self.args, self.kwargs, self.n, name=f"l{self.i}")
        cls, _kind = REGISTRY[self.name]
        return cls(*self.args, **dict(self.kwargs), name=f"l{self.i}")


class Repeat(nn.Module):
    """Chain n copies of a registered module (YAML repeats on non-CSP rows,
    e.g. YOLOv6's stacked plain convs)."""

    inner: str
    args: tuple
    kw: tuple
    count: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        cls, _ = REGISTRY[self.inner]
        for i in range(self.count):
            x = cls(*self.args, **dict(self.kw), name=f"r{i}")(x, train=train)
        return x


@dataclass
class ParsedModel:
    specs: tuple
    save: tuple  # layer indices whose outputs must be cached
    nc: int
    task: str
    head_index: int
    yaml: dict = field(default_factory=dict)


def parse_model(cfg: dict, ch: int = 3, scale: str | None = None, verbose: bool = False) -> ParsedModel:
    """Parse an Ultralytics-style model YAML dict into LayerSpecs."""
    nc = int(cfg.get("nc", 80))
    scales = cfg.get("scales") or {}
    depth, width, max_ch = cfg.get("depth_multiple", 1.0), cfg.get("width_multiple", 1.0), float("inf")
    if scales:
        scale = scale or cfg.get("scale") or next(iter(scales))
        if scale not in scales:
            # filename-derived scale letter that this yaml doesn't define
            # (e.g. yolov9s.yaml is its own file, not yolov9.yaml scale "s")
            scale = next(iter(scales))
        depth, width, max_ch = scales[scale]

    layers: list[LayerSpec] = []
    save: set[int] = set()
    channels = [ch]
    task = "detect"
    head_index = -1

    rows = list(cfg["backbone"]) + list(cfg.get("head", []))
    # yolo11/yolo12 graphs (C3k2 / A2C2f present) switch the Detect-family
    # cls branch to the DWConv form (reference nn/tasks.py:1191,1195)
    legacy_head = not any(r[2] in ("C3k2", "A2C2f") for r in rows)
    for i, (f, n, name, args) in enumerate(rows):
        fs = tuple(f) if isinstance(f, (list, tuple)) else (f,)
        # normalize negative refs to absolute layer indices (-1 stays relative marker)
        fs = tuple(x if x >= 0 else i + x for x in fs)
        n_rep = max(round(n * depth), 1) if n > 1 else n
        # substitute YAML symbols: the literal string "nc"/"kpt_shape" resolve
        # against the model dict (reference parse_model does an eval(); we
        # whitelist instead)
        args = [
            cfg.get(a, a) if isinstance(a, str) and a in ("nc", "kpt_shape") else a for a in args
        ]
        if name not in REGISTRY:
            raise KeyError(f"module {name!r} not in registry (layer {i})")
        cls, kind = REGISTRY[name]
        c1 = channels[fs[0] + 1] if fs[0] >= 0 else channels[-1]

        kwargs: dict[str, Any] = {}
        if kind == "conv":
            c2 = args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_ch) * width, 8)
            margs = [c2, *args[1:]]
        elif kind == "csp":
            c2 = args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_ch) * width, 8)
            margs = [c2, n_rep, *args[1:]]
            n_rep = 1
        elif kind == "concat":
            c2 = sum(channels[x + 1] for x in fs)
            # YAML dim is torch-NCHW (1 = channels); we are NHWC
            margs = [-1 if (args and args[0] == 1) else (args[0] if args else -1)]
        elif kind == "index":
            c2 = args[0] if args else 0  # caller-specified channel of the selected element
            margs = args[1:] if args else []
        elif kind == "plain":
            c2 = c1
            # nn.Upsample YAML args: [None, 2, "nearest"]
            if name in ("nn.Upsample", "Upsample"):
                margs = []
                if len(args) >= 2 and args[1]:
                    kwargs["scale"] = int(args[1])
                if len(args) >= 3 and args[2]:
                    kwargs["mode"] = str(args[2])
            elif name in ("nn.MaxPool2d", "MaxPool"):
                margs = list(args[:2])  # [k, s]; explicit pad handled by ZeroPad2d
            elif name == "nn.ZeroPad2d":
                margs = [tuple(args[0])]  # [[l, r, t, b]]
            else:
                margs = args
        elif kind == "world_pool":
            # ImagePoolingAttn [ec]: output IS the updated text guide
            c2 = 512
            margs = []
            kwargs["ec"] = make_divisible(min(args[0] if args else 256, max_ch) * width, 8)
        elif kind == "elan":
            # RepNCSPELAN4 [c2, c3, c4, n]: only c2 is width-scaled; c3/c4
            # pass through raw (reference parse_model scales args[0] only —
            # v9m's c4=180 is deliberately not rounded to 184)
            c2 = make_divisible(min(args[0], max_ch) * width, 8)
            margs = [c2, args[1], args[2], args[3] if len(args) > 3 else 1]
            n_rep = 1
        elif kind == "hg":
            # HGStem [cm, c2] / HGBlock [cm, c2, k, light, shortcut] — args
            # pass through RAW (reference parse_model :1231 neither
            # width-scales nor max_ch-clamps HG channels)
            cm, c2 = int(args[0]), int(args[1])
            margs = [cm, c2]
            if name == "HGBlock":
                if len(args) > 2:
                    kwargs["k"] = int(args[2])
                if len(args) > 3:
                    kwargs["lightconv"] = bool(args[3])
                if len(args) > 4:
                    kwargs["shortcut"] = bool(args[4])
                if n_rep > 1:
                    kwargs["n"] = n_rep  # internal conv count, not block repeats
            else:
                margs += list(args[2:])
            n_rep = 1
        elif kind == "plain_args":
            c2 = c1
            if name == "AIFI":
                margs = [c1]
                if args:
                    kwargs["cm"] = make_divisible(min(args[0], max_ch) * width, 8)
                if len(args) > 1:
                    kwargs["num_heads"] = int(args[1])
            else:
                margs = args
        elif kind == "world":
            # C2fAttn [c2, ec, nh]: channels width-scaled, repeats internal
            c2 = make_divisible(min(args[0], max_ch) * width, 8)
            ec = make_divisible(min(args[1], max_ch) * width, 8) if len(args) > 1 else 128
            margs = [c2]
            kwargs = {"ec": ec, "nh": int(args[2]) if len(args) > 2 else 1,
                      "n": n_rep if n_rep > 1 else 1}
            n_rep = 1
        elif kind == "head":
            in_ch = tuple(channels[x + 1] for x in fs)
            head_index = i
            if name == "WorldDetect":
                # [nc, embed_dim, with_bn] (reference yolov8-world.yaml row)
                task = "world"
                margs = [int(args[1]) if len(args) > 1 else 512]
                kwargs["ch"] = in_ch
                kwargs["with_bn"] = bool(args[2]) if len(args) > 2 else False
            elif name == "RTDETRDecoder":
                task = "rtdetr"
                margs = [args[0] if args else nc]
                kwargs["ch"] = in_ch
            if name in ("Detect", "v10Detect"):
                task = "detect"
                margs = [args[0] if args else nc]
                kwargs["ch"] = in_ch
            elif name == "Segment":
                task = "segment"
                margs = list(args) if args else [nc]
                if len(margs) > 2:  # proto channels width-scale (tasks.py:1246)
                    margs[2] = make_divisible(min(margs[2], max_ch) * width, 8)
                kwargs["ch"] = in_ch
            elif name == "Pose":
                task = "pose"
                margs = list(args) if args else [nc]
                if len(margs) >= 2 and isinstance(margs[1], (list, tuple)):
                    margs[1] = tuple(margs[1])
                kwargs["ch"] = in_ch
            elif name == "OBB":
                task = "obb"
                margs = list(args) if args else [nc]
                kwargs["ch"] = in_ch
            elif name == "Classify":
                task = "classify"
                margs = [args[0] if args else nc]
            if name in ("Detect", "Segment", "Pose", "OBB") and not legacy_head:
                kwargs["legacy"] = False
            c2 = 0
        else:  # custom kinds are handled by the registered class itself
            c2, margs, kwargs = cls.parse(  # type: ignore[attr-defined]
                args, channels, fs, nc=nc, width=width, depth=depth, n=n_rep,
                max_ch=max_ch,
            )
            n_rep = 1

        spec = LayerSpec(
            i=i,
            f=fs,
            name=name,
            args=tuple(_hashable(a) for a in margs),
            kwargs=tuple(sorted((k, _hashable(v)) for k, v in kwargs.items())),
            c2=c2,
            n=n_rep if isinstance(n_rep, int) and n_rep > 1 else 1,
        )
        layers.append(spec)
        channels.append(c2)
        for x in spec.f:
            if x != i - 1 and x >= 0:
                save.add(x)
        if verbose:
            print(f"{i:>3} {str(fs):>12} {name:<20} c1={c1} c2={c2} args={margs} {kwargs}")

    return ParsedModel(
        specs=tuple(layers), save=tuple(sorted(save)), nc=nc, task=task, head_index=head_index, yaml=cfg
    )


def _hashable(v):
    if isinstance(v, list):
        return tuple(_hashable(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    return v


class GraphModel(nn.Module):
    """Replays a parsed layer graph. Returns the head output.

    The reference caches intermediate outputs in a ``y`` list guided by a
    save-list (``nn/tasks.py:152-180``); we do the same, but the "loop" is
    unrolled at trace time so XLA sees one flat program.
    """

    parsed: ParsedModel

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, head_kwargs: dict | None = None,
                 guide: jnp.ndarray | None = None, upto: int | None = None):
        """``guide`` is an optional (B, nt, embed) side input (text embeddings
        for YOLOWorld, reference nn/tasks.py:737 WorldModel.predict): it is
        handed to every module whose class sets ``needs_guide = True``
        (C2fAttn, WorldDetect)."""
        cache: dict[int, jnp.ndarray] = {}
        prev = x
        out = None
        save = set(self.parsed.save)
        for spec in self.parsed.specs:
            if len(spec.f) == 1:
                inp = prev if spec.f[0] == spec.i - 1 else cache[spec.f[0]]
            else:
                inp = [prev if j == spec.i - 1 else cache[j] for j in spec.f]
            mod = spec.build()
            extra = head_kwargs if (head_kwargs and spec.i == self.parsed.head_index) else {}
            if getattr(type(mod), "needs_guide", False):
                g = guide
                if g is None:  # init-time fallback so params exist
                    g = jnp.zeros((x.shape[0], 1, 512), x.dtype)
                prev = mod(inp, g, train=train, **extra)
                if getattr(type(mod), "updates_guide", False):
                    # ImagePoolingAttn: its output replaces the text guide for
                    # every later layer (reference WorldModel txt_feats update)
                    guide = prev
            else:
                prev = mod(inp, train=train, **extra)
            if spec.i in save:
                cache[spec.i] = prev
            out = prev
            if upto is not None and spec.i >= upto:
                # truncated replay for per-layer profiling (reference
                # BaseModel._profile_one_layer, nn/tasks.py:190)
                return out
        return out
