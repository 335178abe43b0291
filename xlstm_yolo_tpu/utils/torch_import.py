"""Import Ultralytics/PyTorch checkpoints into our parameter trees.

Replaces the reference's pickle-based weight loading
(``nn/tasks.py:928-1068`` torch_safe_load / attempt_load_one_weight) with a
tensors-only path: ``torch.load(weights_only=True)`` (no arbitrary code
execution — the reference needs a SafeUnpickler allowlist for the same
reason), then a name-mapped conversion into the flax layout:

  torch ``model.{i}.<sub>.weight``  ->  params ``l{i}/<sub'>/kernel``
  conv   (cout, cin, kh, kw)        ->  (kh, kw, cin, cout)
  bn     weight/bias                ->  bn/{scale, bias}
  stats  running_mean/var           ->  batch_stats ``.../bn/{mean, var}``
  linear (out, in)                  ->  (in, out)

Sub-module naming: sequential children like ``cv2.0.1`` (per-scale branches
in Detect) become ``cv2_0_1``; bottleneck lists ``m.3`` become ``m3``.
"""
from __future__ import annotations

import re
from pathlib import Path

import numpy as np


def torch_state_dict(pt_path: str | Path) -> dict:
    """Load a .pt checkpoint to {name: numpy array} without unpickling code."""
    import torch

    obj = torch.load(str(pt_path), map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "state_dict"):
        sd = obj["model"].state_dict()
    elif isinstance(obj, dict) and all(hasattr(v, "numpy") for v in obj.values()):
        sd = obj
    elif isinstance(obj, dict) and "state_dict" in obj:
        sd = obj["state_dict"]
    else:
        raise ValueError(f"unrecognized checkpoint structure in {pt_path}")
    return {k: v.detach().float().numpy() for k, v in sd.items()}


def _rename_transformer_mods(mods: list[str]) -> list[str]:
    """Rename torch transformer/RT-DETR module paths to our flax tree names.

    Covers the reference's AIFI (``nn/modules/transformer.py``) and
    RTDETRDecoder (``nn/modules/head.py``) attribute names:

      ma -> mha (AIFI MultiheadAttention)
      decoder.layers.{i} -> layer{i}        out_proj -> out
      dec_bbox_head.{i} -> bbox_head{i}     linear1/2 -> fc1/2
      dec_score_head.{i} -> score_head{i}   <mlp>.layers.{j} -> <mlp>.l{j}
      enc_output.{0,1} -> enc_output / enc_output_norm
      input_proj.{i}.{0,1} -> input_proj{i}.{conv,bn}
    """
    out = list(mods)
    if len(out) >= 3 and out[0] == "decoder" and out[1] == "layers":
        out = [f"layer{out[2]}"] + out[3:]
    if len(out) >= 2 and out[0] in ("dec_bbox_head", "dec_score_head"):
        out = [out[0][4:] + out[1]] + out[2:]
    i = 0
    while i < len(out) - 1:  # MLP heads: layers.{j} -> l{j}
        if out[i] == "layers" and out[i + 1].isdigit():
            out[i: i + 2] = [f"l{out[i + 1]}"]
        else:
            i += 1
    if out[:2] == ["enc_output", "0"]:
        out = ["enc_output"] + out[2:]
    elif out[:2] == ["enc_output", "1"]:
        out = ["enc_output_norm"] + out[2:]
    if len(out) >= 3 and out[0] == "input_proj" and out[1].isdigit():
        out = [f"input_proj{out[1]}", "conv" if out[2] == "0" else "bn"] + out[3:]
    rename = {"ma": "mha", "out_proj": "out", "linear1": "fc1", "linear2": "fc2"}
    return [rename.get(p, p) for p in out]


def _flax_path(torch_name: str) -> tuple | None:
    """Map a torch param name to (collection, path tuple, kind)."""
    parts = torch_name.split(".")
    if parts[0] == "model":
        parts = parts[1:]
        layer = f"l{parts[0]}"
        parts = parts[1:]
    else:
        layer = None
    leaf = parts[-1]
    mods = _rename_transformer_mods(parts[:-1])

    # merge numeric sequential indices into their parent name:
    #   m.2 (CSP bottleneck list)        -> m2
    #   cv2.0.1 (per-scale head branch)  -> cv2_0_1
    #   proto.cv1 / proto.upsample      -> proto_cv1 / proto_up (Segment)
    if "proto" in parts:
        i = parts.index("proto")
        child = parts[i + 1]
        parts[i: i + 2] = ["proto_up" if child == "upsample" else f"proto_{child}"]
        mods = parts[:-1]
    merged: list[str] = []
    for p in mods:
        if p.isdigit() and merged:
            base = merged[-1]
            if base == "m" or (base[0] == "m" and base[1:].isdigit()):
                merged[-1] = base + p if base == "m" else base  # m -> m2 (only first digit)
                if base != "m":
                    merged.append(p)  # unexpected deeper nesting
            else:
                merged[-1] = f"{base}_{p}"
        else:
            merged.append(p)

    if leaf in ("in_proj_weight", "in_proj_bias"):
        # torch MultiheadAttention packed qkv -> split into query/key/value
        coll = "params"
        name = "kernel" if leaf == "in_proj_weight" else "bias"
        kind = "mha_in_proj"
    elif leaf == "weight" and merged and merged[-1] == "denoising_class_embed":
        coll, name, kind = "params", "embedding", "raw"
    elif leaf in ("weight", "bias") and merged and merged[-1] == "bn":
        coll = "params"
        name = "scale" if leaf == "weight" else "bias"
        kind = "bn_affine"
    elif leaf in ("running_mean", "running_var"):
        coll = "batch_stats"
        name = "mean" if leaf == "running_mean" else "var"
        kind = "bn_stats"
    elif leaf == "num_batches_tracked":
        return None
    elif leaf == "weight" and merged and merged[-1] == "proto_up":
        # ConvTranspose2d weight is (in, out, kh, kw); flax wants (kh, kw, in, out)
        coll, name, kind = "params", "kernel", "deconv"
    elif leaf == "weight" and merged and merged[-1] == "conv":
        coll, name, kind = "params", "kernel", "conv"
    elif leaf == "weight":
        coll, name, kind = "params", "kernel", "linear"
    elif leaf == "bias":
        coll, name, kind = "params", "bias", "bias"
    else:
        coll, name, kind = "params", leaf, "raw"

    path = ([layer] if layer else []) + merged + [name]
    return coll, tuple(path), kind


def load_torch_weights(variables: dict, pt_path: str | Path, verbose: bool = True):
    """Fill our variables from a torch checkpoint; returns
    (new_variables, matched, missed_torch_keys)."""
    sd = torch_state_dict(pt_path)
    return load_torch_state_dict(variables, sd, verbose=verbose)


def load_torch_state_dict(variables: dict, sd: dict, verbose: bool = True):
    import jax

    flat = _flatten(variables)
    matched, missed = 0, []
    import copy

    out = copy.deepcopy(jax.tree_util.tree_map(lambda x: x, variables))

    for tname, arr in sd.items():
        mapped = _flax_path(tname)
        if mapped is None:
            continue
        coll, path, kind = mapped
        if kind == "mha_in_proj":
            # packed (3D, ...) qkv: rows [q; k; v] -> three flax sub-modules
            assigns = [((coll,) + path[:-1] + (qkv, path[-1]), sub)
                       for qkv, sub in zip(("query", "key", "value"),
                                           np.split(arr, 3, axis=0))]
        else:
            assigns = [((coll,) + path, arr)]
        for key, arr in assigns:
            if key not in flat and len(key) > 2:
                # Segment/Pose/OBB heads nest the shared Detect branches under
                # a "detect" submodule in our tree; torch has cv2/cv3 on head
                alt = (key[0], key[1], "detect") + key[2:]
                if alt in flat:
                    key = alt
            if key not in flat and any(p in ("conv1", "conv2") for p in key):
                # HGBlock's LightConv list: torch "m.{i}.conv{j}" vs our
                # flattened "m{i}_cv{j}" (RepC3's RepConv keeps real conv1/
                # conv2 submodules, so only fall back when the direct miss)
                alt, i = list(key), 1
                while i < len(alt):
                    if alt[i] in ("conv1", "conv2") and re.fullmatch(r"m\d+", alt[i - 1]):
                        alt[i - 1: i + 1] = [alt[i - 1] + "_cv" + alt[i][-1]]
                    else:
                        i += 1
                if tuple(alt) in flat:
                    key = tuple(alt)
            if key not in flat and key[-1] == "kernel" and arr.ndim == 1:
                # torch LayerNorm.weight maps to flax "scale"
                alt = key[:-1] + ("scale",)
                if alt in flat:
                    key = alt
            if key not in flat:
                # bottleneck lists inside CSP blocks: torch "m.0.cv1..."
                # already merged to "m0"; detect branches "cv2.0.0"->"cv2_0_0"
                missed.append(tname)
                continue
            want_shape = tuple(flat[key].shape)
            if kind == "deconv" and arr.ndim == 4:
                arr = np.transpose(arr, (2, 3, 0, 1))  # IOHW -> HWIO
            elif kind in ("conv", "linear") and arr.ndim == 4:
                arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
            elif kind in ("linear", "mha_in_proj") and arr.ndim == 2:
                arr = arr.T
            if (arr.shape != want_shape and arr.size == int(np.prod(want_shape))
                    and kind in ("linear", "mha_in_proj", "bias") and arr.ndim <= 2):
                # flax attention splits the feature dim into (heads, head_dim):
                # q/k/v kernel (D, D)->(D, H, Hd), out (D, D)->(H, Hd, D),
                # per-head bias (D,)->(H, Hd) — all row-major reshapes
                arr = arr.reshape(want_shape)
            if arr.shape != want_shape:
                missed.append(tname)
                continue
            _set(out, key, arr.astype(np.asarray(flat[key]).dtype))
            matched += 1

    if verbose:
        print(f"torch import: {matched} tensors matched, {len(missed)} unmatched")
        for m in missed[:10]:
            print("  unmatched:", m)
    return out, matched, missed


def export_torch_names(variables: dict) -> dict:
    """Inverse map: our flat paths -> ultralytics-style torch names (for
    building test fixtures and exporting back)."""
    out = {}
    for key in _flatten(variables):
        coll, *path = key
        name = list(path)
        leaf = name[-1]
        mods = name[:-1]
        tparts = []
        for p in mods:
            if p.startswith("l") and p[1:].isdigit():
                tparts.extend(["model", p[1:]])
            elif "_" in p:
                head, *idxs = p.split("_")
                tparts.append(head)
                tparts.extend(idxs)
            elif p[-1].isdigit() and not p[-2:].isdigit() and p[0] == "m":
                tparts.extend([p[0], p[1:]])
            else:
                tparts.append(p)
        if leaf == "kernel":
            tleaf = "weight"
        elif leaf == "scale":
            tleaf = "weight"
        elif leaf in ("mean", "var"):
            tleaf = f"running_{leaf}"
        else:
            tleaf = leaf
        out[key] = ".".join(tparts + [tleaf])
    return out


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _set(tree, key, value):
    node = tree
    for k in key[:-1]:
        node = node[k]
    import jax.numpy as jnp

    node[key[-1]] = jnp.asarray(value)


# ---------------------------------------------------------------------------
# SAM checkpoint import (reference models/sam/build.py:23-121 builds from the
# released sam_*.pt checkpoints; this maps the image-encoder tensors into our
# flax ImageEncoderViT tree — models_sam.py)
# ---------------------------------------------------------------------------

def sam_encoder_params(sd: dict, prefix: str = "image_encoder.") -> dict:
    """Translate a torch SAM image-encoder state_dict into a params subtree
    for ``models_sam.ImageEncoderViT``.

    Layout map (torch -> flax):
      patch_embed.proj.{weight,bias} -> patch_embed/{kernel(T),bias}
      pos_embed (1,H,W,C, already channels-last in SAM) -> pos_embed
      blocks.i.norm{1,2}.{weight,bias} -> block{i}/norm{1,2}/{scale,bias}
      blocks.i.attn.qkv/proj (out,in) -> block{i}/attn/{qkv,proj}/kernel (in,out)
      blocks.i.attn.rel_pos_{h,w} -> block{i}/attn/rel_pos_{h,w}
      blocks.i.mlp.lin{1,2} -> block{i}/mlp/Dense_{0,1}
      neck.{0,2} convs -> neck{0,1}/kernel; neck.{1,3} LayerNorm2d -> neck_ln{0,1}
    """
    def g(k):
        return np.asarray(sd[prefix + k], np.float32)

    def lin(k):
        return {"kernel": g(k + ".weight").T, "bias": g(k + ".bias")}

    p = {
        "patch_embed": {"kernel": g("patch_embed.proj.weight").transpose(2, 3, 1, 0),
                        "bias": g("patch_embed.proj.bias")},
        "pos_embed": g("pos_embed"),
        "neck0": {"kernel": g("neck.0.weight").transpose(2, 3, 1, 0)},
        "neck_ln0": {"scale": g("neck.1.weight"), "bias": g("neck.1.bias")},
        "neck1": {"kernel": g("neck.2.weight").transpose(2, 3, 1, 0)},
        "neck_ln1": {"scale": g("neck.3.weight"), "bias": g("neck.3.bias")},
    }
    i = 0
    while f"{prefix}blocks.{i}.norm1.weight" in sd:
        b = f"blocks.{i}."
        blk = {
            "norm1": {"scale": g(b + "norm1.weight"), "bias": g(b + "norm1.bias")},
            "norm2": {"scale": g(b + "norm2.weight"), "bias": g(b + "norm2.bias")},
            "attn": {"qkv": lin(b + "attn.qkv"), "proj": lin(b + "attn.proj")},
            "mlp": {"Dense_0": lin(b + "mlp.lin1"), "Dense_1": lin(b + "mlp.lin2")},
        }
        if prefix + b + "attn.rel_pos_h" in sd:
            blk["attn"]["rel_pos_h"] = g(b + "attn.rel_pos_h")
            blk["attn"]["rel_pos_w"] = g(b + "attn.rel_pos_w")
        p[f"block{i}"] = blk
        i += 1
    return p


def sam2_hiera_params(sd: dict, prefix: str = "image_encoder.trunk.") -> dict:
    """Translate a torch SAM2 Hiera trunk state_dict into a params subtree
    for ``models_sam2.Hiera`` (reference models/sam/modules/encoders.py:645;
    released sam2*.pt checkpoints key the trunk as ``image_encoder.trunk.``).

    Layout map (torch -> flax):
      patch_embed.proj.{weight,bias} (C,3,7,7) -> patch_embed/{kernel(T),bias}
      pos_embed (1,C,14,14) / pos_embed_window (1,C,ws,ws) -> NHWC
      blocks.i.norm{1,2}.{weight,bias}        -> b{i}/norm{1,2}/{scale,bias}
      blocks.i.attn.qkv/proj (out,in)         -> b{i}/attn/{qkv,proj}/kernel (in,out)
      blocks.i.proj (dim-change shortcut)     -> b{i}/proj
      blocks.i.mlp.layers.{0,1}               -> b{i}/mlp{0,1}
    """
    def g(k):
        return np.asarray(sd[prefix + k], np.float32)

    def lin(k):
        return {"kernel": g(k + ".weight").T, "bias": g(k + ".bias")}

    p = {
        "patch_embed": {"kernel": g("patch_embed.proj.weight").transpose(2, 3, 1, 0),
                        "bias": g("patch_embed.proj.bias")},
        "pos_embed": g("pos_embed").transpose(0, 2, 3, 1),
        "pos_embed_window": g("pos_embed_window").transpose(0, 2, 3, 1),
    }
    i = 0
    while f"{prefix}blocks.{i}.norm1.weight" in sd:
        b = f"blocks.{i}."
        blk = {
            "norm1": {"scale": g(b + "norm1.weight"), "bias": g(b + "norm1.bias")},
            "norm2": {"scale": g(b + "norm2.weight"), "bias": g(b + "norm2.bias")},
            "attn": {"qkv": lin(b + "attn.qkv"), "proj": lin(b + "attn.proj")},
            "mlp0": lin(b + "mlp.layers.0"),
            "mlp1": lin(b + "mlp.layers.1"),
        }
        if prefix + b + "proj.weight" in sd:
            blk["proj"] = lin(b + "proj")
        p[f"b{i}"] = blk
        i += 1
    return p


def load_sam2_hiera(variables: dict, sd: dict, prefix: str = "image_encoder.trunk.") -> dict:
    """Return ``variables`` with the Hiera trunk params replaced by the
    checkpoint's (shape-checked against the initialized tree). ``variables``
    may be a bare Hiera tree or a full SAM2 tree (trunk under
    params/image_encoder/trunk or params/trunk)."""
    new_trunk = sam2_hiera_params(sd, prefix)

    def _locate(params):
        if "b0" in params:
            return params, None
        for path in (("image_encoder", "trunk"), ("trunk",)):
            node = params
            ok = True
            for k in path:
                if k not in node:
                    ok = False
                    break
                node = node[k]
            if ok and "b0" in node:
                return node, path
        raise ValueError("no Hiera trunk found in params")

    old_trunk, path = _locate(variables["params"])
    flat_old = dict(_flatten(old_trunk))
    flat_new = dict(_flatten(new_trunk))
    missing = set(flat_old) - set(flat_new)
    extra = set(flat_new) - set(flat_old)
    if missing or extra:
        raise ValueError(f"SAM2 Hiera map mismatch: missing={sorted(missing)[:4]} "
                         f"extra={sorted(extra)[:4]}")
    for k, v in flat_new.items():
        if tuple(flat_old[k].shape) != tuple(v.shape):
            raise ValueError(f"shape mismatch at {k}: {flat_old[k].shape} vs {v.shape}")
    import copy

    out = dict(variables)
    out["params"] = copy.deepcopy(dict(variables["params"]))
    if path is None:
        out["params"] = new_trunk
    else:
        node = out["params"]
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = new_trunk
    return out


def load_sam_encoder(variables: dict, sd: dict, prefix: str = "image_encoder.") -> dict:
    """Return ``variables`` with the image-encoder params replaced by the
    checkpoint's (shape-checked against the initialized tree)."""
    new_enc = sam_encoder_params(sd, prefix)
    nested = "image_encoder" in variables["params"]  # full SAM vs bare encoder
    old_enc = variables["params"]["image_encoder"] if nested else variables["params"]
    flat_old = dict(_flatten(old_enc))
    flat_new = dict(_flatten(new_enc))
    missing = set(flat_old) - set(flat_new)
    extra = set(flat_new) - set(flat_old)
    if missing or extra:
        raise ValueError(f"SAM encoder map mismatch: missing={sorted(missing)[:4]} "
                         f"extra={sorted(extra)[:4]}")
    for k, v in flat_new.items():
        if flat_old[k].shape != v.shape:
            raise ValueError(f"shape mismatch at {k}: {flat_old[k].shape} vs {v.shape}")
    out = dict(variables)
    if nested:
        out["params"] = dict(variables["params"])
        out["params"]["image_encoder"] = new_enc
    else:
        out["params"] = new_enc
    return out


def to_torch_state_dict(variables: dict) -> dict:
    """Inverse of ``load_torch_state_dict``: our variables -> an
    ultralytics-style torch state_dict (numpy arrays, torch layouts), so a
    reference user can take weights trained here back into the torch
    framework (reference ``nn/tasks.py`` model.load path). Layout inverses:
    HWIO conv kernels -> OIHW, HWIO deconv -> IOHW, (in, out) linear ->
    (out, in), flax attention (D, H, Hd)/(H, Hd, D) kernels -> 2D torch.

    Every emitted name is validated by running ``_flax_path`` back over it
    and requiring the original key (the same resolution the importer uses),
    so the export can never silently produce a name the importer would not
    round-trip. Keys with no reference analogue raise."""
    names = export_torch_names(variables)
    flat = _flatten(variables)
    out = {}
    for key, tname in names.items():
        # seg/pose/obb heads nest the shared Detect branches under a
        # "detect" submodule here; the torch head keeps cv2/cv3 directly
        tname = tname.replace(".detect.", ".")

        def _resolves(mapped):
            # the same resolution load_torch_state_dict applies: direct hit,
            # or the seg/pose/obb heads' "detect" submodule nesting
            if mapped is None:
                return False
            got = (mapped[0],) + mapped[1]
            return got == key or (got[:2] + ("detect",) + got[2:]) == key

        mapped = _flax_path(tname)
        if not _resolves(mapped):
            # HGBlock LightConv flattening: our "m{i}_cv{j}" -> "m.{i}.conv{j}"
            alt = re.sub(r"\bm\.(\d+)\.cv(\d)\b", r"m.\1.conv\2", tname)
            mapped = _flax_path(alt)
            if not _resolves(mapped):
                raise ValueError(f"no reference torch name for {key} "
                                 f"(candidate {tname!r})")
            tname = alt
        kind = mapped[2]
        arr = np.asarray(flat[key], np.float32)
        if kind == "deconv" and arr.ndim == 4:
            arr = np.transpose(arr, (2, 3, 0, 1))  # HWIO -> IOHW
        elif kind in ("conv", "linear") and arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        elif kind == "linear" and arr.ndim >= 2:
            if arr.ndim == 3:  # flax attention kernels
                if key[-2] == "out":  # (H, Hd, D): in = leading two dims
                    arr = arr.reshape(-1, arr.shape[-1])
                else:  # q/k/v (D, H, Hd): in = first dim
                    arr = arr.reshape(arr.shape[0], -1)
            arr = arr.T
        elif kind == "bias" and arr.ndim == 2:
            arr = arr.reshape(-1)  # flax per-head attention bias (H, Hd)
        out[tname] = arr
    return out
