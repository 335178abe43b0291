"""Config system: default.yaml + override merge + typed validation.

Re-design of reference ``cfg/__init__.py`` (get_cfg :276, check_cfg :324,
entrypoint :825). Same three-tier merge: defaults -> programmatic overrides
-> CLI ``k=v`` pairs, with typed validation and did-you-mean errors.
"""
from __future__ import annotations

import difflib
from pathlib import Path
from types import SimpleNamespace
from typing import Any

import yaml

CFG_DIR = Path(__file__).parent
MODELS_DIR = CFG_DIR / "models"

TASKS = ("detect", "segment", "classify", "pose", "obb")
MODES = ("train", "val", "predict", "export", "track", "benchmark")

TASK2METRIC = {
    "detect": "metrics/mAP50-95(B)",
    "segment": "metrics/mAP50-95(M)",
    "classify": "metrics/accuracy_top1",
    "pose": "metrics/mAP50-95(P)",
    "obb": "metrics/mAP50-95(B)",
}

# typed key groups (reference cfg/__init__.py:147-238)
CFG_FLOAT_KEYS = {"warmup_epochs", "box", "cls", "dfl", "degrees", "shear", "time", "pose", "kobj",
                  "workspace", "batch"}
CFG_FRACTION_KEYS = {"dropout", "lr0", "lrf", "momentum", "weight_decay", "warmup_momentum",
                     "warmup_bias_lr", "hsv_h", "hsv_s", "hsv_v", "translate", "scale",
                     "perspective", "flipud", "fliplr", "bgr", "mosaic", "mixup", "copy_paste",
                     "conf", "iou", "fraction", "erasing", "crop_fraction"}
CFG_INT_KEYS = {"epochs", "patience", "workers", "seed", "close_mosaic", "mask_ratio",
                "max_det", "vid_stride", "line_width", "nbs", "save_period", "imgsz",
                "mesh_dp", "mesh_tp", "mesh_sp", "max_labels", "mosaic_n"}
CFG_BOOL_KEYS = {"save", "exist_ok", "verbose", "deterministic", "single_cls", "rect", "cos_lr",
                 "overlap_mask", "val", "save_json", "save_hybrid", "half", "dnn", "plots",
                 "show", "save_txt", "save_conf", "save_crop", "save_frames", "show_labels",
                 "show_conf", "visualize", "augment", "agnostic_nms", "retina_masks",
                 "show_boxes", "keras", "optimize", "int8", "dynamic", "simplify", "nms",
                 "profile", "multi_scale", "stream_buffer", "device_augment"}


def yaml_load(path: str | Path) -> dict:
    with open(path, errors="ignore", encoding="utf-8") as f:
        data = yaml.safe_load(f.read()) or {}
    if not isinstance(data, dict):
        raise TypeError(f"YAML file {path} should define a dict, got {type(data)}")
    return data


def yaml_save(path: str | Path, data: dict) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump({k: (str(v) if isinstance(v, Path) else v) for k, v in data.items()}, f,
                       sort_keys=False, allow_unicode=True)


DEFAULT_CFG_DICT = yaml_load(CFG_DIR / "default.yaml")
for _k, _v in DEFAULT_CFG_DICT.items():
    if isinstance(_v, str) and _v.lower() == "none":
        DEFAULT_CFG_DICT[_k] = None


def check_cfg(cfg: dict, hard: bool = True) -> dict:
    """Typed validation (reference check_cfg, cfg/__init__.py:324)."""
    for k, v in list(cfg.items()):
        if v is None:
            continue
        if k in CFG_FLOAT_KEYS:
            if not isinstance(v, (int, float)):
                _type_err(k, v, "float", hard)
            cfg[k] = float(v)
        elif k in CFG_FRACTION_KEYS:
            if not isinstance(v, (int, float)):
                _type_err(k, v, "float", hard)
            cfg[k] = float(v)
            if not (0.0 <= cfg[k] <= 1.0):
                raise ValueError(f"'{k}={v}' must be in [0, 1]")
        elif k in CFG_INT_KEYS:
            if not isinstance(v, int):
                if isinstance(v, float) and v.is_integer():
                    cfg[k] = int(v)
                else:
                    _type_err(k, v, "int", hard)
        elif k in CFG_BOOL_KEYS:
            if not isinstance(v, bool):
                if isinstance(v, str) and v.lower() in ("true", "false"):
                    cfg[k] = v.lower() == "true"
                else:
                    _type_err(k, v, "bool", hard)
    return cfg


def _type_err(k, v, t, hard):
    msg = f"'{k}={v}' is of invalid type {type(v).__name__}, expected {t}"
    if hard:
        raise TypeError(msg)


def check_dict_alignment(base: dict, custom: dict) -> None:
    """Did-you-mean error for mistyped keys (reference cfg/__init__.py:456)."""
    unknown = [k for k in custom if k not in base]
    if unknown:
        msgs = []
        for k in unknown:
            matches = difflib.get_close_matches(k, base.keys(), n=3)
            hint = f" — did you mean {matches}?" if matches else ""
            msgs.append(f"'{k}' is not a valid key{hint}")
        raise KeyError("; ".join(msgs))


def get_cfg(cfg: dict | str | Path | SimpleNamespace | None = None, overrides: dict | None = None) -> SimpleNamespace:
    """Merge defaults + cfg + overrides into a validated namespace."""
    if cfg is None:
        merged = dict(DEFAULT_CFG_DICT)
    elif isinstance(cfg, (str, Path)):
        merged = {**DEFAULT_CFG_DICT, **yaml_load(cfg)}
    elif isinstance(cfg, SimpleNamespace):
        merged = {**DEFAULT_CFG_DICT, **vars(cfg)}
    else:
        check_dict_alignment(DEFAULT_CFG_DICT, cfg)
        merged = {**DEFAULT_CFG_DICT, **cfg}
    if overrides:
        overrides = dict(overrides)
        overrides.pop("__dict__", None)
        check_dict_alignment(merged, overrides)
        merged.update(overrides)
    check_cfg(merged)
    return SimpleNamespace(**merged)


def model_yaml_path(name: str | Path) -> Path:
    """Resolve a model YAML by path or bundled name; parse trailing scale.

    "yolov8n.yaml" -> (bundled yolov8.yaml, scale "n"), like the reference's
    yaml_model_load (nn/tasks.py:1281) guess_model_scale.
    """
    p = Path(name)
    if p.exists():
        return p
    cand = MODELS_DIR / p.name
    if cand.exists():
        return cand
    raise FileNotFoundError(f"model yaml {name!r} not found (searched {MODELS_DIR})")


def load_model_yaml(name: str | Path) -> tuple[dict, str | None]:
    """Load a model YAML, extracting the scale letter from names like yolov8n.yaml."""
    import re

    p = Path(name)
    stem = p.stem
    scale = None
    # "yolov8n.yaml" -> yolov8.yaml scale n; "yolov8s-seg.yaml" -> yolov8-seg.yaml
    # scale s; the letter class covers every scale the zoo defines
    # (n/s/m/l/x + v9's t/c/e and v10's b) — exact zoo files always win below
    m = re.match(r"^(.*?)([nsmlxtcbe])(-[a-z0-9]+)?$", stem)
    if not p.exists() and (MODELS_DIR / p.with_suffix(".yaml").name).exists():
        m = None  # an exact zoo file wins over scale-letter stripping (yolov9s.yaml)
    if not p.exists() and m is not None:
        base = f"{m.group(1)}{m.group(3) or ''}.yaml"
        if (MODELS_DIR / base).exists():
            p = MODELS_DIR / base
            scale = m.group(2)
    if scale is None:
        p = model_yaml_path(name)
    d = yaml_load(p)
    d["yaml_file"] = str(p)
    return d, scale
