"""CLI entrypoint: ``python -m xlstm_yolo_tpu TASK MODE k=v ...``

Re-design of reference ``cfg/__init__.py:entrypoint`` (:825): the same
``yolo detect train data=... model=...`` grammar.
"""
from __future__ import annotations

import sys

from .cfg import DEFAULT_CFG_DICT, MODES, TASKS, check_dict_alignment


def parse_kv(args: list[str]) -> dict:
    """k=v pairs with '=' splitting tolerance (reference merge_equals_args)."""
    merged: list[str] = []
    for a in args:
        if a.endswith("=") and merged is not None:
            merged.append(a)
        elif a.startswith("=") and merged:
            merged[-1] += a
        elif "=" not in a and merged and merged[-1].endswith("="):
            merged[-1] += a
        else:
            merged.append(a)
    out = {}
    for a in merged:
        if "=" not in a:
            raise SystemExit(f"argument {a!r} is not k=v")
        k, v = a.split("=", 1)
        out[k] = _coerce(v)
    return out


def _coerce(v: str):
    low = v.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("none", "null", ""):
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v


HELP = f"""usage: python -m xlstm_yolo_tpu TASK MODE [k=v ...]

    TASK in {TASKS}
    MODE in {MODES}

examples:
    python -m xlstm_yolo_tpu detect train data=coco8.yaml model=yolov8n.yaml epochs=10
    python -m xlstm_yolo_tpu detect predict model=runs/detect/train/best.ckpt source=img.jpg
    python -m xlstm_yolo_tpu detect val model=best.ckpt data=coco8.yaml
    python -m xlstm_yolo_tpu detect export model=best.ckpt format=stablehlo
"""


def entrypoint(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(HELP)
        return 0
    task = argv[0] if argv and argv[0] in TASKS else "detect"
    rest = argv[1:] if argv and argv[0] in TASKS else argv
    mode = rest[0] if rest and rest[0] in MODES else "predict"
    kv = parse_kv(rest[1:] if rest and rest[0] in MODES else rest)
    check_dict_alignment({**DEFAULT_CFG_DICT, "model": None}, kv)

    from . import Model

    model_src = kv.pop("model", None) or ("yolov8n.yaml" if task == "detect" else f"yolov8n-{task[:3]}.yaml")
    m = Model(model_src, task=task)
    if mode == "train":
        m.train(**kv)
    elif mode == "val":
        print(m.val(**kv))
    elif mode == "predict":
        for r in m.predict(kv.pop("source", None), **kv):
            print(r.verbose())
    elif mode == "track":
        for r in m.track(kv.pop("source", None), **kv):
            print(len(r), "tracks")
    elif mode == "export":
        print(m.export(**kv))
    elif mode == "benchmark":
        from .utils.benchmarks import benchmark

        benchmark(m.model, m.variables, **kv)
    return 0


if __name__ == "__main__":
    raise SystemExit(entrypoint())
