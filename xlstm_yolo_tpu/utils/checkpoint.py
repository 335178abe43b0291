"""Checkpoint save/load — functional-pytree replacement for the reference's
torch.save ckpt dicts (``engine/trainer.py:514-545``): same logical contents
{epoch, best_fitness, ema, optimizer state, train_args, date, version} but
serialized with flax msgpack + a YAML sidecar, no pickle anywhere (the
reference needs a SafeUnpickler allowlist, nn/tasks.py:908 — msgpack makes
that problem not exist).

A checkpoint is a directory:
    meta.yaml        — model yaml graph, task, nc, epoch, best_fitness, args
    state.msgpack    — {"params", "batch_stats"} (EMA params if saved as best)
    optimizer.msgpack (optional) — optimizer state for exact resume
"""
from __future__ import annotations

import datetime
from pathlib import Path

import yaml
from flax import serialization


def save_checkpoint(path: str | Path, model, variables: dict, *, optimizer_state=None,
                    epoch: int = -1, best_fitness: float = 0.0, train_args: dict | None = None,
                    ema_params=None) -> None:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    meta = {
        "yaml": {k: v for k, v in model.yaml.items() if k != "yaml_file"},
        "scale": model.scale,
        "task": model.task,
        "nc": model.nc,
        "names": model.names,
        "epoch": int(epoch),
        "best_fitness": float(best_fitness),
        "train_args": dict(train_args or {}),
        "date": datetime.datetime.now().isoformat(),
        "version": "0.1.0",
    }
    (p / "meta.yaml").write_text(yaml.safe_dump(meta, sort_keys=False))
    state = dict(variables)
    if ema_params is not None:
        state = {**state, "ema_params": ema_params}
    (p / "state.msgpack").write_bytes(serialization.to_bytes(state))
    if optimizer_state is not None:
        (p / "optimizer.msgpack").write_bytes(serialization.to_bytes(optimizer_state))


def load_checkpoint(path: str | Path, use_ema: bool = True):
    """Returns (model, variables, meta)."""
    from ..nn.tasks import TaskModel

    p = Path(path)
    if not (p / "meta.yaml").exists() and (p.with_suffix("") / "meta.yaml").exists():
        p = p.with_suffix("")
    meta = yaml.safe_load((p / "meta.yaml").read_text())
    model = TaskModel(meta["yaml"], nc=meta["nc"], scale=meta.get("scale"))
    model.names = meta.get("names") or model.names
    template = model.init(0, imgsz=64)
    raw = (p / "state.msgpack").read_bytes()
    # tolerate the optional ema_params key in the serialized tree
    tmpl = dict(template)
    state = serialization.from_bytes(tmpl, raw) if not _has_ema(raw, template) else None
    if state is None:
        tmpl = {**template, "ema_params": template["params"]}
        full = serialization.from_bytes(tmpl, raw)
        ema = full.pop("ema_params")
        state = full
        if use_ema:
            state = {**state, "params": ema}
    return model, state, meta


def _has_ema(raw: bytes, template: dict) -> bool:
    from flax import serialization as s

    try:
        s.from_bytes(dict(template), raw)
        return False
    except Exception:
        return True


def load_optimizer_state(path: str | Path, template):
    p = Path(path)
    f = p / "optimizer.msgpack"
    if not f.exists():
        return None
    return serialization.from_bytes(template, f.read_bytes())
