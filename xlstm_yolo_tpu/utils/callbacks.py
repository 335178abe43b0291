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


def _scalar_metrics(trainer) -> dict:
    return {k: v for k, v in (trainer.metrics or {}).items()
            if isinstance(v, (int, float))}


def wandb_integration(project: str = "xlstm_yolo_tpu", **init_kw) -> dict:
    """Weights & Biases sink (reference utils/callbacks/wb.py). Raises
    ImportError when wandb is absent — add_integration gates on that."""
    import wandb

    def on_pretrain_routine_start(trainer):
        wandb.init(project=project, config=vars(getattr(trainer, "args", None) or object()),
                   **init_kw)

    def on_fit_epoch_end(trainer):
        wandb.log(_scalar_metrics(trainer), step=trainer.epoch)

    def on_train_end(trainer):
        wandb.finish()

    return {"on_pretrain_routine_start": on_pretrain_routine_start,
            "on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}


def mlflow_integration(experiment: str = "xlstm_yolo_tpu") -> dict:
    """MLflow sink (reference utils/callbacks/mlflow.py)."""
    import mlflow

    def on_pretrain_routine_start(trainer):
        mlflow.set_experiment(experiment)
        mlflow.start_run()

    def on_fit_epoch_end(trainer):
        mlflow.log_metrics({k.replace("(", "").replace(")", ""): v
                            for k, v in _scalar_metrics(trainer).items()},
                           step=trainer.epoch)

    def on_train_end(trainer):
        mlflow.end_run()

    return {"on_pretrain_routine_start": on_pretrain_routine_start,
            "on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}


def comet_integration(project: str = "xlstm_yolo_tpu") -> dict:
    """Comet sink (reference utils/callbacks/comet.py)."""
    import comet_ml

    state = {}

    def on_pretrain_routine_start(trainer):
        state["exp"] = comet_ml.Experiment(project_name=project)

    def on_fit_epoch_end(trainer):
        if "exp" in state:
            state["exp"].log_metrics(_scalar_metrics(trainer), epoch=trainer.epoch)

    def on_train_end(trainer):
        if "exp" in state:
            state["exp"].end()

    return {"on_pretrain_routine_start": on_pretrain_routine_start,
            "on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}


def clearml_integration(project: str = "xlstm_yolo_tpu") -> dict:
    """ClearML sink (reference utils/callbacks/clearml.py)."""
    from clearml import Task

    state = {}

    def on_pretrain_routine_start(trainer):
        state["task"] = Task.init(project_name=project, task_name=str(trainer.save_dir))

    def on_fit_epoch_end(trainer):
        if "task" in state:
            log = state["task"].get_logger()
            for k, v in _scalar_metrics(trainer).items():
                log.report_scalar("train", k, v, iteration=trainer.epoch)

    return {"on_pretrain_routine_start": on_pretrain_routine_start,
            "on_fit_epoch_end": on_fit_epoch_end}


def dvc_integration() -> dict:
    """DVCLive sink (reference utils/callbacks/dvc.py)."""
    from dvclive import Live

    state = {}

    def on_pretrain_routine_start(trainer):
        state["live"] = Live(save_dvc_exp=True)

    def on_fit_epoch_end(trainer):
        live = state.get("live")
        if live:
            for k, v in _scalar_metrics(trainer).items():
                live.log_metric(k, v)
            live.next_step()

    def on_train_end(trainer):
        if state.get("live"):
            state["live"].end()

    return {"on_pretrain_routine_start": on_pretrain_routine_start,
            "on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}


def neptune_integration(project: str | None = None) -> dict:
    """Neptune sink (reference utils/callbacks/neptune.py)."""
    import neptune

    state = {}

    def on_pretrain_routine_start(trainer):
        state["run"] = neptune.init_run(project=project)

    def on_fit_epoch_end(trainer):
        run = state.get("run")
        if run:
            for k, v in _scalar_metrics(trainer).items():
                run[f"train/{k}"].append(v, step=trainer.epoch)

    def on_train_end(trainer):
        if state.get("run"):
            state["run"].stop()

    return {"on_pretrain_routine_start": on_pretrain_routine_start,
            "on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}


def raytune_integration() -> dict:
    """Ray Tune session sink (reference utils/callbacks/raytune.py): reports
    per-epoch metrics to an ACTIVE ray tune session so schedulers (ASHA)
    can early-stop trials launched by engine.tuner.run_ray_tune."""
    from ray import tune
    from ray.tune import is_session_enabled

    def on_fit_epoch_end(trainer):
        if is_session_enabled():
            tune.report({**_scalar_metrics(trainer), "epoch": trainer.epoch})

    return {"on_fit_epoch_end": on_fit_epoch_end}


INTEGRATIONS = {
    "tensorboard": tensorboard_integration,
    "jsonl": jsonl_integration,
    "wandb": wandb_integration,
    "mlflow": mlflow_integration,
    "comet": comet_integration,
    "clearml": clearml_integration,
    "dvc": dvc_integration,
    "neptune": neptune_integration,
    "raytune": raytune_integration,
}


def add_integration(callbacks: Callbacks, name: str, *args, **kwargs) -> bool:
    """Merge a named sink if its package imports (the reference merges each
    callbacks/*.py dict only when its import guard passes,
    utils/callbacks/base.py:187-217). Returns True when attached."""
    try:
        callbacks.merge(INTEGRATIONS[name](*args, **kwargs))
        return True
    except ImportError:
        return False


def default_callbacks() -> Callbacks:
    return Callbacks()
