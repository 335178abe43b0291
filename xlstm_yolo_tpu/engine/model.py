"""User-facing Model facade (reference engine/model.py:29).

``Model("yolov8n.yaml")`` builds a task model; ``.train/.val/.predict``
construct the task-specific worker lazily through a task map, like the
reference's ``_smart_load`` (engine/model.py:1072)."""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


class Model:
    def __init__(self, model: str | Path = "yolov8n.yaml", task: str | None = None, verbose: bool = False):
        from ..nn.tasks import TaskModel

        self.model_path = str(model)
        if str(model).endswith((".yaml", ".yml")):
            self.model = TaskModel(str(model), verbose=verbose)
            self.variables = self.model.init()
            self.ckpt = None
        elif str(model).endswith(".ckpt") or Path(str(model)).is_dir():
            from ..utils.checkpoint import load_checkpoint

            self.model, self.variables, self.ckpt = load_checkpoint(str(model))
        elif str(model).endswith(".pt"):
            # torch checkpoints (reference Model.__init__ .pt route,
            # engine/model.py:126): our Exporter(format='torch') artifacts
            # carry {yaml, nc, names} so the architecture rebuilds here;
            # bare state_dicts need Model(yaml).load(pt) instead
            import torch

            from ..utils.torch_import import load_torch_state_dict

            obj = torch.load(str(model), map_location="cpu", weights_only=True)
            if not (isinstance(obj, dict) and "state_dict" in obj and obj.get("yaml")):
                raise ValueError(
                    f"{model!r} has no architecture metadata — build the "
                    "architecture first: Model('cfg.yaml').load(pt_path)")
            self.model = TaskModel(str(obj["yaml"]), nc=obj.get("nc"), verbose=verbose)
            if obj.get("names"):
                self.model.names = {int(k): v for k, v in dict(obj["names"]).items()}
            sd = {k: t.detach().float().numpy() for k, t in obj["state_dict"].items()}
            v0 = self.model.init()
            self.variables, _, _ = load_torch_state_dict(v0, sd, verbose=verbose)
            self.ckpt = {k: obj[k] for k in ("yaml", "task", "nc", "names") if k in obj}
        else:
            raise ValueError(f"unsupported model source {model!r} (expected .yaml, .pt or checkpoint dir)")
        from ..utils.callbacks import default_callbacks

        self.task = task or self.model.task
        self.predictor = None
        self.trainer = None
        self.metrics = None
        self.callbacks = default_callbacks()

    def add_callback(self, event: str, func) -> None:
        """Register a hook (reference engine/model.py:add_callback)."""
        self.callbacks.add(event, func)

    def clear_callback(self, event: str) -> None:
        self.callbacks._cbs[event] = []

    def reset_callbacks(self) -> None:
        from ..utils.callbacks import default_callbacks

        self.callbacks = default_callbacks()

    @property
    def names(self):
        return self.model.names

    def predict(self, source=None, stream: bool = False, **kwargs) -> list:
        from .predictor import Predictor

        if self.predictor is None:
            self.predictor = Predictor(self.model, self.variables, callbacks=self.callbacks, **kwargs)
        return self.predictor(source, stream=stream)

    def __call__(self, source=None, **kwargs):
        return self.predict(source, **kwargs)

    def track(self, source=None, tracker: str = "bytetrack.yaml", stream: bool = False, **kwargs):
        """Predict + multi-object tracking (reference engine/model.py:562)."""
        from ..trackers import create_tracker, track_results
        from .predictor import Predictor

        kwargs.setdefault("conf", 0.1)  # tracker needs low-conf candidates
        predictor = Predictor(self.model, self.variables, **kwargs)
        t = create_tracker(tracker)
        gen = track_results(t, predictor(source, stream=True))
        return gen if stream else list(gen)

    def val(self, data: str | None = None, **kwargs):
        from .validator import Validator

        v = Validator(self.model, callbacks=self.callbacks, **kwargs)
        self.metrics = v(self.variables, data=data)
        return self.metrics

    def train(self, data: str | None = None, **kwargs):
        from .trainer import Trainer

        self.trainer = Trainer(self.model, overrides={"data": data, **kwargs}, callbacks=self.callbacks)
        self.trainer.variables = self.variables
        result = self.trainer.train()
        self.variables = self.trainer.variables
        self.metrics = getattr(self.trainer, "metrics", None)
        return result

    def export(self, **kwargs):
        from .exporter import Exporter

        return Exporter(self.model, self.variables, callbacks=self.callbacks, **kwargs)()

    def fuse(self):
        """Fold Conv+BN pairs (reference BaseModel.fuse, nn/tasks.py:212)."""
        from ..nn.fuse import fuse_conv_bn

        self.variables = fuse_conv_bn(self.variables)
        return self

    def info(self):
        return self.model.info(self.variables)

    def save(self, path: str):
        from ..utils.checkpoint import save_checkpoint

        save_checkpoint(path, self.model, self.variables)

    def load(self, weights: str):
        """Load weights into the current architecture (reference
        Model.load): .ckpt dirs or torch .pt files via the name-mapping
        importer; shapes must match."""
        p = str(weights)
        if p.endswith(".pt"):
            from ..utils.torch_import import load_torch_weights

            self.variables, _, _ = load_torch_weights(self.variables, p)
        else:
            from ..utils.checkpoint import load_checkpoint

            _, self.variables, self.ckpt = load_checkpoint(p)
        self.predictor = None  # re-jit with the new weights
        return self

    def reset_weights(self):
        """Re-initialize all parameters (reference Model.reset_weights)."""
        self.variables = self.model.init()
        self.predictor = None
        return self

    def embed(self, source=None, **kwargs):
        """Feature embeddings per image (reference Model.embed): the decoded
        candidate boxes are replaced by pooled backbone features."""
        import numpy as np

        import jax
        import jax.numpy as jnp

        from .predictor import load_source
        from ..data.augment import letterbox

        imgsz = int(kwargs.get("imgsz", 640))
        fn = jax.jit(lambda v, x: self.model.raw_forward(v, x))
        outs = []
        for _, orig in load_source(source):
            img, _, _ = letterbox(orig, imgsz)
            out = fn(self.variables, jnp.asarray(img, jnp.float32)[None] / 255.0)
            det = out.get("det") if isinstance(out, dict) else out
            feats = det if isinstance(det, (list, tuple)) else [det]
            # per-scale maps may be (box, cls) stream pairs (nn/heads.py
            # split_maps) — pool every leaf
            feats = jax.tree.leaves(feats)
            pooled = [np.asarray(jnp.mean(f, axis=(1, 2))) for f in feats]
            outs.append(np.concatenate([p.reshape(-1) for p in pooled]))
        return outs

    def benchmark(self, data: str | None = None, **kwargs):
        """Export-parity + latency table across formats (reference
        Model.benchmark -> utils/benchmarks.benchmark)."""
        from ..utils.benchmarks import benchmark

        return benchmark(self.model, self.variables, data=data, **kwargs)

    def tune(self, data: str | None = None, iterations: int = 10, **kwargs):
        """Genetic hyperparameter evolution (reference Model.tune ->
        engine/tuner.Tuner)."""
        from ..nn.tasks import TaskModel
        from .tuner import Tuner

        overrides = {"data": data, **kwargs}
        nc = self.model.nc
        yaml_path = self.model_path

        def model_fn():
            return TaskModel(yaml_path, nc=nc)

        return Tuner(model_fn, overrides,
                     save_dir=str(kwargs.get("project", "runs/tune")))(iterations)
