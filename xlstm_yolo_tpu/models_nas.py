"""YOLO-NAS model family (reference ``models/nas/``: model.py:27 NAS facade,
predict.py NASPredictor, val.py NASValidator).

The reference is an inference-only wrapper around super-gradients
checkpoints: it loads the torch model, attaches fuse/stride/names metadata,
and routes predict/val through the standard engine with the NAS raw output
adapted to the YOLO candidate layout. Here the topology lives natively in
the graph compiler (cfg/models/yolo_nas.yaml — re-param RepConv stages),
weights arrive through utils/torch_import conversion, and predict/val reuse
the shared engine exactly like the reference's task_map does. Training is
blocked, matching the reference (model.py:79 task_map has no trainer).
"""
from __future__ import annotations

from .engine.model import Model


class NAS(Model):
    """Inference-only facade: ``NAS('yolo_nas_s.yaml').predict(img)``."""

    def __init__(self, model: str = "yolo_nas_s.yaml", **kw):
        # accept yolo_nas_{s,m,l} aliases like the reference's weight names
        name = str(model)
        for scale in ("s", "m", "l"):
            if name.endswith(f"yolo_nas_{scale}.yaml"):
                name = name.replace(f"yolo_nas_{scale}.yaml", "yolo_nas.yaml")
                kw.setdefault("scale", scale)
                break
        scale = kw.pop("scale", None)
        if scale is not None and name.endswith(".yaml"):
            from .nn.tasks import TaskModel

            self.model_path = name
            self.model = TaskModel(name, scale=scale)
            self.variables = self.model.init()
            self.ckpt = None
            self.task = self.model.task
            self.predictor = None
            self.trainer = None
            self.metrics = None
        else:
            super().__init__(name, **kw)

    def train(self, *a, **kw):  # reference models/nas has no trainer entry
        raise NotImplementedError(
            "YOLO-NAS is inference-only (reference models/nas/model.py task_map)"
        )
