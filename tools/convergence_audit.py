"""Matched-run training-convergence audit: ours vs the live torch reference.

Reproduces the 240-step overfit run from tests/test_train.py::
test_train_then_val_map_improves in BOTH frameworks on the same on-disk
synthetic dataset with the same hypers (SGD lr0=0.02 momentum 0.937 nesterov,
grad-clip 0.5, no augmentation, batch=8=dataset), then evaluates both.

Usage:
    python tools/convergence_audit.py ours   [--epochs 240] [--out ours.json]
    python tools/convergence_audit.py torch  [--epochs 240] [--out torch.json]

The torch side drives the reference's own DetectionTrainer
(/root/reference/models/yolo/detect/train.py) so its numbers are the
reference's numbers, not a reimplementation.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

DS_ROOT = Path("/tmp/convaudit_ds")


def get_dataset():
    from xlstm_yolo_tpu.data.synthetic import make_synthetic_dataset

    if not (DS_ROOT / "data.yaml").exists():
        make_synthetic_dataset(DS_ROOT, n_train=8, n_val=4, imgsz=96)
    # overfit view: val split IS the train split
    import yaml

    d = yaml.safe_load(open(DS_ROOT / "data.yaml"))
    d["val"] = d["train"]
    ov = DS_ROOT / "overfit.yaml"
    ov.write_text(yaml.safe_dump(d))
    return str(DS_ROOT / "data.yaml"), str(ov)


def run_ours(epochs: int, out: str, platform: str = "cpu"):
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import numpy as np

    from xlstm_yolo_tpu.engine.trainer import Trainer
    from xlstm_yolo_tpu.engine.validator import Validator
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    data_yaml, overfit_yaml = get_dataset()
    model = TaskModel("yolov8n.yaml", nc=3)
    stale = Path("/tmp/convaudit_runs/ours/results.csv")
    if stale.exists():
        stale.unlink()  # Trainer appends; keep the loss curves single-run
    tr = Trainer(model, overrides={
        "data": data_yaml, "epochs": epochs, "imgsz": 96, "batch": 8, "val": False,
        "project": "/tmp/convaudit_runs", "name": "ours", "max_labels": 16,
        "optimizer": "SGD", "lr0": 0.02, "warmup_epochs": 0.0, "nbs": 8,
        "mosaic": 0.0, "scale": 0.0, "translate": 0.0, "fliplr": 0.0,
        "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "workers": 0,
        "plots": False, "seed": 0, "exist_ok": True,
    })
    tr.train()

    import csv

    with open(tr.csv) as f:
        rows = list(csv.DictReader(f))
    losses = {k: [float(r[f"train/{k}"]) for r in rows] for k in ("loss", "box", "cls", "dfl")}

    res = {"losses": losses}
    for tag, variables in (
        ("ema", tr.variables),
        ("raw", {"params": tr.raw_params, "batch_stats": tr.variables["batch_stats"]}
         if hasattr(tr, "raw_params") else None),
    ):
        if variables is None:
            continue
        m = Validator(model, imgsz=96, batch=8)(variables, overfit_yaml)
        res[f"map50_{tag}"] = float(m["mAP50"])
        res[f"map_{tag}"] = float(m["mAP50-95"])
        print(f"[{tag}] mAP50={m['mAP50']:.4f} mAP50-95={m['mAP50-95']:.4f}")
    Path(out).write_text(json.dumps(res))
    print(f"wrote {out}")


def _install_reference():
    """Import the mounted reference as ``ultralytics`` with the same shims the
    parity tests use, plus a FUNCTIONAL torchvision.ops.nms (the only
    torchvision symbol on the train/val path — reference utils/ops.py:312)."""
    import importlib
    import importlib.metadata
    import importlib.util
    import types

    import torch

    if "ultralytics" in sys.modules:
        return sys.modules["ultralytics"]

    try:
        importlib.import_module("torchvision")
    except ImportError:
        tv = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")

        def _nms(boxes, scores, iou_threshold):
            order = scores.argsort(descending=True)
            keep = []
            while order.numel():
                i = order[0]
                keep.append(i.item())
                if order.numel() == 1:
                    break
                rest = boxes[order[1:]]
                bi = boxes[i]
                x1 = torch.maximum(bi[0], rest[:, 0])
                y1 = torch.maximum(bi[1], rest[:, 1])
                x2 = torch.minimum(bi[2], rest[:, 2])
                y2 = torch.minimum(bi[3], rest[:, 3])
                inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
                a1 = (bi[2] - bi[0]) * (bi[3] - bi[1])
                a2 = (rest[:, 2] - rest[:, 0]) * (rest[:, 3] - rest[:, 1])
                iou = inter / (a1 + a2 - inter + 1e-9)
                order = order[1:][iou <= iou_threshold]
            return torch.as_tensor(keep, dtype=torch.long)

        tv_ops.nms = _nms
        tv.ops = tv_ops
        tv.__version__ = "0.0.0"
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops

    def _install_stub_tree(root):
        # meta-path finder fabricating empty modules for root and submodules
        class _Stub(types.ModuleType):
            def __getattr__(self, name):
                if name.startswith("__"):
                    raise AttributeError(name)

                def _raises(*a, **k):
                    raise RuntimeError(f"stub {self.__name__}.{name} called")

                return _raises

        class _Finder:
            def find_spec(self, fullname, path=None, target=None):
                if fullname == root or fullname.startswith(root + "."):
                    return importlib.util.spec_from_loader(fullname, self)
                return None

            def create_module(self, spec):
                m = _Stub(spec.name)
                m.__path__ = []
                return m

            def exec_module(self, module):
                pass

        sys.meta_path.insert(0, _Finder())

    for mod in ("mlstm_kernels",):
        try:
            importlib.import_module(mod)
        except ImportError:
            _install_stub_tree(mod)

    orig_version = importlib.metadata.version

    def _version(name, *a, **k):
        try:
            return orig_version(name, *a, **k)
        except importlib.metadata.PackageNotFoundError:
            return "0.0.0"

    importlib.metadata.version = _version

    spec = importlib.util.spec_from_file_location(
        "ultralytics", "/root/reference/__init__.py",
        submodule_search_locations=["/root/reference"])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["ultralytics"] = pkg
    spec.loader.exec_module(pkg)
    return pkg


def run_torch(epochs: int, out: str):
    """Drive the reference's own trainer on the same dataset/hypers."""
    _install_reference()

    data_yaml, overfit_yaml = get_dataset()

    from ultralytics import YOLO

    m = YOLO("yolov8n.yaml")
    m.model.args = None  # built fresh below
    results = m.train(
        data=data_yaml, epochs=epochs, imgsz=96, batch=8, val=False,
        project="/tmp/convaudit_runs", name="torch", exist_ok=True,
        optimizer="SGD", lr0=0.02, warmup_epochs=0.0, nbs=8,
        mosaic=0.0, scale=0.0, translate=0.0, fliplr=0.0,
        hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, workers=0, plots=False, seed=0,
        device="cpu", amp=False, deterministic=True, patience=0,
        cache=False, save=True, verbose=False,
    )
    # eval on the overfit view with the reference's own validator
    vm = m.val(data=overfit_yaml, imgsz=96, batch=8, plots=False, device="cpu")
    res = {
        "map50": float(vm.box.map50),
        "map": float(vm.box.map),
        "results_csv": str(Path(m.trainer.save_dir) / "results.csv"),
    }
    print(f"[torch] mAP50={res['map50']:.4f} mAP50-95={res['map']:.4f}")
    Path(out).write_text(json.dumps(res))
    print(f"wrote {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("side", choices=["ours", "torch"])
    ap.add_argument("--epochs", type=int, default=240)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default="cpu")
    a = ap.parse_args()
    out = a.out or f"/tmp/convaudit_{a.side}.json"
    if a.side == "ours":
        run_ours(a.epochs, out, a.platform)
    else:
        run_torch(a.epochs, out)
