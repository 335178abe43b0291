"""Exporter — serialize the jitted inference pipeline to deployment formats.

Re-design of reference ``engine/exporter.py`` (Exporter :207, 14-format
table :111-131). The torch export zoo (ONNX/TensorRT/CoreML/...) is replaced
by the JAX-native export surface:

  * stablehlo   — portable compiler IR via jax.export (the analogue of ONNX
                  in the XLA ecosystem); reloadable with jax.export.deserialize
  * savedmodel  — TensorFlow SavedModel via jax2tf (serving / TF ecosystems)
  * tflite      — TFLite flatbuffer converted from the SavedModel (edge)
  * nms         — optionally embed the fixed-shape NMS in the exported graph
                  (the reference's NMSModel wrapper, exporter.py:1550)

Every export wraps the same function the predictor jits: normalize ->
forward -> decode (-> NMS), so exported and native outputs are bit-identical
modulo backend math.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

FORMATS = ("stablehlo", "savedmodel", "tflite", "torch", "onnx")


class Exporter:
    def __init__(self, model, variables, format: str = "stablehlo", imgsz: int = 640,
                 batch: int = 1, nms: bool = False, conf: float = 0.25, iou: float = 0.7,
                 max_det: int = 300, half: bool = False, output_dir: str = "runs/export",
                 int8: bool = False, data: str | dict | None = None,
                 calib_batches: int = 8, callbacks=None, **kwargs):
        from ..utils.callbacks import default_callbacks

        self.callbacks = callbacks if callbacks is not None else default_callbacks()
        self.model = model
        self.variables = variables
        self.format = format
        self.imgsz = imgsz
        self.batch = batch
        self.nms = nms
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.half = half
        # INT8 quantized TFLite (reference exporter.py:483 int8 calibration):
        # post-training quantization with a representative dataset drawn from
        # ``data``'s val split (random frames if no data given)
        self.int8 = int8
        self.data = data
        self.calib_batches = calib_batches
        self.output_dir = Path(output_dir)

    def _infer_fn(self):
        model, variables = self.model, self.variables
        if self.half:
            variables = {
                "params": jax.tree.map(lambda x: x.astype(jnp.bfloat16), variables["params"]),
                "batch_stats": variables["batch_stats"],
            }
        nms = self.nms
        conf, iou, max_det = self.conf, self.iou, self.max_det

        def fn(img):  # (B, H, W, 3) float32 in [0, 1]
            pred = model.predictions(variables, img)
            if nms:
                from ..ops.nms import non_max_suppression

                dets, valid = non_max_suppression(
                    pred, conf_thres=conf, iou_thres=iou, max_det=max_det
                )
                return dets, valid
            return pred

        return fn

    def __call__(self) -> str:
        t0 = time.time()
        self.callbacks.run("on_export_start", self)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        fn = self._infer_fn()
        shape = (self.batch, self.imgsz, self.imgsz, 3)
        if self.format == "stablehlo":
            out = self._export_stablehlo(fn, shape)
        elif self.format == "savedmodel":
            out = self._export_savedmodel(fn, shape)
        elif self.format == "tflite":
            out = self._export_tflite(fn, shape)
        elif self.format == "torch":
            out = self._export_torch()
        elif self.format == "onnx":
            out = self._export_onnx(fn, shape)
        else:
            raise ValueError(f"unknown export format {self.format!r}; choose from {FORMATS}")
        print(f"export {self.format} done in {time.time() - t0:.1f}s -> {out}")
        self.callbacks.run("on_export_end", self)
        return str(out)

    def _export_stablehlo(self, fn, shape) -> Path:
        from jax import export as jexport

        exp = jexport.export(jax.jit(fn))(jax.ShapeDtypeStruct(shape, jnp.float32))
        out = self.output_dir / f"{self._stem()}.stablehlo"
        out.write_bytes(exp.serialize())
        meta = {
            "imgsz": self.imgsz, "batch": self.batch, "task": self.model.task,
            "nc": self.model.nc, "names": self.model.names, "nms": self.nms,
            "strides": list(self.model.strides), "format": "stablehlo",
        }
        out.with_suffix(".json").write_text(json.dumps(meta, indent=2))
        return out

    def _export_torch(self) -> Path:
        """Reverse interop: an ultralytics-layout torch checkpoint so
        reference users can take weights trained here back into the torch
        framework. Layouts are the exact inverse of our importer
        (utils/torch_import.py); load on the torch side with
        ``DetectionModel(cfg.yaml); model.load_state_dict(ckpt["state_dict"],
        strict=False)`` (strict=False only for the reference's frozen DFL
        arange projection, which is functional here)."""
        import torch

        from ..utils.torch_import import to_torch_state_dict

        # .copy(): jax-backed numpy views are read-only, torch wants writable
        sd = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
              for k, v in to_torch_state_dict(self.variables).items()}
        meta = {
            "state_dict": sd,
            "yaml": getattr(self.model, "cfg_name", None),
            "task": self.model.task,
            "nc": self.model.nc,
            "names": self.model.names,
            "strides": [int(s) for s in getattr(self.model, "strides", ())],
        }
        out = self.output_dir / f"{self._stem()}.pt"
        torch.save(meta, out)
        return out

    def _export_savedmodel(self, fn, shape) -> Path:
        import tensorflow as tf
        from jax.experimental import jax2tf

        tf_fn = tf.function(
            jax2tf.convert(fn, with_gradient=False),
            input_signature=[tf.TensorSpec(shape, tf.float32, name="images")],
            autograph=False,
        )
        module = tf.Module()
        module.serve = tf_fn
        out = self.output_dir / f"{self._stem()}_savedmodel"
        tf.saved_model.save(module, str(out), signatures={"serving_default": tf_fn})
        return out

    def _export_onnx(self, fn, shape) -> Path:
        """ONNX via the SavedModel bridge (reference engine/exporter.py:524
        export_onnx). The jax graph converts jax2tf -> SavedModel -> tf2onnx;
        tf2onnx/onnx are NOT bundled with this image, so the path is gated:
        it raises a clear ImportError naming the pip extras when absent.
        Output round-trips through onnxruntime (AutoBackend kind 'onnx')."""
        try:
            import tf2onnx  # noqa: F401  (optional dependency)
        except ImportError as e:
            raise ImportError(
                "ONNX export needs the optional onnx bridge: "
                "pip install tf2onnx onnx  (and onnxruntime to run the "
                "artifact). The jax-native equivalent that needs no extras "
                "is format='stablehlo'.") from e
        import subprocess
        import sys

        sm = self._export_savedmodel(fn, shape)
        out = self.output_dir / f"{self._stem()}.onnx"
        # tf2onnx's supported entrypoint is its CLI module; the python API
        # (from_function) chokes on jax2tf's XlaCallModule ops unless the
        # graph is fully lowered, which the CLI's saved-model path handles
        subprocess.run(
            [sys.executable, "-m", "tf2onnx.convert", "--saved-model",
             str(sm), "--output", str(out), "--opset", "17"],
            check=True)
        meta = {
            "imgsz": self.imgsz, "batch": self.batch, "task": self.model.task,
            "nc": self.model.nc, "names": self.model.names, "nms": self.nms,
            "strides": list(self.model.strides), "format": "onnx",
        }
        out.with_suffix(".json").write_text(json.dumps(meta, indent=2))
        return out

    def _representative_dataset(self, shape):
        """Calibration sample generator for INT8 quantization (reference
        exporter.py:483 builds a 100-image dataloader; here: up to
        ``calib_batches`` real val batches, random frames as fallback)."""
        import numpy as np

        batches = []
        if self.data is not None:
            try:
                from ..data.dataset import build_dataloader

                loader, _ = build_dataloader(
                    self.data, "val", batch=shape[0], imgsz=self.imgsz,
                    augment=False, task=self.model.task)
                for bi, b in enumerate(loader):
                    batches.append(np.asarray(b["img"], np.float32))
                    if bi + 1 >= self.calib_batches:
                        break
            except Exception:
                batches = []
        if not batches:
            rng = np.random.default_rng(0)
            batches = [rng.uniform(size=shape).astype(np.float32)
                       for _ in range(self.calib_batches)]

        def gen():
            for b in batches:
                yield [b[: shape[0]]]

        return gen

    def _export_tflite(self, fn, shape) -> Path:
        import tensorflow as tf

        sm = self._export_savedmodel(fn, shape)
        converter = tf.lite.TFLiteConverter.from_saved_model(str(sm))
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS,
        ]
        suffix = ".tflite"
        if self.int8:
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            converter.representative_dataset = self._representative_dataset(shape)
            converter.target_spec.supported_ops = [
                tf.lite.OpsSet.TFLITE_BUILTINS_INT8,
                tf.lite.OpsSet.TFLITE_BUILTINS,
                tf.lite.OpsSet.SELECT_TF_OPS,
            ]
            # io stays float32 ([0,1] images in, dets out) — int8 internals
            suffix = "_int8.tflite"
        blob = converter.convert()
        out = self.output_dir / f"{self._stem()}{suffix}"
        out.write_bytes(blob)
        return out

    def _stem(self) -> str:
        return f"{self.model.task}_{self.imgsz}"


def load_stablehlo(path: str | Path):
    """Reload an exported StableHLO artifact -> callable (the AutoBackend
    counterpart for our own format; reference nn/autobackend.py)."""
    from jax import export as jexport

    exp = jexport.deserialize(Path(path).read_bytes())
    meta_path = Path(path).with_suffix(".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return exp.call, meta
