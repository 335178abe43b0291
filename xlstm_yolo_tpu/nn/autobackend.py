"""AutoBackend — one forward() over every supported runtime.

Re-design of reference ``nn/autobackend.py`` (AutoBackend :54): dispatches on
the artifact type and exposes a uniform ``forward(img) -> (B, N, 4+nc)``.
Supported runtimes: native checkpoint (jit), StableHLO (jax.export),
TF SavedModel, TFLite (interpreter). The reference's 14 torch-ecosystem
formats collapse to the XLA-ecosystem set; parity checks run through
``utils/benchmarks.py``.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


class AutoBackend:
    def __init__(self, weights: str | Path, imgsz: int = 640):
        self._raw = str(weights)  # URLs must not round-trip through Path
        self.path = Path(self._raw)
        self.imgsz = imgsz
        self.kind = self._sniff_str(self._raw) or self._sniff(self.path)
        self.meta: dict = {}
        getattr(self, f"_init_{self.kind}")()

    @staticmethod
    def _sniff_str(s: str) -> str | None:
        """URL weights -> the remote HTTP backend (the TPU-native analogue
        of the reference's Triton client, /root/reference/utils/triton.py)."""
        return "remote" if s.startswith(("http://", "https://")) else None

    @staticmethod
    def _sniff(p: Path) -> str:
        s = str(p)
        if s.endswith(".stablehlo"):
            return "stablehlo"
        if s.endswith(".tflite"):
            return "tflite"
        if s.endswith(".onnx"):
            return "onnx"
        if s.endswith("_savedmodel") or (p / "saved_model.pb").exists():
            return "savedmodel"
        if s.endswith(".ckpt") or (p / "meta.yaml").exists() or (p.with_suffix("") / "meta.yaml").exists():
            return "ckpt"
        if s.endswith((".yaml", ".yml")):
            return "yaml"
        raise ValueError(f"cannot determine backend for {p}")

    # -- init per kind ----------------------------------------------------
    def _init_ckpt(self):
        from ..utils.checkpoint import load_checkpoint

        model, variables, meta = load_checkpoint(self.path)
        self.meta = {"task": model.task, "nc": model.nc, "names": model.names}
        self._fn = jax.jit(lambda img: model.predictions(variables, img))

    def _init_yaml(self):
        from .tasks import TaskModel

        model = TaskModel(str(self.path))
        variables = model.init(0, imgsz=64)
        self.meta = {"task": model.task, "nc": model.nc, "names": model.names}
        self._fn = jax.jit(lambda img: model.predictions(variables, img))

    def _init_stablehlo(self):
        from ..engine.exporter import load_stablehlo

        call, meta = load_stablehlo(self.path)
        self.meta = meta
        self._fn = jax.jit(call)

    def _init_savedmodel(self):
        import tensorflow as tf

        self._sm = tf.saved_model.load(str(self.path))
        fn = self._sm.signatures["serving_default"]

        def call(img):
            out = fn(images=tf.constant(np.asarray(img, np.float32)))
            return np.asarray(next(iter(out.values())))

        self._fn = call

    def _init_tflite(self):
        import tensorflow as tf

        self._interp = tf.lite.Interpreter(model_path=str(self.path))
        self._interp.allocate_tensors()
        inp = self._interp.get_input_details()[0]
        outs = self._interp.get_output_details()

        def call(img):
            self._interp.set_tensor(inp["index"], np.asarray(img, np.float32))
            self._interp.invoke()
            return self._interp.get_tensor(outs[0]["index"])

        self._fn = call

    def _init_onnx(self):
        """onnxruntime session over an Exporter(format='onnx') artifact
        (reference autobackend.py onnx branch). Gated: onnxruntime is an
        optional extra in this image."""
        try:
            import onnxruntime as ort
        except ImportError as e:
            raise ImportError(
                "the onnx backend needs onnxruntime: pip install onnxruntime"
            ) from e
        self._sess = ort.InferenceSession(
            str(self.path), providers=["CPUExecutionProvider"])
        inp_name = self._sess.get_inputs()[0].name
        meta_path = self.path.with_suffix(".json")
        if meta_path.exists():
            self.meta = json.loads(meta_path.read_text())

        def call(img):
            return self._sess.run(None, {inp_name: np.asarray(img, np.float32)})[0]

        self._fn = call

    def _init_remote(self):
        """HTTP remote-model client (utils/remote.py) — the TPU-native
        analogue of the reference's Triton backend."""
        from ..utils.remote import RemoteModel

        rm = RemoteModel(self._raw)
        self.meta = rm.meta
        self._fn = rm

    # -- uniform API -------------------------------------------------------
    def forward(self, img) -> np.ndarray:
        """img: (B, H, W, 3) float32 [0, 1] -> (B, N, 4+nc) candidates."""
        out = self._fn(img if self.kind in ("savedmodel", "tflite", "onnx",
                                            "remote")
                       else jnp.asarray(img))
        if isinstance(out, (list, tuple)):
            out = out[0]
        return np.asarray(out)

    def warmup(self, batch: int = 1):
        self.forward(np.zeros((batch, self.imgsz, self.imgsz, 3), np.float32))
        return self

    __call__ = forward
