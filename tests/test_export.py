"""Export + AutoBackend parity tests (StableHLO / SavedModel / TFLite)."""
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def small_model():
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    m = TaskModel("yolov8n.yaml", nc=3)
    v = m.init(0, imgsz=64)
    return m, v


def test_stablehlo_roundtrip(small_model, tmp_path):
    from xlstm_yolo_tpu.engine.exporter import Exporter
    from xlstm_yolo_tpu.nn.autobackend import AutoBackend

    m, v = small_model
    path = Exporter(m, v, format="stablehlo", imgsz=64, batch=2, output_dir=str(tmp_path))()
    rng = np.random.default_rng(0)
    x = np.asarray(rng.random((2, 64, 64, 3)), np.float32)
    want = np.asarray(jax.jit(m.predictions)(v, jnp.asarray(x)))
    backend = AutoBackend(path, imgsz=64)
    got = backend.forward(x)
    assert backend.meta["nc"] == 3
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_stablehlo_with_nms(small_model, tmp_path):
    from xlstm_yolo_tpu.engine.exporter import Exporter, load_stablehlo

    m, v = small_model
    path = Exporter(m, v, format="stablehlo", imgsz=64, batch=1, nms=True,
                    conf=0.0001, output_dir=str(tmp_path))()
    call, meta = load_stablehlo(path)
    dets, valid = call(np.zeros((1, 64, 64, 3), np.float32))
    assert dets.shape == (1, 300, 6)
    assert meta["nms"] is True


def test_savedmodel_parity(small_model, tmp_path):
    from xlstm_yolo_tpu.engine.exporter import Exporter
    from xlstm_yolo_tpu.nn.autobackend import AutoBackend

    m, v = small_model
    path = Exporter(m, v, format="savedmodel", imgsz=64, batch=1, output_dir=str(tmp_path))()
    rng = np.random.default_rng(1)
    x = np.asarray(rng.random((1, 64, 64, 3)), np.float32)
    want = np.asarray(jax.jit(m.predictions)(v, jnp.asarray(x)))
    got = AutoBackend(path, imgsz=64).forward(x)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_autobackend_ckpt(small_model, tmp_path):
    from xlstm_yolo_tpu.nn.autobackend import AutoBackend
    from xlstm_yolo_tpu.utils.checkpoint import save_checkpoint

    m, v = small_model
    save_checkpoint(tmp_path / "m.ckpt", m, v)
    backend = AutoBackend(tmp_path / "m.ckpt", imgsz=64).warmup()
    out = backend.forward(np.zeros((1, 64, 64, 3), np.float32))
    assert out.shape[-1] == 4 + 3


@pytest.mark.slow
def test_export_tflite_int8(small_model, tmp_path):
    """INT8 post-training quantization with a representative dataset
    (reference exporter.py:483 int8 calibration). Quantized model must load
    in the TFLite interpreter and produce outputs in the float ballpark."""
    import numpy as np

    from xlstm_yolo_tpu.engine.exporter import Exporter

    m, v = small_model
    path = Exporter(m, v, format="tflite", imgsz=64, batch=1, int8=True,
                    calib_batches=2, output_dir=str(tmp_path))()
    assert path.endswith("_int8.tflite")
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    rng = np.random.default_rng(0)
    x = np.asarray(rng.random((1, 64, 64, 3)), np.float32)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    out = interp.get_tensor(interp.get_output_details()[0]["index"])
    assert np.isfinite(out).all()
    # quantization actually happened: int8 tensors present in the graph
    kinds = {t["dtype"].__name__ for t in interp.get_tensor_details() if "dtype" in t}
    assert "int8" in kinds, kinds


def test_export_torch_roundtrip(small_model, tmp_path):
    """format='torch' reverse interop: the exported ultralytics-layout
    checkpoint must import back through our own torch importer bit-exactly
    (layout inverses OIHW/IOHW/linear-T all exercised)."""
    import torch

    from xlstm_yolo_tpu.engine.exporter import Exporter
    from xlstm_yolo_tpu.utils.torch_import import load_torch_state_dict

    m, v = small_model
    out = Exporter(m, v, format="torch", imgsz=64, output_dir=str(tmp_path))()
    ckpt = torch.load(out, weights_only=True)
    assert ckpt["task"] == "detect" and ckpt["nc"] == 3
    assert ckpt["yaml"] == "yolov8n.yaml"
    sd = {k: t.numpy() for k, t in ckpt["state_dict"].items()}
    zero = jax.tree.map(lambda x: np.zeros_like(x), v)
    back, matched, missed = load_torch_state_dict(zero, sd, verbose=False)
    assert not missed
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_torch_task_heads(tmp_path):
    """Torch export covers every YOLO task head's parameter layout."""
    from xlstm_yolo_tpu.nn.tasks import TaskModel
    from xlstm_yolo_tpu.utils.torch_import import (load_torch_state_dict,
                                                   to_torch_state_dict)

    for yaml_name, nc in [("yolov8n-seg.yaml", 3), ("yolov8n-pose.yaml", 1),
                          ("yolov8n-obb.yaml", 3), ("yolov8n-cls.yaml", 3)]:
        m = TaskModel(yaml_name, nc=nc)
        v = m.init(1, imgsz=64)
        sd = to_torch_state_dict(v)
        zero = jax.tree.map(lambda x: np.zeros_like(x), v)
        back, _, missed = load_torch_state_dict(zero, sd, verbose=False)
        assert not missed, (yaml_name, missed[:5])
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_ctor_from_torch_pt(small_model, tmp_path):
    """YOLO('weights.pt') — the reference's primary entry — rebuilds the
    architecture from the export's metadata and loads the weights."""
    from xlstm_yolo_tpu.engine.exporter import Exporter
    from xlstm_yolo_tpu.engine.model import Model

    m, v = small_model
    pt = Exporter(m, v, format="torch", imgsz=64, output_dir=str(tmp_path))()
    m2 = Model(pt)
    assert m2.task == "detect" and m2.model.nc == 3
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(m2.variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_onnx_gated(small_model, tmp_path):
    """format='onnx' is registered and properly gated: with the optional
    tf2onnx bridge absent (as in this image) it must raise an ImportError
    that names the extras, never a silent fallback or an AttributeError."""
    import importlib.util

    from xlstm_yolo_tpu.engine.exporter import FORMATS, Exporter
    from xlstm_yolo_tpu.nn.autobackend import AutoBackend

    assert "onnx" in FORMATS
    assert AutoBackend._sniff(Path("model.onnx")) == "onnx"

    m, v = small_model
    ex = Exporter(m, v, format="onnx", imgsz=64, output_dir=str(tmp_path))
    if importlib.util.find_spec("tf2onnx") is None:
        with pytest.raises(ImportError, match="tf2onnx"):
            ex()
    else:  # bridge present: full round-trip through onnxruntime
        out = ex()
        ab = AutoBackend(out, imgsz=64)
        pred = ab.forward(np.zeros((1, 64, 64, 3), np.float32))
        ref = np.asarray(jax.jit(m.predictions)(v, jnp.zeros((1, 64, 64, 3))))
        np.testing.assert_allclose(pred, ref, atol=1e-3)
