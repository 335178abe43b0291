"""Benchmark: end-to-end detection throughput on the local accelerator.

Boundary (BASELINE.md "preproc -> NMS", reference engine/predictor.py:245-268
Profile blocks): raw uint8 frames at camera resolution (540x810) ->
ON-DEVICE letterbox (resize+pad+normalize fused in-graph, ops/letterbox.py)
-> forward -> DFL decode -> fixed-shape NMS. This is the TPU-native preproc
design: instead of the reference's host letterbox + float PCIe transfer, the
uint8 frame ships to the device and preprocessing runs inside the same XLA
program as the network (the host C++ letterbox, native/imgproc.cpp, remains
for ragged offline inputs).

Models: yolov8n (conv baseline) and vil_yolon (the ViL-YOLO flagship —
printed LAST, it is the headline metric). Conv+BN folded (Model.fuse
analogue), bf16 params/compute, NMS pre_topk 512 (predict-path default).

Methodology notes for this environment:
  * the axon relay's block_until_ready does not synchronize, so iterations
    are chained inside ONE jit (fori_loop) and forced with a scalar readback;
  * a persistent compilation cache is used (first AOT compile through the
    relay takes minutes).

Prints ONE JSON line per model:
    {"metric": "...", "value": N, "unit": "img/s", "vs_baseline": N}
vs_baseline is relative to the driver-assigned north star of 2000 img/s/chip
on TPU v5e (BASELINE.md).
"""
from __future__ import annotations

import json
import time

import numpy as np


def bench_model(name: str, metric: str, imgsz: int = 640, batch: int = 256,
                iters: int = 5, src_hw: tuple = (540, 810)) -> dict:
    # batch 256 sustained (measured on the assigned v5e): yolov8n 4,616 ->
    # 4,993 img/s, vil_yolon 3,180 -> 3,299 img/s vs batch 128
    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.nn.fuse import fuse_conv_bn
    from xlstm_yolo_tpu.nn.tasks import TaskModel
    from xlstm_yolo_tpu.ops.letterbox import letterbox_device
    from xlstm_yolo_tpu.ops.nms import non_max_suppression

    model = TaskModel(name)
    variables = model.init(0, imgsz=imgsz)
    variables = fuse_conv_bn(variables)
    # bf16 params for MXU-friendly inference (BN stats stay fp32)
    variables = {
        "params": jax.tree.map(lambda x: x.astype(jnp.bfloat16), variables["params"]),
        "batch_stats": variables["batch_stats"],
    }

    def one(raw):
        x, _meta = letterbox_device(raw, imgsz=imgsz)
        pred = model.predictions(variables, x)
        dets, valid = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.7,
                                          max_det=300, pre_topk=512, fast_sel=True)
        return dets

    @jax.jit
    def many(raw):
        def body(i, acc):
            return acc + jnp.sum(one(raw + i.astype(jnp.uint8)))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 255, (batch, *src_hw, 3)), jnp.uint8)

    _ = float(many(raw))  # compile + warm (forces a real readback)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(many(raw))
        best = min(best, (time.perf_counter() - t0) / iters)
    img_s = batch / best
    return {
        "metric": metric,
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / 2000.0, 3),
    }


def main():
    from pathlib import Path

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(json.dumps(bench_model("yolov8n.yaml", "yolov8n_640_e2e_throughput")), flush=True)

    # training-step throughput (full jit'd step: bf16 fwd + TAL loss + bwd +
    # clip + SGD + EMA at B128/640 — bench_train.py), driver-visible per
    # round since r3
    from bench_train import bench_train

    print(json.dumps(bench_train(
        "yolov8n.yaml", "yolov8n_640_train_step_throughput")), flush=True)
    print(json.dumps(bench_train(
        "vil_yolon.yaml", "vil_yolon_640_train_step_throughput")), flush=True)

    # flagship last: the driver's parsed line
    print(json.dumps(bench_model("vil_yolon.yaml", "vil_yolon_640_e2e_throughput")), flush=True)


if __name__ == "__main__":
    main()
