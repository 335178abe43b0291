"""Benchmark: end-to-end detection throughput on the local accelerator.

Measures the full device pipeline the reference times with its three Profile
blocks (engine/predictor.py:245-268): normalize -> forward -> DFL decode ->
fixed-shape NMS, on a YOLOv8n-class model at 640x640, bf16 compute.

Methodology notes for this environment:
  * the axon relay's block_until_ready does not synchronize, so iterations
    are chained inside ONE jit (fori_loop) and forced with a scalar readback;
  * a persistent compilation cache is used (first AOT compile through the
    relay takes minutes).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "img/s", "vs_baseline": N}
vs_baseline is relative to the driver-assigned north star of 2000 img/s/chip
on TPU v5e (BASELINE.md).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from xlstm_yolo_tpu.nn.tasks import TaskModel
    from xlstm_yolo_tpu.ops.nms import non_max_suppression

    imgsz, batch, iters = 640, 128, 5
    model = TaskModel("yolov8n.yaml")
    variables = model.init(0, imgsz=imgsz)
    # bf16 params for MXU-friendly inference (BN stats stay fp32)
    variables = {
        "params": jax.tree.map(lambda x: x.astype(jnp.bfloat16), variables["params"]),
        "batch_stats": variables["batch_stats"],
    }

    def one(raw):
        x = raw.astype(jnp.bfloat16) / 255.0
        pred = model.predictions(variables, x)
        dets, valid = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.7, max_det=300)
        return dets

    @jax.jit
    def many(raw):
        def body(i, acc):
            return acc + jnp.sum(one(raw + i.astype(jnp.uint8)))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3)), jnp.uint8)

    _ = float(many(raw))  # compile + warm (forces a real readback)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(many(raw))
        best = min(best, (time.perf_counter() - t0) / iters)
    img_s = batch / best

    print(json.dumps({
        "metric": "yolov8n_640_e2e_throughput",
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / 2000.0, 3),
    }))


if __name__ == "__main__":
    main()
