"""Inference-path stage attribution on the accelerator.

Times letterbox / forward / decode / NMS separately at the bench shape so
e2e optimization targets the right stage (companion to bench.py; same
fori_loop + scalar-readback methodology).

Usage: python tools/infer_profile.py [model.yaml] [batch]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from xlstm_yolo_tpu.nn import heads as H
    from xlstm_yolo_tpu.nn.fuse import fuse_conv_bn
    from xlstm_yolo_tpu.nn.tasks import TaskModel
    from xlstm_yolo_tpu.ops.letterbox import letterbox_device
    from xlstm_yolo_tpu.ops.nms import non_max_suppression

    name = sys.argv[1] if len(sys.argv) > 1 else "yolov8n.yaml"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    imgsz, iters = 640, 5

    model = TaskModel(name)
    variables = fuse_conv_bn(model.init(0, imgsz=imgsz))
    variables = {"params": jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                                        variables["params"]),
                 "batch_stats": variables["batch_stats"]}

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 255, (batch, 540, 810, 3)), jnp.uint8)
    x = jnp.asarray(rng.random((batch, imgsz, imgsz, 3)), jnp.bfloat16)

    def timed(fn, *args):
        def many(*a):
            def body(i, acc):
                a0 = a[0]
                if a0.dtype == jnp.uint8:
                    a0 = a0 + i.astype(jnp.uint8)
                else:
                    a0 = a0 + (i.astype(a0.dtype) * 1e-6)
                r = fn(a0, *a[1:])
                return acc + jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        jit = jax.jit(many)
        _ = float(jit(*args))
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(jit(*args))
            best = min(best, (time.perf_counter() - t0) / iters)
        return round(1e3 * best, 2)

    out = {"model": name, "batch": batch}
    out["letterbox_ms"] = timed(lambda r: letterbox_device(r, imgsz=imgsz)[0], raw)
    out["fwd_ms"] = timed(lambda xx: jax.tree.leaves(
        model.raw_forward(variables, xx))[0], x)
    # raw maps for decode/nms isolation
    det = model.raw_forward(variables, x)
    det = det["det"] if isinstance(det, dict) else det
    det = [jnp.asarray(m) for m in det]
    out["decode_ms"] = timed(
        lambda m0, m1, m2: H.decode_detections([m0, m1, m2], model.strides,
                                               model.nc, model.reg_max),
        *det)
    pred = H.decode_detections(det, model.strides, model.nc, model.reg_max)
    out["nms_ms"] = timed(
        lambda p: non_max_suppression(p, conf_thres=0.25, iou_thres=0.7,
                                      max_det=300, pre_topk=512,
                                      fast_sel=True)[0], pred)
    out["e2e_ms"] = timed(lambda r: non_max_suppression(
        model.predictions(variables, letterbox_device(r, imgsz=imgsz)[0]),
        conf_thres=0.25, iou_thres=0.7, max_det=300, pre_topk=512,
        fast_sel=True)[0], raw)
    out["e2e_img_s"] = round(batch / (out["e2e_ms"] / 1e3), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
