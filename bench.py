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
                iters: int = 20, src_hw: tuple = (540, 810)) -> dict:
    # iters=20 (round 5): each host readback through the axon relay costs
    # ~25-30 ms of pure latency — a 5-iter chain inflated per-iter time by
    # ~5 ms (>15% at these rates). Longer chains amortize the relay tax
    # toward the device-lane truth (tools/xprof_step.py).
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


def kernel_parity() -> dict:
    """Compiled-kernel numerics gate (VERDICT r3 #4): every bench round runs
    the Pallas mLSTM forward + backward and the sLSTM scan kernel COMPILED on
    the real chip (tests pin interpret mode on CPU; this is the only per-round
    silicon check) against the jnp goldens (kernels/mlstm_native.py — the
    reference math of xlstm/blocks/mlstm/backends.py:149-263 — and
    kernels/mlstm_bwd.py / kernels/slstm.py). fp32-MXU mode isolates Mosaic
    lowering bugs from the deliberate bf16 trade."""
    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.kernels.mlstm_bwd import mlstm_chunkwise_bwd_ref
    from xlstm_yolo_tpu.kernels.mlstm_native import mlstm_chunkwise
    from xlstm_yolo_tpu.kernels.mlstm_pallas import mlstm_chunkwise_pallas
    from xlstm_yolo_tpu.kernels.mlstm_pallas_bwd import mlstm_chunkwise_pallas_bwd
    from xlstm_yolo_tpu.kernels.slstm import slstm_scan
    from xlstm_yolo_tpu.kernels.slstm_pallas import slstm_scan_pallas

    rng = np.random.default_rng(7)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    B, NH, S, DH = 2, 4, 512, 64
    q, k, v = mk(B, NH, S, DH), mk(B, NH, S, DH), mk(B, NH, S, DH)
    ip, fp = mk(B, NH, S) - 2.0, mk(B, NH, S) + 2.0
    g = mk(B, NH, S, DH)

    def relerr(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))

    h_pal = jax.jit(lambda *a: mlstm_chunkwise_pallas(
        *a, chunk_size=128, mxu_dtype="float32"))(q, k, v, ip, fp)
    h_ref = mlstm_chunkwise(q, k, v, ip, fp, chunk_size=128)
    errs = {"mlstm_fwd": relerr(h_pal, h_ref)}

    g_pal = jax.jit(lambda *a: mlstm_chunkwise_pallas_bwd(
        *a, chunk_size=128, mxu_dtype="float32"))(q, k, v, ip, fp, g)
    g_ref = mlstm_chunkwise_bwd_ref(q, k, v, ip, fp, g, chunk_size=128)
    errs["mlstm_bwd"] = max(relerr(a, b) for a, b in zip(g_pal, g_ref))

    wx = mk(2, 12, 2, 4, 16)
    R = mk(2, 16, 4, 16) * 0.1
    b = mk(2, 4, 16) * 0.1
    y_pal = jax.jit(lambda *a: slstm_scan_pallas(*a))(wx, R, b)
    errs["slstm_fwd"] = relerr(y_pal, slstm_scan(wx, R, b))

    worst = max(errs.values())
    tol = 2e-2
    return {
        "metric": "pallas_kernel_parity_maxrelerr",
        "value": round(worst, 6),
        "unit": "rel",
        "ok": bool(worst < tol),
        "detail": {kk: round(vv, 6) for kk, vv in errs.items()},
    }


def main():
    from pathlib import Path

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # on-silicon kernel numerics gate, FIRST (the driver parses the LAST line
    # as the headline metric; a parity failure must not mask the throughput)
    print(json.dumps(kernel_parity()), flush=True)

    print(json.dumps(bench_model("yolov8n.yaml", "yolov8n_640_e2e_throughput")), flush=True)

    # compute-bound model (VERDICT r4 #4: n-scale models are overhead/
    # bandwidth-dominated; MFU claims need a larger config). yolov8m is
    # ~79 GFLOP/img at 640 — the MXU-utilization row.
    print(json.dumps(bench_model("yolov8m.yaml", "yolov8m_640_e2e_throughput",
                                 batch=128)), flush=True)

    # training-step throughput (full jit'd step: bf16 fwd + TAL loss + bwd +
    # clip + SGD + EMA at B128/640 — bench_train.py), driver-visible per
    # round since r3
    from bench_train import bench_train

    print(json.dumps(bench_train(
        "yolov8n.yaml", "yolov8n_640_train_step_throughput")), flush=True)
    print(json.dumps(bench_train(
        "yolov8m.yaml", "yolov8m_640_train_step_throughput", batch=64)), flush=True)
    print(json.dumps(bench_train(
        "vil_yolon.yaml", "vil_yolon_640_train_step_throughput")), flush=True)

    # op-level train-step attribution (XProf device lane, tools/xprof_step.py
    # — the round-5 tool that found the TAL gather custom-calls and the ViL
    # backward recompute): one line per model, device ms/step + top source
    # regions. Compiles are cached from the train rows above, so each is two
    # traced steps.
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
    try:
        from xprof_step import attribution

        for nm in ("yolov8n.yaml", "vil_yolon.yaml"):
            print(json.dumps(attribution(nm)), flush=True)
    except Exception as e:  # noqa: BLE001 — attribution is best-effort
        print(json.dumps({"metric": "train_step_attribution",
                          "error": str(e)[:120]}), flush=True)

    # flagship last: the driver's parsed line
    print(json.dumps(bench_model("vil_yolon.yaml", "vil_yolon_640_e2e_throughput")), flush=True)


if __name__ == "__main__":
    main()
