"""Op-level device-time attribution of the production train step (XProf).

Round-5 discovery: every host readback through the axon relay costs ~25-30 ms
of pure latency, so the fori-chained wall-clock tools (train_step_profile,
loss_profile) carry a ~25/iters ms constant per metric and CANNOT see inside
the step. jax.profiler traces DO capture the TPU lane op-by-op
(device_duration_ps per HLO fusion, with bytes_accessed + source lines).
This tool runs the exact bench_train step under a trace and prints:

  * total device time per step (the truth bench_train approximates)
  * top-N HLO ops by device time, with hlo_category, GB touched, and the
    model source line that produced them
  * an aggregate by source region (vil / loss / conv bwd / optimizer ...)

Usage: python tools/xprof_step.py [batch] [model.yaml] [--fwd|--e2e]
"""
from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run_and_trace(step_kind: str, batch: int, name: str, trace_dir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from xlstm_yolo_tpu.nn.tasks import TaskModel
    from xlstm_yolo_tpu.utils import train_utils as TU

    imgsz, nL = 640, 32
    model = TaskModel(name)
    variables = model.init(0, imgsz=imgsz)
    params, batch_stats = variables["params"], variables["batch_stats"]
    step_update, opt_init, _, _, _ = TU.build_flat_step(
        params, name="SGD", lr=0.01, momentum=0.937, clip_norm=0.5)
    lr = jnp.float32(0.01)
    opt_state = opt_init(params)
    ema = jax.tree.map(jnp.copy, params)
    rng = np.random.default_rng(0)
    dbatch = {
        "img": jnp.asarray(rng.random((batch, imgsz, imgsz, 3)), jnp.bfloat16),
        "cls_boxes": jnp.tile(jnp.asarray([[1.0, 100, 100, 400, 400]], jnp.float32), (batch, nL, 1)),
        "mask": jnp.tile(jnp.asarray([True] + [False] * (nL - 1)), (batch, 1)),
    }

    if step_kind == "e2e":
        from xlstm_yolo_tpu.nn.fuse import fuse_conv_bn
        from xlstm_yolo_tpu.ops.letterbox import letterbox_device
        from xlstm_yolo_tpu.ops.nms import non_max_suppression

        fv = fuse_conv_bn({"params": params, "batch_stats": batch_stats})
        fv = {"params": jax.tree.map(lambda x: x.astype(jnp.bfloat16), fv["params"]),
              "batch_stats": fv["batch_stats"]}
        raw = jnp.asarray(rng.integers(0, 255, (batch, 540, 810, 3)), jnp.uint8)

        @jax.jit
        def fn(raw):
            x, _ = letterbox_device(raw, imgsz=imgsz)
            pred = model.predictions(fv, x)
            dets, valid = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.7,
                                              max_det=300, pre_topk=512, fast_sel=True)
            return jnp.sum(dets)

        args = (raw,)
    elif step_kind == "fwd":
        @jax.jit
        def fn(params, batch_stats, b):
            out, _ = model.module.apply(
                {"params": params, "batch_stats": batch_stats}, b["img"],
                train=True, mutable=["batch_stats"])
            det = out["det"] if isinstance(out, dict) else out
            return sum(jnp.sum(d.astype(jnp.float32) ** 2) for d in jax.tree.leaves(det))

        args = (params, batch_stats, dbatch)
    else:
        @jax.jit
        def fn(params, batch_stats, opt_state, ema, b):
            def loss_fn(p):
                (total, aux), updates = model.loss(
                    {"params": p, "batch_stats": batch_stats}, b, train=True)
                return total, updates

            (total, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            params2, ema2, opt_state = step_update(grads, opt_state, params,
                                                   ema, lr, 1)
            return sum(jnp.sum(x).astype(jnp.float32)
                       for x in jax.tree.leaves(params2)) + total

        args = (params, batch_stats, opt_state, ema, dbatch)

    _ = float(fn(*args))  # compile + warm
    jax.profiler.start_trace(trace_dir)
    for _ in range(2):
        _ = float(fn(*args))
    jax.profiler.stop_trace()


def collect(trace_dir: str):
    """Parse the newest trace in ``trace_dir`` -> (ops, device_ms_per_step,
    n_steps, by_src) where ops maps HLO op name to [dur_ms, count, GB, cat,
    src] and by_src aggregates device ms per source file:line."""
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    dev_pids = {e["pid"] for e in t["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    ops = defaultdict(lambda: [0.0, 0, 0.0, "", ""])  # dur_ms, count, GB, cat, src
    by_src = defaultdict(float)
    total = 0.0
    n_launch = 0
    for e in t["traceEvents"]:
        if e.get("pid") not in dev_pids or e.get("ph") != "X":
            continue
        a = e.get("args", {})
        if "hlo_category" not in a:
            if e.get("name", "").startswith("jit"):
                total += e.get("dur", 0) / 1e3
                n_launch += 1
            continue
        o = ops[e["name"]]
        d = e.get("dur", 0) / 1e3
        o[0] += d
        o[1] += 1
        o[2] += float(a.get("bytes_accessed", 0)) / 1e9
        o[3] = a.get("hlo_category", "")
        src = a.get("source", "") or ""
        o[4] = src.split("/")[-1]
        by_src[o[4] or "?"] += d
    n_steps = max(n_launch, 1)
    return ops, total / n_steps, n_steps, {k: v / n_steps for k, v in by_src.items()}


def attribution(name: str, batch: int = 128) -> dict:
    """One-line step attribution for bench.py: device ms/step + the top
    source regions. Uses the persistent compile cache, so after the train
    bench has run this costs two traced steps."""
    trace_dir = f"/tmp/xprof_{name.replace('.yaml', '')}_attr"
    run_and_trace("full", batch, name, trace_dir)
    _, dev_ms, _, by_src = collect(trace_dir)
    top = dict(sorted(by_src.items(), key=lambda kv: -kv[1])[:8])
    return {"metric": f"{name.replace('.yaml', '')}_train_step_attribution",
            "value": round(dev_ms, 2), "unit": "device_ms/step",
            "detail": {k: round(v, 2) for k, v in top.items()}}


def parse(trace_dir: str, top: int = 40):
    ops, dev_ms, n_steps, _ = collect(trace_dir)
    print(json.dumps({"device_ms_per_step": round(dev_ms, 3),
                      "n_steps": n_steps}))
    total = dev_ms * n_steps
    n_launch = n_steps
    rows = sorted(ops.items(), key=lambda kv: -kv[1][0])
    print(f"{'ms/step':>8} {'GB/s':>6} {'n':>3}  {'category':<18} {'src':<28} name")
    for name, (dur, cnt, gb, cat, src) in rows[:top]:
        bw = gb / (dur / 1e3) if dur else 0
        print(f"{dur / n_steps:8.3f} {bw:6.0f} {cnt:3d}  {cat:<18.18} {src:<28.28} {name[:60]}")
    # aggregate by category
    agg = defaultdict(float)
    for name, (dur, cnt, gb, cat, src) in ops.items():
        agg[cat] += dur / n_steps
    print(json.dumps({"by_category_ms": {k: round(v, 2) for k, v in
                                         sorted(agg.items(), key=lambda kv: -kv[1])}}))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    name = sys.argv[2] if len(sys.argv) > 2 else "yolov8n.yaml"
    kind = "full"
    if "--fwd" in sys.argv:
        kind = "fwd"
    if "--e2e" in sys.argv:
        kind = "e2e"
    trace_dir = f"/tmp/xprof_{name.replace('.yaml', '')}_{kind}"
    run_and_trace(kind, batch, name, trace_dir)
    parse(trace_dir)


if __name__ == "__main__":
    main()
