"""Train-step time attribution on the local accelerator.

Times three nested variants of the yolov8n training step at the production
shape to locate where the step's time goes (VERDICT round 2: train MFU ~4%
vs 22% at inference):

  fwd       — bf16 forward only (train=True, batch_stats mutable)
  fwd+bwd   — plus backward of a dummy L2 head loss (no TAL/CIoU/DFL)
  full      — the real step: loss (TAL assign + CIoU + DFL + BCE), backward,
              clip, SGD+momentum, EMA

CAVEAT (round 5): every host readback through the axon relay costs
~25-30 ms of pure latency, so each metric here carries a +25/iters ms
constant — DIFFERENCES between variants are meaningful, absolute values
are not. For op-level truth use tools/xprof_step.py (device-lane trace).

Methodology mirrors bench.py (fori_loop chaining + scalar readback; the
axon relay's block_until_ready does not synchronize).

Usage: python tools/train_step_profile.py [batch] [model.yaml]
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
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from xlstm_yolo_tpu.nn.tasks import TaskModel
    from xlstm_yolo_tpu.utils import train_utils as TU

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    name = sys.argv[2] if len(sys.argv) > 2 else "yolov8n.yaml"
    imgsz, iters, nL = 640, 3, 32

    model = TaskModel(name)
    variables = model.init(0, imgsz=imgsz)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx, _, _, _ = TU.build_optimizer(params, name="SGD", lr=0.01,
                                     momentum=0.937, clip_norm=0.5)
    lr = jnp.float32(0.01)
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.copy, params)

    rng = np.random.default_rng(0)
    dbatch = {
        "img": jnp.asarray(rng.random((batch, imgsz, imgsz, 3)), jnp.bfloat16),
        "cls_boxes": jnp.tile(jnp.asarray([[1.0, 100, 100, 400, 400]], jnp.float32), (batch, nL, 1)),
        "mask": jnp.tile(jnp.asarray([True] + [False] * (nL - 1)), (batch, 1)),
    }

    def fwd_only(params, batch_stats, b):
        out, upd = model.module.apply(
            {"params": params, "batch_stats": batch_stats}, b["img"],
            train=True, mutable=["batch_stats"])
        det = out["det"] if isinstance(out, dict) else out
        import jax as _jax
        return sum(jnp.sum(d.astype(jnp.float32) ** 2)
                   for d in _jax.tree.leaves(det)), upd["batch_stats"]

    def fwd_bwd(params, batch_stats, opt_state, ema, n, b):
        def loss_fn(p):
            l, bs = fwd_only(p, batch_stats, b)
            return l * 1e-6, bs

        (l, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params, ema = TU.fused_apply_ema(params, upd, ema, lr, n + 1)
        return params, bs, opt_state, ema, l

    def full(params, batch_stats, opt_state, ema, n, b):
        def loss_fn(p):
            (total, aux), updates = model.loss(
                {"params": p, "batch_stats": batch_stats}, b, train=True)
            return total, updates

        (total, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params, ema = TU.fused_apply_ema(params, upd, ema, lr, n + 1)
        return params, updates.get("batch_stats", batch_stats), opt_state, ema, total

    def timed(fn, *args):
        jitted = jax.jit(fn)
        _ = float(jitted(*args))
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(jitted(*args))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    def many_fwd(params, batch_stats, b):
        # perturb the input per iteration or XLA hoists the loop-invariant
        # forward out of the fori_loop and reports time/iters (1/iters of
        # the truth — caught round 5 when ViL stage sums exceeded the
        # "whole model" number)
        def body(i, acc):
            bi = {**b, "img": b["img"] + (acc * 1e-12 + i).astype(b["img"].dtype) * 1e-6}
            l, bs = fwd_only(params, batch_stats, bi)
            return acc + l

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    def loop(step):
        def many(params, batch_stats, opt_state, ema, b):
            def body(i, carry):
                params, bs, opt_state, ema, acc = carry
                # grads_only/opt_only leave params untouched — perturb the
                # batch per iteration so XLA cannot hoist the body
                bi = {**b, "img": b["img"] + (acc * 1e-12 + i).astype(b["img"].dtype) * 1e-6}
                params, bs, opt_state, ema, l = step(params, bs, opt_state, ema, i, bi)
                return params, bs, opt_state, ema, acc + l

            return jax.lax.fori_loop(
                0, iters, body, (params, batch_stats, opt_state, ema, jnp.float32(0)))[-1]

        return many

    def grads_only(params, batch_stats, opt_state, ema, n, b):
        def loss_fn(p):
            l, bs = fwd_only(p, batch_stats, b)
            return l * 1e-6, bs

        (l, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # touch grads so nothing is dead-code-eliminated
        gsum = sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))
        return params, bs, opt_state, ema, l + gsum * 0.0

    def grads_eval(params, batch_stats, opt_state, ema, n, b):
        # BN frozen (running stats, train=False): the delta vs grads_only is
        # the price of train-mode BN (batch-stat reductions + their backward)
        def loss_fn(p):
            out = model.module.apply({"params": p, "batch_stats": batch_stats},
                                     b["img"], train=False)
            det = out["det"] if isinstance(out, dict) else out
            return sum(jnp.sum(d.astype(jnp.float32) ** 2) for d in jax.tree.leaves(det)) * 1e-6

        l, grads = jax.value_and_grad(loss_fn)(params)
        gsum = sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))
        return params, batch_stats, opt_state, ema, l + gsum * 0.0

    def opt_only(params, batch_stats, opt_state, ema, n, b):
        grads = jax.tree.map(lambda p: p * 1e-8 + b["img"].sum() * 0.0, params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params, ema = TU.fused_apply_ema(params, upd, ema, lr, n + 1)
        return params, batch_stats, opt_state, ema, jax.tree.leaves(params)[0].sum()

    out = {}
    out["fwd_ms"] = round(1e3 * timed(many_fwd, params, batch_stats, dbatch), 2)
    out["grads_ms"] = round(1e3 * timed(loop(grads_only), params, batch_stats, opt_state, ema, dbatch), 2)
    out["grads_eval_ms"] = round(1e3 * timed(loop(grads_eval), params, batch_stats, opt_state, ema, dbatch), 2)
    out["opt_ms"] = round(1e3 * timed(loop(opt_only), params, batch_stats, opt_state, ema, dbatch), 2)
    out["fwd_bwd_ms"] = round(1e3 * timed(loop(fwd_bwd), params, batch_stats, opt_state, ema, dbatch), 2)
    out["full_ms"] = round(1e3 * timed(loop(full), params, batch_stats, opt_state, ema, dbatch), 2)
    out["batch"] = batch
    out["model"] = name
    out["full_img_s"] = round(batch / (out["full_ms"] / 1e3), 1)
    out["loss_overhead_ms"] = round(out["full_ms"] - out["fwd_bwd_ms"], 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
