"""Per-stage attribution of the ViL layer's backward cost on the local chip.

The round-3 profile showed the flagship train step is backward-dominated
(fwd 19.8 ms vs fwd+bwd 214 ms at b128/640). This tool times, at each
vil_yolon ViL stage shape:

  fwd        — the v3 layer-fused Pallas forward (production fwd path)
  fwd+bwd    — jax.grad through the current custom_vjp (recompute through
               the unfused composite, mLSTM hop on the Pallas bwd kernel)
  comp_fwd   — the unfused composite forward alone (= the recompute tax)
  cell_fwd   — mlstm_chunkwise_pallas_t alone (the recurrence)
  cell_bwd   — grad of mlstm_chunkwise_pallas_t alone (phase1 + reverse
               streaming kernel)

Methodology mirrors bench.py: fori_loop chaining + scalar readback.

Usage: python tools/vil_bwd_profile.py [batch]
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

    from xlstm_yolo_tpu.kernels.mlstm_pallas import (
        mlstm_chunkwise_pallas_t, mlstm_vil_layer_fused_pallas,
        _vil_layer_composite)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = 3
    # vil_yolon stages at 640px: (S, DIM); inner = 2*DIM, nh = inner/64
    stages = {"P3": (6400, 64), "P4": (1600, 128), "P5": (400, 256)}
    CS = 128

    def timeit(fn, *args):
        # chain iters sequential calls inside one jit so nothing hoists
        @jax.jit
        def chained(*a):
            def body(i, carry):
                x0 = a[0] + (carry * 0).astype(a[0].dtype)
                r = fn(x0, *a[1:])
                leaf = jax.tree_util.tree_leaves(r)[0]
                return carry + jnp.sum(leaf).astype(jnp.float32) * 1e-12
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        _ = float(chained(*args))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(chained(*args))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1e3

    out = {}
    for name, (S, DIM) in stages.items():
        inner = 2 * DIM
        nh = inner // 64
        dh = inner // nh
        rng = np.random.default_rng(0)
        bf = jnp.bfloat16
        x = jnp.asarray(rng.standard_normal((batch, S, DIM)), bf)
        conv_act = jnp.asarray(rng.standard_normal((batch, S, inner)), bf)
        nrm = jnp.ones((DIM,), jnp.float32)
        wu = jnp.asarray(rng.standard_normal((DIM, 2 * inner)) * 0.05, jnp.float32)
        bu = jnp.zeros((2 * inner,), jnp.float32)
        wq = jnp.asarray(rng.standard_normal((nh, dh, dh)) * 0.1, jnp.float32)
        wk = jnp.asarray(rng.standard_normal((nh, dh, dh)) * 0.1, jnp.float32)
        wv = jnp.asarray(rng.standard_normal((nh, dh, dh)) * 0.1, jnp.float32)
        bq = jnp.zeros((inner,), jnp.float32)
        bk = jnp.zeros((inner,), jnp.float32)
        bv = jnp.zeros((inner,), jnp.float32)
        wgi = jnp.zeros((3 * inner, nh), jnp.float32)
        bgi = jnp.full((nh,), -10.0, jnp.float32)
        wgf = jnp.zeros((3 * inner, nh), jnp.float32)
        bgf = jnp.linspace(3.0, 6.0, nh, dtype=jnp.float32)
        nsc = jnp.ones((inner,), jnp.float32)
        nbi = jnp.zeros((inner,), jnp.float32)
        skip = jnp.ones((inner,), jnp.float32)
        wd = jnp.asarray(rng.standard_normal((inner, DIM)) * 0.05, jnp.float32)
        bd = jnp.zeros((DIM,), jnp.float32)
        weights = (nrm, wu, bu, wq, bq, wk, bk, wv, bv, wgi, bgi, wgf, bgf,
                   nsc, nbi, skip, wd, bd)

        def fused(x, conv_act, *w):
            nrm, wu, bu, wq, bq, wk, bk, wv, bv, wgi, bgi, wgf, bgf, nsc, nbi, skip, wd, bd = w
            return mlstm_vil_layer_fused_pallas(
                x, conv_act, nrm, wu, bu, wq, bq, wk, bk, wv, bv, wgi, bgi,
                wgf, bgf, nsc, nbi, skip, wd, bd, nh, chunk_size=CS)

        def comp(x, conv_act, *w):
            nrm, wu, bu, wq, bq, wk, bk, wv, bv, wgi, bgi, wgf, bgf, nsc, nbi, skip, wd, bd = w
            return _vil_layer_composite(
                x, conv_act, nrm, wu, bu, wq, wk, wv, bq, bk, bv, wgi, bgi,
                wgf, bgf, nsc, nbi, skip, wd, bd, nh, CS, "exp", 1e-6, 1e-3, 1e-6)

        def fused_loss(x, conv_act, *w):
            return jnp.sum(fused(x, conv_act, *w).astype(jnp.float32))

        fused_grad = jax.grad(fused_loss, argnums=tuple(range(2 + len(weights))))

        # the raw recurrence alone
        q = jnp.asarray(rng.standard_normal((batch, nh, dh, S)), bf)
        kk = jnp.asarray(rng.standard_normal((batch, nh, dh, S)), bf)
        vv = jnp.asarray(rng.standard_normal((batch, nh, dh, S)), bf)
        ip = jnp.asarray(rng.standard_normal((batch, nh, S)) - 9, jnp.float32)
        fp = jnp.asarray(rng.standard_normal((batch, nh, S)) + 4, jnp.float32)

        def cell(q, kk, vv, ip, fp):
            return mlstm_chunkwise_pallas_t(q, kk, vv, ip, fp, chunk_size=CS)

        def cell_loss(q, kk, vv, ip, fp):
            return jnp.sum(cell(q, kk, vv, ip, fp).astype(jnp.float32))

        cell_grad = jax.grad(cell_loss, argnums=(0, 1, 2, 3, 4))

        res = {
            "fwd_ms": round(timeit(fused, x, conv_act, *weights), 2),
            "fwd_bwd_ms": round(timeit(fused_grad, x, conv_act, *weights), 2),
            "comp_fwd_ms": round(timeit(comp, x, conv_act, *weights), 2),
            "cell_fwd_ms": round(timeit(cell, q, kk, vv, ip, fp), 2),
            "cell_bwd_ms": round(timeit(cell_grad, q, kk, vv, ip, fp), 2),
        }
        out[name] = res
        print(json.dumps({name: res}), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
