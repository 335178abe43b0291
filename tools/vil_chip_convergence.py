"""On-silicon convergence gate for the ViL training path.

20 overfit SGD steps of vil_yolon on the REAL chip (the CPU test tier runs
the native mLSTM backend, so the fused Pallas forward + hand-written
save_acts backward only ever execute compiled here). Asserts finite,
decreasing loss. Round-5 run: 104.6 -> 51.8 over 20 steps.

Usage: python tools/vil_chip_convergence.py
"""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from xlstm_yolo_tpu.nn.tasks import TaskModel
from xlstm_yolo_tpu.utils import train_utils as TU

model = TaskModel("vil_yolon.yaml", nc=3)
v = model.init(0, imgsz=128)
params, bs = v["params"], v["batch_stats"]
step_update, opt_init, _, _, _ = TU.build_flat_step(params, name="SGD", lr=0.01, momentum=0.9, clip_norm=0.5)
opt = opt_init(params)
ema = jax.tree.map(jnp.copy, params)
rng = np.random.default_rng(0)
batch = {
    "img": jnp.asarray(rng.random((8, 128, 128, 3)), jnp.bfloat16),
    "cls_boxes": jnp.tile(jnp.asarray([[1.0, 20, 20, 90, 90]], jnp.float32), (8, 8, 1)),
    "mask": jnp.tile(jnp.asarray([True] + [False] * 7), (8, 1)),
}

@jax.jit
def step(params, bs, opt, ema, n):
    def loss_fn(p):
        (total, aux), upd = model.loss({"params": p, "batch_stats": bs}, batch, train=True)
        return total, upd
    (total, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    params, ema, opt = step_update(grads, opt, params, ema, jnp.float32(0.01), n + 1)
    return params, upd.get("batch_stats", bs), opt, ema, total

losses = []
for i in range(20):
    params, bs, opt, ema, total = step(params, bs, opt, ema, jnp.int32(i))
    losses.append(float(total))
print("losses:", [round(x, 1) for x in losses[::4]], "first", round(losses[0],1), "last", round(losses[-1],1))
assert np.isfinite(losses).all(), "non-finite loss"
assert losses[-1] < losses[0] * 0.8, f"no convergence: {losses[0]} -> {losses[-1]}"
print("VIL CHIP CONVERGENCE OK")
