"""Optimizer groups, LR schedules, EMA — jax-native equivalents of
reference ``engine/trainer.py:764-825`` (build_optimizer),
``utils/torch_utils.py:482-551`` (one_cycle, EMA), and the warmup
interpolation at ``engine/trainer.py:366-376``.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import optax


def _is_no_decay(path) -> bool:
    """No weight decay for biases and normalization scales.

    Fork quirk preserved: the reference's no-decay group takes
    ``nn.BatchNorm2d``-like weights and *excludes RMSNorm* (RMSNorm scales ARE
    decayed, engine/trainer.py:783) — our RMSNorm scale param is named
    "scale" under a module path containing "norm"; we decay it like the fork.
    """
    keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    last = keys[-1] if keys else ""
    if last == "bias":
        return True
    # BatchNorm scale/bias (flax: .../bn/{scale,bias})
    if last in ("scale", "bias") and any(k in ("bn", "norm2") for k in keys[:-1]):
        return True
    return False


def auto_optimizer_name(nc: int, iterations: float) -> tuple[str, float, float]:
    """Auto optimizer pick (reference engine/trainer.py:784-793):
    AdamW with fitted lr for short runs, SGD otherwise."""
    if iterations > 10000:
        return "SGD", 0.01, 0.937
    lr = round(0.002 * 5 / (4 + nc), 6)
    return "AdamW", lr, 0.9


def _flat_domain(inner: optax.GradientTransformation, template) -> optax.GradientTransformation:
    """Run ``inner`` on ONE concatenated parameter vector.

    A yolov8n tree has ~200 leaves; per-leaf optimizer math costs ~2000 tiny
    kernels ≈ 9 ms/step on the TPU (tools/train_step_profile.py) — flattened
    it is ~1 ms. Like optax.flatten, but built here so the masked weight
    decay can live in the flat domain too (optax.flatten breaks on pytree
    masks)."""
    from jax.flatten_util import ravel_pytree

    _, unravel = ravel_pytree(template)

    def init(params):
        return inner.init(ravel_pytree(params)[0])

    def update(updates, state, params=None):
        uv, _ = ravel_pytree(updates)
        pv = ravel_pytree(params)[0] if params is not None else None
        uv, state = inner.update(uv, state, pv)
        return unravel(uv), state

    return optax.GradientTransformation(init, update)


def _add_decayed_flat(decay: float, mask_vec) -> optax.GradientTransformation:
    """Coupled L2 on the flat vector, masked elementwise (the 3-group
    decay/no-decay split as one fused multiply-add)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return updates + decay * mask_vec * params, state

    return optax.GradientTransformation(init, update)


def _flat_parts(params, name, lr, momentum, decay, nc, iterations, clip_norm):
    """Shared: resolve the optimizer name and build the flat-domain chain."""
    if name == "auto":
        name, lr, momentum = auto_optimizer_name(nc, iterations)

    from jax.flatten_util import ravel_pytree

    mask_vec, _ = ravel_pytree(jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.full(x.shape, float(not _is_no_decay(p)), jnp.float32),
        params))

    if name in ("Adam", "AdamW", "NAdam", "RAdam"):
        base = {
            "Adam": optax.adam, "AdamW": optax.adam, "NAdam": optax.nadam, "RAdam": optax.radam,
        }[name](learning_rate=1.0, b1=momentum, b2=0.999, eps=1e-8)
    elif name == "RMSProp":
        base = optax.rmsprop(learning_rate=1.0, momentum=momentum)
    elif name == "SGD":
        base = optax.sgd(learning_rate=1.0, momentum=momentum, nesterov=True)
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts += [_add_decayed_flat(decay, mask_vec), base]
    return optax.chain(*parts), name, lr, momentum


def build_optimizer(
    params: Any,
    name: str = "auto",
    lr: float = 0.01,
    momentum: float = 0.937,
    decay: float = 0.0005,
    nc: int = 80,
    iterations: float = 1e5,
    clip_norm: float | None = None,
) -> tuple[optax.GradientTransformation, str, float, float]:
    """3-group optimizer: decayed weights / no-decay biases+BN (reference
    engine/trainer.py:764), running in the flat domain (one concatenated
    vector). clip_norm, when given, fuses global-norm clipping in as well.
    Returns (tx, resolved_name, lr, momentum); tx consumes/produces
    parameter TREES like any optax transform."""
    inner, name, lr, momentum = _flat_parts(params, name, lr, momentum, decay,
                                            nc, iterations, clip_norm)
    tx = _flat_domain(inner, params)
    return tx, name, lr, momentum


def build_flat_step(
    params: Any,
    name: str = "auto",
    lr: float = 0.01,
    momentum: float = 0.937,
    decay: float = 0.0005,
    nc: int = 80,
    iterations: float = 1e5,
    clip_norm: float | None = None,
    accumulate: int = 1,
) -> tuple:
    """The whole per-step parameter update — clip + decay + optimizer math +
    lr-scale + apply + EMA — through ONE flatten of each tree.

    ``build_optimizer`` + ``fused_apply_ema`` together ravel the tree 5x and
    unravel 3x per step; a 200-leaf concat is latency-bound (~1 ms each, the
    train_utils reshape the XProf trace shows). Here grads/params/ema ravel
    once, everything chains on the flat vectors, and only the two result
    trees unravel.

    Returns (step_update, init_fn, resolved_name, lr, momentum) where
    ``step_update(grads, opt_state, params, ema, lr, n_updates) ->
    (params, ema, opt_state)`` and ``init_fn(params) -> opt_state`` (same
    state pytree as build_optimizer's, so checkpoints interchange)."""
    from jax.flatten_util import ravel_pytree

    inner, name, lr0, momentum = _flat_parts(params, name, lr, momentum,
                                             decay, nc, iterations, clip_norm)
    if accumulate > 1:
        inner = optax.MultiSteps(inner, every_k_schedule=accumulate)
    _, unravel = ravel_pytree(params)

    def init_fn(p):
        return inner.init(ravel_pytree(p)[0])

    def step_update(grads, opt_state, p, ema, lr, n_updates,
                    decay_ema: float = 0.9999, tau: float = 2000.0):
        gv = ravel_pytree(grads)[0]
        pv = ravel_pytree(p)[0]
        ev = ravel_pytree(ema)[0]
        uv, opt_state = inner.update(gv, opt_state, pv)
        pv = pv + uv * lr
        d = decay_ema * (1 - jnp.exp(-n_updates / tau))
        ev = ev * d + pv * (1 - d)
        return unravel(pv), unravel(ev), opt_state

    return step_update, init_fn, name, lr0, momentum


def lr_schedule(lr0: float, lrf: float, epochs: int, cos_lr: bool = False):
    """Per-epoch LR factor (reference one_cycle / linear, trainer.py:312,
    torch_utils.py:482). Returns f(epoch) -> lr."""
    if cos_lr:
        def f(e):
            return lr0 * (((1 - math.cos(e * math.pi / epochs)) / 2) * (lrf - 1) + 1)
    else:
        def f(e):
            return lr0 * max(1 - e / epochs, 0) * (1.0 - lrf) + lr0 * lrf
    return f


def warmup_lr(step: int, epoch_f: float, warmup_steps: float, base_lr: float, warmup_bias_lr: float = 0.1):
    """Linear warmup interp (reference trainer.py:366-376), simplified to a
    single LR (bias group ramp handled by the same scalar here)."""
    if warmup_steps <= 0 or step >= warmup_steps:
        return base_lr
    return float(jnp.interp(step, jnp.array([0.0, warmup_steps]), jnp.array([warmup_bias_lr * 0.0, base_lr])))


class EMA:
    """Pytree EMA with warmup decay ramp (reference ModelEMA,
    utils/torch_utils.py:515): decay = d * (1 - exp(-updates / tau))."""

    def __init__(self, params, decay: float = 0.9999, tau: float = 2000.0):
        self.ema = jax.tree.map(lambda x: x, params)
        self.decay = decay
        self.tau = tau
        self.updates = 0

    def update(self, params):
        self.updates += 1
        d = self.decay * (1 - math.exp(-self.updates / self.tau))
        self.ema = jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1 - d), self.ema, params)
        return self.ema


def ema_update(ema_params, params, updates: int, decay: float = 0.9999, tau: float = 2000.0):
    """Functional EMA update for use inside a jit'd train step."""
    d = decay * (1 - jnp.exp(-updates / tau))
    return jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1 - d), ema_params, params)


def fused_apply_ema(params, updates, ema_params, lr, n_updates,
                    decay: float = 0.9999, tau: float = 2000.0):
    """lr-scale + apply_updates + EMA as THREE flat-vector passes.

    The per-leaf tree.map form costs one XLA fusion per (op, leaf) — ~600
    dispatches for a ~200-leaf model, measured ~6 ms of the 10 ms
    optimizer+EMA block at B128 (tools/train_step_profile.py opt_ms). Here
    the tree flattens once (concat — pure bandwidth over ~13 MB) and the
    arithmetic is three fused vector ops.

    Returns (new_params, new_ema) as trees.
    """
    from jax.flatten_util import ravel_pytree

    pv, unravel = ravel_pytree(params)
    uv, _ = ravel_pytree(updates)
    ev, _ = ravel_pytree(ema_params)
    d = decay * (1 - jnp.exp(-n_updates / tau))
    pv = pv + uv * lr
    ev = ev * d + pv * (1 - d)
    return unravel(pv), unravel(ev)


class EarlyStopping:
    """Patience-based stopper (reference utils/torch_utils.py:733)."""

    def __init__(self, patience: int = 100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float | None) -> bool:
        if fitness is None:
            return False
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        return (epoch - self.best_epoch) >= self.patience
