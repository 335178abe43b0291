"""Automatic batch-size estimation (reference ``utils/autobatch.py:38``).

The reference profiles CUDA memory at batch sizes 1/2/4/8/16 and fits a
log-log polynomial. On TPU we do better: XLA's ahead-of-time compile
reports exact peak memory (``compiled.memory_analysis()``), so we compile
the train step at two batch sizes, fit the linear model
``bytes(b) = fixed + b * per_image`` (activation memory is linear in batch
for static-shape programs), and solve for the target HBM fraction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import LOGGER


def device_memory_bytes(default: int = 16 * 1024**3) -> int:
    """Accelerator HBM size (v5e: 16 GiB); falls back to ``default`` when the
    platform doesn't expose it (CPU)."""
    d = jax.devices()[0]
    stats = getattr(d, "memory_stats", None)
    if callable(stats):
        try:
            s = stats() or {}
            if "bytes_limit" in s:
                return int(s["bytes_limit"])
        except Exception:  # pragma: no cover - platform dependent
            pass
    return default


def _peak_bytes(fn, batch: int, imgsz: int, ch: int = 3) -> int:
    """AOT-compile fn(img) at the given batch and read XLA's peak estimate."""
    x = jax.ShapeDtypeStruct((batch, imgsz, imgsz, ch), jnp.float32)
    compiled = jax.jit(fn).lower(x).compile()
    m = compiled.memory_analysis()
    if m is None:  # pragma: no cover - interpreter backends
        return 0
    return int(m.temp_size_in_bytes + m.argument_size_in_bytes +
               m.output_size_in_bytes + m.generated_code_size_in_bytes)


def autobatch(step_fn, imgsz: int = 640, fraction: float = 0.60,
              max_batch: int = 1024, probe: tuple = (1, 4), ch: int = 3) -> int:
    """Largest batch using <= ``fraction`` of HBM (reference autobatch
    defaults to 60% CUDA memory).

    step_fn(img) must be jit-compatible and shape-polymorphic over batch
    (a closed-over train/val step). Returns a power-of-two batch size.
    """
    total = device_memory_bytes()
    budget = int(total * fraction)
    try:
        b0, b1 = probe
        y0 = _peak_bytes(step_fn, b0, imgsz, ch)
        y1 = _peak_bytes(step_fn, b1, imgsz, ch)
    except Exception as e:  # pragma: no cover - compile failure
        LOGGER.warning(f"autobatch probe failed ({e}); using batch=16")
        return 16
    if y1 <= y0 or y0 <= 0:
        LOGGER.warning("autobatch: degenerate memory readings; using batch=16")
        return 16
    per_image = (y1 - y0) / (b1 - b0)
    fixed = y0 - b0 * per_image
    best = int((budget - fixed) / per_image)
    # round down to a power of two like the reference's final check
    b = 1
    while b * 2 <= min(best, max_batch):
        b *= 2
    pct = (fixed + b * per_image) / total * 100
    LOGGER.info(f"autobatch: batch={b} uses ~{pct:.0f}% of "
                f"{total / 1024**3:.1f} GiB (fraction target {fraction:.0%})")
    return max(1, b)
