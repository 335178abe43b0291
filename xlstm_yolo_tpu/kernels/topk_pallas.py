"""Single-pass row-wise kth-largest value on TPU (Pallas).

KEPT AS A DOCUMENTED NEGATIVE RESULT — not on the default TAL path.

The motivating wall-clock measurement ("the k-1 XLA max+suppress passes
cost 8.1 ms") turned out to be ~25 ms of axon relay readback latency
divided by the iteration count; the XProf device lane (tools/xprof_step.py,
round 5) showed XLA fuses the suppress chain to ~2 ms at B128/A8400 while
THIS kernel ran at 2-7 GB/s (~15 ms in-step): its k-1 in-VMEM iterations
are serial lane-axis max reductions on the VPU, and one HBM read cannot
buy that back. utils/tal.py uses the XLA form; the kernel and its exact-
ness test remain as the record of why.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kth_kernel(x_ref, out_ref, *, k: int, n_valid: int):
    v = x_ref[...].astype(jnp.float32)
    if n_valid < v.shape[1]:  # mask the lane padding off
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        v = jnp.where(lane < n_valid, v, NEG_INF)
    for _ in range(k - 1):
        row_max = jnp.max(v, axis=1, keepdims=True)
        v = jnp.where(v >= row_max, NEG_INF, v)
    out_ref[...] = jnp.broadcast_to(jnp.max(v, axis=1, keepdims=True),
                                    out_ref.shape)


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def rowwise_kth_value(x: jnp.ndarray, k: int, block_rows: int = 128,
                      interpret: bool | None = None) -> jnp.ndarray:
    """(R, N) -> (R, 1): the kth-largest value of each row (k >= 1).

    TPU path: one HBM read of x per element; CPU/GPU falls back to the
    k-1-pass XLA form (identical result).
    """
    R, N = x.shape
    if jax.default_backend() != "tpu" and not interpret:
        v = x.astype(jnp.float32)
        for _ in range(k - 1):
            row_max = jnp.max(v, axis=1, keepdims=True)
            v = jnp.where(v >= row_max, NEG_INF, v)
        return jnp.max(v, axis=1, keepdims=True)

    np_ = (-N) % 128
    if np_:
        x = jnp.pad(x, ((0, 0), (0, np_)))
    rp = (-R) % block_rows
    if rp:
        x = jnp.pad(x, ((0, rp), (0, 0)))
    Rp = x.shape[0]
    out = pl.pallas_call(
        functools.partial(_kth_kernel, k=k, n_valid=N),
        grid=(Rp // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, 128), jnp.float32),
        interpret=bool(interpret),
    )(x)
    return out[:R, :1]
