"""sLSTM fused recurrent kernel — TPU-native (lax.scan) equivalent of the
reference's CUDA implementation.

The reference JIT-compiles ~4.2k LoC of CUDA under
``xlstm/blocks/slstm/src/`` (cuBLAS GEMM for the per-head recurrent matmul
R·y plus a fused pointwise gate kernel per timestep,
``cuda/slstm_forward.cu``; golden math ``src/vanilla/slstm.py:8-40``).
On TPU the same structure is a ``lax.scan`` over time whose body is one
batched headwise matmul (MXU) + fused gate math (VPU) — XLA fuses the
pointwise chain; the sequential dependency is inherent to sLSTM (real
recurrence, not linearizable like mLSTM).

States (y, c, n, m), gates (i, f, z, o), exp-max stabilizer:
    m' = max(i_raw, logsigmoid(f_raw) + m)
    c' = exp(logsig(f)+m-m') * c + exp(i-m') * tanh(z)
    n' = exp(logsig(f)+m-m') * n + exp(i-m')
    y  = sigmoid(o) * c' / n'

Shapes: x-projected gate preacts Wx (B, S, NH, 4, DH); recurrent kernel
R (NH, DH, 4, DH); bias (NH, 4, DH).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


NEG_INIT = -1e30  # initial m: makes step 1 reduce to m' = i_raw, f-path 0
# (the reference's explicit n == 0 branch, vanilla/slstm.py:26, falls out of
# the math with this initialization — exp(NEG_INIT - m') == 0 exactly)


def slstm_pointwise(raw: jnp.ndarray, state: tuple):
    """One fused gate step. raw: (B, NH, 4, DH); state: (y, c, n, m) each (B, NH, DH)."""
    y, c, n, m = state
    iraw, fraw, zraw, oraw = raw[:, :, 0], raw[:, :, 1], raw[:, :, 2], raw[:, :, 3]
    logfplusm = m + jax.nn.log_sigmoid(fraw)
    m_new = jnp.maximum(iraw, logfplusm)
    ogate = jax.nn.sigmoid(oraw)
    igate = jnp.exp(iraw - m_new)
    fgate = jnp.exp(logfplusm - m_new)
    c_new = fgate * c + igate * jnp.tanh(zraw)
    n_new = fgate * n + igate
    y_new = ogate * c_new / n_new
    return (y_new, c_new, n_new, m_new)


@partial(jax.jit, static_argnames=("return_last_state",))
def slstm_scan(
    wx: jnp.ndarray,  # (B, S, NH, 4, DH) input-projected gate preacts
    r: jnp.ndarray,  # (NH, DH, 4, DH) recurrent kernel (per head)
    b: jnp.ndarray,  # (NH, 4, DH) bias
    initial_state: tuple | None = None,
    return_last_state: bool = False,
):
    """Full-sequence sLSTM. Returns y (B, S, NH, DH) (+ last state)."""
    B, S, NH, _, DH = wx.shape
    f32 = jnp.float32
    wx = wx.astype(f32)
    r = r.astype(f32)
    b = b.astype(f32)

    if initial_state is None:
        zeros = jnp.zeros((B, NH, DH), f32)
        state = (zeros, zeros, zeros, jnp.full((B, NH, DH), NEG_INIT, f32))
    else:
        state = tuple(x.astype(f32) for x in initial_state)

    def step(state, wx_t):
        y = state[0]
        ry = jnp.einsum("bnd,ndge->bnge", y, r, preferred_element_type=f32)
        raw = wx_t + ry + b[None]
        new_state = slstm_pointwise(raw, state)
        return new_state, new_state[0]

    last, ys = jax.lax.scan(step, state, jnp.moveaxis(wx, 1, 0))
    y = jnp.moveaxis(ys, 0, 1)  # (B, S, NH, DH)
    if return_last_state:
        return y, last
    return y


def slstm_step(
    wx: jnp.ndarray,  # (B, NH, 4, DH)
    r: jnp.ndarray,
    b: jnp.ndarray,
    state: tuple,
):
    """Single autoregressive step (reference cell step path)."""
    y = state[0]
    ry = jnp.einsum("bnd,ndge->bnge", y.astype(jnp.float32), r.astype(jnp.float32))
    raw = wx.astype(jnp.float32) + ry + b[None].astype(jnp.float32)
    new_state = slstm_pointwise(raw, tuple(s.astype(jnp.float32) for s in state))
    return new_state[0], new_state


def powerlaw_blockdependent_bias(num_heads: int, head_dim: int, block_idx: int, num_blocks: int) -> jnp.ndarray:
    """f-gate bias init (reference cell.py:393-415): per-channel powerlaw ramp."""
    ratio = block_idx / (num_blocks - 1) if num_blocks > 1 else 0.0
    x = jnp.arange(head_dim, dtype=jnp.float32) / max(head_dim - 1, 1)
    init = -(-5.0 + 12.0 * x ** (0.3 + 1.3 * ratio))
    return jnp.tile(init[None], (num_heads, 1))
