"""mLSTM (matrix-memory LSTM) math in pure jnp — three equivalent forms.

This is the TPU-native re-derivation of the xLSTM mLSTM cell that the
reference delegates to the external Triton ``mlstm_kernels`` package
(reference config strings at ``nn/modules/vision_lstm/vision_lstm2.py:818-877``)
with the pure-PyTorch golden math at
``nn/modules/vision_lstm/xlstm/blocks/mlstm/backends.py:9-263``.

Recurrence (per head, head dim DH, log-space max-stabilized):

    m_t = max(log f̃_t + m_{t-1}, log ĩ_t)
    C_t = exp(log f̃_t + m_{t-1} - m_t) C_{t-1} + exp(log ĩ_t - m_t) k_t v_tᵀ
    n_t = exp(log f̃_t + m_{t-1} - m_t) n_{t-1} + exp(log ĩ_t - m_t) k_t
    h_t = q̃_tᵀ C_t / (max(|q̃_tᵀ n_t|, exp(-m_t)) + eps),   q̃ = q / sqrt(DH)

where log f̃ = logsigmoid(f_preact) always, and log ĩ is either the raw
input-gate preactivation (``igate_act="exp"``, classic xLSTM) or
logsigmoid(i_preact) (``igate_act="sigmoid"``, the "siging" variant the
reference selects via ``chunkwise--triton_xl_chunk_siging``).

Three forms, all numerically equivalent (cross-checked in tests):
  * ``mlstm_parallel``  — O(S²) D-matrix attention form, for short S / tests.
  * ``mlstm_recurrent_step`` — single-step form for autoregressive decode.
  * ``mlstm_chunkwise`` — chunked scan: intra-chunk (CS × CS) work on the
    MXU, inter-chunk (C, n, m) state carried through ``lax.scan``. This is
    the training/inference workhorse and the golden model for the Pallas
    kernel in ``mlstm_pallas.py``.

All functions take (B, NH, S, DH) q/k/v and (B, NH, S) gate preactivations
and return (B, NH, S, DH), matching the reference backend contract.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def soft_cap(x: jnp.ndarray, cap: float | None) -> jnp.ndarray:
    """cap * tanh(x / cap); identity if cap is None (reference xlstm_large components)."""
    if cap is None:
        return x
    return cap * jnp.tanh(x / cap)


def _log_igate(i_preact: jnp.ndarray, igate_act: str) -> jnp.ndarray:
    if igate_act == "exp":
        return i_preact
    if igate_act == "sigmoid":
        return jax.nn.log_sigmoid(i_preact)
    raise ValueError(f"unknown igate_act {igate_act!r}")


# ---------------------------------------------------------------------------
# parallel (quadratic) form
# ---------------------------------------------------------------------------

def mlstm_parallel(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    i_preact: jnp.ndarray,
    f_preact: jnp.ndarray,
    igate_act: str = "exp",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """O(S²) stabilized parallel form (zero initial state)."""
    B, NH, S, DH = q.shape
    dtype = jnp.float32
    q, k, v = q.astype(dtype), k.astype(dtype), v.astype(dtype)
    logf = jax.nn.log_sigmoid(f_preact.astype(dtype))  # (B, NH, S)
    logi = _log_igate(i_preact.astype(dtype), igate_act)

    b = jnp.cumsum(logf, axis=-1)  # inclusive cumsum: b_t = sum_{s<=t} log f_s
    # log decay from source s to target t (t >= s): b_t - b_s  (f at step s not applied)
    log_fg = b[..., :, None] - b[..., None, :]  # (B, NH, S, S)
    causal = jnp.tril(jnp.ones((S, S), dtype=bool))
    log_d = jnp.where(causal, log_fg + logi[..., None, :], -jnp.inf)
    max_log_d = jnp.max(log_d, axis=-1, keepdims=True)  # rowwise stabilizer
    d = jnp.exp(log_d - max_log_d)

    qk = jnp.einsum("bnsd,bntd->bnst", q, k, preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.float32(DH)
    )
    c = qk * d
    normalizer = jnp.maximum(jnp.abs(jnp.sum(c, axis=-1, keepdims=True)), jnp.exp(-max_log_d))
    c_norm = c / (normalizer + eps)
    return jnp.einsum("bnst,bntd->bnsd", c_norm, v, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# recurrent single-step form
# ---------------------------------------------------------------------------

def mlstm_recurrent_step(
    c_state: jnp.ndarray,  # (B, NH, DH, DH)
    n_state: jnp.ndarray,  # (B, NH, DH)
    m_state: jnp.ndarray,  # (B, NH)
    q: jnp.ndarray,  # (B, NH, DH)
    k: jnp.ndarray,
    v: jnp.ndarray,
    i_preact: jnp.ndarray,  # (B, NH)
    f_preact: jnp.ndarray,
    igate_act: str = "exp",
    eps: float = 1e-6,
):
    """One autoregressive step. Returns (h, (C', n', m'))."""
    DH = q.shape[-1]
    logf = jax.nn.log_sigmoid(f_preact)
    logi = _log_igate(i_preact, igate_act)

    m_new = jnp.maximum(logf + m_state, logi)
    f_act = jnp.exp(logf + m_state - m_new)[..., None, None]
    i_act = jnp.exp(logi - m_new)[..., None, None]

    qs = q / jnp.sqrt(jnp.float32(DH))
    c_new = f_act * c_state + i_act * (k[..., :, None] * v[..., None, :])
    n_new = f_act[..., 0] * n_state + i_act[..., 0] * k

    h_num = jnp.einsum("bnd,bnde->bne", qs, c_new)
    qn = jnp.einsum("bnd,bnd->bn", qs, n_new)
    denom = jnp.maximum(jnp.abs(qn), jnp.exp(-m_new)) + eps
    h = h_num / denom[..., None]
    return h, (c_new, n_new, m_new)


def mlstm_recurrent(
    q, k, v, i_preact, f_preact, igate_act: str = "exp", eps: float = 1e-6,
    initial_state=None, return_last_state: bool = False,
):
    """Full-sequence scan of the single-step form (slow reference path)."""
    B, NH, S, DH = q.shape
    DV = v.shape[-1]  # may differ from DH (qk_dim_factor < 1, xLSTM-7B style)
    if initial_state is None:
        c0 = jnp.zeros((B, NH, DH, DV), jnp.float32)
        n0 = jnp.zeros((B, NH, DH), jnp.float32)
        m0 = jnp.zeros((B, NH), jnp.float32)
    else:
        c0, n0, m0 = initial_state

    def step(carry, xs):
        qt, kt, vt, it, ft = xs
        h, carry = mlstm_recurrent_step(*carry, qt, kt, vt, it, ft, igate_act=igate_act, eps=eps)
        return carry, h

    xs = (
        jnp.moveaxis(q.astype(jnp.float32), 2, 0),
        jnp.moveaxis(k.astype(jnp.float32), 2, 0),
        jnp.moveaxis(v.astype(jnp.float32), 2, 0),
        jnp.moveaxis(i_preact.astype(jnp.float32), 2, 0),
        jnp.moveaxis(f_preact.astype(jnp.float32), 2, 0),
    )
    last, hs = jax.lax.scan(step, (c0, n0, m0), xs)
    h = jnp.moveaxis(hs, 0, 2)
    return (h, last) if return_last_state else h


# ---------------------------------------------------------------------------
# chunkwise-parallel form (the workhorse)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("chunk_size", "igate_act", "return_last_state"))
def mlstm_chunkwise(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    i_preact: jnp.ndarray,
    f_preact: jnp.ndarray,
    chunk_size: int = 64,
    igate_act: str = "exp",
    eps: float = 1e-6,
    initial_state=None,
    return_last_state: bool = False,
):
    """Chunked-parallel mLSTM: O(S·CS) memory, MXU-friendly matmuls.

    Equivalent math to reference ``backends.py:149-263`` (chunkwise_simple),
    re-derived for jax: per-chunk summaries computed batched, the (C, n, m)
    inter-chunk recurrence carried by a lax.scan emitting carry-in states,
    then intra + inter contributions combined fully vectorized.

    Supports distinct q/k vs v head dims (DQK != DV — used by the
    xLSTM-large-style layer with qk_dim_factor 0.5): C is (DQK, DV),
    n is (DQK,).
    """
    B, NH, S, DH = q.shape
    DV = v.shape[-1]
    CS = chunk_size
    assert S % CS == 0, f"sequence length {S} must be divisible by chunk_size {CS}"
    NS = S // CS
    f32 = jnp.float32

    qc = q.astype(f32).reshape(B, NH, NS, CS, DH) / jnp.sqrt(f32(DH))
    kc = k.astype(f32).reshape(B, NH, NS, CS, DH)
    vc = v.astype(f32).reshape(B, NH, NS, CS, DV)
    logf = jax.nn.log_sigmoid(f_preact.astype(f32)).reshape(B, NH, NS, CS)
    logi = _log_igate(i_preact.astype(f32), igate_act).reshape(B, NH, NS, CS)

    b = jnp.cumsum(logf, axis=-1)  # (B, NH, NS, CS) inclusive within-chunk cumsum
    btot = b[..., -1]  # (B, NH, NS) total chunk decay

    # per-chunk state summaries: contribution of step t to end-of-chunk state
    # decays by (btot - b_t); input gate applies at t.
    g_acc = logi + (btot[..., None] - b)  # (B, NH, NS, CS)
    m_loc = jnp.max(g_acc, axis=-1)  # (B, NH, NS)
    gw = jnp.exp(g_acc - m_loc[..., None])  # (B, NH, NS, CS)
    kv = jnp.einsum("bncsd,bncse->bncde", kc * gw[..., None], vc, preferred_element_type=f32)
    ksum = jnp.sum(kc * gw[..., None], axis=-2)  # (B, NH, NS, DH)

    if initial_state is None:
        c0 = jnp.zeros((B, NH, DH, DV), f32)
        n0 = jnp.zeros((B, NH, DH), f32)
        m0 = jnp.zeros((B, NH), f32)
    else:
        c0, n0, m0 = (x.astype(f32) for x in initial_state)

    def chunk_step(carry, xs):
        c_prev, n_prev, m_prev = carry
        kv_j, ksum_j, btot_j, mloc_j = xs
        m_new = jnp.maximum(btot_j + m_prev, mloc_j)
        decay_old = jnp.exp(btot_j + m_prev - m_new)[..., None, None]
        decay_new = jnp.exp(mloc_j - m_new)[..., None, None]
        c_new = c_prev * decay_old + kv_j * decay_new
        n_new = n_prev * decay_old[..., 0] + ksum_j * decay_new[..., 0]
        return (c_new, n_new, m_new), (c_prev, n_prev, m_prev)

    xs = (
        jnp.moveaxis(kv, 2, 0),
        jnp.moveaxis(ksum, 2, 0),
        jnp.moveaxis(btot, 2, 0),
        jnp.moveaxis(m_loc, 2, 0),
    )
    last_state, prev_states = jax.lax.scan(chunk_step, (c0, n0, m0), xs)
    c_prev = jnp.moveaxis(prev_states[0], 0, 2)  # (B, NH, NS, DH, DV) carry-in per chunk
    n_prev = jnp.moveaxis(prev_states[1], 0, 2)  # (B, NH, NS, DH)
    m_prev = jnp.moveaxis(prev_states[2], 0, 2)  # (B, NH, NS)

    # intra-chunk D matrix: log_d[t, s] = (b_t - b_s) + logi_s for s <= t
    log_fg = b[..., :, None] - b[..., None, :]  # (B, NH, NS, CS, CS)
    causal = jnp.tril(jnp.ones((CS, CS), dtype=bool))
    log_d = jnp.where(causal, log_fg + logi[..., None, :], -jnp.inf)
    d_max = jnp.max(log_d, axis=-1)  # (B, NH, NS, CS)

    # stabilizer must cover both intra max and the inter-chunk contribution
    inter_decay_log = m_prev[..., None] + b  # (B, NH, NS, CS)
    stab = jnp.maximum(d_max, inter_decay_log)

    d = jnp.exp(log_d - stab[..., None])
    qk = jnp.einsum("bncsd,bnctd->bncst", qc, kc, preferred_element_type=f32)
    e = qk * d

    q_inter = qc * jnp.exp(inter_decay_log - stab)[..., None]
    inter_num = jnp.einsum("bncsd,bncde->bncse", q_inter, c_prev, preferred_element_type=f32)
    inter_norm = jnp.einsum("bncsd,bncd->bncs", q_inter, n_prev, preferred_element_type=f32)

    normalizer = jnp.maximum(
        jnp.abs(jnp.sum(e, axis=-1) + inter_norm), jnp.exp(-stab)
    )[..., None] + eps
    intra_num = jnp.einsum("bncst,bnctd->bncsd", e, vc, preferred_element_type=f32)
    h = (intra_num + inter_num) / normalizer
    h = h.reshape(B, NH, S, DV)
    if return_last_state:
        return h, last_state
    return h
