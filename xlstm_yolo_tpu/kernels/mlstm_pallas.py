"""Fused chunkwise mLSTM — Pallas TPU kernel.

TPU-native replacement for the reference's external Triton kernel
(``mlstm_kernels`` ``chunkwise--triton_xl_chunk[_siging]``, selected at
``nn/modules/vision_lstm/vision_lstm2.py:818-877``). Golden model:
``kernels/mlstm_native.mlstm_chunkwise`` (itself verified against the
parallel and recurrent forms, which mirror the reference math at
``xlstm/blocks/mlstm/backends.py:9-263``).

Design:
  * grid = (NS, BNH/G): the chunk index is the OUTER grid dim and the
    head-group row the INNER one, so consecutive grid steps touch different
    rows and are data-independent — the sequential (C, n, m) dependency only
    binds steps that are BNH/G apart, letting Mosaic's pipeline overlap DMA
    and MXU work. All rows' states live in one VMEM scratch array
    ((BNH, DH, DH) fp32 ≈ 0.25 MB for ViL-sized heads), indexed per step.
  * G heads are processed per grid step (ViL head dims are small —
    qkv_block_size 4..16 — so per-head matmuls are thin; packing G heads per
    step amortizes grid overhead). Matmuls are unrolled 2D dots: Mosaic's
    batched dot_general lowering emits a contraction form it rejects.
  * one pass over HBM: q/k/v/gates stream in chunk blocks, h streams out; no
    (CS × CS) D-matrices or per-chunk states ever touch HBM (XLA's version
    of the native form materializes all of them).
  * matmul inputs default to bf16 (single MXU pass, fp32 accumulation) —
    the same trade the reference makes with autocast_kernel_dtype=bfloat16;
    gate/exp math is always fp32 on the VPU. ``mxu_dtype="float32"`` forces
    full-precision MXU passes for parity tests.
  * backward: custom_vjp recomputes through the native jnp chunkwise form
    (rematerialization — the standard trade of FLOPs for HBM on TPU).

Performance status (v5e, B8 NH32 S6400 DH16, CS128): 14.9 ms vs XLA's
batched-einsum native form at 11.8 ms — the fused kernel wins on HBM traffic
but loses more to grid serialization and thin-DH MXU padding; the module
default therefore stays on the native backend (nn/vil.py MatrixLSTMCell
"auto"). Remaining headroom: emit per-head matmuls as one block-diagonal
MXU pass, and double-buffer the (C, n, m) scratch to overlap state updates.

Known Mosaic pitfalls worked around here (see git history for repros):
  * no cumsum primitive -> tril-ones matmul;
  * (G,1,1)->(G,DH,DH) broadcast must be staged through an exp;
  * slicing the last sublane while scratch-RMW crashes lowering -> btot
    computed as a sum instead of b[CS-1].

Args match mlstm_chunkwise: q/k/v (B, NH, S, DH), gates (B, NH, S).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlstm_native import mlstm_chunkwise

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, i_ref, f_ref, h_ref, c_scr, n_scr, m_scr, *,
            g, cs, dh, igate_act, eps, mxu):
    j = pl.program_id(0)  # chunk index (outer, sequential dependency)
    r = pl.program_id(1)  # head-group row (inner, independent)
    row0 = r * g

    # fp32 MXU inputs still multiply in bf16 under default precision; HIGHEST
    # forces true fp32 passes when mxu == float32 (parity-test mode)
    prec = jax.lax.Precision.HIGHEST if mxu == jnp.float32 else jax.lax.Precision.DEFAULT

    def bdot(a, b, transpose_b=False):
        outs = []
        for gi in range(g):
            rhs = b[gi].T if transpose_b else b[gi]
            outs.append(jnp.dot(a[gi].astype(mxu), rhs.astype(mxu),
                                preferred_element_type=jnp.float32, precision=prec))
        return jnp.stack(outs)

    @pl.when(j == 0)
    def _reset():
        c_scr[pl.ds(row0, g)] = jnp.zeros((g, dh, dh), jnp.float32)
        n_scr[pl.ds(row0, g)] = jnp.zeros((g, 1, dh), jnp.float32)
        m_scr[pl.ds(row0, g)] = jnp.zeros((g, 1, 1), jnp.float32)

    q = q_ref[:].astype(jnp.float32) * (dh**-0.5)  # (G, CS, DH)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    i_pre = i_ref[:].astype(jnp.float32)  # (G, CS, 1)
    f_pre = f_ref[:].astype(jnp.float32)

    logf = jax.nn.log_sigmoid(f_pre)  # (G, CS, 1)
    logi = jax.nn.log_sigmoid(i_pre) if igate_act == "sigmoid" else i_pre
    # inclusive cumsum via tril-ones matmul (Mosaic has no cumsum primitive);
    # fp32 MXU path: gate accumulation must not round to bf16.
    row_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    causal = row_i >= col_i
    tril = causal.astype(jnp.float32)
    # precision=HIGHEST: the MXU's default single-pass bf16 rounding on this
    # fp32 matmul corrupts the log-space gate accumulation (errors get
    # exponentiated downstream — observed 0.1-0.4 absolute h error otherwise)
    b = jnp.stack([
        jnp.dot(tril, logf[gi], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        for gi in range(g)
    ])  # (G, CS, 1)
    # btot == b[CS-1], but computed as a sum: slicing the last sublane while
    # also doing scratch RMW crashes Mosaic ("Check failed: d >> 32 == 0")
    btot = jnp.sum(logf, axis=1, keepdims=True)  # (G, 1, 1)

    c_prev = c_scr[pl.ds(row0, g)]  # (G, DH, DH)
    n_prev = n_scr[pl.ds(row0, g)]  # (G, 1, DH)
    m_prev = m_scr[pl.ds(row0, g)]  # (G, 1, 1)

    # ---- intra-chunk D matrix ----------------------------------------------
    # rowwise max of log_d equals b_s + cummax_t<=s(logi_t - b_t): a cheap
    # sublane cumulative max (log2(CS) roll+max steps) replaces the full
    # (CS, CS) materialize-and-reduce.
    w_vec = logi - b  # (G, CS, 1)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (g, cs, 1), 1)
    cm = w_vec
    sh = 1
    while sh < cs:
        rolled = pltpu.roll(cm, shift=sh, axis=1)
        rolled = jnp.where(sub_ids >= sh, rolled, NEG_INF)
        cm = jnp.maximum(cm, rolled)
        sh *= 2
    d_max = b + cm  # (G, CS, 1)

    inter_decay_log = m_prev + b  # (G, CS, 1)
    stab = jnp.maximum(d_max, inter_decay_log)

    # log_d[s, t] = (b_s - stab_s) + (logi_t - b_t): column + row broadcast;
    # mask BEFORE exp (the t > s half can overflow)
    arg = (b - stab) + jnp.swapaxes(w_vec, 1, 2)  # (G, CS, CS)
    arg = jnp.where(causal[None], arg, NEG_INF)
    qk = bdot(q, k, transpose_b=True)  # (G, CS, CS)
    e = qk * jnp.exp(arg)

    q_inter = q * jnp.exp(inter_decay_log - stab)  # (G, CS, DH)
    inter_num = bdot(q_inter, c_prev)  # (G, CS, DH)
    inter_norm = jnp.sum(q_inter * n_prev, axis=2, keepdims=True)  # (G, CS, 1)

    normalizer = jnp.maximum(
        jnp.abs(jnp.sum(e, axis=2, keepdims=True) + inter_norm), jnp.exp(-stab)
    ) + eps
    intra_num = bdot(e, v)  # (G, CS, DH)
    h_ref[:] = ((intra_num + inter_num) / normalizer).astype(h_ref.dtype)

    # ---- inter-chunk state update --------------------------------------------
    g_acc = logi + (btot - b)  # (G, CS, 1)
    m_loc = jnp.max(g_acc, axis=1, keepdims=True)  # (G, 1, 1)
    gw = jnp.exp(g_acc - m_loc)  # (G, CS, 1)
    kg = k * gw
    kv = bdot(jnp.swapaxes(kg, 1, 2), v)  # (G, DH, DH)
    ksum = jnp.sum(kg, axis=1, keepdims=True)  # (G, 1, DH)

    m_new = jnp.maximum(btot + m_prev, m_loc)  # (G, 1, 1)
    decay_old = jnp.exp(btot + m_prev - m_new)
    decay_new = jnp.exp(m_loc - m_new)
    # Mosaic can't broadcast (G,1,1)->(G,DH,DH) in one shot (sublane+lane);
    # materialize the sublane expansion through the exp so it can't be fused
    # back into a single two-axis broadcast.
    decay_old_c = jnp.exp(jnp.broadcast_to(btot + m_prev - m_new, (g, dh, 1)))
    decay_new_c = jnp.exp(jnp.broadcast_to(m_loc - m_new, (g, dh, 1)))
    c_scr[pl.ds(row0, g)] = c_prev * decay_old_c + kv * decay_new_c
    n_scr[pl.ds(row0, g)] = n_prev * decay_old + ksum * decay_new
    m_scr[pl.ds(row0, g)] = m_new


def _pick_group(bnh: int, cs: int, dh: int) -> int:
    """Heads per grid step, bounded by a VMEM budget for the (CS, CS)
    temporaries (arg/e/qk + bdot stacks; ~4 live CS x CS fp32 arrays after
    the cummax rewrite). Empirically G=8 at CS=128 is the sweet spot;
    G>=16 at CS=128 exceeds VMEM."""
    budget = 4 * 1024 * 1024
    per_head = (4 * cs * cs + 10 * cs * dh + 2 * dh * dh) * 4
    g = max(1, min(bnh, budget // max(per_head, 1)))
    while bnh % g != 0:
        g -= 1
    return g


def _mlstm_pallas_fwd_impl(q, k, v, i_preact, f_preact, chunk_size, igate_act, eps,
                           interpret=False, mxu_dtype="bfloat16"):
    B, NH, S, DH = q.shape
    CS = chunk_size
    assert S % CS == 0, f"S={S} must be divisible by chunk_size={CS}"
    NS = S // CS
    BNH = B * NH
    G = _pick_group(BNH, CS, DH)
    mxu = jnp.bfloat16 if mxu_dtype == "bfloat16" else jnp.float32

    qf = q.reshape(BNH, S, DH)
    kf = k.reshape(BNH, S, DH)
    vf = v.reshape(BNH, S, DH)
    i2 = i_preact.reshape(BNH, S, 1)
    f2 = f_preact.reshape(BNH, S, 1)

    qkv_spec = pl.BlockSpec((G, CS, DH), lambda j, r: (r, j, 0), memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec((G, CS, 1), lambda j, r: (r, j, 0), memory_space=pltpu.VMEM)

    h = pl.pallas_call(
        functools.partial(_kernel, g=G, cs=CS, dh=DH, igate_act=igate_act, eps=eps, mxu=mxu),
        grid=(NS, BNH // G),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, gate_spec, gate_spec],
        out_specs=pl.BlockSpec((G, CS, DH), lambda j, r: (r, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BNH, S, DH), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BNH, DH, DH), jnp.float32),
            pltpu.VMEM((BNH, 1, DH), jnp.float32),
            pltpu.VMEM((BNH, 1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * BNH * NS * (2 * CS * CS * DH + 2 * CS * DH * DH),
            bytes_accessed=BNH * S * DH * 4 * 4,
            transcendentals=BNH * S * (CS + 4),
        ),
        interpret=interpret,
    )(qf, kf, vf, i2, f2)
    return h.reshape(B, NH, S, DH)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _mlstm_pallas(q, k, v, i_preact, f_preact, chunk_size, igate_act, eps, interpret, mxu_dtype):
    return _mlstm_pallas_fwd_impl(q, k, v, i_preact, f_preact, chunk_size, igate_act, eps,
                                  interpret, mxu_dtype)


def _fwd(q, k, v, i_preact, f_preact, chunk_size, igate_act, eps, interpret, mxu_dtype):
    h = _mlstm_pallas_fwd_impl(q, k, v, i_preact, f_preact, chunk_size, igate_act, eps,
                               interpret, mxu_dtype)
    return h, (q, k, v, i_preact, f_preact)


def _bwd(chunk_size, igate_act, eps, interpret, mxu_dtype, res, g):
    q, k, v, i_preact, f_preact = res

    def f(q, k, v, i_, f_):
        return mlstm_chunkwise(
            q, k, v, i_, f_, chunk_size=chunk_size, igate_act=igate_act, eps=eps
        )

    _, vjp = jax.vjp(f, q, k, v, i_preact, f_preact)
    dq, dk, dv, di, df = vjp(g.astype(jnp.float32))
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        di.astype(i_preact.dtype), df.astype(f_preact.dtype),
    )


_mlstm_pallas.defvjp(_fwd, _bwd)


def mlstm_chunkwise_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    i_preact: jnp.ndarray,
    f_preact: jnp.ndarray,
    chunk_size: int = 64,
    igate_act: str = "exp",
    eps: float = 1e-6,
    interpret: bool | None = None,
    mxu_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """Fused chunkwise mLSTM. On non-TPU backends runs the kernel in
    interpreter mode (slow; for correctness tests) unless interpret=False,
    in which case it falls back to the native jnp form."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if jax.default_backend() == "tpu":
        interpret = False
    elif interpret is False:
        return mlstm_chunkwise(q, k, v, i_preact, f_preact, chunk_size=chunk_size,
                               igate_act=igate_act, eps=eps)
    return _mlstm_pallas(q, k, v, i_preact, f_preact, chunk_size, igate_act, eps,
                         interpret, mxu_dtype)
