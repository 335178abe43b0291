"""Fused chunkwise mLSTM — Pallas TPU kernel.

TPU-native replacement for the reference's external Triton kernel
(``mlstm_kernels`` ``chunkwise--triton_xl_chunk[_siging]``, selected at
``nn/modules/vision_lstm/vision_lstm2.py:818-877``). Golden model:
``kernels/mlstm_native.mlstm_chunkwise`` (itself verified against the
parallel and recurrent forms, which mirror the reference math at
``xlstm/blocks/mlstm/backends.py:9-263``).

Design (v3 — row-resident, segmented):
  * grid = (BNH/G, NSEG): one grid step per (head-group, sequence segment);
    each step loops over its segment's chunks with a ``fori_loop`` INSIDE
    the kernel. v1 used a (NS, BNH/G) grid — one launch per (chunk, row)
    pair — and drowned in per-step overhead (12,800 steps x ~4 us ≈ 51 ms
    at ViL-P3 size). Segmenting (vs one whole-sequence step per row) frees
    VMEM so G can reach 16, which widens every stacked VPU op.
  * (C, n, m) states live in VMEM scratch (G, DH, DH) and persist across a
    row's segment steps (row-major grid order); they never touch HBM.
  * G heads are processed per step (ViL head dims are small —
    qkv_block_size 4..16 — so per-head matmuls are thin; packing G heads
    amortizes further). Matmuls are unrolled 2D dots: Mosaic's batched
    dot_general lowering emits a contraction form it rejects.
  * one pass over HBM: q/k/v/gates stream in row blocks, h streams out; no
    (CS x CS) D-matrices or per-chunk states ever touch HBM (XLA's version
    of the native form materializes all of them — ~20 GB of traffic at
    ViL-P3/batch-128 size, a >25 ms floor).
  * matmul inputs default to bf16 (single MXU pass, fp32 accumulation) —
    the same trade the reference makes with autocast_kernel_dtype=bfloat16;
    gate/exp math is always fp32 on the VPU. ``mxu_dtype="float32"`` forces
    full-precision MXU passes for parity tests.
  * backward: custom_vjp recomputes through the native jnp chunkwise form
    (rematerialization — the standard trade of FLOPs for HBM on TPU).

Performance (v5e, loop-carried inputs so nothing hoists; flagship shapes,
qkv_block_size 64 -> DH 64; b128 bf16; FULL ViLBlockPair stage = kernel +
remaining XLA ops):
  stage   v1 cell-fused   v2 block-fused   v3 layer-fused
  P3        18.0 ms          15.6 ms          13.0 ms
  P4        12.2 ms          11.6 ms           9.9 ms
  P5         8.5 ms           8.9 ms           7.7 ms
ViL-YOLO-n e2e 640px b128 (preproc->NMS, fused BN): 40.2 ms = 3,187 img/s;
batch 256 sustained: 3,282 img/s (yolov8n: 4,992).
Ablation (P3, on-chip): the kernel is DMA-bound — pure streaming of the
activation planes runs ~100-130 GB/s at these block shapes regardless of
(BB, SEG, semantics, scratch); batched projections and per-bi stacking are
~free; chunk math adds ~28%. Hence v3: stream only x + conv_act and
recompute everything else on-chip.

Round-2 follow-up ablations (all measured on the assigned v5e, loop-carried
single-layer harness; kept as the engineering record for future rounds):
  * DMA and compute DO NOT OVERLAP on this part, at all: kernel time is
    exactly io + compute for every variant tested — the BlockSpec pipeline
    (default double buffering; buffer_count>2 and use_lookahead are
    rejected by the XLA pipeline emitter), AND a fully manual ping-pong
    make_async_copy pipeline (prefetch t+1 issued before compute of t)
    measured additive to the nanosecond (copy 3.76 ms + 3.74 ms of chained
    dots = 7.75 ms observed). Design rule here: minimize bytes + flops,
    not max(bytes, flops).
  * Streaming rate is flat in block size: 1-26 MB blocks all run ~170 GB/s
    single-stream, ~150 GB/s effective for the 3-stream mix (99 GB/s on
    nominal bytes at P3 — DIM=64 planes are lane-padded to 128 in HBM, so
    the x/out streams physically move 2x their nominal bytes).
  * Dot-restructure attempt ("v5": gate weights folded into the cv/xm
    projections, batched b-cumsum, merged intra+inter dots, single output
    GEMM, per-g operands sliced instead of stacked): 8.8 ms vs v3's 7.95 —
    the per-g slice/concat relayouts cost more than the dots they save;
    v3's stack-once layout stands.

Layout studies (measured on-chip, kept for the record — git history has the
implementations):
  * activation-natural I/O with in-kernel (CS, G*DH) XLU transposes:
    kernel 5.3 -> 8.5 ms at P3 (bf16 AND fp32 transposes are slow at this
    rate: 4 per chunk x 25 chunks x 128 rows);
  * row-form math (un-transposed equations, per-head 64-aligned lane
    slices, operand transposes absorbed into MXU dimension numbers):
    10.2 ms at P3 — lane extracts/concats per row cost more than the
    XLA-side relayout copies they replace.
  The transposed-resident layout wins: sequence on lanes makes every gate
  vector broadcast free, and the XLA-side entry/exit relayouts (~4.5 ms per
  step at P3, profiled) are cheaper than moving the reorientation on-chip.
  (The in-kernel q/k/v "NT"-form projection fusion this paragraph once
  proposed became the v2/v3 kernels above.) Remaining known lever: DIM=64
  activation planes are lane-padded to 128 in HBM, so the x/out streams
  move 2x their nominal bytes — eliminating that needs either a transposed
  (B, DIM, S) residual stream through the whole block graph or packed
  (S/2, 128) I/O with a permuted chunk order; both trade in-kernel
  shuffles (measured slow on this part) against the stream tax, est. ceiling
  ~+10-15% e2e.

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


def _chunk_math(qt, kt, vt, i_pre, f_pre, c_prev, n_prev, m_prev, *,
                g, cs, dh, igate_act, eps, mxu, causal_t, cum_mat, lane_ids):
    """The transposed-layout chunkwise step on VMEM-resident values:
    inputs (G, DH, CS) q/k/v (q pre-scaled by dh^-0.5), (G, 1, CS) gate
    preacts, (G, DH, DH)/(G, DH, 1)/(G, 1, 1) carried states. Returns
    (hT, c_new, n_new, m_new). Shared by every kernel entry."""
    # NOTE: Precision.HIGHEST on these thin transposed dots miscompiles in
    # Mosaic (observed 0.8 abs error on v5e vs 2e-3 at DEFAULT; HIGH is
    # unsupported). fp32 mode therefore only keeps OPERANDS un-truncated;
    # the MXU pass itself stays DEFAULT. Interpret mode (CPU parity tests)
    # is exact regardless.
    def dot32(a, b):
        return jnp.dot(a.astype(mxu), b.astype(mxu),
                       preferred_element_type=jnp.float32)

    logf = jax.nn.log_sigmoid(f_pre)  # (G, 1, CS)
    logi = jax.nn.log_sigmoid(i_pre) if igate_act == "sigmoid" else i_pre
    # precision=HIGHEST: bf16 rounding on this fp32 matmul corrupts the
    # log-space gate accumulation (errors get exponentiated downstream)
    b = jnp.stack([
        jnp.dot(logf[gi], cum_mat, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        for gi in range(g)
    ])  # (G, 1, CS) inclusive cumsum over lanes
    btot = jnp.sum(logf, axis=2, keepdims=True)  # (G, 1, 1)

    # rowwise max of log_d equals b_s + cummax_{t<=s}(logi_t - b_t): a
    # lane cumulative max (log2(CS) roll+max) replaces materializing and
    # reducing the (CS, CS) matrix.
    w_vec = logi - b  # (G, 1, CS)
    cm = w_vec
    sh = 1
    while sh < cs:
        rolled = pltpu.roll(cm, shift=sh, axis=2)
        rolled = jnp.where(lane_ids >= sh, rolled, NEG_INF)
        cm = jnp.maximum(cm, rolled)
        sh *= 2
    d_max = b + cm  # (G, 1, CS)

    inter_decay_log = m_prev + b  # (G, 1, CS)
    stab = jnp.maximum(d_max, inter_decay_log)

    q_inter = qt * jnp.exp(inter_decay_log - stab)  # (G, DH, CS) lane-scaled
    g_acc = logi + (btot - b)  # (G, 1, CS)
    m_loc = jnp.max(g_acc, axis=2, keepdims=True)  # (G, 1, 1)
    gw = jnp.exp(g_acc - m_loc)  # (G, 1, CS)

    m_new = jnp.maximum(btot + m_prev, m_loc)
    decay_old = jnp.exp(btot + m_prev - m_new)  # (G, 1, 1)
    decay_new = jnp.exp(m_loc - m_new)
    # Mosaic can't broadcast (G,1,1)->(G,DH,DH) in one shot (sublane+
    # lane); materialize the sublane expansion through the exp so it
    # can't be fused back into a single two-axis broadcast.
    decay_old_c = jnp.exp(jnp.broadcast_to(btot + m_prev - m_new, (g, dh, 1)))
    decay_new_c = jnp.exp(jnp.broadcast_to(m_loc - m_new, (g, dh, 1)))

    hT_out, e_sums, kvs, ksums = [], [], [], []
    w_col = jnp.swapaxes(w_vec, 1, 2)  # (G, CS, 1)
    b_stab = b - stab  # (G, 1, CS)
    for gi in range(g):
        # transposed D, built per head so only ~2 (CS, CS) temporaries are
        # live at once (keeps VMEM independent of G):
        # argT[t, s] = w_t + (b_s - stab_s); mask BEFORE exp
        argT = jnp.where(causal_t, w_col[gi] + b_stab[gi], NEG_INF)
        # eT = (q k^T * D)^T = k^T q * D^T: contraction over DH sublanes
        eT = dot32(kt[gi].T, qt[gi]) * jnp.exp(argT)  # (CS_t, CS_s)
        # intra numerator, transposed: v^T e^T -> (DHv, CS_s)
        intra = dot32(vt[gi], eT)
        # inter numerator, transposed: C^T q_inter -> (DHv, CS_s)
        inter = dot32(c_prev[gi], q_inter[gi])
        e_sums.append(jnp.sum(eT, axis=0, keepdims=True))  # (1, CS_s)
        hT_out.append(intra + inter)
        kg = kt[gi] * gw[gi]  # (DHq, CS)
        kvs.append(dot32(vt[gi], kg.T))  # C^T update: (DHv, DHq)
        ksums.append(jnp.sum(kg, axis=1, keepdims=True))  # (DHq, 1)

    e_sum = jnp.stack(e_sums)  # (G, 1, CS)
    inter_norm = jnp.sum(q_inter * n_prev, axis=1, keepdims=True)  # (G, 1, CS)
    normalizer = jnp.maximum(jnp.abs(e_sum + inter_norm), jnp.exp(-stab)) + eps
    hT = jnp.stack(hT_out) / normalizer  # (G, DH, CS) / (G, 1, CS)

    c_new = c_prev * decay_old_c + jnp.stack(kvs) * decay_new_c
    n_new = n_prev * decay_old + jnp.stack(ksums) * decay_new
    return hT, c_new, n_new, m_new


def _kernel(q_ref, k_ref, v_ref, i_ref, f_ref, h_ref, c_scr, n_scr, m_scr, *,
            g, ns, cs, dh, igate_act, eps, mxu):
    """One grid step = G head-rows, full sequence; chunk loop inside.

    All refs use the TRANSPOSED (G, DH, S) layout (sequence on the lane
    dimension): a (G, S, DH<=16) block would pad its 16 lanes to 128 and
    inflate VMEM 8x (observed: 43.8 MB scoped demand at ViL-P3 size). The
    math below is the standard chunkwise form with every equation
    transposed; positions live on lanes, head-dims on sublanes.
    """
    # loop-invariant constants; s = output position, t = source position
    t_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    causal_t = t_i <= s_i  # eT[t, s] mask (transposed causal)
    # inclusive lane-cumsum as a matmul: b[s] = sum_{t<=s} logf[t]
    cum_mat = causal_t.astype(jnp.float32)  # upper-triangular ones
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (g, 1, cs), 2)

    # states persist across a row's SEGMENT steps (grid dim 1, row-major
    # order); reset them at the first segment of each row
    @pl.when(pl.program_id(1) == 0)
    def _reset():
        c_scr[:] = jnp.zeros((g, dh, dh), jnp.float32)   # C^T: (DHv, DHq)
        n_scr[:] = jnp.zeros((g, dh, 1), jnp.float32)    # n: (DHq, 1)
        m_scr[:] = jnp.zeros((g, 1, 1), jnp.float32)

    def chunk_body(j, _):
        s0 = j * cs
        qt = q_ref[:, :, pl.ds(s0, cs)].astype(jnp.float32) * (dh**-0.5)  # (G, DH, CS)
        kt = k_ref[:, :, pl.ds(s0, cs)].astype(jnp.float32)
        vt = v_ref[:, :, pl.ds(s0, cs)].astype(jnp.float32)
        i_pre = i_ref[:, :, pl.ds(s0, cs)].astype(jnp.float32)  # (G, 1, CS)
        f_pre = f_ref[:, :, pl.ds(s0, cs)].astype(jnp.float32)

        hT, c_new, n_new, m_new = _chunk_math(
            qt, kt, vt, i_pre, f_pre, c_scr[:], n_scr[:], m_scr[:],
            g=g, cs=cs, dh=dh, igate_act=igate_act, eps=eps, mxu=mxu,
            causal_t=causal_t, cum_mat=cum_mat, lane_ids=lane_ids)
        h_ref[:, :, pl.ds(s0, cs)] = hT.astype(h_ref.dtype)

        c_scr[:] = c_new
        n_scr[:] = n_new
        m_scr[:] = m_new
        return 0

    jax.lax.fori_loop(0, ns, chunk_body, 0)


def _pick_layout(bnh: int, s: int, cs: int, dh: int, in_bytes: int) -> tuple:
    """(G, NSEG): heads per grid step and sequence segments, under a VMEM
    budget (~16 MB/core on v5e).

    Resident per head-row (transposed (DH, SEG) layout — no lane padding):
    one q/k/v/gate/h segment double-buffered by Mosaic's pipeline, plus
    ~3 live (CS, CS) fp32 chunk temporaries.  Splitting the sequence into
    segments (states carried across a row's segment steps in scratch) lets
    G grow — bigger G means wider VPU ops and fewer thin-matmul stalls."""
    budget = 10 * 1024 * 1024
    sub = max(dh, 8)
    ns = s // cs
    best = (1, 1)
    best_key = (-1, 0)
    # (CS, CS) temporaries are per-HEAD transients (built inside the head
    # loop), so they cost a constant ~3 live buffers, not x G
    temps = (3 * cs * cs + 12 * cs * sub + 3 * dh * dh) * 4
    for nseg in range(1, ns + 1):
        if ns % nseg:
            continue
        seg = s // nseg
        stream = 2 * (3 * seg * sub * in_bytes + 2 * seg * 8 * 4 + seg * sub * 4)
        # G cap 32: measured P3 (B128 NH8 S6400) 20.3 -> 19.0 ms over G=16
        # (wider VPU ops); G=64 fails to fit/compile. The budget model is
        # accurate (predicted 19.3M vs Mosaic's observed 19.8M at the G=32
        # seg=1280 OOM config), so small-seg G=32 layouts stay in VMEM.
        g = max(1, min(bnh, min(32, (budget - temps) // max(stream, 1))))
        while bnh % g != 0:
            g -= 1
        steps = (bnh // g) * nseg
        key = (g, -steps)
        if key > best_key:
            best_key = key
            best = (g, nseg)
    return best


def _mlstm_pallas_t_impl(qf, kf, vf, i2, f2, chunk_size, igate_act, eps,
                         interpret=False, mxu_dtype="bfloat16", out_dtype=None):
    """Layout-native entry: q/k/v (BNH, DH, S), gates (BNH, 1, S) ->
    h (BNH, DH, S). No HBM relayouts — the caller's producers (headwise
    projection einsums) emit this layout directly."""
    BNH, DH, S = qf.shape
    CS = chunk_size
    assert S % CS == 0, f"S={S} must be divisible by chunk_size={CS}"
    NS = S // CS
    G, NSEG = _pick_layout(BNH, S, CS, DH, qf.dtype.itemsize)
    SEG = S // NSEG
    mxu = jnp.bfloat16 if mxu_dtype == "bfloat16" else jnp.float32
    out_dtype = out_dtype or qf.dtype

    qkv_spec = pl.BlockSpec((G, DH, SEG), lambda r, t: (r, 0, t), memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec((G, 1, SEG), lambda r, t: (r, 0, t), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, g=G, ns=SEG // CS, cs=CS, dh=DH, igate_act=igate_act,
                          eps=eps, mxu=mxu),
        grid=(BNH // G, NSEG),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, gate_spec, gate_spec],
        out_specs=pl.BlockSpec((G, DH, SEG), lambda r, t: (r, 0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BNH, DH, S), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((G, DH, DH), jnp.float32),
            pltpu.VMEM((G, DH, 1), jnp.float32),
            pltpu.VMEM((G, 1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * BNH * NS * (2 * CS * CS * DH + 2 * CS * DH * DH),
            bytes_accessed=BNH * S * (DH * 3 * qf.dtype.itemsize + DH * 4 + 8),
            transcendentals=BNH * S * (CS + 4),
        ),
        interpret=interpret,
    )(qf, kf, vf, i2, f2)


def _mlstm_pallas_fwd_impl(q, k, v, i_preact, f_preact, chunk_size, igate_act, eps,
                           interpret=False, mxu_dtype="bfloat16"):
    B, NH, S, DH = q.shape
    BNH = B * NH
    # transposed (BNH, DH, S) layout: sequence on lanes (no 8x lane padding
    # for DH <= 16 head dims); XLA fuses these transposes with the
    # producers/consumers (the cell's (B,S,NH,DH)->(B,NH,S,DH) moves).
    qf = q.reshape(BNH, S, DH).swapaxes(1, 2)
    kf = k.reshape(BNH, S, DH).swapaxes(1, 2)
    vf = v.reshape(BNH, S, DH).swapaxes(1, 2)
    i2 = i_preact.reshape(BNH, 1, S)
    f2 = f_preact.reshape(BNH, 1, S)
    h = _mlstm_pallas_t_impl(qf, kf, vf, i2, f2, chunk_size, igate_act, eps,
                             interpret, mxu_dtype, out_dtype=jnp.float32)
    return h.swapaxes(1, 2).reshape(B, NH, S, DH)


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
    if v.shape[-1] == q.shape[-1]:
        # fused reverse-streaming Pallas backward (frozen-stabilizer
        # gradients — see kernels/mlstm_bwd.py for the convention and the
        # autograd-equivalence proof)
        from .mlstm_pallas_bwd import mlstm_chunkwise_pallas_bwd

        grads = mlstm_chunkwise_pallas_bwd(
            q, k, v, i_preact, f_preact, g, chunk_size=chunk_size,
            igate_act=igate_act, eps=eps, interpret=interpret,
            mxu_dtype=mxu_dtype)
    else:
        # rectangular heads (DQK != DV): explicit golden-jnp gradients
        from .mlstm_bwd import mlstm_chunkwise_bwd_ref

        grads = mlstm_chunkwise_bwd_ref(
            q, k, v, i_preact, f_preact, g, chunk_size=chunk_size,
            igate_act=igate_act, eps=eps)
    # cotangent dtypes must match each primal's dtype (bf16 activations
    # stream through the train step; the bwd kernel computes in fp32)
    return tuple(gr.astype(p.dtype) for gr, p in
                 zip(grads, (q, k, v, i_preact, f_preact)))


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
    S = q.shape[2]
    cs = min(chunk_size, S)
    if not interpret:
        # Mosaic lane slices must be 128-aligned; snap the chunk to a
        # 128-multiple (padding below absorbs any S mismatch)
        cs = max(128, (cs // 128) * 128)
    pad = (-S) % cs
    if pad:
        # pad to a chunk multiple: padded steps get i-gate -> 0 (no write into
        # the state) and f-gate -> 1 (no decay), so real positions are exact;
        # padded outputs are sliced off.
        padw = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, padw)
        k = jnp.pad(k, padw)
        v = jnp.pad(v, padw)
        i_preact = jnp.pad(i_preact, padw[:3], constant_values=-40.0)
        f_preact = jnp.pad(f_preact, padw[:3], constant_values=40.0)
    h = _mlstm_pallas(q, k, v, i_preact, f_preact, cs, igate_act, eps,
                      interpret, mxu_dtype)
    return h[:, :, :S] if pad else h


# ---------------------------------------------------------------------------
# Layout-native entry: (B, NH, DH, S) in / out.
#
# The ViL cell's headwise projections emit the kernel's transposed layout
# directly (einsum "bsnd,nod->bnos"), so q/k/v never take an HBM relayout on
# the way in, and h comes back in the same layout for an on-layout outnorm.
# On this host's ~300 GB/s effective HBM that removes ~2.5 GB of pure
# transpose traffic per ViL-P3 layer (measured 31 -> ~23 ms, e2e profile).
# Backward transposes to the natural layout and reuses the fused reverse-
# streaming backward kernel (train-only cost).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _mlstm_pallas_t(q_t, k_t, v_t, i2, f2, chunk_size, igate_act, eps, interpret, mxu_dtype):
    return _mlstm_pallas_t_impl(q_t, k_t, v_t, i2, f2, chunk_size, igate_act, eps,
                                interpret, mxu_dtype)


def _fwd_t(q_t, k_t, v_t, i2, f2, chunk_size, igate_act, eps, interpret, mxu_dtype):
    h = _mlstm_pallas_t_impl(q_t, k_t, v_t, i2, f2, chunk_size, igate_act, eps,
                             interpret, mxu_dtype)
    return h, (q_t, k_t, v_t, i2, f2)


def _bwd_t(chunk_size, igate_act, eps, interpret, mxu_dtype, res, g):
    q_t, k_t, v_t, i2, f2 = res
    BNH, DH, S = q_t.shape
    # q/k/v share one BlockSpec in the transposed entry, so DHq == DHv by
    # construction — the fused reverse-streaming backward always applies;
    # the layout-native entry feeds it without any relayout copies
    from .mlstm_pallas_bwd import mlstm_chunkwise_pallas_bwd_t

    dq, dk, dv, di, df = mlstm_chunkwise_pallas_bwd_t(
        q_t.reshape(1, BNH, DH, S), k_t.reshape(1, BNH, DH, S),
        v_t.reshape(1, BNH, DH, S), i2.reshape(1, BNH, S),
        f2.reshape(1, BNH, S), g.reshape(1, BNH, DH, S),
        chunk_size=chunk_size, igate_act=igate_act,
        eps=eps, interpret=interpret, mxu_dtype=mxu_dtype)
    back = lambda x, p: x.reshape(BNH, DH, S).astype(p.dtype)
    return (back(dq, q_t), back(dk, k_t), back(dv, v_t),
            di.reshape(BNH, 1, S).astype(i2.dtype), df.reshape(BNH, 1, S).astype(f2.dtype))


_mlstm_pallas_t.defvjp(_fwd_t, _bwd_t)


def mlstm_chunkwise_pallas_t(
    q_t: jnp.ndarray,
    k_t: jnp.ndarray,
    v_t: jnp.ndarray,
    i_preact: jnp.ndarray,
    f_preact: jnp.ndarray,
    chunk_size: int = 64,
    igate_act: str = "exp",
    eps: float = 1e-6,
    interpret: bool | None = None,
    mxu_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """Fused chunkwise mLSTM, transposed layout: q/k/v (B, NH, DH, S),
    gate preacts (B, NH, S) -> h (B, NH, DH, S) in the input dtype.

    On non-TPU backends falls back to the native jnp chunkwise form (with
    the layout moves XLA-CPU handles fine); on TPU it is the zero-relayout
    fast path used by the ViL cell."""
    B, NH, DH, S = q_t.shape
    if jax.default_backend() != "tpu" and not interpret:
        cs = min(chunk_size, S)
        while S % cs:
            cs //= 2
        q = q_t.swapaxes(2, 3)
        h = mlstm_chunkwise(q, k_t.swapaxes(2, 3), v_t.swapaxes(2, 3), i_preact, f_preact,
                            chunk_size=cs, igate_act=igate_act, eps=eps)
        return h.swapaxes(2, 3).astype(q_t.dtype)
    cs = max(128, (min(chunk_size, S) // 128) * 128)
    pad = (-S) % cs
    if pad:
        padw = ((0, 0), (0, 0), (0, 0), (0, pad))
        q_t = jnp.pad(q_t, padw)
        k_t = jnp.pad(k_t, padw)
        v_t = jnp.pad(v_t, padw)
        i_preact = jnp.pad(i_preact, ((0, 0), (0, 0), (0, pad)), constant_values=-40.0)
        f_preact = jnp.pad(f_preact, ((0, 0), (0, 0), (0, pad)), constant_values=40.0)
    Sp = S + pad
    qf = q_t.reshape(B * NH, DH, Sp)
    kf = k_t.reshape(B * NH, DH, Sp)
    vf = v_t.reshape(B * NH, DH, Sp)
    i2 = i_preact.reshape(B * NH, 1, Sp)
    f2 = f_preact.reshape(B * NH, 1, Sp)
    h = _mlstm_pallas_t(qf, kf, vf, i2, f2, cs, igate_act, eps, bool(interpret), mxu_dtype)
    h = h.reshape(B, NH, DH, Sp)
    return h[..., :S] if pad else h


# ---------------------------------------------------------------------------
# Fully-fused ViL cell entry: the headwise q/k/v projections AND the gate
# dots move INTO the kernel. Inputs are the activation-natural conv branch
# (post-silu) and the raw mLSTM branch; per batch element the block-diagonal
# projection runs as one "NT"-form dot_general (contraction over the lane
# dim of the natural chunk), emitting q/k/v directly in the kernel's
# transposed (G, DH, CS) layout on-chip. This deletes every q/k/v HBM
# round-trip: the separate projection outputs, their relayout copies, and
# the 3x gate re-read (~2.7 GB at ViL-P3 b128 on a ~300 GB/s part).
# Backward: custom_vjp recomputes through the unfused composite (projection
# einsums + the _t entry, which carries the fused reverse-streaming
# backward kernel), so training reuses the existing fast bwd path.
# ---------------------------------------------------------------------------

def _kernel_vil_fused(conv_ref, xm_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
                      bv_ref, wgi_ref, bgi_ref, wgf_ref, bgf_ref, h_ref,
                      c_scr, n_scr, m_scr, *, bb, nh, ns, cs, dh, inner,
                      igate_act, eps, mxu):
    g = bb * nh

    t_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    causal_t = t_i <= s_i
    cum_mat = causal_t.astype(jnp.float32)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (g, 1, cs), 2)

    @pl.when(pl.program_id(1) == 0)
    def _reset():
        c_scr[:] = jnp.zeros((g, dh, dh), jnp.float32)
        n_scr[:] = jnp.zeros((g, dh, 1), jnp.float32)
        m_scr[:] = jnp.zeros((g, 1, 1), jnp.float32)

    def nt_dot(w, x):
        # (O, I) x (CS, I) -> (O, CS): contraction over both minor (lane)
        # dims — the MXU's native "NT" form, no relayout emitted
        return jax.lax.dot_general(
            w.astype(mxu), x.astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def tn_dot(w, x):
        # (I, O) x (I, CS) -> (O, CS): contraction over both sublane dims
        return jax.lax.dot_general(
            w.astype(mxu), x.astype(mxu), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def chunk_body(j, _):
        s0 = j * cs
        x_c = conv_ref[:, pl.ds(s0, cs), :]   # (BB, CS, INNER)
        xm_c = xm_ref[:, pl.ds(s0, cs), :]
        wq = wq_ref[...]
        wk = wk_ref[...]
        wv = wv_ref[...]
        bq = bq_ref[...].astype(jnp.float32)  # (INNER, 1)
        bk = bk_ref[...].astype(jnp.float32)
        bv = bv_ref[...].astype(jnp.float32)
        wgi = wgi_ref[...]                    # (3*INNER, NH)
        wgf = wgf_ref[...]
        bgi = bgi_ref[...].astype(jnp.float32)  # (NH, 1)
        bgf = bgf_ref[...].astype(jnp.float32)

        qs, ks, vs, gis, gfs = [], [], [], [], []
        for bi in range(bb):
            qf = nt_dot(wq, x_c[bi]) + bq   # (INNER, CS) fp32
            kf = nt_dot(wk, x_c[bi]) + bk
            vf = nt_dot(wv, xm_c[bi]) + bv
            gi_pre = (tn_dot(wgi[:inner], qf) + tn_dot(wgi[inner:2 * inner], kf)
                      + tn_dot(wgi[2 * inner:], vf) + bgi)  # (NH, CS)
            gf_pre = (tn_dot(wgf[:inner], qf) + tn_dot(wgf[inner:2 * inner], kf)
                      + tn_dot(wgf[2 * inner:], vf) + bgf)
            qs.append(qf)
            ks.append(kf)
            vs.append(vf)
            gis.append(gi_pre)
            gfs.append(gf_pre)

        qt = jnp.stack(qs).reshape(g, dh, cs) * (dh**-0.5)
        kt = jnp.stack(ks).reshape(g, dh, cs)
        vt = jnp.stack(vs).reshape(g, dh, cs)
        i_pre = jnp.stack(gis).reshape(g, 1, cs)
        f_pre = jnp.stack(gfs).reshape(g, 1, cs)

        hT, c_new, n_new, m_new = _chunk_math(
            qt, kt, vt, i_pre, f_pre, c_scr[:], n_scr[:], m_scr[:],
            g=g, cs=cs, dh=dh, igate_act=igate_act, eps=eps, mxu=mxu,
            causal_t=causal_t, cum_mat=cum_mat, lane_ids=lane_ids)
        h_ref[:, :, pl.ds(s0, cs)] = hT.astype(h_ref.dtype)
        c_scr[:] = c_new
        n_scr[:] = n_new
        m_scr[:] = m_new
        return 0

    jax.lax.fori_loop(0, ns, chunk_body, 0)


def _pick_layout_fused(b: int, nh: int, s: int, cs: int, dh: int, inner: int,
                       in_bytes: int) -> tuple:
    """(BB, NSEG): batch elements per grid step (g = BB*NH rows, capped at
    the measured VPU sweet spot 32) and the largest segment that fits VMEM
    (streams: 2 natural input blocks + the transposed h block; temps: the
    fp32 q/k/v/h stacks + (CS, CS) transients + weights)."""
    budget = 10 * 1024 * 1024
    ns = s // cs
    bb = max(1, min(b, 32 // nh))
    while b % bb:
        bb -= 1
    g = bb * nh
    w_bytes = (3 * inner * inner + 6 * inner * 128 + 3 * cs * cs) * 4
    temps = (4 * g * dh * cs + 3 * g * dh * dh) * 4
    while bb >= 1:
        g = bb * nh
        temps = (4 * g * dh * cs + 3 * g * dh * dh) * 4
        for nseg in range(1, ns + 1):
            if ns % nseg:
                continue
            seg = s // nseg
            stream = 2 * bb * (2 * seg * inner * in_bytes + nh * dh * seg * in_bytes)
            if stream + temps + w_bytes <= budget:
                return (bb, nseg)
        nb = bb - 1
        while nb > 1 and b % nb:
            nb -= 1
        bb = nb if nb != bb else bb - 1
    return (1, ns)


def _vil_fused_impl(conv_act, x_mlstm, wq_bd, wk_bd, wv_bd, bq, bk, bv,
                    wgi, bgi, wgf, bgf, nh, chunk_size, igate_act, eps,
                    interpret=False, mxu_dtype="bfloat16"):
    """conv_act/x_mlstm (B, S, INNER) natural -> h (B*NH, DH, S) transposed,
    input dtype."""
    B, S, INNER = conv_act.shape
    dh = INNER // nh
    CS = chunk_size
    assert S % CS == 0
    BB, NSEG = _pick_layout_fused(B, nh, S, CS, dh, INNER, conv_act.dtype.itemsize)
    SEG = S // NSEG
    G = BB * nh
    mxu = jnp.bfloat16 if mxu_dtype == "bfloat16" else jnp.float32

    in_spec = pl.BlockSpec((BB, SEG, INNER), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((INNER, INNER), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((INNER, 1), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    wg_spec = pl.BlockSpec((3 * INNER, nh), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    bg_spec = pl.BlockSpec((nh, 1), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((G, dh, SEG), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel_vil_fused, bb=BB, nh=nh, ns=SEG // CS, cs=CS,
                          dh=dh, inner=INNER, igate_act=igate_act, eps=eps, mxu=mxu),
        grid=(B // BB, NSEG),
        in_specs=[in_spec, in_spec, w_spec, w_spec, w_spec, b_spec, b_spec,
                  b_spec, wg_spec, bg_spec, wg_spec, bg_spec],
        out_specs=h_spec,
        out_shape=jax.ShapeDtypeStruct((B * nh, dh, S), conv_act.dtype),
        scratch_shapes=[
            pltpu.VMEM((G, dh, dh), jnp.float32),
            pltpu.VMEM((G, dh, 1), jnp.float32),
            pltpu.VMEM((G, 1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * (3 * INNER * INNER + nh * (2 * CS * dh + 2 * dh * dh)),
            bytes_accessed=B * S * INNER * 3 * conv_act.dtype.itemsize,
            transcendentals=B * nh * S * (CS + 4),
        ),
        interpret=interpret,
    )(conv_act, x_mlstm, wq_bd, wk_bd, wv_bd, bq, bk, bv, wgi, bgi, wgf, bgf)


def _vil_fused_composite(conv_act, x_mlstm, wq, wk, wv, bq, bk, bv,
                         wgi, bgi, wgf, bgf, nh, chunk_size, igate_act, eps):
    """Unfused reference composite (projection einsums + the _t entry) —
    the recompute target for the fused entry's backward, and the non-TPU
    fallback. Weights in headwise (NH, DH, DH) form."""
    B, S, INNER = conv_act.shape
    dh = INNER // nh
    xs = conv_act.reshape(B, S, nh, dh)
    xms = x_mlstm.reshape(B, S, nh, dh)
    dt = conv_act.dtype
    q_t = jnp.einsum("bsnd,nod->bnos", xs, wq.astype(dt)) + bq.astype(dt).reshape(nh, dh, 1)
    k_t = jnp.einsum("bsnd,nod->bnos", xs, wk.astype(dt)) + bk.astype(dt).reshape(nh, dh, 1)
    v_t = jnp.einsum("bsnd,nod->bnos", xms, wv.astype(dt)) + bv.astype(dt).reshape(nh, dh, 1)
    rs = lambda wm: wm.reshape(nh, dh, nh).astype(dt)
    i_pre = (jnp.einsum("bnos,noh->bhs", q_t, rs(wgi[:INNER]), preferred_element_type=jnp.float32)
             + jnp.einsum("bnos,noh->bhs", k_t, rs(wgi[INNER:2 * INNER]), preferred_element_type=jnp.float32)
             + jnp.einsum("bnos,noh->bhs", v_t, rs(wgi[2 * INNER:]), preferred_element_type=jnp.float32)
             + bgi.astype(jnp.float32).reshape(1, nh, 1))
    f_pre = (jnp.einsum("bnos,noh->bhs", q_t, rs(wgf[:INNER]), preferred_element_type=jnp.float32)
             + jnp.einsum("bnos,noh->bhs", k_t, rs(wgf[INNER:2 * INNER]), preferred_element_type=jnp.float32)
             + jnp.einsum("bnos,noh->bhs", v_t, rs(wgf[2 * INNER:]), preferred_element_type=jnp.float32)
             + bgf.astype(jnp.float32).reshape(1, nh, 1))
    h = mlstm_chunkwise_pallas_t(q_t, k_t, v_t, i_pre, f_pre,
                                 chunk_size=chunk_size, igate_act=igate_act, eps=eps)
    return h.reshape(B * nh, dh, S)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16, 17))
def _vil_fused(conv_act, x_mlstm, wq, wk, wv, bq, bk, bv, wgi, bgi, wgf, bgf,
               nh, chunk_size, igate_act, eps, interpret, mxu_dtype):
    import jax.scipy.linalg as jsl

    wq_bd = jsl.block_diag(*wq).astype(conv_act.dtype)
    wk_bd = jsl.block_diag(*wk).astype(conv_act.dtype)
    wv_bd = jsl.block_diag(*wv).astype(conv_act.dtype)
    inner = conv_act.shape[-1]
    return _vil_fused_impl(
        conv_act, x_mlstm, wq_bd, wk_bd, wv_bd,
        bq.reshape(inner, 1).astype(conv_act.dtype),
        bk.reshape(inner, 1).astype(conv_act.dtype),
        bv.reshape(inner, 1).astype(conv_act.dtype),
        wgi.astype(conv_act.dtype), bgi.reshape(nh, 1).astype(jnp.float32),
        wgf.astype(conv_act.dtype), bgf.reshape(nh, 1).astype(jnp.float32),
        nh, chunk_size, igate_act, eps, interpret, mxu_dtype)


def _vil_fused_fwd(conv_act, x_mlstm, wq, wk, wv, bq, bk, bv, wgi, bgi, wgf, bgf,
                   nh, chunk_size, igate_act, eps, interpret, mxu_dtype):
    h = _vil_fused(conv_act, x_mlstm, wq, wk, wv, bq, bk, bv, wgi, bgi, wgf, bgf,
                   nh, chunk_size, igate_act, eps, interpret, mxu_dtype)
    return h, (conv_act, x_mlstm, wq, wk, wv, bq, bk, bv, wgi, bgi, wgf, bgf)


def _vil_fused_bwd(nh, chunk_size, igate_act, eps, interpret, mxu_dtype, res, gout):
    # recompute through the unfused composite; its mLSTM hop carries the
    # fused reverse-streaming pallas backward via mlstm_chunkwise_pallas_t
    fn = lambda *args: _vil_fused_composite(*args, nh, chunk_size, igate_act, eps)
    _, vjp = jax.vjp(fn, *res)
    return vjp(gout)


_vil_fused.defvjp(_vil_fused_fwd, _vil_fused_bwd)


def mlstm_vil_fused_pallas(
    conv_act: jnp.ndarray,
    x_mlstm: jnp.ndarray,
    wq: jnp.ndarray, bq: jnp.ndarray,
    wk: jnp.ndarray, bk: jnp.ndarray,
    wv: jnp.ndarray, bv: jnp.ndarray,
    wgi: jnp.ndarray, bgi: jnp.ndarray,
    wgf: jnp.ndarray, bgf: jnp.ndarray,
    num_heads: int,
    chunk_size: int = 64,
    igate_act: str = "exp",
    eps: float = 1e-6,
    interpret: bool | None = None,
    mxu_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """Fused ViL cell core: headwise projections + gate dots + chunkwise
    mLSTM in ONE kernel. conv_act/x_mlstm (B, S, INNER) natural; headwise
    weights (NH, DH, DH) + biases (INNER,); gate weights (3*INNER, NH) +
    biases (NH,). Returns h (B, NH, DH, S) in the input dtype (outnorm and
    the output gate stay outside)."""
    B, S, INNER = conv_act.shape
    dh = INNER // num_heads
    if jax.default_backend() != "tpu" and not interpret:
        h = _vil_fused_composite(conv_act, x_mlstm, wq, wk, wv, bq, bk, bv,
                                 wgi, bgi, wgf, bgf, num_heads,
                                 min(chunk_size, S), igate_act, eps)
        return h.reshape(B, num_heads, dh, S)
    cs = max(128, (min(chunk_size, S) // 128) * 128)
    pad = (-S) % cs
    if pad:
        # end-padding is causally inert: padded positions only influence
        # later (also padded) positions, which are sliced off
        conv_act = jnp.pad(conv_act, ((0, 0), (0, pad), (0, 0)))
        x_mlstm = jnp.pad(x_mlstm, ((0, 0), (0, pad), (0, 0)))
    h = _vil_fused(conv_act, x_mlstm, wq, wk, wv, bq, bk, bv, wgi, bgi, wgf, bgf,
                   num_heads, cs, igate_act, eps, bool(interpret), mxu_dtype)
    h = h.reshape(B, num_heads, dh, S + pad)
    return h[..., :S] if pad else h


# ---------------------------------------------------------------------------
# v2: whole-branch fusion — projections + gates + chunkwise mLSTM + outnorm +
# learnable-skip + output gate + proj_down + residual in ONE kernel.
# ---------------------------------------------------------------------------


def _kernel_vil_block(conv_ref, xm_ref, z_ref, xr_ref, wq_ref, wk_ref, wv_ref,
                      bq_ref, bk_ref, bv_ref, wgi_ref, bgi_ref, wgf_ref,
                      bgf_ref, nsc_ref, nbi_ref, skip_ref, wd_ref, bd_ref,
                      out_ref, c_scr, n_scr, m_scr, *, bb, nh, ns, cs, dh,
                      inner, dim, igate_act, eps, norm_eps, mxu):
    """The ViL mLSTM branch end-to-end on VMEM-resident values.

    Per chunk: batched NT projections over all BB batch elements at once
    (one (INNER, INNER) x (BB*CS, INNER) dot per projection — the v1 kernel
    unrolled BB thin dots and was MXU-issue-bound), gate dots, the shared
    transposed chunkwise math, then the epilogue: per-head layernorm over
    DH (sublanes — no relayout), affine, + skip * conv_act^T, * silu(z^T)
    (both transposes are single MXU identity-dots), proj_down as a TN-form
    dot that emits the NATURAL (CS, DIM) block, + bias + residual. h, the
    normalized h, and the gated products never touch HBM."""
    g = bb * nh

    t_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    causal_t = t_i <= s_i
    cum_mat = causal_t.astype(jnp.float32)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (g, 1, cs), 2)
    # MXU transpose helper: y^T = I_inner(NT)x for natural (CS, INNER) x
    r_i = jax.lax.broadcasted_iota(jnp.int32, (inner, inner), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (inner, inner), 1)
    ident = (r_i == c_i).astype(mxu)

    @pl.when(pl.program_id(1) == 0)
    def _reset():
        c_scr[:] = jnp.zeros((g, dh, dh), jnp.float32)
        n_scr[:] = jnp.zeros((g, dh, 1), jnp.float32)
        m_scr[:] = jnp.zeros((g, 1, 1), jnp.float32)

    def nt_dot(w, x):
        return jax.lax.dot_general(
            w.astype(mxu), x.astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def tn_dot(w, x):
        return jax.lax.dot_general(
            w.astype(mxu), x.astype(mxu), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def chunk_body(j, _):
        s0 = j * cs
        x_c = conv_ref[:, pl.ds(s0, cs), :]   # (BB, CS, INNER)
        xm_c = xm_ref[:, pl.ds(s0, cs), :]
        z_c = z_ref[:, pl.ds(s0, cs), :]
        xf = x_c.reshape(bb * cs, inner)
        xmf = xm_c.reshape(bb * cs, inner)
        zf = z_c.reshape(bb * cs, inner)

        bq = bq_ref[...].astype(jnp.float32)  # (INNER, 1)
        bk = bk_ref[...].astype(jnp.float32)
        bv = bv_ref[...].astype(jnp.float32)
        wgi = wgi_ref[...]                    # (3*INNER, NH)
        wgf = wgf_ref[...]
        bgi = bgi_ref[...].astype(jnp.float32)  # (NH, 1)
        bgf = bgf_ref[...].astype(jnp.float32)

        # batched projections: one MXU dot per projection for all BB rows
        qf_all = nt_dot(wq_ref[...], xf) + bq   # (INNER, BB*CS) fp32
        kf_all = nt_dot(wk_ref[...], xf) + bk
        vf_all = nt_dot(wv_ref[...], xmf) + bv
        gi_all = (tn_dot(wgi[:inner], qf_all) + tn_dot(wgi[inner:2 * inner], kf_all)
                  + tn_dot(wgi[2 * inner:], vf_all) + bgi)  # (NH, BB*CS)
        gf_all = (tn_dot(wgf[:inner], qf_all) + tn_dot(wgf[inner:2 * inner], kf_all)
                  + tn_dot(wgf[2 * inner:], vf_all) + bgf)
        # transposed natural inputs for the epilogue (MXU identity-dots)
        cT_all = nt_dot(ident, xf)              # (INNER, BB*CS)
        zT_all = nt_dot(ident, zf)

        qt = jnp.stack([qf_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                       ).reshape(g, dh, cs) * (dh**-0.5)
        kt = jnp.stack([kf_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                       ).reshape(g, dh, cs)
        vt = jnp.stack([vf_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                       ).reshape(g, dh, cs)
        i_pre = jnp.stack([gi_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                          ).reshape(g, 1, cs)
        f_pre = jnp.stack([gf_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                          ).reshape(g, 1, cs)

        hT, c_new, n_new, m_new = _chunk_math(
            qt, kt, vt, i_pre, f_pre, c_scr[:], n_scr[:], m_scr[:],
            g=g, cs=cs, dh=dh, igate_act=igate_act, eps=eps, mxu=mxu,
            causal_t=causal_t, cum_mat=cum_mat, lane_ids=lane_ids)
        c_scr[:] = c_new
        n_scr[:] = n_new
        m_scr[:] = m_new

        # epilogue: per-head layernorm over DH (sublane reductions)
        mu = jnp.mean(hT, axis=1, keepdims=True)          # (G, 1, CS)
        var = jnp.mean((hT - mu) ** 2, axis=1, keepdims=True)
        hn = (hT - mu) * jax.lax.rsqrt(var + norm_eps)    # (G, DH, CS)

        nsc = nsc_ref[...].astype(jnp.float32)    # (INNER, 1) effective scale
        nbi = nbi_ref[...].astype(jnp.float32)    # (INNER, 1)
        skip = skip_ref[...].astype(jnp.float32)  # (INNER, 1)
        wd = wd_ref[...]                          # (INNER, DIM)
        bd = bd_ref[...].astype(jnp.float32)      # (1, DIM)

        outs = []
        for bi in range(bb):
            y = hn[bi * nh:(bi + 1) * nh].reshape(inner, cs)
            y = y * nsc + nbi
            cT = cT_all[:, bi * cs:(bi + 1) * cs]
            zT = zT_all[:, bi * cs:(bi + 1) * cs]
            y = (y + skip * cT) * (zT * jax.nn.sigmoid(zT))
            o = jax.lax.dot_general(y.astype(mxu), wd.astype(mxu),
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append(o + bd)                   # (CS, DIM)
        out = jnp.stack(outs)                     # (BB, CS, DIM)
        xr_c = xr_ref[:, pl.ds(s0, cs), :].astype(jnp.float32)
        out_ref[:, pl.ds(s0, cs), :] = (out + xr_c).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ns, chunk_body, 0)


def _pick_layout_block(b: int, nh: int, s: int, cs: int, dh: int, inner: int,
                       dim: int, in_bytes: int) -> tuple:
    """(BB, NSEG) for the block-fused kernel: streams 3 INNER-wide + 2
    DIM-wide natural blocks; temps add the (INNER, BB*CS) fp32 projection/
    transpose planes on top of the v1 stacks. Weights (incl. the identity
    for the MXU transposes) live in VMEM at the INPUT dtype — they are cast
    to the MXU dtype at use."""
    # calibrated on-chip (P3/P5 sweeps): G=32 seg=128 configs (13.9-16.3 MB
    # by this model) compile and are fastest; the next size up (P3 seg 256,
    # ~17.9 MB) OOMs — the ceiling sits right at the 16 MB VMEM plus a bit
    # of model slack
    budget = 16_800_000
    ns = s // cs
    bb = max(1, min(b, 32 // nh))
    while b % bb:
        bb -= 1
    w_bytes = ((4 * inner * inner + inner * dim + 6 * inner * nh) * in_bytes
               + 4 * cs * cs * 4)
    while bb >= 1:
        g = bb * nh
        # peak live fp32 planes per chunk: 4 (G, DH, CS) stacks + ~3
        # (INNER, BB*CS) planes (Mosaic's liveness folds the qf/kf/vf_all
        # forms into the stacks; cT/zT persist through the epilogue)
        temps = (4 * g * dh * cs + 3 * g * dh * dh
                 + 3 * inner * bb * cs + bb * cs * dim) * 4
        for nseg in range(1, ns + 1):
            if ns % nseg:
                continue
            seg = s // nseg
            stream = 2 * bb * seg * (3 * inner + 2 * dim) * in_bytes
            if stream + temps + w_bytes <= budget:
                return (bb, nseg)
        nb = bb - 1
        while nb > 1 and b % nb:
            nb -= 1
        bb = nb if nb != bb else bb - 1
    return (1, ns)


def _vil_block_impl(conv_act, x_mlstm, z, x_res, wq_bd, wk_bd, wv_bd, bq, bk,
                    bv, wgi, bgi, wgf, bgf, nsc, nbi, skip, wd, bd, nh,
                    chunk_size, igate_act, eps, norm_eps, interpret=False,
                    mxu_dtype="bfloat16", layout=None):
    """(B, S, INNER) natural branch inputs -> (B, S, DIM) final output.
    ``layout`` overrides the (BB, NSEG) auto-pick (tuning sweeps)."""
    B, S, INNER = conv_act.shape
    DIM = x_res.shape[-1]
    dh = INNER // nh
    CS = chunk_size
    assert S % CS == 0
    BB, NSEG = layout or _pick_layout_block(B, nh, S, CS, dh, INNER, DIM,
                                            conv_act.dtype.itemsize)
    SEG = S // NSEG
    G = BB * nh
    mxu = jnp.bfloat16 if mxu_dtype == "bfloat16" else jnp.float32

    in_spec = pl.BlockSpec((BB, SEG, INNER), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    res_spec = pl.BlockSpec((BB, SEG, DIM), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((INNER, INNER), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((INNER, 1), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    wg_spec = pl.BlockSpec((3 * INNER, nh), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    bg_spec = pl.BlockSpec((nh, 1), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    wd_spec = pl.BlockSpec((INNER, DIM), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    bd_spec = pl.BlockSpec((1, DIM), lambda b, t: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel_vil_block, bb=BB, nh=nh, ns=SEG // CS, cs=CS,
                          dh=dh, inner=INNER, dim=DIM, igate_act=igate_act,
                          eps=eps, norm_eps=norm_eps, mxu=mxu),
        grid=(B // BB, NSEG),
        in_specs=[in_spec, in_spec, in_spec, res_spec, w_spec, w_spec, w_spec,
                  b_spec, b_spec, b_spec, wg_spec, bg_spec, wg_spec, bg_spec,
                  b_spec, b_spec, b_spec, wd_spec, bd_spec],
        out_specs=res_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, DIM), conv_act.dtype),
        scratch_shapes=[
            pltpu.VMEM((G, dh, dh), jnp.float32),
            pltpu.VMEM((G, dh, 1), jnp.float32),
            pltpu.VMEM((G, 1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * (5 * INNER * INNER + INNER * DIM
                               + nh * (2 * CS * dh + 2 * dh * dh)),
            bytes_accessed=B * S * (3 * INNER + 2 * DIM) * conv_act.dtype.itemsize,
            transcendentals=B * nh * S * (CS + 4),
        ),
        interpret=interpret,
    )(conv_act, x_mlstm, z, x_res, wq_bd, wk_bd, wv_bd, bq, bk, bv,
      wgi, bgi, wgf, bgf, nsc, nbi, skip, wd, bd)


def _vil_block_composite(conv_act, x_mlstm, z, x_res, wq, wk, wv, bq, bk, bv,
                         wgi, bgi, wgf, bgf, nsc, nbi, skip, wd, bd,
                         nh, chunk_size, igate_act, eps, norm_eps):
    """Unfused reference for the block-fused entry (backward recompute +
    non-TPU fallback): mirrors nn/vil.py's ViLLayer tail exactly —
    MultiHeadLayerNorm (transposed, fp32, EFFECTIVE scale nsc) -> relayout
    -> + skip * conv_act -> * silu(z) -> proj_down -> + residual."""
    B, S, INNER = conv_act.shape
    dh = INNER // nh
    h = _vil_fused_composite(conv_act, x_mlstm, wq, wk, wv, bq, bk, bv,
                             wgi, bgi, wgf, bgf, nh, chunk_size, igate_act,
                             eps).reshape(B, nh, dh, S)
    hf = h.astype(jnp.float32)
    mu = jnp.mean(hf, axis=2, keepdims=True)
    var = jnp.var(hf, axis=2, keepdims=True)
    hn = (hf - mu) * jax.lax.rsqrt(var + norm_eps)
    hn = hn * nsc.reshape(1, nh, dh, 1) + nbi.reshape(1, nh, dh, 1)
    hn = hn.astype(conv_act.dtype).transpose(0, 3, 1, 2).reshape(B, S, INNER)
    y = (hn + skip.astype(hn.dtype) * conv_act) * jax.nn.silu(z)
    out = jnp.dot(y, wd.astype(y.dtype), preferred_element_type=jnp.float32)
    out = (out + bd.astype(jnp.float32)).astype(conv_act.dtype)
    return out + x_res


@functools.partial(jax.custom_vjp, nondiff_argnums=(19, 20, 21, 22, 23, 24, 25))
def _vil_block(conv_act, x_mlstm, z, x_res, wq, wk, wv, bq, bk, bv, wgi, bgi,
               wgf, bgf, nsc, nbi, skip, wd, bd, nh, chunk_size, igate_act,
               eps, norm_eps, interpret, mxu_dtype):
    import jax.scipy.linalg as jsl

    dt = conv_act.dtype
    inner = conv_act.shape[-1]
    dim = x_res.shape[-1]
    return _vil_block_impl(
        conv_act, x_mlstm, z, x_res,
        jsl.block_diag(*wq).astype(dt), jsl.block_diag(*wk).astype(dt),
        jsl.block_diag(*wv).astype(dt),
        bq.reshape(inner, 1).astype(dt), bk.reshape(inner, 1).astype(dt),
        bv.reshape(inner, 1).astype(dt),
        wgi.astype(dt), bgi.reshape(nh, 1).astype(jnp.float32),
        wgf.astype(dt), bgf.reshape(nh, 1).astype(jnp.float32),
        nsc.reshape(inner, 1).astype(jnp.float32),
        nbi.reshape(inner, 1).astype(jnp.float32),
        skip.reshape(inner, 1).astype(jnp.float32),
        wd.astype(dt), bd.reshape(1, dim).astype(jnp.float32),
        nh, chunk_size, igate_act, eps, norm_eps, interpret, mxu_dtype)


def _vil_block_fwd(conv_act, x_mlstm, z, x_res, wq, wk, wv, bq, bk, bv, wgi,
                   bgi, wgf, bgf, nsc, nbi, skip, wd, bd, nh, chunk_size,
                   igate_act, eps, norm_eps, interpret, mxu_dtype):
    out = _vil_block(conv_act, x_mlstm, z, x_res, wq, wk, wv, bq, bk, bv, wgi,
                     bgi, wgf, bgf, nsc, nbi, skip, wd, bd, nh, chunk_size,
                     igate_act, eps, norm_eps, interpret, mxu_dtype)
    return out, (conv_act, x_mlstm, z, x_res, wq, wk, wv, bq, bk, bv, wgi,
                 bgi, wgf, bgf, nsc, nbi, skip, wd, bd)


def _vil_block_bwd(nh, chunk_size, igate_act, eps, norm_eps, interpret,
                   mxu_dtype, res, gout):
    fn = lambda *args: _vil_block_composite(*args, nh, chunk_size, igate_act,
                                            eps, norm_eps)
    _, vjp = jax.vjp(fn, *res)
    return vjp(gout)


_vil_block.defvjp(_vil_block_fwd, _vil_block_bwd)


def mlstm_vil_block_fused_pallas(
    conv_act: jnp.ndarray,
    x_mlstm: jnp.ndarray,
    z: jnp.ndarray,
    x_res: jnp.ndarray,
    wq: jnp.ndarray, bq: jnp.ndarray,
    wk: jnp.ndarray, bk: jnp.ndarray,
    wv: jnp.ndarray, bv: jnp.ndarray,
    wgi: jnp.ndarray, bgi: jnp.ndarray,
    wgf: jnp.ndarray, bgf: jnp.ndarray,
    nscale: jnp.ndarray, nbias: jnp.ndarray,
    skip: jnp.ndarray,
    wd: jnp.ndarray, bd: jnp.ndarray,
    num_heads: int,
    chunk_size: int = 64,
    igate_act: str = "exp",
    eps: float = 1e-6,
    norm_eps: float = 1e-3,
    interpret: bool | None = None,
    mxu_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """Whole ViL mLSTM branch in one kernel (v2 of the fused cell): headwise
    projections + gate dots + chunkwise mLSTM + per-head outnorm (EFFECTIVE
    scale ``nscale`` — pass 1+w for the residual convention) + learnable
    skip + SiLU output gate + proj_down + residual. Natural (B, S, INNER)
    branch inputs, (B, S, DIM) natural output; h never exists in HBM."""
    B, S, INNER = conv_act.shape
    if jax.default_backend() != "tpu" and not interpret:
        return _vil_block_composite(
            conv_act, x_mlstm, z, x_res, wq, wk, wv, bq, bk, bv, wgi, bgi,
            wgf, bgf, nsc=nscale, nbi=nbias, skip=skip, wd=wd, bd=bd,
            nh=num_heads, chunk_size=min(chunk_size, S), igate_act=igate_act,
            eps=eps, norm_eps=norm_eps)
    cs = max(128, (min(chunk_size, S) // 128) * 128)
    pad = (-S) % cs
    if pad:
        # end-padding is causally inert; padded output rows are sliced off
        conv_act = jnp.pad(conv_act, ((0, 0), (0, pad), (0, 0)))
        x_mlstm = jnp.pad(x_mlstm, ((0, 0), (0, pad), (0, 0)))
        z = jnp.pad(z, ((0, 0), (0, pad), (0, 0)))
        x_res = jnp.pad(x_res, ((0, 0), (0, pad), (0, 0)))
    out = _vil_block(conv_act, x_mlstm, z, x_res, wq, wk, wv, bq, bk, bv,
                     wgi, bgi, wgf, bgf, nscale, nbias, skip, wd, bd,
                     num_heads, cs, igate_act, eps, norm_eps, bool(interpret),
                     mxu_dtype)
    return out[:, :S] if pad else out


# ---------------------------------------------------------------------------
# v3: layer fusion — v2 PLUS the pre-norm (RMSNorm) and BOTH proj_up halves
# recomputed in-kernel from x. Streams shrink to x + conv_act (+ out): the
# ablation study showed the v2 kernel is DMA-bound (pure streaming at these
# block shapes runs ~130 GB/s; chunk math is only ~28% of kernel time), so
# the x_mlstm / z / x_res streams are the dominant cost — recomputing them
# on-chip from the DIM-wide x is cheaper than reading the INNER-wide planes.
# Only the depthwise SequenceConv2d stays outside (spatial halo).
# ---------------------------------------------------------------------------


def _kernel_vil_layer(x_ref, conv_ref, nrm_ref, wum_ref, bum_ref, wuzt_ref,
                      buz_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                      wgi_ref, bgi_ref, wgf_ref, bgf_ref, nsc_ref, nbi_ref,
                      skip_ref, wd_ref, bd_ref, out_ref, *rest,
                      bb, nh, ns, cs, dh, inner, dim, igate_act, eps,
                      norm_eps, rms_eps, mxu, save_h=False, save_acts=False):
    """ViLLayer forward minus the conv, on VMEM-resident values. With
    ``save_h`` the pre-outnorm cell output streams out as a second
    (transposed) plane — the training forward saves it so the backward
    never re-runs the recurrence. With ``save_acts`` the in-kernel q/k/v
    (unscaled, kernel layout) and gate preacts also stream out, so the
    hand-written backward (_vil_layer_bwd) never recomputes the projection
    head either."""
    if save_acts:
        h_ref, q_sref, k_sref, v_sref, ip_sref, fp_sref = rest[:6]
    else:
        h_ref = rest[0] if save_h else None
    c_scr, n_scr, m_scr = rest[-3:]
    g = bb * nh

    t_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    causal_t = t_i <= s_i
    cum_mat = causal_t.astype(jnp.float32)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (g, 1, cs), 2)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (inner, inner), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (inner, inner), 1)
    ident = (r_i == c_i).astype(mxu)

    @pl.when(pl.program_id(1) == 0)
    def _reset():
        c_scr[:] = jnp.zeros((g, dh, dh), jnp.float32)
        n_scr[:] = jnp.zeros((g, dh, 1), jnp.float32)
        m_scr[:] = jnp.zeros((g, 1, 1), jnp.float32)

    def nt_dot(w, x):
        return jax.lax.dot_general(
            w.astype(mxu), x.astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def tn_dot(w, x):
        return jax.lax.dot_general(
            w.astype(mxu), x.astype(mxu), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def chunk_body(j, _):
        s0 = j * cs
        x_c = x_ref[:, pl.ds(s0, cs), :]      # (BB, CS, DIM)
        cv_c = conv_ref[:, pl.ds(s0, cs), :]  # (BB, CS, INNER)
        xflat = x_c.reshape(bb * cs, dim).astype(jnp.float32)
        cvf = cv_c.reshape(bb * cs, inner)

        # RMSNorm over DIM (lanes) + scale, then the two proj_up halves:
        # x_mlstm natural (feeds the v projection), z directly TRANSPOSED
        # via an NT dot with the pre-transposed weight
        msq = jnp.mean(xflat * xflat, axis=1, keepdims=True)
        xn = xflat * jax.lax.rsqrt(msq + rms_eps) * nrm_ref[...].astype(jnp.float32)
        xmf = (jax.lax.dot_general(xn.astype(mxu), wum_ref[...].astype(mxu),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               + bum_ref[...].astype(jnp.float32))          # (BB*CS, INNER)
        zT = nt_dot(wuzt_ref[...], xn) + buz_ref[...].astype(jnp.float32)  # (INNER, BB*CS)

        bq = bq_ref[...].astype(jnp.float32)
        bk = bk_ref[...].astype(jnp.float32)
        bv = bv_ref[...].astype(jnp.float32)
        wgi = wgi_ref[...]
        wgf = wgf_ref[...]
        bgi = bgi_ref[...].astype(jnp.float32)
        bgf = bgf_ref[...].astype(jnp.float32)

        qf_all = nt_dot(wq_ref[...], cvf) + bq
        kf_all = nt_dot(wk_ref[...], cvf) + bk
        # xmf is an fp32 VMEM temp (not a ref load) — same NT form
        vf_all = jax.lax.dot_general(wv_ref[...].astype(mxu), xmf.astype(mxu),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) + bv
        gi_all = (tn_dot(wgi[:inner], qf_all) + tn_dot(wgi[inner:2 * inner], kf_all)
                  + tn_dot(wgi[2 * inner:], vf_all) + bgi)
        gf_all = (tn_dot(wgf[:inner], qf_all) + tn_dot(wgf[inner:2 * inner], kf_all)
                  + tn_dot(wgf[2 * inner:], vf_all) + bgf)
        cT_all = nt_dot(ident, cvf)

        qt_un = jnp.stack([qf_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                          ).reshape(g, dh, cs)
        qt = qt_un * (dh**-0.5)
        kt = jnp.stack([kf_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                       ).reshape(g, dh, cs)
        vt = jnp.stack([vf_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                       ).reshape(g, dh, cs)
        i_pre = jnp.stack([gi_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                          ).reshape(g, 1, cs)
        f_pre = jnp.stack([gf_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                          ).reshape(g, 1, cs)
        if save_acts:
            q_sref[:, :, pl.ds(s0, cs)] = qt_un.astype(q_sref.dtype)
            k_sref[:, :, pl.ds(s0, cs)] = kt.astype(k_sref.dtype)
            v_sref[:, :, pl.ds(s0, cs)] = vt.astype(v_sref.dtype)
            ip_sref[:, :, pl.ds(s0, cs)] = i_pre
            fp_sref[:, :, pl.ds(s0, cs)] = f_pre

        hT, c_new, n_new, m_new = _chunk_math(
            qt, kt, vt, i_pre, f_pre, c_scr[:], n_scr[:], m_scr[:],
            g=g, cs=cs, dh=dh, igate_act=igate_act, eps=eps, mxu=mxu,
            causal_t=causal_t, cum_mat=cum_mat, lane_ids=lane_ids)
        c_scr[:] = c_new
        n_scr[:] = n_new
        m_scr[:] = m_new
        if save_h or save_acts:
            h_ref[:, :, pl.ds(s0, cs)] = hT.astype(h_ref.dtype)

        mu = jnp.mean(hT, axis=1, keepdims=True)
        var = jnp.mean((hT - mu) ** 2, axis=1, keepdims=True)
        hn = (hT - mu) * jax.lax.rsqrt(var + norm_eps)

        nsc = nsc_ref[...].astype(jnp.float32)
        nbi = nbi_ref[...].astype(jnp.float32)
        skip = skip_ref[...].astype(jnp.float32)
        wd = wd_ref[...]
        bd = bd_ref[...].astype(jnp.float32)

        outs = []
        for bi in range(bb):
            y = hn[bi * nh:(bi + 1) * nh].reshape(inner, cs)
            y = y * nsc + nbi
            cT = cT_all[:, bi * cs:(bi + 1) * cs]
            zTb = zT[:, bi * cs:(bi + 1) * cs]
            y = (y + skip * cT) * (zTb * jax.nn.sigmoid(zTb))
            o = jax.lax.dot_general(y.astype(mxu), wd.astype(mxu),
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append(o + bd)
        out = jnp.stack(outs)  # (BB, CS, DIM)
        out_ref[:, pl.ds(s0, cs), :] = (out + x_c.astype(jnp.float32)
                                        ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ns, chunk_body, 0)


def _pick_layout_layer(b: int, nh: int, s: int, cs: int, dh: int, inner: int,
                       dim: int, in_bytes: int, save_h: bool = False,
                       save_acts: bool = False) -> tuple:
    """(BB, NSEG) for the layer-fused kernel: streams 1 INNER-wide + 2
    DIM-wide natural planes only (+1 transposed INNER h plane out when
    ``save_h``). Budget calibrated on-chip: P3 (16, 25) models at 15.4M and
    Mosaic reports 16.85M scoped (>16M limit), so the model under-counts
    ~1.4M — 15.3M keeps every accepted config under."""
    budget = 15_300_000
    ns = s // cs
    bb = max(1, min(b, 32 // nh))
    while b % bb:
        bb -= 1
    w_bytes = ((4 * inner * inner + 3 * inner * dim + 6 * inner * nh
                + 2 * inner * dim) * in_bytes + 4 * cs * cs * 4)
    while bb >= 1:
        g = bb * nh
        temps = (4 * g * dh * cs + 3 * g * dh * dh
                 + 4 * inner * bb * cs + 2 * bb * cs * dim) * 4
        for nseg in range(1, ns + 1):
            if ns % nseg:
                continue
            seg = s // nseg
            stream = (2 * bb * seg * ((1 + save_h + 3 * save_acts) * inner
                                      + 2 * dim) * in_bytes
                      + (4 * bb * nh * seg * 4 if save_acts else 0))
            if stream + temps + w_bytes <= budget:
                return (bb, nseg)
        nb = bb - 1
        while nb > 1 and b % nb:
            nb -= 1
        bb = nb if nb != bb else bb - 1
    return (1, ns)


def _vil_layer_impl(x, conv_act, nrm, wum, bum, wuzt, buz, wq_bd, wk_bd,
                    wv_bd, bq, bk, bv, wgi, bgi, wgf, bgf, nsc, nbi, skip,
                    wd, bd, nh, chunk_size, igate_act, eps, norm_eps, rms_eps,
                    interpret=False, mxu_dtype="bfloat16", layout=None,
                    save_h=False, save_acts=False):
    B, S, DIM = x.shape
    INNER = conv_act.shape[-1]
    dh = INNER // nh
    CS = chunk_size
    assert S % CS == 0
    BB, NSEG = layout or _pick_layout_layer(B, nh, S, CS, dh, INNER, DIM,
                                            conv_act.dtype.itemsize,
                                            save_h=save_h,
                                            save_acts=save_acts)
    SEG = S // NSEG
    G = BB * nh
    mxu = jnp.bfloat16 if mxu_dtype == "bfloat16" else jnp.float32

    x_spec = pl.BlockSpec((BB, SEG, DIM), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    cv_spec = pl.BlockSpec((BB, SEG, INNER), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    row = lambda r, c: pl.BlockSpec((r, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    if save_acts:
        h_spec = pl.BlockSpec((G, dh, SEG), lambda b, t: (b, 0, t),
                              memory_space=pltpu.VMEM)
        g_spec = pl.BlockSpec((G, 1, SEG), lambda b, t: (b, 0, t),
                              memory_space=pltpu.VMEM)
        plane = jax.ShapeDtypeStruct((B * nh, dh, S), conv_act.dtype)
        gate = jax.ShapeDtypeStruct((B * nh, 1, S), jnp.float32)
        out_specs = [x_spec, h_spec, h_spec, h_spec, h_spec, g_spec, g_spec]
        out_shape = [jax.ShapeDtypeStruct((B, S, DIM), x.dtype),
                     plane, plane, plane, plane, gate, gate]
    elif save_h:
        h_spec = pl.BlockSpec((G, dh, SEG), lambda b, t: (b, 0, t),
                              memory_space=pltpu.VMEM)
        out_specs = [x_spec, h_spec]
        out_shape = [jax.ShapeDtypeStruct((B, S, DIM), x.dtype),
                     jax.ShapeDtypeStruct((B * nh, dh, S), conv_act.dtype)]
    else:
        out_specs = x_spec
        out_shape = jax.ShapeDtypeStruct((B, S, DIM), x.dtype)

    return pl.pallas_call(
        functools.partial(_kernel_vil_layer, bb=BB, nh=nh, ns=SEG // CS,
                          cs=CS, dh=dh, inner=INNER, dim=DIM,
                          igate_act=igate_act, eps=eps, norm_eps=norm_eps,
                          rms_eps=rms_eps, mxu=mxu, save_h=save_h,
                          save_acts=save_acts),
        grid=(B // BB, NSEG),
        in_specs=[x_spec, cv_spec, row(1, DIM), row(DIM, INNER), row(1, INNER),
                  row(INNER, DIM), row(INNER, 1), row(INNER, INNER),
                  row(INNER, INNER), row(INNER, INNER), row(INNER, 1),
                  row(INNER, 1), row(INNER, 1), row(3 * INNER, nh), row(nh, 1),
                  row(3 * INNER, nh), row(nh, 1), row(INNER, 1), row(INNER, 1),
                  row(INNER, 1), row(INNER, DIM), row(1, DIM)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((G, dh, dh), jnp.float32),
            pltpu.VMEM((G, dh, 1), jnp.float32),
            pltpu.VMEM((G, 1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S * (7 * INNER * INNER + 3 * INNER * DIM
                               + nh * (2 * CS * dh + 2 * dh * dh)),
            bytes_accessed=B * S * ((1 + save_h + 3 * save_acts) * INNER
                                    + 2 * DIM) * conv_act.dtype.itemsize,
            transcendentals=B * nh * S * (CS + 4),
        ),
        interpret=interpret,
    )(x, conv_act, nrm, wum, bum, wuzt, buz, wq_bd, wk_bd, wv_bd, bq, bk, bv,
      wgi, bgi, wgf, bgf, nsc, nbi, skip, wd, bd)


def _vil_layer_composite(x, conv_act, nrm, wu, bu, wq, wk, wv, bq, bk, bv,
                         wgi, bgi, wgf, bgf, nsc, nbi, skip, wd, bd,
                         nh, chunk_size, igate_act, eps, norm_eps, rms_eps):
    """Unfused reference for the layer-fused entry: RMSNorm + proj_up halves
    (mirroring nn/vil.py ViLLayer) feeding the v2 composite."""
    inner = conv_act.shape[-1]
    xf = x.astype(jnp.float32)
    xn = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + rms_eps)
    xn = (xn * nrm.astype(jnp.float32)).astype(x.dtype)
    y = jnp.dot(xn, wu.astype(x.dtype)) + bu.astype(x.dtype)
    x_mlstm, z = jnp.split(y, 2, axis=-1)
    return _vil_block_composite(conv_act, x_mlstm, z, x, wq, wk, wv, bq, bk,
                                bv, wgi, bgi, wgf, bgf, nsc, nbi, skip, wd,
                                bd, nh, chunk_size, igate_act, eps, norm_eps)


def _vil_layer_call(x, conv_act, nrm, wu, bu, wq, wk, wv, bq, bk, bv, wgi,
                    bgi, wgf, bgf, nsc, nbi, skip, wd, bd, nh, chunk_size,
                    igate_act, eps, norm_eps, rms_eps, interpret, mxu_dtype,
                    save_h=False, save_acts=False):
    """Shared prep (block-diag weights, kernel-layout reshapes/casts) +
    impl call for the primal and the residual-saving fwd."""
    import jax.scipy.linalg as jsl

    dt = conv_act.dtype
    inner = conv_act.shape[-1]
    dim = x.shape[-1]
    return _vil_layer_impl(
        x, conv_act, nrm.reshape(1, dim).astype(dt),
        wu[:, :inner].astype(dt), bu[:inner].reshape(1, inner).astype(dt),
        wu[:, inner:].T.astype(dt), bu[inner:].reshape(inner, 1).astype(dt),
        jsl.block_diag(*wq).astype(dt), jsl.block_diag(*wk).astype(dt),
        jsl.block_diag(*wv).astype(dt),
        bq.reshape(inner, 1).astype(dt), bk.reshape(inner, 1).astype(dt),
        bv.reshape(inner, 1).astype(dt),
        wgi.astype(dt), bgi.reshape(nh, 1).astype(jnp.float32),
        wgf.astype(dt), bgf.reshape(nh, 1).astype(jnp.float32),
        nsc.reshape(inner, 1).astype(jnp.float32),
        nbi.reshape(inner, 1).astype(jnp.float32),
        skip.reshape(inner, 1).astype(jnp.float32),
        wd.astype(dt), bd.reshape(1, dim).astype(jnp.float32),
        nh, chunk_size, igate_act, eps, norm_eps, rms_eps, interpret,
        mxu_dtype, save_h=save_h, save_acts=save_acts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(20, 21, 22, 23, 24, 25, 26, 27))
def _vil_layer(x, conv_act, nrm, wu, bu, wq, wk, wv, bq, bk, bv, wgi, bgi,
               wgf, bgf, nsc, nbi, skip, wd, bd, nh, chunk_size, igate_act,
               eps, norm_eps, rms_eps, interpret, mxu_dtype):
    return _vil_layer_call(x, conv_act, nrm, wu, bu, wq, wk, wv, bq, bk, bv,
                           wgi, bgi, wgf, bgf, nsc, nbi, skip, wd, bd, nh,
                           chunk_size, igate_act, eps, norm_eps, rms_eps,
                           interpret, mxu_dtype)


def _vil_layer_fwd(x, conv_act, nrm, wu, bu, wq, wk, wv, bq, bk, bv, wgi, bgi,
                   wgf, bgf, nsc, nbi, skip, wd, bd, nh, chunk_size, igate_act,
                   eps, norm_eps, rms_eps, interpret, mxu_dtype):
    out, h, qt, kt, vt, ip, fp = _vil_layer_call(
        x, conv_act, nrm, wu, bu, wq, wk, wv, bq, bk, bv,
        wgi, bgi, wgf, bgf, nsc, nbi, skip, wd, bd, nh,
        chunk_size, igate_act, eps, norm_eps, rms_eps,
        interpret, mxu_dtype, save_acts=True)
    return out, (x, conv_act, nrm, wu, bu, wq, wk, wv, bq, bk, bv, wgi, bgi,
                 wgf, bgf, nsc, nbi, skip, wd, bd, h, qt, kt, vt, ip, fp)


def _vil_layer_bwd(nh, chunk_size, igate_act, eps, norm_eps, rms_eps,
                   interpret, mxu_dtype, res, gout):
    """Hand-written backward on KERNEL-SAVED activations — zero forward
    recompute of the projection head or the recurrence.

    The forward kernel streams out h (pre-outnorm cell output), unscaled
    q/k/v in its own transposed (B*nh, dh, S) layout, and the gate preacts
    (save_acts). Round-4's hand-split backward re-ran the whole projection
    head under jax.vjp to regenerate exactly these tensors. Here the
    backward is the minimal set of gradient contractions: tail gradients in
    plain XLA, the cell gradient on the reverse-streaming Pallas kernel,
    and per-weight einsums that consume the saved kernel-layout planes
    directly. Every big GEMM runs with operands in the primal compute dtype
    (bf16 under AMP — fp32 dots are ~8x slower on the MXU and 2x the
    bytes; the first cut of this function learned that the hard way) and
    fp32 accumulation.

    Gradient conventions match the reference Triton backward (frozen
    stabilizer, see kernels/mlstm_bwd.py); equations mirror the fused
    forward exactly (tests/test_pallas.py pins fp32-MXU grads to autodiff
    of the composite at 2e-4).
    """
    (x, conv_act, nrm, wu, bu, wq, wk, wv, bq, bk, bv, wgi, bgi, wgf, bgf,
     nsc, nbi, skip, wd, bd, h, qt, kt, vt, ip, fp) = res
    B, S, DIM = x.shape
    INNER = conv_act.shape[-1]
    dh = INNER // nh
    f32 = jnp.float32
    cd = conv_act.dtype  # compute dtype for GEMM operands (bf16 under AMP)
    PF = dict(preferred_element_type=f32)

    # ---- cheap natural-layout recompute: RMSNorm + proj_up (1 GEMM) ------
    xf = x.astype(f32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + rms_eps)
    xhat = xf * inv
    xn = (xhat * nrm.astype(f32)).astype(x.dtype)
    y = jnp.dot(xn, wu.astype(x.dtype)) + bu.astype(x.dtype)
    x_mlstm, z = jnp.split(y, 2, axis=-1)

    # ---- tail forward pieces + tail backward -----------------------------
    h4 = h.reshape(B, nh, dh, S).astype(f32)
    mu = jnp.mean(h4, axis=2, keepdims=True)
    var = jnp.var(h4, axis=2, keepdims=True)
    denom = jax.lax.rsqrt(var + norm_eps)
    hnorm = (h4 - mu) * denom  # (B, nh, dh, S) fp32
    hn_nat = ((hnorm * nsc.reshape(1, nh, dh, 1) + nbi.reshape(1, nh, dh, 1))
              .astype(cd).transpose(0, 3, 1, 2).reshape(B, S, INNER))

    zf = z.astype(f32)
    sig_z = jax.nn.sigmoid(zf)
    sg = zf * sig_z  # silu(z)
    ypre = hn_nat.astype(f32) + skip.astype(f32) * conv_act.astype(f32)
    yv = (ypre * sg).astype(cd)

    g32 = gout.astype(f32)
    dbd = jnp.sum(g32, axis=(0, 1))
    dwd = jnp.einsum("bsi,bsd->id", yv, gout.astype(cd), **PF)
    dy = jnp.einsum("bsd,id->bsi", gout.astype(cd), wd.astype(cd), **PF)
    dz = dy * ypre * (sig_z * (1.0 + zf * (1.0 - sig_z)))
    dypre = dy * sg
    dconv_tail = dypre * skip.astype(f32)
    dskip = jnp.sum(dypre * conv_act.astype(f32), axis=(0, 1))

    # outnorm backward over dh (transposed layout, as the cell wants)
    dhn4 = dypre.astype(cd).reshape(B, S, nh, dh).transpose(0, 2, 3, 1)
    dhn4 = dhn4.astype(f32)  # (B, nh, dh, S)
    dnsc = jnp.sum(dhn4 * hnorm, axis=(0, 3)).reshape(INNER)
    dnbi = jnp.sum(dhn4, axis=(0, 3)).reshape(INNER)
    dhnorm = dhn4 * nsc.reshape(1, nh, dh, 1).astype(f32)
    dh4 = denom * (dhnorm - jnp.mean(dhnorm, axis=2, keepdims=True)
                   - hnorm * jnp.mean(dhnorm * hnorm, axis=2, keepdims=True))
    dht = dh4.reshape(B * nh, dh, S)

    # ---- cell backward on the saved kernel-layout planes -----------------
    from .mlstm_pallas_bwd import mlstm_chunkwise_pallas_bwd_t

    sh4 = (B, nh, dh, S)
    dq_c, dk_c, dv_c, di, df = mlstm_chunkwise_pallas_bwd_t(
        qt.reshape(sh4), kt.reshape(sh4), vt.reshape(sh4),
        ip.reshape(B, nh, S), fp.reshape(B, nh, S), dht.reshape(sh4),
        chunk_size=chunk_size, igate_act=igate_act, eps=eps,
        interpret=interpret, mxu_dtype=mxu_dtype)

    # ---- gate backward: i/f preacts are linear in q/k/v ------------------
    rsW = lambda wm: wm.reshape(nh, dh, nh).astype(cd)
    dic = di.astype(cd)  # (B, nh, S)
    dfc = df.astype(cd)
    def gate_grad(w_i, w_f):
        # bf16 outputs: the cast fuses into the einsum epilogue, the sum
        # with the (already-bf16) cell grads then never materializes fp32
        return (jnp.einsum("noh,bhs->bnos", rsW(w_i), dic, **PF).astype(cd)
                + jnp.einsum("noh,bhs->bnos", rsW(w_f), dfc, **PF).astype(cd))
    dq_t = dq_c.astype(cd) + gate_grad(wgi[:INNER], wgf[:INNER])
    dk_t = dk_c.astype(cd) + gate_grad(wgi[INNER:2 * INNER],
                                       wgf[INNER:2 * INNER])
    dv_t = dv_c.astype(cd) + gate_grad(wgi[2 * INNER:], wgf[2 * INNER:])
    q4 = qt.reshape(sh4)
    k4 = kt.reshape(sh4)
    v4 = vt.reshape(sh4)
    dbgi = jnp.sum(di.astype(f32), axis=(0, 2))
    dbgf = jnp.sum(df.astype(f32), axis=(0, 2))
    dwgi = jnp.concatenate([
        jnp.einsum("bnos,bhs->noh", t, dic, **PF).reshape(INNER, nh)
        for t in (q4, k4, v4)], axis=0)
    dwgf = jnp.concatenate([
        jnp.einsum("bnos,bhs->noh", t, dfc, **PF).reshape(INNER, nh)
        for t in (q4, k4, v4)], axis=0)

    # ---- projection backward ---------------------------------------------
    xs = conv_act.reshape(B, S, nh, dh)
    xms = x_mlstm.astype(cd).reshape(B, S, nh, dh)
    dwq = jnp.einsum("bnos,bsnd->nod", dq_t, xs, **PF)
    dwk = jnp.einsum("bnos,bsnd->nod", dk_t, xs, **PF)
    dwv = jnp.einsum("bnos,bsnd->nod", dv_t, xms, **PF)
    dbq = jnp.sum(dq_t.astype(f32), axis=(0, 3)).reshape(INNER)
    dbk = jnp.sum(dk_t.astype(f32), axis=(0, 3)).reshape(INNER)
    dbv = jnp.sum(dv_t.astype(f32), axis=(0, 3)).reshape(INNER)
    dconv_head = (jnp.einsum("bnos,nod->bsnd", dq_t, wq.astype(cd), **PF)
                  + jnp.einsum("bnos,nod->bsnd", dk_t, wk.astype(cd), **PF)
                  ).reshape(B, S, INNER)
    dxm = jnp.einsum("bnos,nod->bsnd", dv_t, wv.astype(cd),
                     **PF).astype(cd).reshape(B, S, INNER)

    # ---- proj_up + RMSNorm backward --------------------------------------
    dy2 = jnp.concatenate([dxm, dz.astype(cd)], axis=-1)  # (B, S, 2*INNER)
    dwu = jnp.einsum("bsd,bse->de", xn, dy2, **PF)
    dbu = jnp.sum(dy2.astype(f32), axis=(0, 1))
    dxn = jnp.einsum("bse,de->bsd", dy2, wu.astype(cd), **PF)
    dnrm = jnp.sum(dxn * xhat, axis=(0, 1))
    dxhat = dxn * nrm.astype(f32)
    dxf = inv * (dxhat - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dx = dxf + g32  # in-kernel residual: out = tail + x

    dconv = (dconv_head + dconv_tail).astype(conv_act.dtype)
    return (dx.astype(x.dtype), dconv, dnrm.astype(nrm.dtype),
            dwu.astype(wu.dtype), dbu.astype(bu.dtype), dwq.astype(wq.dtype),
            dwk.astype(wk.dtype), dwv.astype(wv.dtype), dbq.astype(bq.dtype),
            dbk.astype(bk.dtype), dbv.astype(bv.dtype), dwgi.astype(wgi.dtype),
            dbgi.astype(bgi.dtype), dwgf.astype(wgf.dtype),
            dbgf.astype(bgf.dtype), dnsc.astype(nsc.dtype),
            dnbi.astype(nbi.dtype), dskip.astype(skip.dtype),
            dwd.astype(wd.dtype), dbd.astype(bd.dtype))


_vil_layer.defvjp(_vil_layer_fwd, _vil_layer_bwd)


def mlstm_vil_layer_fused_pallas(
    x: jnp.ndarray,
    conv_act: jnp.ndarray,
    rms_scale: jnp.ndarray,
    wu: jnp.ndarray, bu: jnp.ndarray,
    wq: jnp.ndarray, bq: jnp.ndarray,
    wk: jnp.ndarray, bk: jnp.ndarray,
    wv: jnp.ndarray, bv: jnp.ndarray,
    wgi: jnp.ndarray, bgi: jnp.ndarray,
    wgf: jnp.ndarray, bgf: jnp.ndarray,
    nscale: jnp.ndarray, nbias: jnp.ndarray,
    skip: jnp.ndarray,
    wd: jnp.ndarray, bd: jnp.ndarray,
    num_heads: int,
    chunk_size: int = 64,
    igate_act: str = "exp",
    eps: float = 1e-6,
    norm_eps: float = 1e-3,
    rms_eps: float = 1e-6,
    interpret: bool | None = None,
    mxu_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """The whole ViLLayer minus the depthwise conv, in one kernel: RMSNorm +
    proj_up (both halves, z emitted transposed on-chip) + everything the v2
    entry fuses. Streams only x (DIM) and conv_act (INNER) in and the final
    (B, S, DIM) out — at flagship shapes the v2 kernel is DMA-bound, so
    dropping the x_mlstm/z/x_res planes is the main win. ``wu``/``bu`` are
    the full (DIM, 2*INNER)/(2*INNER,) proj_up parameters; x doubles as the
    in-kernel residual."""
    B, S, DIM = x.shape
    if jax.default_backend() != "tpu" and not interpret:
        return _vil_layer_composite(
            x, conv_act, rms_scale, wu, bu, wq, wk, wv, bq, bk, bv, wgi, bgi,
            wgf, bgf, nscale, nbias, skip, wd, bd, num_heads,
            min(chunk_size, S), igate_act, eps, norm_eps, rms_eps)
    cs = max(128, (min(chunk_size, S) // 128) * 128)
    pad = (-S) % cs
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        conv_act = jnp.pad(conv_act, ((0, 0), (0, pad), (0, 0)))
    out = _vil_layer(x, conv_act, rms_scale, wu, bu, wq, wk, wv, bq, bk, bv,
                     wgi, bgi, wgf, bgf, nscale, nbias, skip, wd, bd,
                     num_heads, cs, igate_act, eps, norm_eps, rms_eps,
                     bool(interpret), mxu_dtype)
    return out[:, :S] if pad else out


# ---------------------------------------------------------------------------
# v4: conv-in-kernel — the ViLLayer INCLUDING the depthwise SequenceConv2d in
# one program; only x is streamed.
# ---------------------------------------------------------------------------

def _kernel_vil_conv(x_hbm, nrm_ref, wum_ref, bum_ref, wuzt_ref, buz_ref,
                     wc_ref, bc_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
                     bv_ref, wgi_ref, bgi_ref, wgf_ref, bgf_ref, nsc_ref,
                     nbi_ref, skip_ref, wd_ref, bd_ref, out_ref,
                     xwin, xmwin, c_scr, n_scr, m_scr, sems, *,
                     bb, nh, ns, cs, dh, inner, dim, dim_out, seg, halo,
                     wgrid, s_real, nseg, igate_act, eps, norm_eps, rms_eps,
                     mxu):
    """ViLLayer forward including the 3x3 depthwise conv.

    Window discipline: ``xwin`` (BB, SEG + 2*HALO, DIM) holds the segment
    plus HALO rows of context each side, DMA'd straight from HBM (the x
    input lives in ANY space — no BlockSpec stream for x). HALO is the
    conv's sequence-space reach (W+1 for a 3x3 on a W-wide token grid)
    rounded up to the sublane tile (8) because Mosaic requires HBM DMA
    slices 8-aligned. Boundary segments zero-fill the missing side.

    The conv runs on ``xmwin`` = masked(RMSNorm(xwin) @ Wu_xm + bu): 9
    shifted multiply-adds in VMEM with column masks for the w-edges (the
    row edges come out of the zero fill + the xm position mask). The xm
    mask ALSO zeroes positions outside [0, s_real): padded x rows are zero
    but xm(0) = bias, and the reference conv zero-pads its INPUT, so the
    mask is what makes in-kernel padding match ``nn.Conv``'s.
    """
    g = bb * nh
    win = seg + 2 * halo
    b, t = pl.program_id(0), pl.program_id(1)

    t_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    causal_t = t_i <= s_i
    cum_mat = causal_t.astype(jnp.float32)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (g, 1, cs), 2)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (inner, inner), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (inner, inner), 1)
    ident = (r_i == c_i).astype(mxu)

    @pl.when(t == 0)
    def _reset():
        c_scr[:] = jnp.zeros((g, dh, dh), jnp.float32)
        n_scr[:] = jnp.zeros((g, dh, 1), jnp.float32)
        m_scr[:] = jnp.zeros((g, 1, 1), jnp.float32)

    # --- window DMA: [head halo | segment | tail halo], per batch row ---
    def _cp(i, src, dst, length, slot):
        src = pl.multiple_of(src, 8)   # seg/halo are 8-aligned by design
        return pltpu.make_async_copy(
            x_hbm.at[b * bb + i, pl.ds(src, length)],
            xwin.at[i, pl.ds(dst, length)], sems.at[slot, i])

    for i in range(bb):
        _cp(i, t * seg, halo, seg, 0).start()

    @pl.when(t > 0)
    def _head_cp():
        for i in range(bb):
            _cp(i, t * seg - halo, 0, halo, 1).start()

    @pl.when(t == 0)
    def _head_zero():
        xwin[:, pl.ds(0, halo), :] = jnp.zeros((bb, halo, dim), xwin.dtype)

    @pl.when(t < nseg - 1)
    def _tail_cp():
        for i in range(bb):
            _cp(i, (t + 1) * seg, halo + seg, halo, 2).start()

    @pl.when(t == nseg - 1)
    def _tail_zero():
        xwin[:, pl.ds(halo + seg, halo), :] = jnp.zeros((bb, halo, dim),
                                                        xwin.dtype)

    for i in range(bb):
        _cp(i, t * seg, halo, seg, 0).wait()

    @pl.when(t > 0)
    def _head_wait():
        for i in range(bb):
            _cp(i, t * seg - halo, 0, halo, 1).wait()

    @pl.when(t < nseg - 1)
    def _tail_wait():
        for i in range(bb):
            _cp(i, (t + 1) * seg, halo + seg, halo, 2).wait()

    # --- xm over the whole window (per batch row, bounds the fp32 temps) ---
    nrm32 = nrm_ref[...].astype(jnp.float32)       # (1, DIM)
    bum32 = bum_ref[...].astype(jnp.float32)       # (1, INNER)
    posw = (t * seg - halo
            + jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0))
    vmask = (posw >= 0) & (posw < s_real)
    for i in range(bb):
        xf = xwin[i].astype(jnp.float32)           # (WIN, DIM)
        # sum/dim_out, not mean: DIM may be lane-padded with zeros
        msq = jnp.sum(xf * xf, axis=1, keepdims=True) / dim_out
        xn = xf * jax.lax.rsqrt(msq + rms_eps) * nrm32
        xm = jax.lax.dot_general(
            xn.astype(mxu), wum_ref[...].astype(mxu),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bum32
        xmwin[i] = jnp.where(vmask, xm, 0.0).astype(xmwin.dtype)

    def nt_dot(w, x):
        return jax.lax.dot_general(
            w.astype(mxu), x.astype(mxu), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def tn_dot(w, x):
        return jax.lax.dot_general(
            w.astype(mxu), x.astype(mxu), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    wc32 = wc_ref[...].astype(jnp.float32)         # (9, INNER)
    bc32 = bc_ref[...].astype(jnp.float32)         # (1, INNER)

    def chunk_body(j, _):
        lbase = halo + j * cs
        x_c = xwin[:, pl.ds(lbase, cs), :]          # (BB, CS, DIM)
        xflat = x_c.reshape(bb * cs, dim).astype(jnp.float32)

        # z half of proj_up, transposed on-chip (as v3)
        msq = jnp.sum(xflat * xflat, axis=1, keepdims=True) / dim_out
        xn = xflat * jax.lax.rsqrt(msq + rms_eps) * nrm32
        zT = nt_dot(wuzt_ref[...], xn) + buz_ref[...].astype(jnp.float32)

        xmf = xmwin[:, pl.ds(lbase, cs), :].reshape(
            bb * cs, inner).astype(jnp.float32)

        # depthwise 3x3 as 9 shifted FMAs with w-edge column masks. Mosaic
        # requires dynamic VMEM slice starts 8-aligned on the sublane dim,
        # so per conv row load ONE aligned (BB, CS+16, INNER) slab (lbase is
        # 8-aligned; d is a static floor8 of the row offset) and take the
        # three kw taps as static sub-slices of the loaded value.
        pos0 = t * seg + j * cs
        lpos = pos0 + jax.lax.broadcasted_iota(jnp.int32, (1, cs, 1), 1)
        wcoord = jax.lax.rem(lpos, wgrid)
        acc = jnp.broadcast_to(bc32.reshape(1, 1, inner),
                               (bb, cs, inner)).astype(jnp.float32)
        for kh in range(3):
            off_row = (kh - 1) * wgrid
            d = ((off_row - 1) // 8) * 8
            slab = xmwin[:, pl.ds(lbase + d, cs + 16), :]
            for kw in range(3):
                rel = off_row + (kw - 1) - d       # static, in [0, 16)
                sl = slab[:, rel:rel + cs, :].astype(jnp.float32)
                term = sl * wc32[kh * 3 + kw].reshape(1, 1, inner)
                if kw == 0:
                    term = jnp.where(wcoord >= 1, term, 0.0)
                elif kw == 2:
                    term = jnp.where(wcoord <= wgrid - 2, term, 0.0)
                acc = acc + term
        cv = acc * jax.nn.sigmoid(acc)              # SiLU, fp32
        cvf = cv.reshape(bb * cs, inner)

        bq = bq_ref[...].astype(jnp.float32)
        bk = bk_ref[...].astype(jnp.float32)
        bv = bv_ref[...].astype(jnp.float32)
        wgi = wgi_ref[...]
        wgf = wgf_ref[...]
        bgi = bgi_ref[...].astype(jnp.float32)
        bgf = bgf_ref[...].astype(jnp.float32)

        qf_all = nt_dot(wq_ref[...], cvf) + bq
        kf_all = nt_dot(wk_ref[...], cvf) + bk
        vf_all = jax.lax.dot_general(
            wv_ref[...].astype(mxu), xmf.astype(mxu),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + bv
        gi_all = (tn_dot(wgi[:inner], qf_all)
                  + tn_dot(wgi[inner:2 * inner], kf_all)
                  + tn_dot(wgi[2 * inner:], vf_all) + bgi)
        gf_all = (tn_dot(wgf[:inner], qf_all)
                  + tn_dot(wgf[inner:2 * inner], kf_all)
                  + tn_dot(wgf[2 * inner:], vf_all) + bgf)
        cT_all = nt_dot(ident, cvf)

        qt = jnp.stack([qf_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                       ).reshape(g, dh, cs) * (dh**-0.5)
        kt = jnp.stack([kf_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                       ).reshape(g, dh, cs)
        vt = jnp.stack([vf_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                       ).reshape(g, dh, cs)
        i_pre = jnp.stack([gi_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                          ).reshape(g, 1, cs)
        f_pre = jnp.stack([gf_all[:, bi * cs:(bi + 1) * cs] for bi in range(bb)]
                          ).reshape(g, 1, cs)

        hT, c_new, n_new, m_new = _chunk_math(
            qt, kt, vt, i_pre, f_pre, c_scr[:], n_scr[:], m_scr[:],
            g=g, cs=cs, dh=dh, igate_act=igate_act, eps=eps, mxu=mxu,
            causal_t=causal_t, cum_mat=cum_mat, lane_ids=lane_ids)
        c_scr[:] = c_new
        n_scr[:] = n_new
        m_scr[:] = m_new

        mu = jnp.mean(hT, axis=1, keepdims=True)
        var = jnp.mean((hT - mu) ** 2, axis=1, keepdims=True)
        hn = (hT - mu) * jax.lax.rsqrt(var + norm_eps)

        nsc = nsc_ref[...].astype(jnp.float32)
        nbi = nbi_ref[...].astype(jnp.float32)
        skip = skip_ref[...].astype(jnp.float32)
        wd = wd_ref[...]
        bd = bd_ref[...].astype(jnp.float32)

        outs = []
        for bi in range(bb):
            y = hn[bi * nh:(bi + 1) * nh].reshape(inner, cs)
            y = y * nsc + nbi
            cT = cT_all[:, bi * cs:(bi + 1) * cs]
            zTb = zT[:, bi * cs:(bi + 1) * cs]
            y = (y + skip * cT) * (zTb * jax.nn.sigmoid(zTb))
            o = jax.lax.dot_general(y.astype(mxu), wd.astype(mxu),
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append(o + bd)
        out = jnp.stack(outs)  # (BB, CS, DIM_OUT)
        res = x_c[:, :, :dim_out] if dim != dim_out else x_c
        out_ref[:, pl.ds(j * cs, cs), :] = (
            out + res.astype(jnp.float32)).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ns, chunk_body, 0)


def _pick_layout_conv(b: int, nh: int, s_pad: int, cs: int, dh: int,
                      inner: int, dim: int, halo: int, in_bytes: int) -> tuple:
    """(BB, NSEG) for the conv-fused kernel: streams NOTHING through
    BlockSpec but the (BB, SEG, DIM) out blocks; x arrives via window DMA
    (BB, SEG + 2*HALO, DIM) and xm is materialized over the window at
    input precision.

    Unlike the streaming kernels (whose DMA rate is flat in block size, so
    the default 16M Mosaic budget is fine), the window kernel's HBM traffic
    scales with (SEG + 2*HALO)/SEG — at ViL-P3 (halo 96) the old 15.3M
    budget forced small segments and a >2x read amplification. A large
    budget (paired with vmem_limit_bytes below) drives the amplification
    toward 1.0. Measured effect is real but modest (P3 layer 11.05 ->
    10.80 ms, same harness as the v3 layer's 11.19): the kernel is bound
    by its serialized window DMA + VPU conv, not amplification."""
    budget = 85_000_000
    ns_total = s_pad // cs
    bb = max(1, min(b, 32 // nh))
    while b % bb:
        bb -= 1
    w_bytes = ((3 * inner * inner + 3 * inner * dim + 6 * inner * nh
                + 9 * inner) * in_bytes + 4 * cs * cs * 4)
    while bb >= 1:
        g = bb * nh
        for nseg in range(1, ns_total + 1):
            if ns_total % nseg:
                continue
            seg = s_pad // nseg
            if nseg > 1 and seg < halo:
                continue  # head DMA at t=1 would start before row 0
            win = seg + 2 * halo
            xw = bb * win * dim * in_bytes
            xmw = bb * win * inner * in_bytes
            row_tmp = 2 * win * max(inner, dim) * 4
            chunk_tmp = (4 * g * dh * cs + 3 * g * dh * dh
                         + 3 * bb * cs * inner + 4 * inner * bb * cs
                         + 2 * bb * cs * dim) * 4
            stream = 2 * bb * seg * dim * in_bytes
            if xw + xmw + row_tmp + chunk_tmp + stream + w_bytes <= budget:
                return (bb, nseg)
        nb = bb - 1
        while nb > 1 and b % nb:
            nb -= 1
        bb = nb if nb != bb else bb - 1
    # fallback must respect the seg >= halo guard (nseg > 1 with seg < halo
    # would issue the t=1 head-halo DMA at a negative HBM offset): one whole-
    # sequence segment is always safe, whatever it costs in VMEM
    return (1, 1)


def _vil_conv_impl(x, nrm, wum, bum, wuzt, buz, wc, bc, wq_bd, wk_bd, wv_bd,
                   bq, bk, bv, wgi, bgi, wgf, bgf, nsc, nbi, skip, wd, bd,
                   nh, wgrid, s_real, chunk_size, igate_act, eps, norm_eps,
                   rms_eps, interpret=False, mxu_dtype="bfloat16",
                   layout=None):
    B, S_pad, DIM = x.shape
    INNER = wum.shape[-1]
    dh = INNER // nh
    CS = chunk_size
    assert S_pad % CS == 0
    # The manual window DMA slices dim 1 of the HBM x, which Mosaic only
    # allows when the lane dim is a whole number of 128-lane tiles. HBM
    # stores the array lane-padded anyway, so pad x (and the DIM-sided
    # weights) explicitly — zero extra true bytes — and keep out at DIM.
    DIM_OUT = DIM
    if DIM % 128:
        DIMP = ((DIM + 127) // 128) * 128
        x = jnp.pad(x, ((0, 0), (0, 0), (0, DIMP - DIM)))
        nrm = jnp.pad(nrm.reshape(1, -1), ((0, 0), (0, DIMP - DIM)))
        wum = jnp.pad(wum, ((0, DIMP - DIM), (0, 0)))
        wuzt = jnp.pad(wuzt, ((0, 0), (0, DIMP - DIM)))
        DIM = DIMP
    # conv reach, 8-aligned for HBM DMA, +8 slack so the per-row aligned
    # tap slabs (cs+16 rows from lbase+floor8(off_row-1)) stay in-window
    halo = ((wgrid + 1 + 7) // 8) * 8 + 8
    BB, NSEG = layout or _pick_layout_conv(B, nh, S_pad, CS, dh, INNER, DIM,
                                           halo, x.dtype.itemsize)
    SEG = S_pad // NSEG
    WIN = SEG + 2 * halo
    G = BB * nh
    mxu = jnp.bfloat16 if mxu_dtype == "bfloat16" else jnp.float32

    out_spec = pl.BlockSpec((BB, SEG, DIM_OUT), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)
    row = lambda r, c: pl.BlockSpec((r, c), lambda b, t: (0, 0),
                                    memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel_vil_conv, bb=BB, nh=nh, ns=SEG // CS,
                          cs=CS, dh=dh, inner=INNER, dim=DIM,
                          dim_out=DIM_OUT, seg=SEG,
                          halo=halo, wgrid=wgrid, s_real=s_real, nseg=NSEG,
                          igate_act=igate_act, eps=eps, norm_eps=norm_eps,
                          rms_eps=rms_eps, mxu=mxu),
        grid=(B // BB, NSEG),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  row(1, DIM), row(DIM, INNER), row(1, INNER),
                  row(INNER, DIM), row(INNER, 1), row(9, INNER),
                  row(1, INNER), row(INNER, INNER), row(INNER, INNER),
                  row(INNER, INNER), row(INNER, 1), row(INNER, 1),
                  row(INNER, 1), row(3 * INNER, nh), row(nh, 1),
                  row(3 * INNER, nh), row(nh, 1), row(INNER, 1),
                  row(INNER, 1), row(INNER, 1), row(INNER, DIM_OUT),
                  row(1, DIM_OUT)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, S_pad, DIM_OUT), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((BB, WIN, DIM), x.dtype),
            pltpu.VMEM((BB, WIN, INNER), x.dtype),
            pltpu.VMEM((G, dh, dh), jnp.float32),
            pltpu.VMEM((G, dh, 1), jnp.float32),
            pltpu.VMEM((G, 1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((3, BB)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the windowed layout intentionally exceeds Mosaic's 16M default
            # scoped-vmem cap (v5e has 128M physical); see _pick_layout_conv
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * S_pad * (7 * INNER * INNER + 3 * INNER * DIM
                                   + 9 * INNER
                                   + nh * (2 * CS * dh + 2 * dh * dh)),
            bytes_accessed=B * S_pad * 2 * DIM * x.dtype.itemsize,
            transcendentals=B * nh * S_pad * (CS + 4),
        ),
        interpret=interpret,
    )(x, nrm, wum, bum, wuzt, buz, wc, bc, wq_bd, wk_bd, wv_bd, bq, bk, bv,
      wgi, bgi, wgf, bgf, nsc, nbi, skip, wd, bd)


def _vil_conv_composite(x, nrm, wu, bu, wc, bc, wq, wk, wv, bq, bk, bv, wgi,
                        bgi, wgf, bgf, nsc, nbi, skip, wd, bd, nh, hgrid,
                        wgrid, chunk_size, igate_act, eps, norm_eps, rms_eps):
    """Unfused reference for the conv-fused entry: RMSNorm + proj_up + the
    depthwise 3x3 (XLA conv, zero-padded, mirroring SequenceConv2d) feeding
    the v3 composite."""
    B, S, _ = x.shape
    inner = wu.shape[-1] // 2
    xf = x.astype(jnp.float32)
    xn = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                            + rms_eps)
    xn = (xn * nrm.astype(jnp.float32)).astype(x.dtype)
    xm = jnp.dot(xn, wu[:, :inner].astype(x.dtype)) + bu[:inner].astype(x.dtype)
    img = xm.reshape(B, hgrid, wgrid, inner)
    cv = jax.lax.conv_general_dilated(
        img, wc.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=inner) + bc.astype(x.dtype)
    conv_act = jax.nn.silu(cv).reshape(B, S, inner)
    return _vil_layer_composite(
        x, conv_act, nrm, wu, bu, wq, wk, wv, bq, bk, bv, wgi, bgi, wgf,
        bgf, nsc, nbi, skip, wd, bd, nh, min(chunk_size, S), igate_act,
        eps, norm_eps, rms_eps)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(21, 22, 23, 24, 25, 26, 27, 28, 29, 30))
def _vil_conv(x, nrm, wu, bu, wc, bc, wq, wk, wv, bq, bk, bv, wgi, bgi, wgf,
              bgf, nsc, nbi, skip, wd, bd, nh, hgrid, wgrid, chunk_size,
              igate_act, eps, norm_eps, rms_eps, interpret, mxu_dtype):
    import jax.scipy.linalg as jsl

    dt = x.dtype
    dim = x.shape[-1]
    inner = wu.shape[-1] // 2
    S = x.shape[1]
    cs = max(128, (min(chunk_size, S) // 128) * 128)
    pad = (-S) % cs
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    out = _vil_conv_impl(
        xp, nrm.reshape(1, dim).astype(dt),
        wu[:, :inner].astype(dt), bu[:inner].reshape(1, inner).astype(dt),
        wu[:, inner:].T.astype(dt), bu[inner:].reshape(inner, 1).astype(dt),
        wc.reshape(9, inner).astype(dt), bc.reshape(1, inner).astype(dt),
        jsl.block_diag(*wq).astype(dt), jsl.block_diag(*wk).astype(dt),
        jsl.block_diag(*wv).astype(dt),
        bq.reshape(inner, 1).astype(dt), bk.reshape(inner, 1).astype(dt),
        bv.reshape(inner, 1).astype(dt),
        wgi.astype(dt), bgi.reshape(nh, 1).astype(jnp.float32),
        wgf.astype(dt), bgf.reshape(nh, 1).astype(jnp.float32),
        nsc.reshape(inner, 1).astype(jnp.float32),
        nbi.reshape(inner, 1).astype(jnp.float32),
        skip.reshape(inner, 1).astype(jnp.float32),
        wd.astype(dt), bd.reshape(1, dim).astype(jnp.float32),
        nh, wgrid, S, cs, igate_act, eps, norm_eps, rms_eps, interpret,
        mxu_dtype)
    return out[:, :S] if pad else out


def _vil_conv_fwd(x, nrm, wu, bu, wc, bc, wq, wk, wv, bq, bk, bv, wgi, bgi,
                  wgf, bgf, nsc, nbi, skip, wd, bd, nh, hgrid, wgrid,
                  chunk_size, igate_act, eps, norm_eps, rms_eps, interpret,
                  mxu_dtype):
    out = _vil_conv(x, nrm, wu, bu, wc, bc, wq, wk, wv, bq, bk, bv, wgi,
                    bgi, wgf, bgf, nsc, nbi, skip, wd, bd, nh, hgrid, wgrid,
                    chunk_size, igate_act, eps, norm_eps, rms_eps, interpret,
                    mxu_dtype)
    return out, (x, nrm, wu, bu, wc, bc, wq, wk, wv, bq, bk, bv, wgi, bgi,
                 wgf, bgf, nsc, nbi, skip, wd, bd)


def _vil_conv_bwd(nh, hgrid, wgrid, chunk_size, igate_act, eps, norm_eps,
                  rms_eps, interpret, mxu_dtype, res, gout):
    fn = lambda *args: _vil_conv_composite(*args, nh, hgrid, wgrid,
                                           chunk_size, igate_act, eps,
                                           norm_eps, rms_eps)
    _, vjp = jax.vjp(fn, *res)
    return vjp(gout)


_vil_conv.defvjp(_vil_conv_fwd, _vil_conv_bwd)


def mlstm_vil_layer_conv_fused_pallas(
    x: jnp.ndarray,
    rms_scale: jnp.ndarray,
    wu: jnp.ndarray, bu: jnp.ndarray,
    wc: jnp.ndarray, bc: jnp.ndarray,
    wq: jnp.ndarray, bq: jnp.ndarray,
    wk: jnp.ndarray, bk: jnp.ndarray,
    wv: jnp.ndarray, bv: jnp.ndarray,
    wgi: jnp.ndarray, bgi: jnp.ndarray,
    wgf: jnp.ndarray, bgf: jnp.ndarray,
    nscale: jnp.ndarray, nbias: jnp.ndarray,
    skip: jnp.ndarray,
    wd: jnp.ndarray, bd: jnp.ndarray,
    num_heads: int,
    seqlens: tuple,
    chunk_size: int = 64,
    igate_act: str = "exp",
    eps: float = 1e-6,
    norm_eps: float = 1e-3,
    rms_eps: float = 1e-6,
    interpret: bool | None = None,
    mxu_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """The whole ViLLayer INCLUDING the depthwise SequenceConv2d in one
    kernel (v4). x (B, S, DIM) is the only activation that touches HBM in
    either direction: per grid step a (SEG + 2*HALO)-row window of x is
    DMA'd in, xm = RMSNorm(x) @ Wu_xm is materialized over the window, the
    3x3 depthwise conv runs as 9 shifted FMAs in VMEM, and the v3 math
    follows. ``wc`` is the flax HWIO depthwise kernel (3, 3, 1, INNER);
    ``seqlens`` the (H, W) token grid. Cuts the layer's HBM traffic from
    ~4 INNER + 3 DIM planes (v3 + its XLA conv stage) to ~2.3 DIM planes.

    Measured on v5e at ViL-YOLO-n flagship shapes (b128, bf16, cs128),
    15.3M-budget layout: P3 10.44 ms vs v3 9.24, P4 5.74 vs 5.50, P5 4.19
    vs 4.16 — v4 lost to v3 everywhere because the window DMA is not
    pipelined across grid steps and the 9-tap fp32 VPU conv costs more
    than XLA's fused conv. With the 85M-budget layout (amplification
    ~1.06) it is a wash (loop-carried single-layer harness: v4 10.80 vs
    v3-layer 11.19 at P3). Kept as a parity-verified alternative
    (single-kernel deployments, future double-buffered window rework);
    `nn/vil.py` stays on v3."""
    hgrid, wgrid = seqlens
    B, S, DIM = x.shape
    assert hgrid * wgrid == S
    if jax.default_backend() != "tpu" and not interpret:
        return _vil_conv_composite(
            x, rms_scale, wu, bu, wc, bc, wq, wk, wv, bq, bk, bv, wgi, bgi,
            wgf, bgf, nscale, nbias, skip, wd, bd, num_heads,
            hgrid, wgrid, chunk_size, igate_act, eps, norm_eps, rms_eps)
    return _vil_conv(x, rms_scale, wu, bu, wc, bc, wq, wk, wv, bq, bk, bv,
                     wgi, bgi, wgf, bgf, nscale, nbias, skip, wd, bd,
                     num_heads, hgrid, wgrid, chunk_size, igate_act, eps,
                     norm_eps, rms_eps, bool(interpret), mxu_dtype)
