"""Fused chunkwise mLSTM backward — Pallas TPU kernel.

Implements the frozen-stabilizer gradient equations of
``mlstm_bwd.mlstm_chunkwise_bwd_ref`` (verified there against jax.vjp) as a
single reverse-streaming kernel:

  * phase 1 (plain XLA, cheap): the inter-chunk (C, n, m) carry states plus
    per-chunk decay factors — k/v outer-product summaries and a lax.scan,
    no (CS, CS) matrices; written once to HBM (~BNH·NS·DH² floats).
  * phase 2 (this kernel): grid (BNH/G, NSEG) with the SEGMENT index map
    REVERSED — q/k/v/gates/dh stream in reverse sequence order, the reverse
    state-gradient carry (dC, dn) lives in VMEM scratch, and each chunk
    recomputes its forward internals (e, q_inter, normalizer, h) before the
    gradient math. Same transposed (G, DH, S) layout as the forward kernel
    (sequence on lanes).

dq/dk/dv are exact vs autograd; gate gradients drop the normalizer-floor
stabilizer terms (the convention of the reference's Triton backward — see
mlstm_bwd.py docstring).

Measured (v5e, ViL-P3: B128 NH8 S6400 DH16 CS256): train-path fwd+bwd
94.8 -> 68.4 ms/iter vs the XLA backward (autograd of the native form and
the golden-jnp explicit form both compile to ~76 ms of backward; this
kernel replaces them at ~49 ms incl. the phase-1 states pass).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlstm_native import _log_igate

NEG_INF = -1e30


def _gate_chunk_weights(i_preact, f_preact, chunk_size, igate_act):
    """Per-chunk gate summaries shared by both phase-1 entries: returns
    (gw (B, NH, NS, CS) intra-chunk accumulation weights, btot (B, NH, NS)
    total log-decay, m_loc (B, NH, NS) local stabilizer max)."""
    B, NH, S = f_preact.shape
    NS = S // chunk_size
    f32 = jnp.float32
    logf = jax.nn.log_sigmoid(f_preact.astype(f32)).reshape(B, NH, NS, chunk_size)
    logi = _log_igate(i_preact.astype(f32), igate_act).reshape(B, NH, NS, chunk_size)
    b = jnp.cumsum(logf, axis=-1)
    btot = b[..., -1]
    g_acc = logi + (btot[..., None] - b)
    m_loc = jnp.max(g_acc, axis=-1)
    gw = jnp.exp(g_acc - m_loc[..., None])
    return gw, btot, m_loc


def chunk_carry_states(q, k, v, i_preact, f_preact, chunk_size, igate_act="exp"):
    """Phase 1: per-chunk carry-in states (C^T, n, scalars) via plain XLA.

    Returns (ct_prev (B*NH, NS, DV, DH), n_prev (B*NH, NS, DH),
    scalars (B*NH, 3, NS) = [m_prev; decay_old; decay_new])."""
    B, NH, S, DH = q.shape
    DV = v.shape[-1]
    CS = chunk_size
    NS = S // CS
    f32 = jnp.float32
    kc = k.astype(f32).reshape(B, NH, NS, CS, DH)
    vc = v.astype(f32).reshape(B, NH, NS, CS, DV)
    gw, btot, m_loc = _gate_chunk_weights(i_preact, f_preact, CS, igate_act)
    kv = jnp.einsum("bncsd,bncse->bncde", kc * gw[..., None], vc)
    ksum = jnp.sum(kc * gw[..., None], axis=-2)
    return _carry_scan(kv, ksum, btot, m_loc)


def chunk_carry_states_t(k_t, v_t, i_preact, f_preact, chunk_size,
                         igate_act="exp"):
    """Phase 1 on transposed (B, NH, DH, S) k/v — the einsums consume the
    kernel layout directly so no natural-layout plane is ever materialized
    (the relayout-free twin of ``chunk_carry_states``)."""
    B, NH, DH, S = k_t.shape
    CS = chunk_size
    NS = S // CS
    f32 = jnp.float32
    kc = k_t.astype(f32).reshape(B, NH, DH, NS, CS)
    vc = v_t.astype(f32).reshape(B, NH, DH, NS, CS)
    gw, btot, m_loc = _gate_chunk_weights(i_preact, f_preact, CS, igate_act)
    kcw = kc * gw[:, :, None]
    kv = jnp.einsum("bndjc,bnejc->bnjde", kcw, vc)
    ksum = jnp.moveaxis(jnp.sum(kcw, axis=-1), 2, 3)  # (B, NH, NS, DH)
    return _carry_scan(kv, ksum, btot, m_loc)


def _carry_scan(kv, ksum, btot, m_loc):
    """The inter-chunk (C, n, m) recurrence shared by both phase-1 entries;
    kv (B, NH, NS, DH, DV), ksum (B, NH, NS, DH), btot/m_loc (B, NH, NS)."""
    B, NH, NS, DH, DV = kv.shape
    f32 = jnp.float32

    def step(carry, xs):
        c_prev, n_prev, m_prev = carry
        kv_j, ks_j, bt_j, ml_j = xs
        m_new = jnp.maximum(bt_j + m_prev, ml_j)
        ld_old = bt_j + m_prev - m_new  # log decays: the kernel re-exps them
        ld_new = ml_j - m_new           # after a sublane broadcast (Mosaic
        d_old = jnp.exp(ld_old)         # can't fuse a 2-axis broadcast)
        d_new = jnp.exp(ld_new)
        c_new = c_prev * d_old[..., None, None] + kv_j * d_new[..., None, None]
        n_new = n_prev * d_old[..., None] + ks_j * d_new[..., None]
        return (c_new, n_new, m_new), (c_prev, n_prev, m_prev, ld_old, ld_new)

    c0 = jnp.zeros((B, NH, DH, DV), f32)
    n0 = jnp.zeros((B, NH, DH), f32)
    m0 = jnp.zeros((B, NH), f32)
    xs = (jnp.moveaxis(kv, 2, 0), jnp.moveaxis(ksum, 2, 0),
          jnp.moveaxis(btot, 2, 0), jnp.moveaxis(m_loc, 2, 0))
    _, (cp, np_, mp, ldo, ldn) = jax.lax.scan(step, (c0, n0, m0), xs)
    do, dn = ldo, ldn  # stored in LOG space (see step)
    ct_prev = jnp.moveaxis(cp, 0, 2).swapaxes(-1, -2).reshape(B * NH, NS, DV, DH)
    # lane dim = NS so the kernel can take full-row blocks (block-shape rule:
    # small trailing dims must equal the array dims)
    n_prev = jnp.moveaxis(np_, 0, 2).reshape(B * NH, NS, DH).swapaxes(1, 2)  # (BNH, DH, NS)
    scal = jnp.stack([jnp.moveaxis(x, 0, 2).reshape(B * NH, NS) for x in (mp, do, dn)],
                     axis=1)  # (BNH, 3, NS)
    return ct_prev, n_prev, scal


def _chunk_grads(qt, kt, vt, i_pre, f_pre, dht, ct_g, n_col_g, m_prev,
                 ld_old, ld_new, dcn_g, dnn_g, *, g, cs, dh, igate_act, eps,
                 mxu, causal_t, cum_mat, revcum_mat, lane_row, lane_ids3,
                 ones_col):
    """Per-chunk reverse gradient math on VMEM-resident values (shared by
    the standalone cell-bwd kernel and the fused layer-bwd kernel).

    qt/kt/vt (G, DH, CS) fp32 (qt pre-scaled by dh^-0.5), gates (G, 1, CS),
    dht (G, DV, CS); per-chunk carried state ct_g (G, DV, DH),
    n_col_g (G, DH, 1), scalars (G, 1, 1); reverse carries dcn_g (G, DV, DH),
    dnn_g (G, DH, 1). Returns (dq, dk, dv, dlogi->di, dlogf->df stacked
    (G, ...) arrays, dcn_new, dnn_new)."""
    HI = jax.lax.Precision.HIGHEST

    def dot32(a, b):
        return jnp.dot(a.astype(mxu), b.astype(mxu),
                       preferred_element_type=jnp.float32)

    logf = jax.nn.log_sigmoid(f_pre)  # (G, 1, CS)
    logi = jax.nn.log_sigmoid(i_pre) if igate_act == "sigmoid" else i_pre
    b = jnp.stack([
        jnp.dot(logf[gi], cum_mat, preferred_element_type=jnp.float32,
                precision=HI)
        for gi in range(g)
    ])  # (G, 1, CS)
    btot = jnp.sum(logf, axis=2, keepdims=True)  # (G, 1, 1)
    w_vec = logi - b
    cm = w_vec
    sh = 1
    while sh < cs:
        rolled = pltpu.roll(cm, shift=sh, axis=2)
        rolled = jnp.where(lane_ids3 >= sh, rolled, NEG_INF)
        cm = jnp.maximum(cm, rolled)
        sh *= 2
    d_max = b + cm

    idl = m_prev + b  # (G, 1, CS)
    stab = jnp.maximum(d_max, idl)
    g_acc = logi + (btot - b)
    m_loc = jnp.max(g_acc, axis=2, keepdims=True)
    gw = jnp.exp(g_acc - m_loc)  # (G, 1, CS)
    exp_inter = jnp.exp(idl - stab)  # (G, 1, CS)
    b_stab = b - stab
    w_col = jnp.swapaxes(w_vec, 1, 2)  # (G, CS, 1)
    floor = jnp.exp(-stab)

    dq_out, dk_out, dv_out, di_out, df_out = [], [], [], [], []
    dcn_new, dnn_new = [], []
    for gi in range(g):
        ct = ct_g[gi]  # (DV, DH) = C^T
        n_col = n_col_g[gi]  # (DH, 1)

        # ---- forward recompute -----------------------------------
        argT = jnp.where(causal_t, w_col[gi] + b_stab[gi], NEG_INF)
        dT = jnp.exp(argT)
        eT = dot32(kt[gi].T, qt[gi]) * dT  # (CS_t, CS_s)
        q_int = qt[gi] * exp_inter[gi]  # (DH, CS)
        e_sum = jnp.sum(eT, axis=0, keepdims=True)  # (1, CS)
        inter_norm = jnp.sum(q_int * n_col, axis=0, keepdims=True)
        row = e_sum + inter_norm
        norm = jnp.maximum(jnp.abs(row), floor[gi]) + eps
        hT = (dot32(vt[gi], eT) + dot32(ct, q_int)) / norm  # (DV, CS)

        # ---- gradient math ---------------------------------------
        dAT = dht[gi] / norm  # (DV, CS)
        dN = -jnp.sum(dht[gi] * hT, axis=0, keepdims=True) / norm
        dR = jnp.where(jnp.abs(row) > floor[gi], jnp.sign(row) * dN, 0.0)

        deT = dot32(vt[gi].T, dAT) + dR  # (CS_t, CS_s); dR row-bcast
        deT = jnp.where(causal_t, deT, 0.0)
        dqkT = deT * dT
        dqkT_T = dqkT.T
        GT = deT * eT

        dqc = dot32(kt[gi], dqkT)  # (DH, CS_s)
        dkc = dot32(qt[gi], dqkT_T)  # (DH, CS_t)
        dvc = dot32(dAT, eT.T)  # (DV, CS_t)

        db = jnp.sum(GT, axis=0, keepdims=True)  # index s
        dli = jnp.swapaxes(jnp.sum(GT, axis=1, keepdims=True), 0, 1)  # (1, CS_t)
        db = db - dli  # w_t = logi_t - b_t
        dlogi = dli

        # inter path
        dqt_t = dot32(ct.T, dAT) + n_col * dR  # (DH, CS)
        dqc = dqc + dqt_t * exp_inter[gi]
        db = db + jnp.sum(dqt_t * q_int, axis=0, keepdims=True)
        dct_attn = dot32(dAT, q_int.T)  # (DV, DH)
        dn_attn = jnp.dot(q_int * dR, ones_col,
                          preferred_element_type=jnp.float32)  # (DH, 1)

        # state chain (reverse carry)
        dcn = dcn_g[gi]  # (DV, DH) grad wrt c_new_j
        dnn = dnn_g[gi]  # (DH, 1)
        do_col = jnp.exp(jnp.broadcast_to(ld_old[gi], (dh, 1)))  # (DV==DH, 1)
        dn_col = jnp.exp(jnp.broadcast_to(ld_new[gi], (dh, 1)))
        dkv = dcn * dn_col  # (DV, DH)
        dksum = dnn * dn_col  # (DH, 1)
        dbtot = (jnp.sum(dcn * ct) + jnp.sum(dnn * n_col)) * jnp.exp(ld_old[gi][0, 0])
        dcn_new.append(dct_attn + dcn * do_col)
        dnn_new.append(dn_attn + dnn * do_col)

        kg = kt[gi] * gw[gi]  # (DH, CS)
        dvc = dvc + dot32(dkv, kg)  # (DV, CS)
        dk_state = dot32(dkv.T, vt[gi]) + dksum  # (DH, CS); dksum lane-bcast
        dkc = dkc + dk_state * gw[gi]
        dgw = jnp.sum(dk_state * kt[gi], axis=0, keepdims=True)  # (1, CS)
        gig = dgw * gw[gi]
        dlogi = dlogi + gig
        db = db - gig
        dbtot = dbtot + jnp.sum(gig)

        db = db + jnp.where(lane_row == cs - 1, dbtot, 0.0)
        dlogf = jnp.dot(db, revcum_mat, preferred_element_type=jnp.float32,
                        precision=HI)  # (1, CS)

        dq_out.append(dqc * (dh**-0.5))
        dk_out.append(dkc)
        dv_out.append(dvc)
        di_out.append(dlogi * (jax.nn.sigmoid(-i_pre[gi])
                               if igate_act == "sigmoid" else 1.0))
        df_out.append(dlogf * jax.nn.sigmoid(-f_pre[gi]))

    return (jnp.stack(dq_out), jnp.stack(dk_out), jnp.stack(dv_out),
            jnp.stack(di_out), jnp.stack(df_out),
            jnp.stack(dcn_new), jnp.stack(dnn_new))


def _kernel(q_ref, k_ref, v_ref, i_ref, f_ref, dh_ref, ct_ref, np_ref, sc_ref,
            dq_ref, dk_ref, dv_ref, di_ref, df_ref, dcn_scr, dnn_scr, *,
            g, segc, nseg, cs, dh, igate_act, eps, mxu):
    """One grid step = G head-rows, one sequence SEGMENT (reverse order);
    chunks inside the segment walk backwards. Per-chunk math lives in
    _chunk_grads (shared with the fused layer-bwd kernel)."""
    t_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    causal_t = t_i <= s_i
    cum_mat = causal_t.astype(jnp.float32)  # inclusive lane-cumsum
    revcum_mat = (t_i >= s_i).astype(jnp.float32)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
    lane_ids3 = jax.lax.broadcasted_iota(jnp.int32, (g, 1, cs), 2)
    ones_col = jnp.ones((cs, 1), jnp.float32)

    seg_id = pl.program_id(1)

    @pl.when(seg_id == 0)
    def _reset():  # first grid step of a row = LAST segment (reversed map)
        dcn_scr[:] = jnp.zeros(dcn_scr.shape, jnp.float32)
        dnn_scr[:] = jnp.zeros(dnn_scr.shape, jnp.float32)

    def chunk_body(jj, _):
        j = segc - 1 - jj  # reverse within the segment
        j_glob = (nseg - 1 - seg_id) * segc + j  # chunk id in S
        s0 = j * cs
        qt = q_ref[:, :, pl.ds(s0, cs)].astype(jnp.float32) * (dh**-0.5)
        kt = k_ref[:, :, pl.ds(s0, cs)].astype(jnp.float32)
        vt = v_ref[:, :, pl.ds(s0, cs)].astype(jnp.float32)
        dht = dh_ref[:, :, pl.ds(s0, cs)].astype(jnp.float32)
        i_pre = i_ref[:, :, pl.ds(s0, cs)].astype(jnp.float32)
        f_pre = f_ref[:, :, pl.ds(s0, cs)].astype(jnp.float32)

        # dynamic lane indexing is not allowed (128-alignment rule); select
        # the chunk's scalars with a one-hot lane mask + reduction instead
        ns_lanes = sc_ref.shape[2]
        sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, ns_lanes), 2) == j_glob)

        def lane_pick(x):  # (G, 1, NS) -> (G, 1, 1)
            return jnp.sum(jnp.where(sel, x, 0.0), axis=2, keepdims=True)

        m_prev = lane_pick(sc_ref[:, 0:1, :])  # (G, 1, 1)
        ld_old = lane_pick(sc_ref[:, 1:2, :])  # LOG decay factors
        ld_new = lane_pick(sc_ref[:, 2:3, :])
        ct_g = jnp.stack([ct_ref[gi, pl.ds(j, 1)][0] for gi in range(g)])
        n_col_g = jnp.stack([
            jnp.sum(jnp.where(sel[0], np_ref[gi], 0.0), axis=1, keepdims=True)
            for gi in range(g)])

        dq, dk, dv, di, df, dcn_new, dnn_new = _chunk_grads(
            qt, kt, vt, i_pre, f_pre, dht, ct_g, n_col_g, m_prev, ld_old,
            ld_new, dcn_scr[:], dnn_scr[:], g=g, cs=cs, dh=dh,
            igate_act=igate_act, eps=eps, mxu=mxu, causal_t=causal_t,
            cum_mat=cum_mat, revcum_mat=revcum_mat, lane_row=lane_row,
            lane_ids3=lane_ids3, ones_col=ones_col)
        dcn_scr[:] = dcn_new
        dnn_scr[:] = dnn_new

        dq_ref[:, :, pl.ds(s0, cs)] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, pl.ds(s0, cs)] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, pl.ds(s0, cs)] = dv.astype(dv_ref.dtype)
        di_ref[:, :, pl.ds(s0, cs)] = di
        df_ref[:, :, pl.ds(s0, cs)] = df
        return 0

    jax.lax.fori_loop(0, segc, chunk_body, 0)


def _pick_layout_bwd(bnh: int, s: int, cs: int, dh: int, in_bytes: int) -> tuple:
    """(G, NSEG) under the VMEM budget; backward streams ~2.3x the forward
    (q/k/v/gates/dh in, five grads out, per-chunk states)."""
    budget = 10 * 1024 * 1024
    sub = max(dh, 8)
    ns = s // cs
    best = (1, 1)
    best_key = (-1, 0)
    temps = (8 * cs * cs + 24 * cs * sub + 6 * dh * dh) * 4
    for nseg in range(1, ns + 1):
        if ns % nseg:
            continue
        seg = s // nseg
        segc = seg // cs
        stream = 2 * (3 * seg * sub * in_bytes + 2 * seg * 8 * 4  # q/k/v + gates in
                      + seg * sub * 4  # dh in
                      + 3 * seg * sub * 4 + 2 * seg * 8 * 4  # dq/dk/dv + di/df out
                      + segc * (dh * dh + sub * 8 + 3 * 8) * 4)  # states
        g = max(1, min(bnh, min(16, (budget - temps) // max(stream, 1))))
        while bnh % g != 0:
            g -= 1
        steps = (bnh // g) * nseg
        key = (g, -steps)
        if key > best_key:
            best_key = key
            best = (g, nseg)
    return best


def mlstm_chunkwise_pallas_bwd(
    q, k, v, i_preact, f_preact, dh,
    chunk_size: int = 64, igate_act: str = "exp", eps: float = 1e-6,
    interpret: bool = False, mxu_dtype: str = "bfloat16",
):
    """Pallas backward pass; returns (dq, dk, dv, di_preact, df_preact).

    Requires DH == DV (the vision/LM layers used with the Pallas path);
    rectangular heads fall back to the golden jnp form upstream."""
    B, NH, S, DH = q.shape
    assert v.shape[-1] == DH, "pallas bwd requires DH == DV"
    CS = chunk_size
    NS = S // CS
    BNH = B * NH
    G, NSEG = _pick_layout_bwd(BNH, S, CS, DH, q.dtype.itemsize)
    SEG = S // NSEG
    SEGC = SEG // CS
    mxu = jnp.bfloat16 if mxu_dtype == "bfloat16" else jnp.float32

    ct_prev, n_prev, scal = chunk_carry_states(q, k, v, i_preact, f_preact, CS,
                                               igate_act)

    qf = q.reshape(BNH, S, DH).swapaxes(1, 2)
    kf = k.reshape(BNH, S, DH).swapaxes(1, 2)
    vf = v.reshape(BNH, S, DH).swapaxes(1, 2)
    dhf = dh.astype(jnp.float32).reshape(BNH, S, DH).swapaxes(1, 2)
    i2 = i_preact.reshape(BNH, 1, S)
    f2 = f_preact.reshape(BNH, 1, S)

    # segment index maps are REVERSED: grid step t streams segment NSEG-1-t
    qkv_spec = pl.BlockSpec((G, DH, SEG), lambda r, t: (r, 0, NSEG - 1 - t),
                            memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec((G, 1, SEG), lambda r, t: (r, 0, NSEG - 1 - t),
                             memory_space=pltpu.VMEM)
    ct_spec = pl.BlockSpec((G, SEGC, DH, DH), lambda r, t: (r, NSEG - 1 - t, 0, 0),
                           memory_space=pltpu.VMEM)
    # full NS lane rows (tiny); indexed per chunk with the global chunk id
    np_spec = pl.BlockSpec((G, DH, NS), lambda r, t: (r, 0, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((G, 3, NS), lambda r, t: (r, 0, 0),
                           memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_kernel, g=G, segc=SEGC, nseg=NSEG, cs=CS, dh=DH,
                          igate_act=igate_act, eps=eps, mxu=mxu),
        grid=(BNH // G, NSEG),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, gate_spec, gate_spec, qkv_spec,
                  ct_spec, np_spec, sc_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec, gate_spec, gate_spec],
        out_shape=[
            jax.ShapeDtypeStruct((BNH, DH, S), q.dtype),
            jax.ShapeDtypeStruct((BNH, DH, S), k.dtype),
            jax.ShapeDtypeStruct((BNH, DH, S), v.dtype),
            jax.ShapeDtypeStruct((BNH, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((BNH, 1, S), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, DH, DH), jnp.float32),
            pltpu.VMEM((G, DH, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, i2, f2, dhf, ct_prev, n_prev, scal)

    dqf, dkf, dvf, dif, dff = outs
    dq = dqf.swapaxes(1, 2).reshape(B, NH, S, DH)
    dk = dkf.swapaxes(1, 2).reshape(B, NH, S, DH)
    dv = dvf.swapaxes(1, 2).reshape(B, NH, S, DH)
    di = dif.reshape(B, NH, S)
    df = dff.reshape(B, NH, S)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            di.astype(i_preact.dtype), df.astype(f_preact.dtype))


def mlstm_chunkwise_pallas_bwd_t(
    q_t, k_t, v_t, i_preact, f_preact, dh_t,
    chunk_size: int = 64, igate_act: str = "exp", eps: float = 1e-6,
    interpret: bool = False, mxu_dtype: str = "bfloat16",
):
    """Layout-native backward: q/k/v/dh in the kernel's own transposed
    (B, NH, DH, S) layout, gates (B, NH, S). The phase-2 kernel already
    wants (BNH, DH, S) blocks, so this entry feeds it with ZERO relayout
    copies (the natural-layout entry above round-trips q/k/v/dh and the
    three grad planes through ~14 full-plane HBM transposes). Returns
    (dq_t, dk_t, dv_t, di, df) in the input layouts."""
    B, NH, DH, S = q_t.shape
    assert v_t.shape[2] == DH, "pallas bwd requires DH == DV"
    CS = chunk_size
    NS = S // CS
    BNH = B * NH
    G, NSEG = _pick_layout_bwd(BNH, S, CS, DH, q_t.dtype.itemsize)
    SEG = S // NSEG
    SEGC = SEG // CS
    mxu = jnp.bfloat16 if mxu_dtype == "bfloat16" else jnp.float32

    ct_prev, n_prev, scal = chunk_carry_states_t(k_t, v_t, i_preact, f_preact,
                                                 CS, igate_act)

    qf = q_t.reshape(BNH, DH, S)
    kf = k_t.reshape(BNH, DH, S)
    vf = v_t.reshape(BNH, DH, S)
    dhf = dh_t.astype(jnp.float32).reshape(BNH, DH, S)
    i2 = i_preact.reshape(BNH, 1, S)
    f2 = f_preact.reshape(BNH, 1, S)

    qkv_spec = pl.BlockSpec((G, DH, SEG), lambda r, t: (r, 0, NSEG - 1 - t),
                            memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec((G, 1, SEG), lambda r, t: (r, 0, NSEG - 1 - t),
                             memory_space=pltpu.VMEM)
    ct_spec = pl.BlockSpec((G, SEGC, DH, DH), lambda r, t: (r, NSEG - 1 - t, 0, 0),
                           memory_space=pltpu.VMEM)
    np_spec = pl.BlockSpec((G, DH, NS), lambda r, t: (r, 0, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((G, 3, NS), lambda r, t: (r, 0, 0),
                           memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_kernel, g=G, segc=SEGC, nseg=NSEG, cs=CS, dh=DH,
                          igate_act=igate_act, eps=eps, mxu=mxu),
        grid=(BNH // G, NSEG),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, gate_spec, gate_spec, qkv_spec,
                  ct_spec, np_spec, sc_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec, gate_spec, gate_spec],
        out_shape=[
            jax.ShapeDtypeStruct((BNH, DH, S), q_t.dtype),
            jax.ShapeDtypeStruct((BNH, DH, S), k_t.dtype),
            jax.ShapeDtypeStruct((BNH, DH, S), v_t.dtype),
            jax.ShapeDtypeStruct((BNH, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((BNH, 1, S), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, DH, DH), jnp.float32),
            pltpu.VMEM((G, DH, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, i2, f2, dhf, ct_prev, n_prev, scal)

    dqf, dkf, dvf, dif, dff = outs
    sh = (B, NH, DH, S)
    return (dqf.reshape(sh).astype(q_t.dtype), dkf.reshape(sh).astype(k_t.dtype),
            dvf.reshape(sh).astype(v_t.dtype),
            dif.reshape(B, NH, S).astype(i_preact.dtype),
            dff.reshape(B, NH, S).astype(f_preact.dtype))
