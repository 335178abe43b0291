"""Chunkwise mLSTM backward — explicit gradient equations (golden form).

Hand-derived VJP of ``mlstm_native.mlstm_chunkwise`` with the stabilizer
quantities (m_prev, m_loc, m_new, d_max, stab) treated as constants — the
standard kernel practice (the reference's Triton backward does the same):
``h`` is analytically invariant to stabilizer shifts (they cancel), so the
frozen-stabilizer gradient EQUALS the autograd gradient wherever the
normalizer's ``exp(-stab)`` floor is inactive. Verified against
``jax.vjp(mlstm_chunkwise)`` in tests.

This module is the golden model for the Pallas backward kernel
(``mlstm_pallas_bwd``): same equations, batched jnp, O(S·CS) memory.

Shapes mirror mlstm_chunkwise: q/k (B, NH, S, DH), v (B, NH, S, DV),
gates (B, NH, S); returns (dq, dk, dv, di_preact, df_preact).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .mlstm_native import _log_igate


def mlstm_chunkwise_bwd_ref(
    q, k, v, i_preact, f_preact, dh,
    chunk_size: int = 64, igate_act: str = "exp", eps: float = 1e-6,
):
    B, NH, S, DH = q.shape
    DV = v.shape[-1]
    CS = chunk_size
    NS = S // CS
    f32 = jnp.float32

    qc = q.astype(f32).reshape(B, NH, NS, CS, DH) / jnp.sqrt(f32(DH))
    kc = k.astype(f32).reshape(B, NH, NS, CS, DH)
    vc = v.astype(f32).reshape(B, NH, NS, CS, DV)
    fp = f_preact.astype(f32).reshape(B, NH, NS, CS)
    ip = i_preact.astype(f32).reshape(B, NH, NS, CS)
    logf = jax.nn.log_sigmoid(fp)
    logi = _log_igate(ip, igate_act).reshape(B, NH, NS, CS)
    dhc = dh.astype(f32).reshape(B, NH, NS, CS, DV)

    # ---- forward replay (identical to mlstm_chunkwise) -------------------
    b = jnp.cumsum(logf, axis=-1)
    btot = b[..., -1]
    g_acc = logi + (btot[..., None] - b)
    m_loc = jnp.max(g_acc, axis=-1)
    gw = jnp.exp(g_acc - m_loc[..., None])
    kv = jnp.einsum("bncsd,bncse->bncde", kc * gw[..., None], vc)
    ksum = jnp.sum(kc * gw[..., None], axis=-2)

    c0 = jnp.zeros((B, NH, DH, DV), f32)
    n0 = jnp.zeros((B, NH, DH), f32)
    m0 = jnp.zeros((B, NH), f32)

    def chunk_step(carry, xs):
        c_prev, n_prev, m_prev = carry
        kv_j, ksum_j, btot_j, mloc_j = xs
        m_new = jnp.maximum(btot_j + m_prev, mloc_j)
        d_old = jnp.exp(btot_j + m_prev - m_new)[..., None, None]
        d_new = jnp.exp(mloc_j - m_new)[..., None, None]
        c_new = c_prev * d_old + kv_j * d_new
        n_new = n_prev * d_old[..., 0] + ksum_j * d_new[..., 0]
        return (c_new, n_new, m_new), (c_prev, n_prev, m_prev, d_old[..., 0, 0], d_new[..., 0, 0])

    xs = (jnp.moveaxis(kv, 2, 0), jnp.moveaxis(ksum, 2, 0),
          jnp.moveaxis(btot, 2, 0), jnp.moveaxis(m_loc, 2, 0))
    _, saved = jax.lax.scan(chunk_step, (c0, n0, m0), xs)
    c_prev = jnp.moveaxis(saved[0], 0, 2)  # (B, NH, NS, DH, DV)
    n_prev = jnp.moveaxis(saved[1], 0, 2)  # (B, NH, NS, DH)
    m_prev = jnp.moveaxis(saved[2], 0, 2)  # (B, NH, NS)
    d_old = jnp.moveaxis(saved[3], 0, 2)  # (B, NH, NS)
    d_new = jnp.moveaxis(saved[4], 0, 2)  # (B, NH, NS)

    log_fg = b[..., :, None] - b[..., None, :]
    causal = jnp.tril(jnp.ones((CS, CS), dtype=bool))
    log_d = jnp.where(causal, log_fg + logi[..., None, :], -jnp.inf)
    d_max = jnp.max(log_d, axis=-1)
    inter_decay_log = m_prev[..., None] + b
    stab = jnp.maximum(d_max, inter_decay_log)
    d = jnp.exp(log_d - stab[..., None])
    e = jnp.einsum("bncsd,bnctd->bncst", qc, kc) * d
    q_inter = qc * jnp.exp(inter_decay_log - stab)[..., None]
    inter_norm = jnp.einsum("bncsd,bncd->bncs", q_inter, n_prev)
    row = jnp.sum(e, axis=-1) + inter_norm  # R_s
    floor = jnp.exp(-stab)
    normalizer = jnp.maximum(jnp.abs(row), floor)[..., None] + eps
    num = (jnp.einsum("bncst,bnctd->bncsd", e, vc)
           + jnp.einsum("bncsd,bncde->bncse", q_inter, c_prev))
    h = num / normalizer

    # ---- backward --------------------------------------------------------
    dA = dhc / normalizer  # (B, NH, NS, CS, DV)
    dN = -jnp.sum(dhc * h, axis=-1) / normalizer[..., 0]  # (B, NH, NS, CS)
    smooth = jnp.abs(row) > floor
    dR = jnp.where(smooth, jnp.sign(row) * dN, 0.0)

    # intra attention
    de = jnp.einsum("bncsd,bnctd->bncst", dA, vc) + dR[..., None]
    de = jnp.where(causal, de, 0.0)
    dqk = de * d
    dqc = jnp.einsum("bncst,bnctd->bncsd", dqk, kc)
    dkc = jnp.einsum("bncst,bncsd->bnctd", dqk, qc)
    dvc = jnp.einsum("bncst,bncsd->bnctd", e, dA)
    G = de * e  # gate grads through exp(b_s + w_t - stab)
    db = jnp.sum(G, axis=-1)  # += over t -> index s
    dlogi = jnp.sum(G, axis=-2)  # += over s -> index t
    db = db - jnp.sum(G, axis=-2)  # w_t = logi_t - b_t

    # inter attention
    dqt = jnp.einsum("bncse,bncde->bncsd", dA, c_prev) + dR[..., None] * n_prev[..., None, :]
    dqc = dqc + dqt * jnp.exp(inter_decay_log - stab)[..., None]
    db = db + jnp.sum(dqt * q_inter, axis=-1)
    dc_attn = jnp.einsum("bncsd,bncse->bncde", q_inter, dA)  # dC_prev per chunk
    dn_attn = jnp.einsum("bncs,bncsd->bncd", dR, q_inter)  # dn_prev per chunk

    # reverse state scan: dcp_j = dc_attn_j + d_old_j * dcp_{j+1}
    def rev_step(carry, xs):
        dcn, dnn = carry  # grads w.r.t. c_new_j / n_new_j ( = c_prev_{j+1})
        dca_j, dna_j, dold_j, cprev_j, nprev_j = xs
        dcp = dca_j + dcn * dold_j[..., None, None]
        dnp_ = dna_j + dnn * dold_j[..., None]
        # gate grad through decay_old (m frozen): d btot
        dbtot_decay = (jnp.sum(dcn * cprev_j, axis=(-2, -1))
                       + jnp.sum(dnn * nprev_j, axis=-1)) * dold_j
        return (dcp, dnp_), (dcn, dnn, dbtot_decay)

    xs_rev = (jnp.moveaxis(dc_attn, 2, 0)[::-1], jnp.moveaxis(dn_attn, 2, 0)[::-1],
              jnp.moveaxis(d_old, 2, 0)[::-1], jnp.moveaxis(c_prev, 2, 0)[::-1],
              jnp.moveaxis(n_prev, 2, 0)[::-1])
    zero_c = jnp.zeros((B, NH, DH, DV), f32)
    zero_n = jnp.zeros((B, NH, DH), f32)
    _, outs = jax.lax.scan(rev_step, (zero_c, zero_n), xs_rev)
    dcn = jnp.moveaxis(outs[0][::-1], 0, 2)  # grad w.r.t. c_new_j (B,NH,NS,DH,DV)
    dnn = jnp.moveaxis(outs[1][::-1], 0, 2)  # grad w.r.t. n_new_j
    dbtot = jnp.moveaxis(outs[2][::-1], 0, 2)  # (B, NH, NS)

    # kv / ksum path: c_new = d_old*c_prev + d_new*kv_j
    dkv = dcn * d_new[..., None, None]
    dksum = dnn * d_new[..., None]
    kg = kc * gw[..., None]
    dvc = dvc + jnp.einsum("bncsd,bncde->bncse", kg, dkv)
    dk_state = jnp.einsum("bncde,bncse->bncsd", dkv, vc) + dksum[..., None, :]
    dkc = dkc + dk_state * gw[..., None]
    dgw = jnp.sum(dk_state * kc, axis=-1)  # (B, NH, NS, CS)
    gi = dgw * gw
    dlogi = dlogi + gi
    dbtot = dbtot + jnp.sum(gi, axis=-1)
    db = db - gi

    # fold btot into b's last slot, then reverse-cumsum through the cumsum
    db = db.at[..., -1].add(dbtot)
    dlogf = jnp.flip(jnp.cumsum(jnp.flip(db, -1), -1), -1)

    dq = (dqc / jnp.sqrt(f32(DH))).reshape(B, NH, S, DH)
    dk = dkc.reshape(B, NH, S, DH)
    dv = dvc.reshape(B, NH, S, DV)
    df = (dlogf * jax.nn.sigmoid(-fp)).reshape(B, NH, S)
    if igate_act == "sigmoid":
        di = (dlogi * jax.nn.sigmoid(-ip)).reshape(B, NH, S)
    else:
        di = dlogi.reshape(B, NH, S)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            di.astype(i_preact.dtype), df.astype(f_preact.dtype))
