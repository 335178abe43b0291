"""Sequence-parallel chunkwise mLSTM over a mesh axis.

The capability SURVEY.md §5 calls out: the chunkwise formulation's
inter-chunk state is a small per-head (DQK, DV) tensor, so sequence length
shards across chips with only tiny state handoffs over ICI — something the
reference's math supports but its NCCL stack never exploits.

Algorithm (associative segment-summary prefix):
  1. each shard runs the local chunkwise pass in summary mode, producing its
     segment summary (C_seg, n_seg, m_seg, btot_seg) — the state the segment
     would leave behind from a zero initial state, plus its total log-decay;
  2. all shards all-gather the summaries (tiny: NH·DQK·DV per shard) and
     compute their exclusive prefix state with the same log-space combine
     the intra-shard scan uses;
  3. each shard re-runs the local pass seeded with its prefix state.

Cost: 2x local compute (the standard prefix-scan trade) + one all_gather of
KB-scale states; wall-clock scales ~1/sp for long sequences.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mlstm_native import mlstm_chunkwise


def _combine(seg_a, seg_b):
    """Sequential composition of two segment summaries (A then B)."""
    c_a, n_a, m_a, b_a = seg_a
    c_b, n_b, m_b, b_b = seg_b
    m = jnp.maximum(m_a + b_b, m_b)
    decay_a = jnp.exp(m_a + b_b - m)[..., None, None]
    decay_b = jnp.exp(m_b - m)[..., None, None]
    c = c_a * decay_a + c_b * decay_b
    n = n_a * decay_a[..., 0] + n_b * decay_b[..., 0]
    return (c, n, m, b_a + b_b)


def mlstm_chunkwise_sp(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    i_preact: jnp.ndarray,
    f_preact: jnp.ndarray,
    mesh,
    axis: str = "sp",
    chunk_size: int = 64,
    igate_act: str = "exp",
) -> jnp.ndarray:
    """Chunkwise mLSTM with S sharded over ``axis`` of ``mesh``.

    Inputs are global (B, NH, S, DH)/(B, NH, S); S must divide by
    mesh.shape[axis] * chunk_size. Output matches mlstm_chunkwise.
    """
    from jax import shard_map

    sp = mesh.shape[axis]
    B, NH, S, DH = q.shape
    DV = v.shape[-1]
    assert S % (sp * chunk_size) == 0, f"S={S} must divide sp*chunk={sp * chunk_size}"

    def local(q, k, v, i_, f_):
        # 1. local segment summary from zero state
        _, (c_seg, n_seg, m_seg) = mlstm_chunkwise(
            q, k, v, i_, f_, chunk_size=chunk_size, igate_act=igate_act,
            return_last_state=True,
        )
        logf = jax.nn.log_sigmoid(f_.astype(jnp.float32))
        btot = jnp.sum(logf, axis=-1)  # (B, NH)

        # 2. all-gather summaries; exclusive prefix for this shard
        idx = jax.lax.axis_index(axis)
        all_c = jax.lax.all_gather(c_seg, axis)  # (sp, B, NH, DQK, DV)
        all_n = jax.lax.all_gather(n_seg, axis)
        all_m = jax.lax.all_gather(m_seg, axis)
        all_b = jax.lax.all_gather(btot, axis)

        def scan_body(carry, xs):
            out = carry
            carry = _combine(carry, xs)
            return carry, out  # emit the carry-IN (exclusive prefix)

        init = (
            jnp.zeros((B, NH, DH, DV), jnp.float32),
            jnp.zeros((B, NH, DH), jnp.float32),
            jnp.zeros((B, NH), jnp.float32),
            jnp.zeros((B, NH), jnp.float32),
        )
        _, prefixes = jax.lax.scan(scan_body, init, (all_c, all_n, all_m, all_b))
        c0 = prefixes[0][idx]
        n0 = prefixes[1][idx]
        m0 = prefixes[2][idx]

        # 3. local pass seeded with the prefix state
        return mlstm_chunkwise(
            q, k, v, i_, f_, chunk_size=chunk_size, igate_act=igate_act,
            initial_state=(c0, n0, m0),
        )

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis, None), P(None, None, axis, None),
                  P(None, None, axis, None), P(None, None, axis), P(None, None, axis)),
        out_specs=P(None, None, axis, None),
        check_vma=False,  # prefix indexing mixes device-varying and invariant values
    )
    return fn(q, k, v, i_preact, f_preact)
