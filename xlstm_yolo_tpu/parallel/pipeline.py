"""Pipeline parallelism over a ``pp`` mesh axis — GPipe-style microbatching.

A capability the reference lacks entirely (SURVEY.md §2.11: PP = No). The
xLSTM block stacks are uniform (same block repeated N times,
``xlstm_large/model.py:187``), which makes them natural pipeline targets:
each pp rank owns ``num_blocks / pp`` consecutive blocks, activations hop
rank→rank over ICI via ``jax.lax.ppermute``, and microbatches keep every
stage busy after a ``pp-1`` step fill.

Implementation: ``shard_map`` over the pp axis. Stage parameters are a
leading-axis-stacked pytree (pp, ...) sharded so each device holds only its
own stage — model memory scales 1/pp per chip. The classic GPipe schedule
(fill + steady state + drain = M + P - 1 ticks for M microbatches, P
stages) runs as a ``lax.fori_loop`` of permute→compute ticks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def stack_stage_params(stage_params: list):
    """Stack per-stage param pytrees along a new leading pp axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stage_params)


def stage_sharding(mesh: Mesh, stacked_params):
    """Each pp rank holds only its stage's slice of the stacked params."""
    def rule(x):
        spec = ["pp"] + [None] * (x.ndim - 1)
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(rule, stacked_params)


def pipeline_apply(mesh: Mesh, stage_fn, stacked_params, x, *, num_microbatches: int):
    """Run ``x`` through the pipeline; returns the final-stage output.

    stage_fn(params_slice, activations) -> activations, applied by every pp
    rank to its resident stage. x: (B, ...) with B divisible by
    num_microbatches. Output matches x's shape (pipeline preserves shape —
    true for transformer/xLSTM trunks).
    """
    pp = mesh.shape["pp"]
    B = x.shape[0]
    M = num_microbatches
    assert B % M == 0, f"batch {B} % microbatches {M} != 0"
    assert M >= pp, f"need >= {pp} microbatches to fill a {pp}-stage pipeline"

    mb = x.reshape(M, B // M, *x.shape[1:])

    def per_rank(params, mb):  # params: (1, ...) this rank's stage; mb: (M, b, ...)
        params = jax.tree.map(lambda p: p[0], params)
        rank = jax.lax.axis_index("pp")
        ticks = M + pp - 1
        buf = jnp.zeros_like(mb)  # output slots, filled as microbatches drain

        def tick(t, carry):
            cur, buf = carry  # cur: activation entering this rank this tick
            # stage 0 feeds itself from the microbatch queue
            feed = mb[jnp.clip(t, 0, M - 1)]
            cur = jnp.where(rank == 0, feed, cur)
            out = stage_fn(params, cur)
            # mask ticks where this rank has no real work yet/anymore
            active = (t >= rank) & (t < M + rank)
            out = jnp.where(active, out, cur)
            # last stage banks its finished microbatch
            idx = jnp.clip(t - (pp - 1), 0, M - 1)
            bank = (rank == pp - 1) & (t >= pp - 1)
            buf = jax.lax.cond(
                bank, lambda b: b.at[idx].set(out), lambda b: b, buf
            )
            # hop activations forward one stage over ICI
            nxt = jax.lax.ppermute(out, "pp", [(i, (i + 1) % pp) for i in range(pp)])
            return nxt, buf

        _, buf = jax.lax.fori_loop(0, ticks, tick, (jnp.zeros_like(mb[0]), buf))
        # only the last rank holds real outputs; broadcast to all so the
        # result is replicated over pp (psum of one-hot contribution)
        buf = jax.lax.psum(jnp.where(rank == pp - 1, buf, jnp.zeros_like(buf)), "pp")
        return buf

    spec_p = jax.tree.map(lambda _: P("pp"), stacked_params)
    out = shard_map(
        per_rank, mesh=mesh,
        in_specs=(spec_p, P()), out_specs=P(),
        check_vma=False,
    )(stacked_params, mb)
    return out.reshape(B, *x.shape[1:])


def pipeline_apply_nested(mesh: Mesh, stage_fn, stacked_params, x, *,
                          num_microbatches: int, batch_axis: str = "dp"):
    """GPipe over the ``pp`` axis of a multi-axis (dp, tp, sp, pp, ep) mesh,
    composable inside an outer jit'd SPMD train step.

    Unlike :func:`pipeline_apply` (dedicated 1-axis mesh), the batch stays
    sharded over ``batch_axis`` (each dp rank pipelines its own local batch
    slice), stage params are sharded over ``pp`` (leading axis = pp), and all
    other mesh axes replicate through the shard_map. stage_fn(stage_params,
    activations) must preserve activation shape.
    """
    pp = mesh.shape["pp"]
    M = num_microbatches
    spec_x = P(batch_axis)
    spec_p = jax.tree.map(lambda _: P("pp"), stacked_params)

    def per_rank(params, xl):  # params: (1, ...) this rank's stage; xl local batch
        params = jax.tree.map(lambda p: p[0], params)
        rank = jax.lax.axis_index("pp")
        Bl = xl.shape[0]
        assert Bl % M == 0, f"local batch {Bl} % microbatches {M} != 0"
        mb = xl.reshape(M, Bl // M, *xl.shape[1:])
        ticks = M + pp - 1
        buf = jnp.zeros_like(mb)

        def tick(t, carry):
            cur, buf = carry
            feed = mb[jnp.clip(t, 0, M - 1)]
            cur = jnp.where(rank == 0, feed, cur)
            out = stage_fn(params, cur)
            active = (t >= rank) & (t < M + rank)
            out = jnp.where(active, out, cur)
            idx = jnp.clip(t - (pp - 1), 0, M - 1)
            bank = (rank == pp - 1) & (t >= pp - 1)
            buf = jax.lax.cond(bank, lambda b: b.at[idx].set(out), lambda b: b, buf)
            nxt = jax.lax.ppermute(out, "pp", [(i, (i + 1) % pp) for i in range(pp)])
            return nxt, buf

        _, buf = jax.lax.fori_loop(0, ticks, tick, (jnp.zeros_like(mb[0]), buf))
        buf = jax.lax.psum(jnp.where(rank == pp - 1, buf, jnp.zeros_like(buf)), "pp")
        return buf.reshape(Bl, *xl.shape[1:])

    return shard_map(per_rank, mesh=mesh, in_specs=(spec_p, spec_x),
                     out_specs=spec_x, check_vma=False)(stacked_params, x)
