"""Mixture-of-Experts feed-forward + expert parallelism over an ``ep`` axis.

A capability the reference lacks (SURVEY.md §2.11: EP = No). Drop-in
replacement for the gated FFN inside xLSTM blocks: top-k token routing over
E experts. TPU-first design choices:

  * dense one-hot dispatch/combine (einsum onto the experts axis) — static
    shapes, no gather/scatter, MXU does the routing;
  * expert weights carry a leading E axis sharded over ``ep``; under jit,
    XLA partitions the dispatch einsum into an all-to-all over ICI;
  * auxiliary load-balancing loss (Switch-style: E · Σ fraction·prob).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MoEFeedForward(nn.Module):
    """Top-k routed SwiGLU expert FFN.

    x (B, S, D) -> router logits (B, S, E) -> top-k one-hot combine of
    expert outputs. Expert params: (E, D, F) / (E, F, D).
    """

    dim: int
    num_experts: int = 4
    top_k: int = 1
    proj_factor: float = 2.6667
    round_up_to: int = 64

    @nn.compact
    def __call__(self, x):
        D, E = self.dim, self.num_experts
        F = int(-(-self.dim * self.proj_factor // self.round_up_to) * self.round_up_to)
        logits = nn.Dense(E, use_bias=False, dtype=x.dtype, name="router")(x)  # (B,S,E)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        topv, topi = jax.lax.top_k(probs, self.top_k)  # (B,S,K)
        # combine weights renormalized over the selected experts
        topv = topv / jnp.clip(jnp.sum(topv, axis=-1, keepdims=True), 1e-9, None)
        # dense one-hot combine tensor (B,S,E): sum_k topv_k * onehot(topi_k)
        comb = jnp.sum(jax.nn.one_hot(topi, E, dtype=jnp.float32) * topv[..., None], axis=-2)

        w_gate = self.param("w_gate", nn.initializers.lecun_normal(), (E, D, F))
        w_up = self.param("w_up", nn.initializers.lecun_normal(), (E, D, F))
        w_down = self.param("w_down", nn.initializers.lecun_normal(), (E, F, D))

        xf = x.astype(jnp.float32)
        # every expert sees every token (dense); the combine zeroes unrouted
        # pairs. At YOLO/LM scales E is small (4-16) so the E× FLOPs ride the
        # MXU; sparsity returns via the ep shard: each device computes only
        # its resident experts' slice of the einsum.
        g = jnp.einsum("bsd,edf->besf", xf, w_gate)
        u = jnp.einsum("bsd,edf->besf", xf, w_up)
        y_e = jnp.einsum("besf,efd->besd", nn.silu(g) * u, w_down)
        y = jnp.einsum("besd,bse->bsd", y_e, comb)

        # Switch-style load-balance aux loss
        frac = jnp.mean(comb > 0, axis=(0, 1))  # tokens per expert
        imp = jnp.mean(probs, axis=(0, 1))  # router mass per expert
        self.sow("losses", "moe_aux", E * jnp.sum(frac * imp))
        return y.astype(x.dtype)


def expert_sharding(mesh: Mesh, params):
    """Shard any leading-E param axis over ep; replicate the rest."""
    ep = mesh.shape.get("ep", 1)

    def rule(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if ep > 1 and name in ("w_gate", "w_up", "w_down") and x.shape[0] % ep == 0:
            return NamedSharding(mesh, P("ep", *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
