"""Conv+BN folding as a pure pytree transform.

Reference ``utils/torch_utils.py:242`` (fuse_conv_and_bn) rebuilds modules;
here the graph stays untouched: for every conv kernel with a sibling BN, the
BN affine + running stats fold into the conv kernel, and the BN is reset to
an identity transform carrying the fused bias. Works on any model built from
ConvBN blocks; numerically identical at eval (BN in running-average mode).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

BN_EPS = 1e-3  # must match nn.modules ConvBN's BatchNorm epsilon


def fuse_conv_bn(variables: dict) -> dict:
    """Return new variables with every conv+bn pair folded."""
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])  # shallow copy via rebuild
    stats = jax.tree_util.tree_map(lambda x: x, variables.get("batch_stats", {}))

    def walk(p_node, s_node):
        if not isinstance(p_node, dict):
            return
        if "conv" in p_node and "bn" in p_node and isinstance(s_node, dict) and "bn" in s_node:
            kernel = p_node["conv"]["kernel"]  # (kh, kw, cin, cout)
            gamma = p_node["bn"].get("scale", jnp.ones(kernel.shape[-1], kernel.dtype))
            beta = p_node["bn"].get("bias", jnp.zeros(kernel.shape[-1], kernel.dtype))
            mean = s_node["bn"]["mean"]
            var = s_node["bn"]["var"]
            inv = gamma / jnp.sqrt(var + BN_EPS)
            p_node["conv"]["kernel"] = (kernel * inv.astype(kernel.dtype)).astype(kernel.dtype)
            p_node["bn"]["scale"] = jnp.ones_like(gamma)
            p_node["bn"]["bias"] = (beta - mean * inv).astype(beta.dtype)
            s_node["bn"]["mean"] = jnp.zeros_like(mean)
            s_node["bn"]["var"] = jnp.ones_like(var) - BN_EPS
        for k, v in p_node.items():
            if isinstance(v, dict):
                walk(v, s_node.get(k, {}) if isinstance(s_node, dict) else {})

    walk(params, stats)
    return {"params": params, "batch_stats": stats}
