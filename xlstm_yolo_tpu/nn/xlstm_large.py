"""xLSTM-7B ("xLSTM Large") text model — flax.

TPU-native rebuild of the reference's vendored ``xlstm/xlstm_large/model.py``
(xLSTMLarge :112, xLSTMLargeBlockStack :187, mLSTMLayer :310, FeedForward
:232) plus the prefill+step ``generate`` loop (xlstm_large/generate.py) and a
**local-path** ``from_pretrained`` (xlstm_large/from_pretrained.py — which
reads ``model.safetensors`` shards + ``config.yaml`` from a directory; no hub
egress in this build).

Structure per block (weight_mode="single"):
    x -> RMSNorm(norm_mlstm) -> mLSTM layer  -> +residual
      -> RMSNorm(norm_ffn)  -> gated FFN     -> +residual
mLSTM layer: q, k (qk_dim_factor·D), v, o-gate from x; soft-capped scalar
i/f gates per head; chunkwise matrix-memory scan; per-head norm;
sigmoid(o)·h; out_proj. Submodule names mirror the torch attribute names so
checkpoint import is a mechanical rename.
"""
from __future__ import annotations

import functools
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..kernels.mlstm_native import (
    mlstm_chunkwise,
    mlstm_recurrent,
    mlstm_recurrent_step,
    soft_cap,
)
from .vil import MultiHeadLayerNorm, RMSNorm


def _round_up(x: float, multiple: int) -> int:
    v = int(-(-x // 1))  # ceil
    return -(-v // multiple) * multiple


class FeedForwardLM(nn.Module):
    """silu(proj_up_gate(x)) * proj_up(x) -> proj_down (reference
    xlstm_large/model.py:232-278, single weight mode)."""

    dim: int
    proj_factor: float = 2.6667
    round_up_to: int = 64
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        up = _round_up(self.dim * self.proj_factor, self.round_up_to)
        gate = nn.Dense(up, use_bias=self.use_bias, dtype=x.dtype, name="proj_up_gate")(x)
        a = nn.Dense(up, use_bias=self.use_bias, dtype=x.dtype, name="proj_up")(x)
        return nn.Dense(self.dim, use_bias=self.use_bias, dtype=x.dtype, name="proj_down")(
            nn.silu(gate) * a
        )


class mLSTMTextLayer(nn.Module):
    """Text-domain mLSTM mixing layer (reference xlstm_large/model.py:310).

    Unlike the vision variant (ViLLayerLarge — which convs its q/k inputs),
    q, k, v and all gates read the raw hidden state. Carries (C, n, m)
    recurrent state for decode.
    """

    dim: int
    num_heads: int
    qk_dim_factor: float = 0.5
    v_dim_factor: float = 1.0
    gate_soft_cap: float = 15.0
    chunk_size: int = 64
    use_bias: bool = False
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, state=None, return_last_state: bool = False):
        B, S, D = x.shape
        NH = self.num_heads
        qk_dim = int(D * self.qk_dim_factor)
        v_dim = int(D * self.v_dim_factor)

        q = nn.Dense(qk_dim, use_bias=self.use_bias, dtype=x.dtype, name="q")(x)
        k = nn.Dense(qk_dim, use_bias=self.use_bias, dtype=x.dtype, name="k")(x)
        v = nn.Dense(v_dim, use_bias=self.use_bias, dtype=x.dtype, name="v")(x)
        o_preact = nn.Dense(v_dim, use_bias=self.use_bias, dtype=x.dtype, name="ogate_preact")(x)
        # i/f gate projections keep bias=True regardless (reference :341-349)
        i_preact = soft_cap(nn.Dense(NH, name="igate_preact")(x), self.gate_soft_cap)
        f_preact = soft_cap(nn.Dense(NH, name="fgate_preact")(x), self.gate_soft_cap)

        qh = q.reshape(B, S, NH, -1).transpose(0, 2, 1, 3)
        kh = k.reshape(B, S, NH, -1).transpose(0, 2, 1, 3)
        vh = v.reshape(B, S, NH, -1).transpose(0, 2, 1, 3)
        ih = i_preact.transpose(0, 2, 1)
        fh = f_preact.transpose(0, 2, 1)

        cs = min(self.chunk_size, S)
        if S > 1 and S % cs == 0:
            out = mlstm_chunkwise(qh, kh, vh, ih, fh, chunk_size=cs,
                                  initial_state=state, return_last_state=return_last_state)
        else:
            # odd prompt lengths / single-token decode: exact sequential form
            out = mlstm_recurrent(qh, kh, vh, ih, fh, initial_state=state,
                                  return_last_state=return_last_state)
        h, last = out if return_last_state else (out, None)
        # xlstm_large stores the norm weight directly (init ones,
        # xlstm_large/components.py:49) — not the fork's residual 1+w
        h = MultiHeadLayerNorm(num_heads=NH, with_bias=self.use_bias, residual=False,
                               eps=self.norm_eps, name="multihead_norm")(h.astype(x.dtype))
        h = h.transpose(0, 2, 1, 3).reshape(B, S, v_dim)
        y = nn.sigmoid(o_preact) * h
        y = nn.Dense(D, use_bias=self.use_bias, dtype=x.dtype, name="out_proj")(y)
        return (y, last) if return_last_state else y


class mLSTMTextBlock(nn.Module):
    """Pre-norm mLSTM + FFN block (reference xlstm_large/model.py:475)."""

    dim: int
    num_heads: int
    qk_dim_factor: float = 0.5
    v_dim_factor: float = 1.0
    ffn_proj_factor: float = 2.6667
    ffn_round_up_to: int = 64
    gate_soft_cap: float = 15.0
    chunk_size: int = 64
    use_bias: bool = False
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, state=None, return_last_state: bool = False):
        h = RMSNorm(eps=self.norm_eps, name="norm_mlstm")(x)
        out = mLSTMTextLayer(
            self.dim, self.num_heads, qk_dim_factor=self.qk_dim_factor,
            v_dim_factor=self.v_dim_factor, gate_soft_cap=self.gate_soft_cap,
            chunk_size=self.chunk_size, use_bias=self.use_bias,
            norm_eps=self.norm_eps, name="mlstm_layer",
        )(h, state=state, return_last_state=return_last_state)
        h, last = out if return_last_state else (out, None)
        x = x + h
        h = RMSNorm(eps=self.norm_eps, name="norm_ffn")(x)
        x = x + FeedForwardLM(self.dim, self.ffn_proj_factor, self.ffn_round_up_to,
                              self.use_bias, name="ffn")(h)
        return (x, last) if return_last_state else x


class xLSTMLarge(nn.Module):
    """Embedding -> N mLSTMTextBlocks -> RMSNorm -> soft-capped lm_head
    (reference xlstm_large/model.py:112-185)."""

    vocab_size: int
    embedding_dim: int
    num_blocks: int
    num_heads: int
    qk_dim_factor: float = 0.5
    v_dim_factor: float = 1.0
    ffn_proj_factor: float = 2.6667
    ffn_round_up_to: int = 64
    gate_soft_cap: float = 15.0
    output_logit_soft_cap: float = 30.0
    chunk_size: int = 64
    use_bias: bool = False
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, tokens, state=None, return_last_states: bool = False):
        x = nn.Embed(self.vocab_size, self.embedding_dim, name="embedding")(tokens)
        new_state = {}
        for i in range(self.num_blocks):
            blk = mLSTMTextBlock(
                self.embedding_dim, self.num_heads, qk_dim_factor=self.qk_dim_factor,
                v_dim_factor=self.v_dim_factor, ffn_proj_factor=self.ffn_proj_factor,
                ffn_round_up_to=self.ffn_round_up_to, gate_soft_cap=self.gate_soft_cap,
                chunk_size=self.chunk_size, use_bias=self.use_bias,
                norm_eps=self.norm_eps, name=f"blocks_{i}",
            )
            si = None if state is None else state.get(i)
            if return_last_states:
                x, new_state[i] = blk(x, state=si, return_last_state=True)
            else:
                x = blk(x, state=si)
        x = RMSNorm(eps=self.norm_eps, name="out_norm")(x)
        logits = nn.Dense(self.vocab_size, use_bias=False, dtype=x.dtype, name="lm_head")(x)
        logits = soft_cap(logits, self.output_logit_soft_cap)
        return (logits, new_state) if return_last_states else logits


def generate(model: xLSTMLarge, variables: dict, prompt, max_new_tokens: int = 20,
             temperature: float = 0.0, rng=None):
    """Prefill + single-token-step decode (reference xlstm_large/generate.py):
    one chunkwise pass over the prompt captures (C, n, m) per block, then each
    new token runs the exact recurrent step — O(1) per token, no re-forward."""
    tokens = jnp.asarray(prompt)
    if tokens.ndim == 1:
        tokens = tokens[None]

    prefill = jax.jit(lambda v, t: model.apply(v, t, return_last_states=True))
    step = jax.jit(lambda v, t, s: model.apply(v, t, state=s, return_last_states=True))

    logits, state = prefill(variables, tokens)
    out = [tokens]
    last = logits[:, -1]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    for _ in range(max_new_tokens):
        if temperature > 0:
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, last / temperature, axis=-1)
        else:
            nxt = jnp.argmax(last, axis=-1)
        nxt = nxt[:, None]
        out.append(nxt)
        logits, state = step(variables, nxt, state)
        last = logits[:, -1]
    return jnp.concatenate(out, axis=1)


def generate_scan(model: xLSTMLarge, variables: dict, prompt,
                  max_new_tokens: int = 20, temperature: float = 0.0, rng=None):
    """Serving decode path: the ENTIRE token loop runs on device as one
    ``lax.scan`` — one jit invocation total, no per-token host round-trips
    (the python-loop ``generate`` pays relay/dispatch latency every step).
    Same math as ``generate``."""
    tokens = jnp.asarray(prompt)
    if tokens.ndim == 1:
        tokens = tokens[None]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    new = _scan_decode(model, variables, tokens, rng, int(max_new_tokens),
                       float(temperature))
    return jnp.concatenate([tokens, new], axis=1)


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def _scan_decode(model, variables, tokens, rng, max_new_tokens, temperature):
    """Module-level so jax.jit caches across generate_scan calls (a closure
    would recompile every invocation)."""
    logits, state = model.apply(variables, tokens, return_last_states=True)

    def body(carry, _):
        last, state, rng = carry
        if temperature > 0:
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, last / temperature, axis=-1)
        else:
            nxt = jnp.argmax(last, axis=-1)
        lg, state = model.apply(variables, nxt[:, None], state=state,
                                return_last_states=True)
        return (lg[:, -1], state, rng), nxt

    (_, _, _), toks = jax.lax.scan(
        body, (logits[:, -1], state, rng), None, length=max_new_tokens)
    return toks.swapaxes(0, 1)  # (B, T_new)


# ---------------------------------------------------------------------------
# local checkpoint import
# ---------------------------------------------------------------------------

def _load_state_dict(path: Path) -> dict:
    """Read model.safetensors / model_{n}.safetensors shards / HF-indexed
    shards from a local directory (reference from_pretrained.py:34-46)."""
    from safetensors import safe_open

    def read(f):
        out = {}
        with safe_open(str(f), framework="np") as sf:
            for kname in sf.keys():
                out[kname] = sf.get_tensor(kname)
        return out

    sd = {}
    if (path / "model.safetensors").exists():
        sd = read(path / "model.safetensors")
    else:
        n = 0
        while (path / f"model_{n}.safetensors").exists():
            sd.update(read(path / f"model_{n}.safetensors"))
            n += 1
        if not sd:  # HF-style sharding
            for f in sorted(path.glob("model-*-of-*.safetensors")):
                sd.update(read(f))
    if not sd:
        raise FileNotFoundError(f"no model*.safetensors found under {path}")
    return sd


def _load_config(path: Path) -> dict:
    import yaml

    if (path / "config.yaml").exists():
        return yaml.safe_load((path / "config.yaml").read_text())
    if (path / "config.json").exists():
        return json.loads((path / "config.json").read_text())
    raise FileNotFoundError(f"no config.yaml/config.json under {path}")


def from_pretrained(checkpoint_path: str | Path, chunk_size: int | None = None):
    """Build an ``xLSTMLarge`` + its flax params from a LOCAL xLSTM-7B-style
    checkpoint directory. Returns (model, {"params": ...}).

    The torch state_dict keys (embedding.weight, backbone.blocks.N.*,
    backbone.out_norm.weight, lm_head.weight) are renamed mechanically;
    nn.Linear weights transpose to Dense kernels.
    """
    path = Path(checkpoint_path)
    cfg = _load_config(path)
    sd = _load_state_dict(path)

    model = xLSTMLarge(
        vocab_size=int(cfg["vocab_size"]),
        embedding_dim=int(cfg["embedding_dim"]),
        num_blocks=int(cfg["num_blocks"]),
        num_heads=int(cfg["num_heads"]),
        qk_dim_factor=float(cfg.get("qk_dim_factor", 0.5)),
        v_dim_factor=float(cfg.get("v_dim_factor", 1.0)),
        ffn_proj_factor=float(cfg.get("ffn_proj_factor", 2.6667)),
        ffn_round_up_to=int(cfg.get("ffn_round_up_to_multiple_of", 64)),
        gate_soft_cap=float(cfg.get("gate_soft_cap", 15.0)),
        output_logit_soft_cap=float(cfg.get("output_logit_soft_cap", 30.0)),
        chunk_size=int(chunk_size or cfg.get("chunk_size", 64)),
        use_bias=bool(cfg.get("use_bias", False)),
        norm_eps=float(cfg.get("norm_eps", 1e-6)),
    )

    def dense(prefix):
        p = {"kernel": jnp.asarray(sd[f"{prefix}.weight"]).T}
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    def norm(prefix):
        return {"scale": jnp.asarray(sd[f"{prefix}.weight"])}

    params = {
        "embedding": {"embedding": jnp.asarray(sd["embedding.weight"])},
        "out_norm": norm("backbone.out_norm"),
        "lm_head": dense("lm_head"),
    }
    for i in range(model.num_blocks):
        b = f"backbone.blocks.{i}"
        layer = {
            "q": dense(f"{b}.mlstm_layer.q"),
            "k": dense(f"{b}.mlstm_layer.k"),
            "v": dense(f"{b}.mlstm_layer.v"),
            "ogate_preact": dense(f"{b}.mlstm_layer.ogate_preact"),
            "igate_preact": dense(f"{b}.mlstm_layer.igate_preact"),
            "fgate_preact": dense(f"{b}.mlstm_layer.fgate_preact"),
            "out_proj": dense(f"{b}.mlstm_layer.out_proj"),
            "multihead_norm": {"scale": jnp.asarray(sd[f"{b}.mlstm_layer.multihead_norm.weight"])},
        }
        if f"{b}.mlstm_layer.multihead_norm.bias" in sd:
            layer["multihead_norm"]["bias"] = jnp.asarray(sd[f"{b}.mlstm_layer.multihead_norm.bias"])
        params[f"blocks_{i}"] = {
            "norm_mlstm": norm(f"{b}.norm_mlstm"),
            "norm_ffn": norm(f"{b}.norm_ffn"),
            "mlstm_layer": layer,
            "ffn": {
                "proj_up_gate": dense(f"{b}.ffn.proj_up_gate"),
                "proj_up": dense(f"{b}.ffn.proj_up"),
                "proj_down": dense(f"{b}.ffn.proj_down"),
            },
        }

    # shape-check against a fresh init to catch mapping drift early
    ref = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)))
    ref_shapes = jax.tree.map(lambda x: x.shape, ref["params"])
    got_shapes = jax.tree.map(lambda x: x.shape, params)
    if ref_shapes != got_shapes:
        raise ValueError(f"checkpoint/model shape mismatch:\nexpected {ref_shapes}\ngot {got_shapes}")
    return model, {"params": params}
