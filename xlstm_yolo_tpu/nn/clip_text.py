"""CLIP text tower — in-framework open-vocabulary text encoding.

The reference encodes arbitrary class strings at runtime by importing the
OpenAI ``clip`` package (``/root/reference/nn/tasks.py:746-763`` downloads
ViT-B/32 and runs ``clip.tokenize`` + ``model.encode_text`` inside
``WorldModel.set_classes``; ``models/yolo/world/train.py`` does the same per
training batch). This module provides the TPU-native equivalent:

  * :class:`SimpleTokenizer` — CLIP's byte-level BPE (lower-cased, html-
    unescaped, ``<|startoftext|>``/``<|endoftext|>`` specials, merges from the
    published ``bpe_simple_vocab_16e6.txt.gz``). The merge table is loaded
    from a user-supplied path (zero-egress build: we never download it); the
    BPE machinery itself is verified against ``transformers.CLIPTokenizer``
    on a synthetic vocabulary (tests/test_clip_text.py).
  * :class:`CLIPTextTower` — flax implementation of the CLIP text
    transformer: token + learned positional embeddings, pre-LN residual
    blocks with causal self-attention and QuickGELU MLPs, final LayerNorm,
    and the text projection taken at the EOT token (= argmax over token ids,
    exactly the OpenAI readout).
  * :func:`load_openai_clip_text` — name-mapped import of an OpenAI
    ``clip`` state dict (``transformer.resblocks.N.attn.in_proj_weight`` et
    al.) into the flax parameter tree.
  * :class:`ClipTextEncoder` — ``list[str] -> (n, embed)`` L2-normalised
    features; plugs directly into ``TaskModel.set_classes`` and
    ``Trainer.text_encoder`` (the MultiModalDataset ``embed_fn``).

Weight-transfer forward parity vs ``transformers.CLIPTextModelWithProjection``
(same architecture as OpenAI CLIP with ``hidden_act='quick_gelu'``) is
asserted in tests — the zero-egress analogue of loading the real checkpoint.
"""
from __future__ import annotations

import functools
import gzip
import html
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------


@functools.lru_cache()
def bytes_to_unicode() -> dict:
    """Reversible byte -> printable-unicode map (GPT-2/CLIP byte-level BPE).

    Published constant construction: printable ASCII + latin-1 ranges keep
    their own codepoints; the remaining 68 bytes are assigned 256+n.
    """
    bs = (list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word: tuple) -> set:
    """Set of adjacent symbol bigrams in ``word``."""
    return set(zip(word[:-1], word[1:]))


def _clean(text: str) -> str:
    """CLIP's whitespace_clean + basic_clean (ftfy is optional: a missing
    ftfy only affects mojibake repair, not tokenization structure)."""
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    import regex as re

    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    """CLIP byte-level BPE tokenizer.

    ``bpe_path`` points at the published merge list (``bpe_simple_vocab_
    16e6.txt.gz`` or an uncompressed/truncated text file of the same format:
    first line a header, then one ``a b`` merge per line). The vocabulary is
    derived exactly as OpenAI does: 256 byte symbols, their ``</w>``
    word-final variants, one token per merge, then the two specials.
    """

    def __init__(self, bpe_path: str | Path, n_merges: int | None = 48_894):
        import regex as re

        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        p = Path(bpe_path)
        raw = gzip.open(p, "rt", encoding="utf-8").read() if p.suffix == ".gz" \
            else p.read_text(encoding="utf-8")
        lines = raw.split("\n")
        merge_lines = lines[1:]  # line 0 is the version header
        if n_merges is not None:
            merge_lines = merge_lines[:n_merges]
        merges = [tuple(m.split()) for m in merge_lines if len(m.split()) == 2]
        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {t: i for i, t in enumerate(vocab)}
        self.decoder = {i: t for t, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE)
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self.vocab_size = len(self.encoder)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word, i = [], 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list:
        bpe_tokens = []
        for token in self.pat.findall(_clean(text).lower()):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return bytearray(self.byte_decoder[c] for c in text).decode(
            "utf-8", errors="replace").replace("</w>", " ")

    def __call__(self, texts, context_length: int = 77, truncate: bool = True) -> np.ndarray:
        """clip.tokenize: (n, context_length) int32 with SOT/EOT framing."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot] + self.encode(t) + [self.eot]
            if len(ids) > context_length:
                if not truncate:
                    raise ValueError(f"text {i} too long for context {context_length}")
                ids = ids[:context_length]
                ids[-1] = self.eot
            out[i, : len(ids)] = ids
        return out


# ---------------------------------------------------------------------------
# Flax text transformer
# ---------------------------------------------------------------------------


def quick_gelu(x):
    """OpenAI CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class _ResBlock(nn.Module):
    """Pre-LN transformer block with causal MHA + QuickGELU MLP."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, x):
        S = x.shape[1]
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, name="attn_in")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.width // self.heads

        def heads_split(t):
            return t.reshape(t.shape[0], S, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        causal = jnp.tril(jnp.ones((S, S), bool))
        att = jnp.where(causal, att, jnp.finfo(att.dtype).min)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3)
        o = o.reshape(o.shape[0], S, self.width)
        x = x + nn.Dense(self.width, name="attn_out")(o)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * self.width, name="mlp_fc")(h)
        h = nn.Dense(self.width, name="mlp_proj")(quick_gelu(h))
        return x + h


class CLIPTextTower(nn.Module):
    """CLIP text encoder: tokens (B, S) int -> (B, embed_dim) features.

    Defaults are ViT-B/32's text config (the one the reference downloads).
    """

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512

    @nn.compact
    def __call__(self, tokens):
        tok_emb = self.param("token_embedding", nn.initializers.normal(0.02),
                             (self.vocab_size, self.width))
        pos_emb = self.param("positional_embedding", nn.initializers.normal(0.01),
                             (self.context_length, self.width))
        # jnp.asarray: imported checkpoints arrive as numpy, which can't be
        # fancy-indexed by a traced token array
        x = jnp.asarray(tok_emb)[tokens] + jnp.asarray(pos_emb)[None, : tokens.shape[1]]
        for i in range(self.layers):
            x = _ResBlock(self.width, self.heads, name=f"resblock_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        proj = self.param("text_projection", nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.embed_dim))
        # EOT readout: the highest token id in each row IS <|endoftext|>
        eot = jnp.argmax(tokens, axis=-1)
        feats = x[jnp.arange(x.shape[0]), eot]
        return feats @ proj


# ---------------------------------------------------------------------------
# Checkpoint import
# ---------------------------------------------------------------------------


def load_openai_clip_text(state_dict: dict, layers: int | None = None) -> dict:
    """OpenAI ``clip`` state dict (text half) -> CLIPTextTower params.

    Accepts numpy or torch tensors keyed the OpenAI way:
    ``token_embedding.weight``, ``positional_embedding``,
    ``transformer.resblocks.N.{ln_1,ln_2}.{weight,bias}``,
    ``...attn.in_proj_weight/in_proj_bias``, ``...attn.out_proj.*``,
    ``...mlp.c_fc.*``, ``...mlp.c_proj.*``, ``ln_final.*``,
    ``text_projection``. Linear weights transpose (torch stores out x in).
    """

    def A(k):
        v = state_dict[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    if layers is None:
        layers = 1 + max(int(k.split(".")[2]) for k in state_dict
                         if k.startswith("transformer.resblocks."))
    params = {
        "token_embedding": A("token_embedding.weight"),
        "positional_embedding": A("positional_embedding"),
        "text_projection": A("text_projection"),
        "ln_final": {"scale": A("ln_final.weight"), "bias": A("ln_final.bias")},
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        params[f"resblock_{i}"] = {
            "ln_1": {"scale": A(f"{p}.ln_1.weight"), "bias": A(f"{p}.ln_1.bias")},
            "ln_2": {"scale": A(f"{p}.ln_2.weight"), "bias": A(f"{p}.ln_2.bias")},
            "attn_in": {"kernel": A(f"{p}.attn.in_proj_weight").T,
                        "bias": A(f"{p}.attn.in_proj_bias")},
            "attn_out": {"kernel": A(f"{p}.attn.out_proj.weight").T,
                         "bias": A(f"{p}.attn.out_proj.bias")},
            "mlp_fc": {"kernel": A(f"{p}.mlp.c_fc.weight").T,
                       "bias": A(f"{p}.mlp.c_fc.bias")},
            "mlp_proj": {"kernel": A(f"{p}.mlp.c_proj.weight").T,
                         "bias": A(f"{p}.mlp.c_proj.bias")},
        }
    return params


def load_hf_clip_text(hf_state_dict: dict) -> dict:
    """``transformers`` CLIPTextModelWithProjection state dict -> OpenAI
    naming -> CLIPTextTower params (HF q/k/v projections concatenate into the
    OpenAI packed in_proj)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in hf_state_dict.items()}
    tm = "text_model."
    out = {
        "token_embedding.weight": sd[tm + "embeddings.token_embedding.weight"],
        "positional_embedding": sd[tm + "embeddings.position_embedding.weight"],
        "ln_final.weight": sd[tm + "final_layer_norm.weight"],
        "ln_final.bias": sd[tm + "final_layer_norm.bias"],
        "text_projection": sd["text_projection.weight"].T,
    }
    i = 0
    while f"{tm}encoder.layers.{i}.layer_norm1.weight" in sd:
        p, q = f"{tm}encoder.layers.{i}", f"transformer.resblocks.{i}"
        out[f"{q}.ln_1.weight"] = sd[f"{p}.layer_norm1.weight"]
        out[f"{q}.ln_1.bias"] = sd[f"{p}.layer_norm1.bias"]
        out[f"{q}.ln_2.weight"] = sd[f"{p}.layer_norm2.weight"]
        out[f"{q}.ln_2.bias"] = sd[f"{p}.layer_norm2.bias"]
        out[f"{q}.attn.in_proj_weight"] = np.concatenate(
            [sd[f"{p}.self_attn.{n}_proj.weight"] for n in ("q", "k", "v")], 0)
        out[f"{q}.attn.in_proj_bias"] = np.concatenate(
            [sd[f"{p}.self_attn.{n}_proj.bias"] for n in ("q", "k", "v")], 0)
        out[f"{q}.attn.out_proj.weight"] = sd[f"{p}.self_attn.out_proj.weight"]
        out[f"{q}.attn.out_proj.bias"] = sd[f"{p}.self_attn.out_proj.bias"]
        out[f"{q}.mlp.c_fc.weight"] = sd[f"{p}.mlp.fc1.weight"]
        out[f"{q}.mlp.c_fc.bias"] = sd[f"{p}.mlp.fc1.bias"]
        out[f"{q}.mlp.c_proj.weight"] = sd[f"{p}.mlp.fc2.weight"]
        out[f"{q}.mlp.c_proj.bias"] = sd[f"{p}.mlp.fc2.bias"]
        i += 1
    return load_openai_clip_text(out, layers=i)


# ---------------------------------------------------------------------------
# Encoder facade
# ---------------------------------------------------------------------------


class ClipTextEncoder:
    """Callable ``list[str] -> (n, embed) float32`` L2-normalised features.

    Drop-in for ``TaskModel.set_classes(texts, encoder=...)``,
    ``Trainer.text_encoder``, and the MultiModalDataset ``embed_fn``.

    Construction paths (all zero-egress):
      * ``ClipTextEncoder(bpe_path=..., params=...)`` — user-provided merge
        table + (optionally) imported OpenAI/HF weights; random init if
        ``params`` is None (structure-only use, e.g. plumbing tests).
      * ``ClipTextEncoder.from_openai_checkpoint(pt_path, bpe_path)`` —
        loads a local OpenAI clip ``state_dict()`` .pt via the safe torch
        importer and maps the text half.
    """

    def __init__(self, bpe_path: str | Path, params: dict | None = None,
                 tower: CLIPTextTower | None = None, context_length: int = 77,
                 n_merges: int | None = 48_894):
        self.tokenizer = SimpleTokenizer(bpe_path, n_merges=n_merges)
        self.tower = tower or CLIPTextTower()
        self.context_length = context_length
        if params is None:
            dummy = jnp.zeros((1, context_length), jnp.int32)
            params = self.tower.init(jax.random.PRNGKey(0), dummy)["params"]
        self.params = params
        self._encode = jax.jit(
            lambda p, t: self.tower.apply({"params": p}, t))

    @classmethod
    def from_openai_checkpoint(cls, pt_path: str | Path, bpe_path: str | Path, **kw):
        from ..utils.torch_import import torch_state_dict

        sd = torch_state_dict(pt_path)
        layers = 1 + max(int(k.split(".")[2]) for k in sd
                         if k.startswith("transformer.resblocks."))
        width = int(np.asarray(sd["ln_final.weight"]).shape[0])
        embed = int(np.asarray(sd["text_projection"]).shape[1])
        vocab = int(np.asarray(sd["token_embedding.weight"]).shape[0])
        ctx = int(np.asarray(sd["positional_embedding"]).shape[0])
        tower = CLIPTextTower(vocab_size=vocab, context_length=ctx, width=width,
                              heads=width // 64, layers=layers, embed_dim=embed)
        return cls(bpe_path, params=load_openai_clip_text(sd, layers=layers),
                   tower=tower, context_length=ctx, **kw)

    def __call__(self, texts) -> np.ndarray:
        tokens = jnp.asarray(self.tokenizer(texts, self.context_length))
        feats = np.asarray(self._encode(self.params, tokens), np.float32)
        return feats / np.clip(np.linalg.norm(feats, axis=-1, keepdims=True), 1e-6, None)
