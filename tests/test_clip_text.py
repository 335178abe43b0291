"""CLIP text tower: BPE machinery parity vs transformers.CLIPTokenizer on a
synthetic vocabulary, and weight-transfer forward parity of the flax text
transformer vs transformers.CLIPTextModelWithProjection (the zero-egress
analogue of loading the real OpenAI ViT-B/32 text checkpoint the reference
downloads in nn/tasks.py:746-763)."""
import json
from pathlib import Path

import numpy as np
import pytest

from xlstm_yolo_tpu.nn.clip_text import (
    CLIPTextTower, ClipTextEncoder, SimpleTokenizer, bytes_to_unicode,
    load_hf_clip_text,
)

pytestmark = pytest.mark.slow  # transformers import alone is ~30 s here

MERGES = [
    ("h", "e</w>"), ("l", "l"), ("ll", "o</w>"), ("c", "a"), ("ca", "t</w>"),
    ("d", "o"), ("do", "g</w>"), ("i", "n</w>"), ("t", "h"), ("th", "e</w>"),
    ("p", "e"), ("pe", "r"), ("per", "s"), ("pers", "o"), ("perso", "n</w>"),
    ("b", "u"), ("bu", "s</w>"), ("e", "r"), ("o", "n</w>"),
]

TEXTS = [
    "hello the cat",
    "a dog, in the fog!",
    "person bus 42",
    "PERSON  riding a   horse",
    "the-cat's toy",
]


def _write_openai_bpe(path: Path) -> Path:
    """The published merge-list format: version header + one merge per line."""
    lines = ["#version: synthetic"] + [f"{a} {b}" for a, b in MERGES]
    p = path / "bpe_synthetic.txt"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return p


def _write_hf_files(path: Path, tok: SimpleTokenizer) -> tuple:
    """transformers.CLIPTokenizer consumables derived from the SAME table."""
    vocab_file = path / "vocab.json"
    vocab_file.write_text(json.dumps(tok.encoder, ensure_ascii=False))
    merges_file = path / "merges.txt"
    merges_file.write_text(
        "\n".join(["#version: 0.2"] + [f"{a} {b}" for a, b in MERGES]) + "\n")
    return vocab_file, merges_file


def test_bpe_tokenizer_matches_transformers(tmp_path):
    from transformers import CLIPTokenizer

    ours = SimpleTokenizer(_write_openai_bpe(tmp_path), n_merges=None)
    vocab_file, merges_file = _write_hf_files(tmp_path, ours)
    hf = CLIPTokenizer(str(vocab_file), str(merges_file))

    for text in TEXTS:
        got = ours.encode(text)
        want = hf(text, add_special_tokens=False)["input_ids"]
        assert got == want, f"{text!r}: {got} != {want}"

    # framed (n, 77) tokenize matches add_special_tokens=True + padding
    framed = ours(TEXTS, context_length=32)
    for i, text in enumerate(TEXTS):
        want = hf(text, add_special_tokens=True)["input_ids"]
        assert framed[i, : len(want)].tolist() == want
        assert (framed[i, len(want):] == 0).all()

    # byte-level round trip through the merge table
    assert ours.decode(ours.encode("hello the dog")).strip() == "hello the dog"


def test_bytes_to_unicode_is_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def _small_hf_model():
    import torch
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    cfg = CLIPTextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu",
        projection_dim=32, eos_token_id=127, bos_token_id=126,
        attention_dropout=0.0)
    torch.manual_seed(0)
    return CLIPTextModelWithProjection(cfg).eval(), cfg


def test_text_tower_weight_transfer_parity_vs_hf():
    """Same seeded weights -> same text embeddings (rtol 2e-5): verifies the
    flax transformer AND the OpenAI-naming checkpoint map (the HF path
    converts to OpenAI naming first, exercising load_openai_clip_text)."""
    import torch

    hf, cfg = _small_hf_model()
    params = load_hf_clip_text(hf.state_dict())
    tower = CLIPTextTower(vocab_size=128, context_length=16, width=64, heads=4,
                          layers=2, embed_dim=32)

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 126, (3, 16)).astype(np.int32)
    eot_pos = np.array([5, 9, 15])
    for i, p in enumerate(eot_pos):
        tokens[i, p] = 127  # EOS == max id: OpenAI argmax == HF eos lookup

    with torch.no_grad():
        want = hf(input_ids=torch.as_tensor(tokens, dtype=torch.long)
                  ).text_embeds.numpy()
    import jax

    got = np.asarray(jax.jit(lambda t: tower.apply({"params": params}, t))(tokens))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_set_classes_with_strings(tmp_path):
    """End-to-end open-vocab path: strings -> tokenizer -> flax tower ->
    normalized guide feats -> world model forward (reference
    WorldModel.set_classes semantics)."""
    import jax.numpy as jnp

    from xlstm_yolo_tpu.nn.tasks import TaskModel

    bpe = _write_openai_bpe(tmp_path)
    # small tower (random init — plumbing + shapes; weights verified above)
    enc = ClipTextEncoder(
        bpe, tower=CLIPTextTower(vocab_size=4096, context_length=16, width=64,
                                 heads=4, layers=2, embed_dim=512),
        context_length=16, n_merges=None)

    m = TaskModel("yolov8-world.yaml", scale="n")
    m.set_classes(["person", "bus"], encoder=enc)
    assert m.txt_feats.shape == (1, 2, 512)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(m.txt_feats), axis=-1), 1.0, rtol=1e-5)
    assert m.nc == 2 and m.names == {0: "person", 1: "bus"}

    v = m.init(0)
    import jax

    out = jax.jit(m.predictions)(v, jnp.zeros((1, 64, 64, 3)))
    assert out.shape[-1] == 4 + 2  # nc followed set_classes

    with pytest.raises(ValueError):
        m.set_classes(["cat"])  # strings need an encoder
