"""xLSTM-7B text model: forward, prefill+step decode parity, and local
from_pretrained import (fake safetensors checkpoint, torch-named keys)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_yolo_tpu.nn.xlstm_large import from_pretrained, generate, xLSTMLarge

CFG = dict(vocab_size=41, embedding_dim=32, num_blocks=2, num_heads=2, chunk_size=8)


@pytest.fixture(scope="module")
def model_and_vars():
    model = xLSTMLarge(**CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return model, variables


def test_forward_shapes_and_softcap(model_and_vars):
    model, variables = model_and_vars
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 41, (2, 16)))
    logits = jax.jit(model.apply)(variables, tokens)
    assert logits.shape == (2, 16, 41)
    # output soft cap bounds the logits
    assert float(jnp.abs(logits).max()) <= model.output_logit_soft_cap + 1e-4


def test_prefill_step_matches_full_forward(model_and_vars):
    """Decode with carried (C,n,m) state must equal a from-scratch forward
    over the concatenated sequence (chunkwise vs recurrent step parity)."""
    model, variables = model_and_vars
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, 41, (1, 8)))
    nxt = jnp.asarray(rng.integers(0, 41, (1, 1)))

    logits_full = model.apply(variables, jnp.concatenate([prompt, nxt], axis=1))
    _, state = model.apply(variables, prompt, return_last_states=True)
    logits_step, _ = model.apply(variables, nxt, state=state, return_last_states=True)
    np.testing.assert_allclose(
        np.asarray(logits_step[:, 0]), np.asarray(logits_full[:, -1]), rtol=2e-3, atol=2e-3
    )


def test_generate_greedy_deterministic(model_and_vars):
    model, variables = model_and_vars
    prompt = jnp.asarray([[3, 5, 7]])
    out1 = generate(model, variables, prompt, max_new_tokens=5)
    out2 = generate(model, variables, prompt, max_new_tokens=5)
    assert out1.shape == (1, 8)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(out1[:, :3]), np.asarray(prompt))


def _write_fake_ckpt(tmp_path, cfg, params_np):
    """Write a torch-named safetensors checkpoint like NXAI/xLSTM-7B."""
    from safetensors.numpy import save_file

    sd = {}
    sd["embedding.weight"] = params_np["embedding"]["embedding"]
    sd["backbone.out_norm.weight"] = params_np["out_norm"]["scale"]
    sd["lm_head.weight"] = params_np["lm_head"]["kernel"].T.copy()
    for i in range(cfg["num_blocks"]):
        p = params_np[f"blocks_{i}"]
        b = f"backbone.blocks.{i}"
        sd[f"{b}.norm_mlstm.weight"] = p["norm_mlstm"]["scale"]
        sd[f"{b}.norm_ffn.weight"] = p["norm_ffn"]["scale"]
        ml = p["mlstm_layer"]
        for lin in ("q", "k", "v", "ogate_preact", "igate_preact", "fgate_preact", "out_proj"):
            sd[f"{b}.mlstm_layer.{lin}.weight"] = ml[lin]["kernel"].T.copy()
            if "bias" in ml[lin]:
                sd[f"{b}.mlstm_layer.{lin}.bias"] = ml[lin]["bias"]
        sd[f"{b}.mlstm_layer.multihead_norm.weight"] = ml["multihead_norm"]["scale"]
        for lin in ("proj_up_gate", "proj_up", "proj_down"):
            sd[f"{b}.ffn.{lin}.weight"] = p["ffn"][lin]["kernel"].T.copy()
    save_file(sd, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps(cfg))


def test_from_pretrained_roundtrip(tmp_path, model_and_vars):
    model, variables = model_and_vars
    params_np = jax.tree.map(np.asarray, variables["params"])
    _write_fake_ckpt(tmp_path, CFG, params_np)

    m2, v2 = from_pretrained(tmp_path)
    tokens = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    l1 = model.apply(variables, tokens)
    l2 = m2.apply(v2, tokens)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)


def test_from_pretrained_shape_mismatch(tmp_path, model_and_vars):
    model, variables = model_and_vars
    params_np = jax.tree.map(np.asarray, variables["params"])
    bad = json.loads(json.dumps(CFG))
    bad["num_heads"] = 4  # multihead norm shape unchanged but layer dims differ? heads same dims
    bad["embedding_dim"] = 64  # definitely mismatched
    _write_fake_ckpt(tmp_path, CFG, params_np)
    (tmp_path / "config.json").write_text(json.dumps(bad))
    with pytest.raises((ValueError, Exception)):
        from_pretrained(tmp_path)


def test_generate_scan_matches_python_loop():
    """Device-side lax.scan decode == per-token python-loop decode (greedy)."""
    import jax
    import numpy as np

    from xlstm_yolo_tpu.nn.xlstm_large import generate, generate_scan, xLSTMLarge

    m = xLSTMLarge(vocab_size=32, embedding_dim=32, num_blocks=2, num_heads=2,
                   chunk_size=4)
    import jax.numpy as jnp

    v = m.init(jax.random.PRNGKey(0), jnp.asarray([[1, 2, 3, 4]]))
    want = np.asarray(generate(m, v, [1, 2, 3, 4], max_new_tokens=6))
    got = np.asarray(generate_scan(m, v, [1, 2, 3, 4], max_new_tokens=6))
    np.testing.assert_array_equal(got, want)
