"""Extended ViL family: large layer, fusion MLPs, hierarchical, classifier."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.nn import vil_extra as VE


pytestmark = pytest.mark.slow


def test_vil_layer_large_and_state_carry():
    m = VE.ViLLayerLarge(dim=32, num_heads=4, chunk_size=8, seqlens=(4, 4))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 32)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())
    y2, state = m.apply(v, x, return_last_state=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)
    assert state[0].shape == (2, 4, 4, 8)  # (B, NH, DQK, DV) — qk_dim_factor 0.5


def test_mlstm_vision_block():
    m = VE.mLSTMVisionBlock(dim=32, num_heads=4, chunk_size=8, seqlens=(4, 4))
    x = jnp.ones((1, 16, 32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape


@pytest.mark.parametrize("mlp_type", list(VE.MLP_REGISTRY))
def test_fusion_mlp_registry(mlp_type):
    m = VE.FusionViLLayer(dim=32, mlp_type=mlp_type, seqlens=(4, 4), chunk_size=8,
                          seq_len=16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 32)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 16, 32)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, ctx)
    y = m.apply(v, x, ctx)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_hierarchical_vision_lstm():
    m = VE.HierarchicalVisionLSTM(dims=(32, 64), depths=(1, 1), patch_size=4,
                                  qkv_block_size=16, chunk_size=8)
    x = jnp.ones((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [(1, 8, 8, 32), (1, 4, 4, 64)]


@pytest.mark.parametrize("pooling,shape", [
    ("bilateral_flatten", (2, 10)),
    ("bilateral_avg", (2, 10)),
])
def test_vision_lstm2_classifier(pooling, shape):
    m = VE.VisionLSTM2(dim=32, depth=2, patch_size=8, output_shape=(10,),
                       pooling=pooling, qkv_block_size=16, chunk_size=8)
    x = jnp.ones((2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    logits = m.apply(v, x)
    assert logits.shape == shape


def test_vision_lstm2_features():
    m = VE.VisionLSTM2(dim=32, depth=1, patch_size=8, mode="features",
                       pooling="to_image", qkv_block_size=16, chunk_size=8)
    x = jnp.ones((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    f = m.apply(v, x)
    assert f.shape == (1, 4, 4, 32)


def test_fusion_block_in_graph():
    from xlstm_yolo_tpu.nn.graph import GraphModel, parse_model

    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "FusionViLLayerBlock", [32, 32, {"mlp_type": "swiglu", "chunk_size": 8}]],
            [-1, 1, "VilLayerUpdated", [32, 32, {"num_heads": 4, "chunk_size": 8}]],
        ],
    }
    parsed = parse_model(cfg, ch=3)
    gm = GraphModel(parsed)
    x = jnp.ones((1, 16, 16, 3))
    v = gm.init(jax.random.PRNGKey(0), x, train=False)
    y = gm.apply(v, x, train=False)
    assert y.shape == (1, 8, 8, 32)


def test_vit_baseline():
    m = VE.VisionTransformer(dim=32, depth=2, num_heads=2, patch_size=8, num_classes=10)
    x = jnp.ones((2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    logits = m.apply(v, x)
    assert logits.shape == (2, 10)
    mf = VE.VisionTransformer(dim=32, depth=1, num_heads=2, patch_size=8, mode="features")
    v = mf.init(jax.random.PRNGKey(0), x)
    assert mf.apply(v, x).shape == (2, 4, 4, 32)


def test_drop_path_and_3d_components():
    """DropPath (deterministic + stochastic), SequenceConv3d, 1d/3d patch &
    pos embeds (reference vision_lstm_util.py:133,155,226,302)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xlstm_yolo_tpu.nn.vil import (
        DropPath, SequenceConv3d, VitPatchEmbed, VitPosEmbed1d, VitPosEmbed3d,
    )

    x = jnp.ones((4, 8, 16))
    dp = DropPath(rate=0.5)
    v = dp.init(jax.random.PRNGKey(0), x)
    # deterministic -> identity
    np.testing.assert_array_equal(np.asarray(dp.apply(v, x)), np.asarray(x))
    # stochastic: per-sample all-or-scaled
    y = dp.apply(v, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    per_sample = np.asarray(y)[:, 0, 0]
    assert set(np.round(per_sample, 4)) <= {0.0, 2.0}

    # video tokens: (B, T*H*W, D) conv3d
    sc = SequenceConv3d(out_channels=8, seqlens=(2, 4, 4))
    xs = jnp.ones((2, 32, 6))
    vv = sc.init(jax.random.PRNGKey(0), xs)
    assert sc.apply(vv, xs).shape == (2, 32, 8)

    # 1d + 3d patch embed via input rank
    pe1 = VitPatchEmbed(dim=8, patch_size=4)
    v1 = pe1.init(jax.random.PRNGKey(0), jnp.ones((2, 16, 3)))
    assert pe1.apply(v1, jnp.ones((2, 16, 3))).shape == (2, 4, 8)
    pe3 = VitPatchEmbed(dim=8, patch_size=2)
    v3 = pe3.init(jax.random.PRNGKey(0), jnp.ones((2, 4, 8, 8, 3)))
    assert pe3.apply(v3, jnp.ones((2, 4, 8, 8, 3))).shape == (2, 2, 4, 4, 8)

    # pos embeds resize to new grids
    p1 = VitPosEmbed1d(dim=8, seqlens=(16,))
    vp1 = p1.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 8)))
    assert p1.apply(vp1, jnp.zeros((2, 10, 8))).shape == (2, 10, 8)
    p3 = VitPosEmbed3d(dim=8, seqlens=(4, 4, 4))
    vp3 = p3.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4, 8)))
    assert p3.apply(vp3, jnp.zeros((1, 2, 6, 6, 8))).shape == (1, 2, 6, 6, 8)


def test_vision_lstm2_drop_path_training():
    """VisionLSTM2 with stochastic depth: train apply with a dropout rng
    differs across rngs, eval apply is deterministic."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xlstm_yolo_tpu.nn.vil_extra import VisionLSTM2

    m = VisionLSTM2(dim=16, depth=2, patch_size=8, output_shape=(5,),
                    qkv_block_size=4, chunk_size=4, drop_path_rate=0.5)
    x = jnp.ones((2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    e1 = m.apply(v, x)
    e2 = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    t1 = m.apply(v, x, rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = m.apply(v, x, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
