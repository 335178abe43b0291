"""ViL subsystem tests: layers, blocks, backbone, YAML wrappers, ViL-YOLO."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.nn import vil as V


pytestmark = pytest.mark.slow


def test_linear_headwise_expand_blockdiag():
    """Headwise projection must not mix heads."""
    m = V.LinearHeadwiseExpand(dim=32, num_heads=4, use_bias=False)
    x = jnp.zeros((1, 3, 32)).at[..., :8].set(1.0)  # only head 0 active
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert float(jnp.abs(y[..., 8:]).max()) == 0.0
    assert float(jnp.abs(y[..., :8]).max()) > 0.0


def test_multihead_layernorm_per_head():
    m = V.MultiHeadLayerNorm(num_heads=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 2, 5, 8)) * 3 + 1, jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    # with unit scale / zero bias: per-(b, head, pos) mean 0, var 1 over DH
    np.testing.assert_allclose(np.asarray(jnp.mean(y, -1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.var(y, -1)), 1.0, atol=2e-2)


def test_sequence_conv2d_shapes():
    m = V.SequenceConv2d(out_channels=16, kernel_size=3, groups=16, seqlens=(4, 6))
    x = jnp.ones((2, 24, 16))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (2, 24, 16)
    # strided downsample
    m2 = V.SequenceConv2d(out_channels=32, kernel_size=3, stride=2, padding=1, seqlens=(4, 6))
    p2 = m2.init(jax.random.PRNGKey(0), x)
    assert m2.apply(p2, x).shape == (2, 6, 32)


@pytest.mark.smoke
def test_vil_block_pair_runs_and_shape():
    m = V.ViLBlockPair(dim=32, qkv_block_size=16, seqlens=(4, 4), chunk_size=8)
    x = jnp.ones((2, 16, 32))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_vil_block_pair_bidirectional_differs():
    kw = dict(dim=32, qkv_block_size=16, seqlens=(4, 4), chunk_size=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 32)), jnp.float32)
    m1 = V.ViLBlockPair(bidirectional=False, **kw)
    m2 = V.ViLBlockPair(bidirectional=True, **kw)
    p2 = m2.init(jax.random.PRNGKey(0), x)
    y2 = m2.apply(p2, x)
    # forward-only apply with the shared fwd params must differ from the pair
    p1 = {"params": {"fwd": p2["params"]["fwd"]}}
    y1 = m1.apply(p1, x)
    assert float(jnp.abs(y1 - y2).max()) > 1e-6


def test_vil_direction_flip_equivariance():
    """A backward-direction layer on x equals a forward layer on reversed x,
    reversed back (same params)."""
    kwf = dict(dim=32, direction="forward", qkv_block_size=16, seqlens=(4, 4), chunk_size=8)
    kwb = dict(dim=32, direction="backward", qkv_block_size=16, seqlens=(4, 4), chunk_size=8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 32)), jnp.float32)
    mf, mb = V.ViLLayer(**kwf), V.ViLLayer(**kwb)
    params = mf.init(jax.random.PRNGKey(0), x)
    yb = mb.apply(params, x)
    # note: the conv runs on the flipped token grid, which is exactly what
    # flipping the input and output achieves:
    yf_flip = mf.apply(params, x[:, ::-1])[:, ::-1]
    np.testing.assert_allclose(np.asarray(yb), np.asarray(yf_flip), rtol=1e-4, atol=1e-4)


def test_vision_lstm_backbone_partials():
    m = V.VisionLSTMBackbone(dim=32, depth=3, patch_size=8, resolution=(32, 32),
                             output_indices=(0, 1), qkv_block_size=16, chunk_size=8)
    x = jnp.ones((1, 32, 32, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(p, x)
    assert len(outs) == 3  # two taps + final
    assert all(o.shape == (1, 4, 4, 32) for o in outs)


def test_vil_yolo_model_builds():
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    m = TaskModel("vil_yolon.yaml")
    assert m.strides == (8, 16, 32)
    v = m.init(0, imgsz=64)
    pred = jax.jit(m.predictions)(v, jnp.zeros((1, 64, 64, 3)))
    assert pred.shape == (1, 84, 84)
    assert bool(jnp.isfinite(pred).all())


def test_vil_yolo_loss_grad():
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    m = TaskModel("vil_yolon.yaml")
    v = m.init(0, imgsz=64)
    batch = {
        "img": jnp.ones((1, 64, 64, 3)) * 0.5,
        "cls_boxes": jnp.asarray([[[0.0, 8, 8, 48, 48]]]),
        "mask": jnp.ones((1, 1), bool),
    }

    @jax.jit
    def g(params, bs):
        def f(p):
            (tot, aux), upd = m.loss({"params": p, "batch_stats": bs}, batch)
            return tot

        return jax.grad(f)(params)

    grads = g(v["params"], v["batch_stats"])
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    # ViL block params must receive gradient
    total = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert total > 0


def test_wrapper_blocks_parse_and_run():
    """Graph-level checks for the sequence-domain wrapper blocks."""
    from xlstm_yolo_tpu.nn.graph import GraphModel, parse_model

    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "VitPatchEmbedBlock", [3, 32, [32, 32], 8]],      # 0: (B,4,4,32)
            [-1, 1, "VitPosEmbedBlock", [32, 32, [4, 4]]],            # 1
            [-1, 1, "ImageToSequence", []],                           # 2: (B,16,32)
            [-1, 1, "ViLBlockPairBlock", [32, 32, {"seqlens": [4, 4], "chunk_size": 8}]],  # 3
            [-1, 1, "PatchMerging", []],                              # 4: (B,4,64)
            [-1, 1, "PatchMerger", [64, 2]],                          # 5: (B,2,64)
            [-1, 1, "ViLLayerNormBlock", [64]],                       # 6
        ],
    }
    parsed = parse_model(cfg, ch=3)
    gm = GraphModel(parsed)
    x = jnp.ones((2, 32, 32, 3))
    p = gm.init(jax.random.PRNGKey(0), x, train=False)
    y = gm.apply(p, x, train=False)
    assert y.shape == (2, 2, 64)


def test_sequence_to_image_and_clue_merge():
    from xlstm_yolo_tpu.nn.graph import GraphModel, parse_model

    cfg = {
        "nc": 2,
        "backbone": [
            [-1, 1, "VitPatchEmbedBlock", [3, 16, [32, 32], 4]],       # 0: (B,8,8,16)
            [-1, 1, "ImageToSequence", []],                            # 1: (B,64,16)
            [-1, 1, "VisionClueMerge", [16, 32, {"seqlens": [8, 8]}]], # 2: (B,16,32)
            [-1, 1, "SequenceToImage", [[4, 4]]],                      # 3: (B,4,4,32)
        ],
    }
    parsed = parse_model(cfg, ch=3)
    gm = GraphModel(parsed)
    x = jnp.ones((1, 32, 32, 3))
    variables = gm.init(jax.random.PRNGKey(0), x, train=False)
    y = gm.apply(variables, x, train=False)
    assert y.shape == (1, 4, 4, 32)
