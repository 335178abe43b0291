"""Weight-transfer forward parity for the classic xLSTM text stack vs the
LIVE vendored NXAI library (reference ``nn/modules/vision_lstm/xlstm/``).

test_reference_kernel_parity.py proves the raw cell math (backends.py,
vanilla slstm); these tests close the remaining wiring gap: build the
vendored torch modules with seeded weights, transfer every tensor into the
``nn/xlstm.py`` equivalents, and require matching outputs at rtol 1e-3 —
covering proj layouts, gate wiring, norm semantics (residual 1+w scale,
components/ln.py:30), up-projection rounding (utils.py:20 ceil-to-64) and
block/stack composition.

The vendored package is imported directly (pure torch on CPU; the sLSTM
cell uses its "vanilla" backend). Skipped without the mount.
"""
import pathlib
import sys

import numpy as np
import pytest

VIS = "/root/reference/nn/modules/vision_lstm"

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def vx():
    """The vendored xlstm package, imported from the reference mount."""
    if not pathlib.Path(VIS).exists():
        pytest.skip("reference mount not present")
    sys.path.insert(0, VIS)
    import xlstm.blocks.mlstm.layer as mlayer
    import xlstm.blocks.slstm.layer as slayer
    import xlstm.components.feedforward as ffmod
    import xlstm.xlstm_block_stack as stackmod

    class NS:
        mLSTMLayer = mlayer.mLSTMLayer
        mLSTMLayerConfig = mlayer.mLSTMLayerConfig
        sLSTMLayer = slayer.sLSTMLayer
        sLSTMLayerConfig = slayer.sLSTMLayerConfig
        FeedForwardConfig = ffmod.FeedForwardConfig
        xLSTMBlockStack = stackmod.xLSTMBlockStack
        xLSTMBlockStackConfig = stackmod.xLSTMBlockStackConfig
        mLSTMBlockConfig = stackmod.mLSTMBlockConfig
        sLSTMBlockConfig = stackmod.sLSTMBlockConfig

    return NS


def _np_sd(tm):
    return {k: v.detach().numpy() for k, v in tm.state_dict().items()}


def _mlstm_layer_params(sd, prefix=""):
    """torch mLSTMLayer state_dict -> flax mLSTMLayer1d param tree."""
    import jax.numpy as jnp

    g = lambda k: jnp.asarray(sd[prefix + k])
    return {
        "proj_up": {"kernel": g("proj_up.weight").T},
        "conv1d": {"conv": {"kernel": g("conv1d.conv.weight").transpose(2, 1, 0),
                            "bias": g("conv1d.conv.bias")}},
        "q_proj": {"weight": g("q_proj.weight")},
        "k_proj": {"weight": g("k_proj.weight")},
        "v_proj": {"weight": g("v_proj.weight")},
        "mlstm_cell": {
            "igate": {"kernel": g("mlstm_cell.igate.weight").T,
                      "bias": g("mlstm_cell.igate.bias")},
            "fgate": {"kernel": g("mlstm_cell.fgate.weight").T,
                      "bias": g("mlstm_cell.fgate.bias")},
            # residual convention: stored w, effective 1+w on both sides
            "outnorm": {"scale": g("mlstm_cell.outnorm.weight")},
        },
        "learnable_skip": g("learnable_skip"),
        "proj_down": {"kernel": g("proj_down.weight").T},
    }


def _slstm_layer_params(tm, sd, prefix=""):
    """torch sLSTMLayer (vanilla cell) -> flax sLSTMLayer param tree.

    The vendored layer feeds its ``fgate`` module into the cell's FIRST
    (input-gate) slot and ``igate`` into the second (layer.py:143-149
    ``i, f = self.fgate(x_conv), self.igate(x_conv)``) — the module names
    are swapped relative to the slot semantics, so the transfer swaps them
    back. Cell tensors go through the cell's own int->ext views.
    """
    import jax.numpy as jnp

    g = lambda k: jnp.asarray(sd[prefix + k])
    cell = tm.slstm_cell
    rk = cell._recurrent_kernel_int2ext(cell._recurrent_kernel_).detach().numpy()
    bias = cell._bias_int2ext(cell._bias_).detach().numpy()
    return {
        "conv1d": {"conv": {"kernel": g("conv1d.conv.weight").transpose(2, 1, 0),
                            "bias": g("conv1d.conv.bias")}},
        "igate": {"weight": g("fgate.weight")},  # slot swap (see docstring)
        "fgate": {"weight": g("igate.weight")},
        "zgate": {"weight": g("zgate.weight")},
        "ogate": {"weight": g("ogate.weight")},
        "recurrent_kernel": jnp.asarray(rk),  # (NH, DH, 4, DH)
        "bias": jnp.asarray(bias),            # (NH, 4, DH)
        "group_norm": {"scale": g("group_norm.weight")},
    }


def _ffn_params(sd, prefix=""):
    import jax.numpy as jnp

    g = lambda k: jnp.asarray(sd[prefix + k])
    return {"proj_up": {"kernel": g("proj_up.weight").T},
            "proj_down": {"kernel": g("proj_down.weight").T}}


def _assert_tree_shapes(init_params, new_params):
    import jax

    a = {jax.tree_util.keystr(k): v.shape
         for k, v in jax.tree_util.tree_flatten_with_path(init_params)[0]}
    b = {jax.tree_util.keystr(k): np.asarray(v).shape
         for k, v in jax.tree_util.tree_flatten_with_path(new_params)[0]}
    assert a == b, (sorted(set(a) ^ set(b)),
                    {k: (a.get(k), b.get(k)) for k in a if a.get(k) != b.get(k)})


def test_mlstm_layer1d_weight_transfer_parity(vx):
    """Vendored mLSTMLayer (blocks/mlstm/layer.py:39) -> mLSTMLayer1d.

    The cell's num_heads (4 wide heads) is independent of the block-diagonal
    projection head count (inner // qkv_proj_blocksize) — this test pins the
    distinction. Gate weights are randomized post-init (they default to
    zeros, which would mask layout mistakes)."""
    import torch

    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.nn.xlstm import mLSTMLayer1d

    D, S = 32, 16
    torch.manual_seed(7)
    tm = vx.mLSTMLayer(vx.mLSTMLayerConfig(embedding_dim=D, context_length=S))
    tm.eval()
    with torch.no_grad():  # make gates non-degenerate
        torch.nn.init.normal_(tm.mlstm_cell.igate.weight, std=0.3)
        torch.nn.init.normal_(tm.mlstm_cell.fgate.weight, std=0.3)
        torch.nn.init.normal_(tm.mlstm_cell.outnorm.weight, std=0.3)

    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, S, D)).astype(np.float32)
    with torch.no_grad():
        tout = tm(torch.from_numpy(x)).numpy()

    ours = mLSTMLayer1d(embedding_dim=D, chunk_size=8)
    v = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = {"params": _mlstm_layer_params(_np_sd(tm))}
    _assert_tree_shapes(v["params"], got["params"])
    jout = np.asarray(jax.jit(ours.apply)(got, jnp.asarray(x)))
    np.testing.assert_allclose(jout, tout, rtol=1e-3, atol=1e-4)


def test_slstm_layer_weight_transfer_parity(vx):
    """Vendored sLSTMLayer with the vanilla cell backend -> sLSTMLayer,
    including the igate/fgate slot swap and the cell's ext tensor views."""
    import torch

    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.nn.xlstm import sLSTMLayer

    D, S = 32, 12
    torch.manual_seed(9)
    tm = vx.sLSTMLayer(vx.sLSTMLayerConfig(
        embedding_dim=D, num_heads=4, backend="vanilla",
        recurrent_weight_init="standard"))
    tm.eval()
    with torch.no_grad():
        torch.nn.init.normal_(tm.group_norm.weight, std=0.3)

    rng = np.random.default_rng(13)
    x = rng.normal(size=(2, S, D)).astype(np.float32)
    with torch.no_grad():
        tout = tm(torch.from_numpy(x)).numpy()

    ours = sLSTMLayer(embedding_dim=D, num_heads=4)
    v = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = {"params": _slstm_layer_params(tm, _np_sd(tm))}
    _assert_tree_shapes(v["params"], got["params"])
    jout = np.asarray(jax.jit(ours.apply)(got, jnp.asarray(x)))
    np.testing.assert_allclose(jout, tout, rtol=1e-3, atol=1e-4)


def test_xlstm_block_stack_weight_transfer_parity(vx):  # noqa: C901
    """Vendored xLSTMBlockStack (1 mLSTM block + 1 sLSTM block with gated
    FFN + post-blocks norm) -> xLSTMBlockStack: the end-to-end text-stack
    wiring check (pre-norm LayerNorm semantics, FFN gelu + ceil-to-64
    rounding, slstm_at placement)."""
    import torch

    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.nn.xlstm import xLSTMBlockStack

    D, S = 64, 16
    torch.manual_seed(21)
    cfg = vx.xLSTMBlockStackConfig(
        mlstm_block=vx.mLSTMBlockConfig(mlstm=vx.mLSTMLayerConfig()),
        slstm_block=vx.sLSTMBlockConfig(
            slstm=vx.sLSTMLayerConfig(backend="vanilla",
                                      recurrent_weight_init="standard"),
            feedforward=vx.FeedForwardConfig(proj_factor=1.3, act_fn="gelu")),
        context_length=S, num_blocks=2, embedding_dim=D, slstm_at=[1])
    tm = vx.xLSTMBlockStack(cfg)
    tm.eval()
    with torch.no_grad():  # non-degenerate norms + gates everywhere
        for name, p in tm.named_parameters():
            if "norm" in name and p.ndim == 1:
                torch.nn.init.normal_(p, std=0.2)
        torch.nn.init.normal_(tm.blocks[0].xlstm.mlstm_cell.igate.weight, std=0.3)
        torch.nn.init.normal_(tm.blocks[0].xlstm.mlstm_cell.fgate.weight, std=0.3)

    rng = np.random.default_rng(17)
    x = rng.normal(size=(2, S, D)).astype(np.float32)
    with torch.no_grad():
        tout = tm(torch.from_numpy(x)).numpy()

    ours = xLSTMBlockStack(embedding_dim=D, num_blocks=2, slstm_at=(1,),
                           chunk_size=8, ffn_proj_factor=1.3)
    v = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))

    sd = _np_sd(tm)
    g = lambda k: jnp.asarray(sd[k])
    got = {"params": {
        "block0": {
            "norm_xlstm": {"scale": g("blocks.0.xlstm_norm.weight")},
            "xlstm": _mlstm_layer_params(sd, "blocks.0.xlstm."),
        },
        "block1": {
            "norm_xlstm": {"scale": g("blocks.1.xlstm_norm.weight")},
            "xlstm": _slstm_layer_params(tm.blocks[1].xlstm, sd, "blocks.1.xlstm."),
            "norm_ffn": {"scale": g("blocks.1.ffn_norm.weight")},
            "ffn": _ffn_params(sd, "blocks.1.ffn."),
        },
        "post_norm": {"scale": g("post_blocks_norm.weight")},
    }}
    _assert_tree_shapes(v["params"], got["params"])
    jout = np.asarray(jax.jit(ours.apply)(got, jnp.asarray(x)))
    # atol 3e-4: fp32 reduction-order noise accumulated over two residual
    # blocks (the single-layer tests above hold at 1e-4)
    np.testing.assert_allclose(jout, tout, rtol=1e-3, atol=3e-4)
