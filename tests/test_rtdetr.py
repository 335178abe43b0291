"""RT-DETR tests: modules, deformable sampling, Hungarian loss, postprocess."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.nn import rtdetr as R


def test_deform_sample_identity():
    """Sampling exactly at pixel centers returns the pixel values."""
    b, h, w, nh, dh = 1, 4, 4, 2, 3
    v = jnp.arange(b * h * w * nh * dh, dtype=jnp.float32).reshape(b, h * w, nh, dh)
    # one query, one point per head at pixel (1, 2) center
    locs = jnp.asarray([(2 + 0.5) / w, (1 + 0.5) / h], jnp.float32)
    locs = jnp.broadcast_to(locs, (b, 1, nh, 1, 1, 2))
    weights = jnp.ones((b, 1, nh, 1), jnp.float32)
    out = R.deform_sample(v, [(h, w)], locs, weights)
    want = v.reshape(b, h, w, nh, dh)[0, 1, 2].reshape(-1)
    np.testing.assert_allclose(out[0, 0], want, atol=1e-5)


def test_hungarian_host():
    cost = np.asarray([[[1.0, 9.0], [9.0, 1.0], [5.0, 5.0]]])  # 3 queries, 2 gt
    out = R._host_hungarian(cost, np.asarray([2]))
    assert out.shape == (1, 2)
    assert out[0, 0] == 0 and out[0, 1] == 1
    out = R._host_hungarian(cost, np.asarray([0]))
    assert (out == -1).all()


def test_aifi_and_hg_blocks():
    x = jnp.ones((1, 8, 8, 32))
    m = R.AIFI(32, num_heads=4, cm=64)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == x.shape

    stem = R.HGStem(16, 32)
    xi = jnp.ones((1, 32, 32, 3))
    v = stem.init(jax.random.PRNGKey(0), xi)
    assert stem.apply(v, xi).shape == (1, 8, 8, 32)


def test_decoder_small():
    dec = R.RTDETRDecoder(nc=3, ch=(16, 16, 16), hd=32, nq=20, ndl=2, nh=4)
    feats = [jnp.ones((1, 8, 8, 16)), jnp.ones((1, 4, 4, 16)), jnp.ones((1, 2, 2, 16))]
    v = dec.init(jax.random.PRNGKey(0), feats)
    out = dec.apply(v, feats)
    assert out["boxes"].shape == (1, 20, 4)
    assert out["scores"].shape == (1, 20, 3)
    assert float(out["boxes"].min()) >= 0 and float(out["boxes"].max()) <= 1
    dets = R.rtdetr_postprocess(out, 64.0, max_det=10)
    assert dets.shape == (1, 10, 6)


def test_rtdetr_loss_grad_small():
    dec = R.RTDETRDecoder(nc=3, ch=(16,), hd=32, nq=16, ndl=2, nh=4)
    feats = [jnp.ones((2, 8, 8, 16)) * 0.1]
    v = dec.init(jax.random.PRNGKey(0), feats)
    batch = {
        "img": jnp.zeros((2, 64, 64, 3)),
        "cls_boxes": jnp.tile(jnp.asarray([[1.0, 8, 8, 40, 40]]), (2, 4, 1)).reshape(2, 4, 5),
        "mask": jnp.ones((2, 4), bool).at[:, 2:].set(False),
    }

    def loss(p):
        out = dec.apply(p, feats)
        total, aux = R.rtdetr_loss(out, batch, nc=3, imgsz=64.0)
        return total

    g = jax.grad(loss)(v)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(t).all()) for t in leaves)
    assert sum(float(jnp.abs(t).sum()) for t in leaves) > 0
