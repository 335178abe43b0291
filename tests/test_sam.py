"""SAM architecture tests (tiny config, random weights)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.models_sam import SAM, SAMPredictor


@pytest.fixture(scope="module")
def tiny_sam():
    m = SAM(img_size=128, encoder_dim=64, encoder_depth=2)
    x = jnp.zeros((1, 128, 128, 3))
    pts = jnp.asarray([[[30.0, 40.0]]])
    lab = jnp.asarray([[1]])
    v = m.init(jax.random.PRNGKey(0), x, pts, lab)
    return m, v


def test_sam_forward_shapes(tiny_sam):
    m, v = tiny_sam
    x = jnp.zeros((1, 128, 128, 3))
    masks, iou = m.apply(v, x, jnp.asarray([[[30.0, 40.0]]]), jnp.asarray([[1]]))
    assert masks.shape == (1, 4, 32, 32)  # 4 mask tokens at 4x of H/16
    assert iou.shape == (1, 4)
    assert bool(jnp.isfinite(masks).all())


def test_sam_box_prompt(tiny_sam):
    m, v = tiny_sam
    x = jnp.zeros((1, 128, 128, 3))
    masks, iou = m.apply(v, x, boxes=jnp.asarray([[[10.0, 10.0], [90.0, 90.0]]]))
    assert masks.shape[0] == 1


def test_sam_predictor_flow(tiny_sam):
    m, v = tiny_sam
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (100, 160, 3)).astype(np.uint8)
    p = SAMPredictor(m, v, img_size=128)
    p.set_image(img)
    masks, iou = p.predict(points=[[80, 50]], point_labels=[1])
    assert masks.shape == (4, 100, 160)
    assert masks.dtype == bool
    masks2, _ = p.predict(boxes=[20, 20, 120, 80], multimask_output=False)
    assert masks2.shape == (1, 100, 160)
