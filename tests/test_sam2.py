"""SAM2 family: Hiera encoder, memory attention, video tracking, TinyViT.

Mirrors reference models/sam/modules/{encoders,memory_attention,sam}.py and
predict.py SAM2VideoPredictor behavior on tiny shapes.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xlstm_yolo_tpu.models_sam2 import (
    SAM2, Hiera, TinyViT, SAM2VideoPredictor, build_sam, sine_pe_2d,
)


SZ = 128  # tiny image size for tests


pytestmark = pytest.mark.slow


def test_hiera_multiscale_shapes():
    m = Hiera(embed_dim=32, stages=(1, 1, 1, 1))
    x = jnp.zeros((1, SZ, SZ, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 32), (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256)]


def test_sine_pe_shape():
    pe = sine_pe_2d(8, 8, 64)
    assert pe.shape == (8, 8, 64)
    assert bool(jnp.all(jnp.isfinite(pe)))


@pytest.fixture(scope="module")
def sam2():
    model = SAM2(img_size=SZ, embed_dim=32)
    x = jnp.zeros((1, SZ, SZ, 3))
    hw = (SZ // 16) ** 2
    variables = model.init(
        jax.random.PRNGKey(0), x,
        jnp.zeros((1, model.num_maskmem, hw, model.mem_dim)),
        jnp.zeros((1, model.num_maskmem), jnp.int32),
        jnp.zeros((1, model.num_maskmem), bool), None, None,
        method=model.track_step)
    return model, variables


def test_sam2_image_prompt(sam2):
    model, v = sam2
    x = jnp.ones((1, SZ, SZ, 3)) * 0.5
    pts = jnp.array([[[40.0, 40.0]]])
    lab = jnp.ones((1, 1))
    masks, iou = model.apply(v, x, pts, lab)
    assert masks.shape[0] == 1 and masks.shape[2:] == (SZ // 4, SZ // 4)
    assert iou.shape == (1, masks.shape[1])
    assert bool(jnp.all(jnp.isfinite(masks)))


def test_sam2_track_step_static_shapes(sam2):
    model, v = sam2
    b, hw = 1, (SZ // 16) ** 2
    bank = jnp.zeros((b, model.num_maskmem, hw, model.mem_dim))
    age = jnp.zeros((b, model.num_maskmem), jnp.int32)
    valid = jnp.zeros((b, model.num_maskmem), bool)
    x = jnp.ones((1, SZ, SZ, 3)) * 0.3
    masks, iou, new_mem = model.apply(v, x, bank, age, valid, None, None,
                                      method=model.track_step)
    assert new_mem.shape == (b, hw, model.mem_dim)
    assert bool(jnp.all(jnp.isfinite(masks)))
    # with a valid memory slot the output must stay finite too
    bank2 = bank.at[:, 0].set(new_mem)
    valid2 = valid.at[:, 0].set(True)
    masks2, _, _ = model.apply(v, x, bank2, age, valid2, None, None,
                               method=model.track_step)
    assert bool(jnp.all(jnp.isfinite(masks2)))


def test_video_predictor_ring_buffer(sam2):
    model, v = sam2
    p = SAM2VideoPredictor(model, v, img_size=SZ).init_state()
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (96, 96, 3), np.uint8) for _ in range(4)]
    m0 = p.track(frames[0], points=[[48, 48]])
    assert m0.shape == (SZ // 4, SZ // 4)
    assert p._state["ptr"] == 0 and bool(p._state["valid"][0, 0])
    for f in frames[1:]:
        m = p.track(f)
        assert np.isfinite(m).all()
    # conditioning slot 0 stays; recent frames cycle through slots 1..6
    assert bool(p._state["valid"][0, 0]) and bool(p._state["valid"][0, 1])
    assert p._state["ptr"] == 3


def test_tinyvit_encoder_shape():
    m = TinyViT(dims=(16, 32, 48), depths=(1, 1, 1), num_heads=(1, 2, 3))
    x = jnp.zeros((1, SZ, SZ, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, SZ // 16, SZ // 16, 256)


def test_build_sam_factory():
    from xlstm_yolo_tpu.models_sam import SAM

    assert isinstance(build_sam("vit_b"), SAM)
    assert isinstance(build_sam("sam2_t", img_size=SZ), SAM2)
    with pytest.raises(ValueError):
        build_sam("nope")
