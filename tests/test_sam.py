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


def test_auto_annotate_tiny(tmp_path):
    """data/annotator.py auto_annotate: det boxes -> SAM polygons -> YOLO
    segment txts (reference data/annotator.py:9)."""
    import cv2
    import numpy as np
    from xlstm_yolo_tpu.data.annotator import auto_annotate, _mask_to_polygon
    from xlstm_yolo_tpu.models_sam import SAM, SAMPredictor

    # polygon extraction on a synthetic mask
    m = np.zeros((32, 32), bool)
    m[8:20, 10:24] = True
    poly = _mask_to_polygon(m)
    assert len(poly) >= 3 and poly.min() >= 0 and poly.max() <= 1

    # a fake detector returning one fixed box (duck-typed Model.predict)
    class FakeBoxes:
        xyxy = np.asarray([[20.0, 20.0, 70.0, 60.0]])
        cls = np.asarray([2.0])
        def __len__(self):
            return 1

    class FakeResult:
        boxes = FakeBoxes()

    class FakeDet:
        def predict(self, img, **kw):
            return [FakeResult()]

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    cv2.imwrite(str(img_dir / "a.jpg"),
                rng.integers(0, 255, (80, 96, 3), np.uint8))

    sz = 128
    sam = SAM(img_size=sz, encoder_dim=32, encoder_depth=1)
    import jax, jax.numpy as jnp
    v = sam.init(jax.random.PRNGKey(0), jnp.zeros((1, sz, sz, 3)))
    pred = SAMPredictor(sam, v, img_size=sz)
    out = auto_annotate(img_dir, FakeDet(), pred, output_dir=tmp_path / "labels")
    assert len(out) == 1 and out[0].exists()
    # file is either empty (random SAM may emit no polygon) or valid rows
    for ln in out[0].read_text().splitlines():
        parts = ln.split()
        assert int(parts[0]) == 2 and len(parts[1:]) % 2 == 0


def test_sam_amg_generate(tiny_sam):
    """Automatic mask generation (reference models/sam/predict.py:297
    Predictor.generate): grid prompts -> conf/stability filter -> NMS ->
    original-space masks + boxes. Random weights: just the full pipeline
    mechanics, shapes, and space mapping."""
    from xlstm_yolo_tpu.models_sam import SAMAutoMaskGenerator

    m, v = tiny_sam
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (96, 130, 3)).astype(np.uint8)
    p = SAMPredictor(m, v, img_size=128)
    gen = SAMAutoMaskGenerator(p, points_stride=4, points_batch_size=8,
                               conf_thres=-1e9, stability_score_thresh=-1.0)
    masks, scores, boxes = gen.generate(img)
    assert masks.ndim == 3 and masks.shape[1:] == (96, 130)
    assert len(masks) == len(scores) == len(boxes)
    assert len(masks) >= 1  # thresholds disabled -> something survives NMS
    assert boxes[:, 0].min() >= 0 and boxes[:, 2].max() <= 130
    # crop layers path (2 extra crops per side)
    masks2, s2, b2 = gen.generate(img, crop_n_layers=1)
    assert masks2.shape[1:] == (96, 130)


def test_sam_amg_point_grid_helpers():
    from xlstm_yolo_tpu.models_sam import (
        build_all_layer_point_grids, build_point_grid, generate_crop_boxes)

    g = build_point_grid(4)
    assert g.shape == (16, 2) and g.min() > 0 and g.max() < 1
    grids = build_all_layer_point_grids(32, 1, 2)
    assert grids[0].shape == (1024, 2) and grids[1].shape == (256, 2)
    crops, layers = generate_crop_boxes((100, 200), 1, 0.34)
    assert crops[0] == [0, 0, 200, 100] and layers[0] == 0
    assert len(crops) == 5 and all(l == 1 for l in layers[1:])
