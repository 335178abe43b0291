"""Device-side augmentation pipeline (data/device_augment.py): the
v8_transforms stages as jitted XLA ops — identity behavior, flip/label
consistency, mosaic label packing, HSV roundtrip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.data.device_augment import device_augment, hsv_jitter


pytestmark = pytest.mark.slow


def _batch(B=2, S=64, M=8, seed=0):
    r = np.random.default_rng(seed)
    imgs = r.integers(0, 255, (B, S, S, 3)).astype(np.uint8)
    cb = np.zeros((B, M, 5), np.float32)
    mk = np.zeros((B, M), bool)
    cb[0, 0] = [1, 8, 8, 32, 40]
    cb[0, 1] = [2, 20, 16, 56, 48]
    cb[1, 0] = [0, 4, 4, 60, 60]
    mk[0, :2] = True
    mk[1, 0] = True
    return {"img": imgs, "cls_boxes": cb, "mask": mk}


IDENTITY = dict(mosaic=0.0, degrees=0.0, translate=0.0, scale=0.0, shear=0.0,
                hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, fliplr=0.0)


def test_identity_config_is_noop():
    b = _batch()
    out = device_augment(b, jax.random.PRNGKey(0), IDENTITY)
    np.testing.assert_allclose(np.asarray(out["img"]), b["img"].astype(np.float32),
                               atol=1.5)  # HSV roundtrip fp wiggle
    got, want = np.asarray(out["cls_boxes"]), b["cls_boxes"]
    assert np.asarray(out["mask"]).sum() == b["mask"].sum()
    np.testing.assert_allclose(got[b["mask"]], want[b["mask"]], atol=1e-3)


def test_fliplr_boxes_mirror():
    b = _batch()
    hyp = dict(IDENTITY, fliplr=1.0)
    out = device_augment(b, jax.random.PRNGKey(1), hyp)
    S = b["img"].shape[1]
    img = np.asarray(out["img"])
    np.testing.assert_allclose(img, b["img"].astype(np.float32)[:, :, ::-1], atol=1.5)
    cb = np.asarray(out["cls_boxes"])
    # [1, 8, 8, 32, 40] -> x1 = 64-32, x2 = 64-8
    np.testing.assert_allclose(cb[0, 0], [1, S - 32, 8, S - 8, 40], atol=1e-3)


def test_mosaic_combines_batch_labels():
    b = _batch(B=4, S=64, M=4)
    hyp = dict(IDENTITY, mosaic=1.0, scale=0.0)
    out = device_augment(b, jax.random.PRNGKey(2), hyp)
    # 2S canvas affine-mapped to S at scale 1 shows the center crop: labels
    # from several quadrants can survive; all surviving boxes are in-bounds
    cb, mk = np.asarray(out["cls_boxes"]), np.asarray(out["mask"])
    assert mk.shape == b["mask"].shape  # repacked to M slots
    boxes = cb[mk]
    if len(boxes):
        assert (boxes[:, 1:] >= 0).all() and (boxes[:, 1:] <= 64).all()
        assert (boxes[:, 3] > boxes[:, 1]).all() and (boxes[:, 4] > boxes[:, 2]).all()


def test_affine_scale_moves_boxes():
    b = _batch()
    hyp = dict(IDENTITY, degrees=10.0, translate=0.1, scale=0.4)
    out = device_augment(b, jax.random.PRNGKey(3), hyp)
    img = np.asarray(out["img"])
    assert img.shape == (2, 64, 64, 3)
    assert np.isfinite(img).all()
    cb, mk = np.asarray(out["cls_boxes"]), np.asarray(out["mask"])
    if mk.any():
        bx = cb[mk][:, 1:]
        assert (bx >= 0).all() and (bx <= 64).all()


def test_hsv_jitter_bounds():
    r = np.random.default_rng(0)
    img = jnp.asarray(r.integers(0, 255, (8, 8, 3)), jnp.float32)
    out = hsv_jitter(jax.random.PRNGKey(0), img, 0.5, 0.9, 0.9)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 255).all()
    # zero gains: exact roundtrip within fp tolerance
    out0 = hsv_jitter(jax.random.PRNGKey(0), img, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(img), atol=1.0)


def test_extra_keys_pass_through():
    b = _batch()
    b["txt_feats"] = np.ones((2, 4, 8), np.float32)
    out = device_augment(b, jax.random.PRNGKey(0), IDENTITY)
    assert "txt_feats" in out and out["txt_feats"].shape == (2, 4, 8)


def test_trainer_with_device_augment(tmp_path):
    """Full train loop with device_augment=True: host letterboxes only, the
    jitted step runs mosaic/affine/HSV/flip; loss stays finite and falls."""
    import csv

    from xlstm_yolo_tpu.data.synthetic import make_synthetic_dataset
    from xlstm_yolo_tpu.engine.trainer import Trainer
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    data_yaml = make_synthetic_dataset(tmp_path / "ds", n_train=8, n_val=2, imgsz=96)
    model = TaskModel("yolov8n.yaml", nc=3)
    tr = Trainer(model, overrides={
        "data": str(data_yaml), "epochs": 6, "imgsz": 96, "batch": 8, "val": False,
        "project": str(tmp_path), "name": "devaug", "max_labels": 16,
        "optimizer": "SGD", "lr0": 0.01, "warmup_epochs": 0.0, "nbs": 8,
        "device_augment": True, "mosaic": 0.5, "close_mosaic": 2,
        "degrees": 5.0, "translate": 0.1, "scale": 0.3, "fliplr": 0.5,
        "plots": False, "seed": 0,
    })
    tr.train()
    with open(tr.csv) as f:
        rows = list(csv.DictReader(f))
    losses = [float(r["train/loss"]) for r in rows]
    assert len(losses) == 6
    assert all(np.isfinite(losses))
    # augmented overfit is noisier than clean overfit; require a mild drop
    assert min(losses[2:]) < losses[0], f"no improvement: {losses}"


# ---------------------------------------------------------------------------
# segment/pose payloads (VERDICT r3 #6): slot-encoded masks and keypoints
# must ride the same geometry as the boxes
# ---------------------------------------------------------------------------

def _seg_pose_batch(B=2, S=64, M=4, ms=32, K=3, seed=3):
    b = _batch(B=B, S=S, M=M, seed=seed)
    masks = np.zeros((B, ms, ms), np.int32)
    r = ms / S
    for bi in range(B):
        for si in range(M):
            if not b["mask"][bi, si]:
                continue
            x1, y1, x2, y2 = (b["cls_boxes"][bi, si, 1:5] * r).astype(int)
            masks[bi, y1:y2, x1:x2] = si + 1
    kpts = np.zeros((B, M, K, 3), np.float32)
    for bi in range(B):
        for si in range(M):
            if not b["mask"][bi, si]:
                continue
            x1, y1, x2, y2 = b["cls_boxes"][bi, si, 1:5]
            kpts[bi, si] = [[x1, y1, 2.0], [(x1 + x2) / 2, (y1 + y2) / 2, 2.0],
                            [x2 - 1, y2 - 1, 1.0]]
    b["masks"] = masks
    b["keypoints"] = kpts
    return b


def test_identity_preserves_masks_and_kpts():
    b = _seg_pose_batch()
    out = device_augment(b, jax.random.PRNGKey(0), IDENTITY)
    np.testing.assert_array_equal(np.asarray(out["masks"]), b["masks"])
    mk = b["mask"]
    np.testing.assert_allclose(np.asarray(out["keypoints"])[mk],
                               b["keypoints"][mk], atol=1e-3)


def test_fliplr_mirrors_masks_and_swaps_kpts():
    b = _seg_pose_batch()
    hyp = dict(IDENTITY, fliplr=1.0)
    flip_idx = (0, 2, 1)  # swap kpts 1<->2
    out = device_augment(b, jax.random.PRNGKey(1), hyp, flip_idx=flip_idx)
    np.testing.assert_array_equal(np.asarray(out["masks"]), b["masks"][:, :, ::-1])
    S = b["img"].shape[1]
    kp = np.asarray(out["keypoints"])
    want = b["keypoints"][:, :, list(flip_idx)].copy()
    vis = want[..., 2] > 0
    want[..., 0] = np.where(vis, S - want[..., 0], want[..., 0])
    mk = b["mask"]
    np.testing.assert_allclose(kp[mk], want[mk], atol=1e-3)


def test_random_geometry_keeps_payloads_synchronized():
    """Under a random affine + mosaic, every surviving slot's mask pixels and
    visible keypoints must lie inside (a slightly dilated) slot box — i.e.
    the payloads follow the same warp AND the same slot permutation."""
    b = _seg_pose_batch(B=4, S=64, M=4, ms=64)
    hyp = dict(IDENTITY, mosaic=1.0, degrees=10.0, translate=0.1, scale=0.4,
               fliplr=0.5)
    out = device_augment(b, jax.random.PRNGKey(7), hyp)
    cb = np.asarray(out["cls_boxes"])
    mk = np.asarray(out["mask"])
    masks = np.asarray(out["masks"])
    kp = np.asarray(out["keypoints"])
    S = b["img"].shape[1]
    r = masks.shape[1] / S
    pad = 3.0  # nearest-resample + box-clip slack (mask px)
    any_checked = False
    for bi in range(masks.shape[0]):
        present = np.unique(masks[bi])
        for v in present:
            if v == 0:
                continue
            si = int(v) - 1
            assert mk[bi, si], f"mask slot {v} not a valid label slot"
            ys, xs = np.nonzero(masks[bi] == v)
            x1, y1, x2, y2 = cb[bi, si, 1:5] * r
            assert xs.min() >= x1 - pad and xs.max() <= x2 + pad
            assert ys.min() >= y1 - pad and ys.max() <= y2 + pad
            any_checked = True
        for si in range(kp.shape[1]):
            if not mk[bi, si]:
                assert np.all(kp[bi, si] == 0)
                continue
            x1, y1, x2, y2 = cb[bi, si, 1:5]
            vis = kp[bi, si][:, 2] > 0
            pts = kp[bi, si][vis]
            if len(pts):
                # keypoints can land outside the clipped box (the box was
                # clipped to the canvas; points are only vis-masked) but must
                # stay inside the canvas
                assert np.all(pts[:, 0] >= 0) and np.all(pts[:, 0] <= S)
                assert np.all(pts[:, 1] >= 0) and np.all(pts[:, 1] <= S)
                any_checked = True
    assert any_checked


def test_host_device_equivalence_flip_only():
    """Host pipeline vs device pipeline on the SAME deterministic transform
    (forced flip, no geometry): outputs must agree exactly up to HSV fp
    wiggle — the device path is a drop-in for the host path."""
    b = _seg_pose_batch()
    hyp = dict(IDENTITY, fliplr=1.0)
    out = device_augment(b, jax.random.PRNGKey(5), hyp)
    # host reference: numpy flip of every payload
    np.testing.assert_allclose(np.asarray(out["img"]),
                               b["img"].astype(np.float32)[:, :, ::-1], atol=1.5)
    np.testing.assert_array_equal(np.asarray(out["masks"]), b["masks"][:, :, ::-1])
    S = b["img"].shape[1]
    cb = np.asarray(out["cls_boxes"])
    want = b["cls_boxes"].copy()
    x1 = want[:, :, 1].copy()
    want[:, :, 1] = S - want[:, :, 3]
    want[:, :, 3] = S - x1
    mkb = b["mask"]
    np.testing.assert_allclose(cb[mkb], want[mkb], atol=1e-3)
