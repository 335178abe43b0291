"""Augment-pipeline geometry tests: mosaic9/mosaic3 (reference
data/augment.py:716,596) and cross-image CopyPaste (reference
data/augment.py:1636) — label geometry must track pixel geometry."""
import numpy as np
import pytest

from xlstm_yolo_tpu.data import augment as A


def _tile(color, h=100, w=120):
    """Solid-color image with one full-extent box label + matching segment."""
    img = np.full((h, w, 3), color, np.uint8)
    labels = np.array([[0, 10, 10, w - 10, h - 10]], np.float32)
    seg = np.array([[10, 10], [w - 10, 10], [w - 10, h - 10], [10, h - 10]], np.float32)
    return img, labels, {"segments": [seg]}


@pytest.mark.parametrize("fn,n", [(A.mosaic3_points, 3), (A.mosaic9_points, 9),
                                  (A.mosaic4_points, 4)])
def test_mosaic_geometry_tracks_pixels(fn, n):
    """Every surviving label's box center must sit on pixels of its own tile
    color (labels move with the same transform as the image)."""
    rng = np.random.default_rng(0)
    s = 96
    colors = [(10 + 20 * i) % 250 for i in range(n)]
    samples = [_tile(c) for c in colors]
    canvas, labels, extra = fn(samples, s, rng)
    assert canvas.shape == (2 * s, 2 * s, 3)
    assert labels.shape[1] == 5 and len(labels) >= 1
    assert len(extra["segments"]) == len(labels)
    hits = 0
    for lb in labels:
        cx = int(np.clip((lb[1] + lb[3]) / 2, 0, 2 * s - 1))
        cy = int(np.clip((lb[2] + lb[4]) / 2, 0, 2 * s - 1))
        px = canvas[cy, cx, 0]
        # center may be cropped into the pad for tiles straddling the border
        if int(px) in colors or px == 114:
            hits += 1
        # each box stays inside the canvas
        assert 0 <= lb[1] <= lb[3] <= 2 * s and 0 <= lb[2] <= lb[4] <= 2 * s
    assert hits == len(labels)
    # at least one box center must land on real (non-pad) pixels
    assert any(int(canvas[int((lb[2] + lb[4]) / 2), int(np.clip((lb[1] + lb[3]) / 2, 0, 2 * s - 1)), 0]) in colors
               for lb in labels)
    # segments track their boxes: segment bbox == label box (both post-shift)
    for lb, seg in zip(labels, extra["segments"]):
        sx1, sy1 = seg.min(0)
        sx2, sy2 = seg.max(0)
        np.testing.assert_allclose(
            np.clip([sx1, sy1, sx2, sy2], 0, 2 * s), lb[1:5], atol=1.5)


def test_mosaic9_center_tile_visible():
    """The base (i=0) image must occupy the canvas center after the 2s crop
    (reference _mosaic9 places img0 at [s:s+h, s:s+w] of the 3s canvas,
    then crops [s//2 : s//2+2s])."""
    s = 96
    samples = [_tile(200)] + [_tile(30) for _ in range(8)]
    canvas, labels, _ = A.mosaic9_points(samples, s, np.random.default_rng(1))
    # center of base tile lands at (s + h/2 - s/2, s + w/2 - s/2) post-crop
    h, w = samples[0][0].shape[:2]
    r = min(s / h, s / w)
    cy, cx = int(s + h * r / 2 - s // 2), int(s + w * r / 2 - s // 2)
    assert canvas[cy, cx, 0] == 200


def test_copy_paste_mix_pastes_donor_instances():
    """Donor segments land as pixels + labels; overlapping donors (ioa>=0.3)
    are rejected (reference CopyPaste._transform, data/augment.py:1704-1717)."""
    rng = np.random.default_rng(0)
    h = w = 128
    img = np.zeros((h, w, 3), np.uint8)
    labels = np.array([[0, 5, 5, 40, 40]], np.float32)
    segs = [np.array([[5, 5], [40, 5], [40, 40], [5, 40]], np.float32)]
    img2 = np.full((h, w, 3), 250, np.uint8)
    # donor 1 far from existing box -> accepted; donor 2 overlapping -> rejected
    labels2 = np.array([[1, 80, 80, 120, 120], [2, 6, 6, 39, 39]], np.float32)
    segs2 = [np.array([[80, 80], [120, 80], [120, 120], [80, 120]], np.float32),
             np.array([[6, 6], [39, 6], [39, 39], [6, 39]], np.float32)]
    out, lb, sg = A.copy_paste_mix(img.copy(), labels, segs, img2, labels2, segs2,
                                   p=1.0, rng=rng)
    assert len(lb) == 2 and len(sg) == 2  # one accepted, one rejected
    assert lb[1, 0] == 1  # the far donor
    assert out[100, 100, 0] == 250  # donor pixels pasted
    assert out[20, 20, 0] == 0  # original pixels kept (overlapper rejected)


def test_copy_paste_mix_resizes_donor():
    """Donor of a different shape is resized (boxes + segments scaled)."""
    rng = np.random.default_rng(0)
    img = np.zeros((128, 128, 3), np.uint8)
    img2 = np.full((64, 64, 3), 250, np.uint8)
    labels2 = np.array([[3, 40, 40, 60, 60]], np.float32)
    segs2 = [np.array([[40, 40], [60, 40], [60, 60], [40, 60]], np.float32)]
    out, lb, sg = A.copy_paste_mix(img.copy(), np.zeros((0, 5), np.float32), [],
                                   img2, labels2, segs2, p=1.0, rng=rng)
    assert len(lb) == 1
    np.testing.assert_allclose(lb[0, 1:5], [80, 80, 120, 120], atol=1e-4)
    assert out[100, 100, 0] == 250


def test_dataset_mosaic9_and_mixup_copy_paste(tmp_path):
    """Dataset-level wiring: mosaic_n=9 + copy_paste_mode=mixup drive the
    segment sample path end to end (cfg keys actually consumed)."""
    from xlstm_yolo_tpu.data.dataset import YOLODataset
    from xlstm_yolo_tpu.data.synthetic import make_synthetic_dataset
    import yaml as _y

    data_yaml = make_synthetic_dataset(tmp_path, n_train=10, n_val=2, imgsz=96,
                                       task="segment")
    root = _y.safe_load(open(data_yaml))["path"]
    ds = YOLODataset(f"{root}/images/train", imgsz=96, augment=True, task="segment",
                     hyp={"mosaic": 1.0, "mosaic_n": 9, "copy_paste": 0.5,
                          "copy_paste_mode": "mixup"},
                     max_labels=32)
    rng = np.random.default_rng(0)
    for i in range(4):
        img, labels, extra = ds.get_sample(i, rng)
        assert img.shape == (96, 96, 3)
        assert np.isfinite(labels).all()
        assert len(extra.get("segments", [])) == len(labels)
    # detect path too (mosaic9 without points)
    ds2 = YOLODataset(f"{root}/images/train", imgsz=96, augment=True,
                      hyp={"mosaic": 1.0, "mosaic_n": 9}, max_labels=32)
    img, labels = ds2.get_sample(0, rng)
    assert img.shape == (96, 96, 3)
    # batch collate path stays fixed-shape
    batch = ds.collate([ds.get_sample(i, rng) for i in range(2)], idxs=[0, 1])
    assert batch["img"].shape[0] == 2


# --- classify augment stack (reference data/augment.py:2348-2502) ----------

def test_classify_eval_transform_crop_fraction():
    """Short edge resizes to size/crop_fraction then center-crops size."""
    img = np.arange(200 * 300 * 3, dtype=np.uint8).reshape(200, 300, 3)
    out = A.classify_eval_transform(img, 96, crop_fraction=0.5)
    assert out.shape == (96, 96, 3)
    out2 = A.classify_eval_transform(img, 96, crop_fraction=1.0)
    assert out2.shape == (96, 96, 3)
    # crop_fraction=1: short edge == size, so the full height is kept
    ref = cv2_resize_short(img, 96)
    y0 = 0
    x0 = (ref.shape[1] - 96) // 2
    np.testing.assert_array_equal(out2, ref[y0:y0 + 96, x0:x0 + 96])


def cv2_resize_short(img, s):
    import cv2
    h, w = img.shape[:2]
    r = s / min(h, w)
    return cv2.resize(img, (max(s, int(round(w * r))), max(s, int(round(h * r)))))


def test_random_resized_crop_shape_and_content():
    rng = np.random.default_rng(0)
    img = np.full((80, 120, 3), 77, np.uint8)
    out = A.random_resized_crop(img, 64, rng=rng)
    assert out.shape == (64, 64, 3)
    assert (out == 77).all()  # crops of a constant image stay constant


@pytest.mark.parametrize("policy", ["randaugment", "augmix", "autoaugment"])
def test_auto_augment_policies_valid_uint8(policy):
    rng = np.random.default_rng(3)
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8).astype(np.uint8)
    fn = {"randaugment": A.rand_augment, "augmix": A.augmix,
          "autoaugment": A.autoaugment_imagenet}[policy]
    for _ in range(5):
        out = fn(img, rng)
        assert out.shape == img.shape and out.dtype == np.uint8


def test_random_erasing_erases_region():
    rng = np.random.default_rng(0)
    img = np.zeros((64, 64, 3), np.uint8)
    out = A.random_erasing(img, p=1.0, rng=rng)
    assert (out != 0).any()  # filled region present
    assert (A.random_erasing(img, p=0.0, rng=rng) == 0).all()


def test_classify_train_transform_pipeline():
    rng = np.random.default_rng(0)
    img = np.random.default_rng(1).integers(0, 255, (100, 140, 3), np.uint8).astype(np.uint8)
    out = A.classify_train_transform(img, 96, rng, erasing=1.0,
                                     auto_augment="randaugment")
    assert out.shape == (96, 96, 3) and out.dtype == np.uint8
    # no-policy path exercises color_jitter
    out2 = A.classify_train_transform(img, 96, rng, auto_augment=None)
    assert out2.shape == (96, 96, 3)


def test_classification_dataset_consumes_cfg_keys(tmp_path):
    """erasing/crop_fraction/auto_augment keys drive the classify dataset
    (reference ClassificationDataset wiring, data/dataset.py:445-459)."""
    import cv2
    from xlstm_yolo_tpu.data.dataset import ClassificationDataset
    for split, cls in [("train", "cat"), ("train", "dog")]:
        d = tmp_path / split / cls
        d.mkdir(parents=True)
        for i in range(3):
            cv2.imwrite(str(d / f"{i}.jpg"),
                        np.random.default_rng(i).integers(0, 255, (80, 90, 3)).astype(np.uint8))
    rng = np.random.default_rng(0)
    ds = ClassificationDataset(str(tmp_path / "train"), imgsz=64, augment=True,
                               hyp={"auto_augment": "randaugment", "erasing": 1.0,
                                    "scale": 0.5})
    img, label = ds.get_sample(0, rng)
    assert img.shape == (64, 64, 3) and label in (0, 1)
    ds_eval = ClassificationDataset(str(tmp_path / "train"), imgsz=64, augment=False,
                                    hyp={"crop_fraction": 0.8})
    img, _ = ds_eval.get_sample(0, rng)
    assert img.shape == (64, 64, 3)
