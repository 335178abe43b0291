"""Rect val — aspect-ratio-bucketed static batch shapes.

Covers the reference's rect=True val pipeline (data/base.py set_rectangle +
models/yolo/detect/val.py pad=0.5) in its TPU-native form: a small set of
stride-aligned bucket shapes, each one XLA compilation.
"""
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.smoke


CLASSES = ["a", "b", "c"]


def _mixed_ar_dataset(root: Path, n_wide=5, n_tall=5, n_square=2, base=96):
    """YOLO-format detect dataset with wide (h<w), tall (h>w) and square
    images, one bright box per image."""
    import cv2

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        shapes = ([(base // 2, base)] * n_wide + [(base, base // 2)] * n_tall
                  + [(base, base)] * n_square)
        for i, (h, w) in enumerate(shapes):
            img = (rng.integers(0, 40, (h, w, 3))).astype(np.uint8) + 40
            bw, bh = w // 3, h // 3
            cx = int(rng.integers(bw // 2 + 2, w - bw // 2 - 2))
            cy = int(rng.integers(bh // 2 + 2, h - bh // 2 - 2))
            cv2.rectangle(img, (cx - bw // 2, cy - bh // 2),
                          (cx + bw // 2, cy + bh // 2), (220, 220, 220), -1)
            cv2.imwrite(str(root / "images" / split / f"{i}.jpg"), img)
            (root / "labels" / split / f"{i}.txt").write_text(
                f"0 {cx / w:.6f} {cy / h:.6f} {bw / w:.6f} {bh / h:.6f}\n")
    yml = root / "data.yaml"
    yml.write_text(
        f"path: {root}\ntrain: images/train\nval: images/val\nnc: {len(CLASSES)}\n"
        f"names: {CLASSES}\n")
    return str(yml)


@pytest.fixture(scope="module")
def rect_data(tmp_path_factory):
    return _mixed_ar_dataset(tmp_path_factory.mktemp("rectds"))


def test_set_rectangle_buckets(rect_data):
    """Batches group by aspect ratio; bucket shapes are stride-aligned and
    oriented with the images (wide bucket h<w, tall bucket h>w)."""
    from xlstm_yolo_tpu.data.dataset import YOLODataset, check_det_dataset

    d = check_det_dataset(rect_data)
    ds = YOLODataset(d["val"], imgsz=96, rect=True, batch=4, stride=32, max_labels=8)
    assert ds.rect and ds.rect_batches
    assert sum(len(g[0]) for g in ds.rect_batches) == ds.ni
    shapes = ds._image_shapes(d["val"]).astype(float)
    for idxs, (h, w) in ds.rect_batches:
        assert h % 32 == 0 and w % 32 == 0
        ar = shapes[idxs, 0] / shapes[idxs, 1]
        if (ar < 1).all():       # all wide -> short canvas
            assert h < w
        elif (ar > 1).all():     # all tall -> narrow canvas
            assert h > w
    # buckets reuse shapes: distinct shapes stay small (compile count bound)
    assert len({g[1] for g in ds.rect_batches}) <= 3


def test_image_shapes_cached(rect_data):
    """Second construction loads header shapes from the persisted cache."""
    from xlstm_yolo_tpu.data.dataset import YOLODataset, check_det_dataset

    d = check_det_dataset(rect_data)
    ds = YOLODataset(d["val"], imgsz=96, rect=True, batch=4, max_labels=8)
    cp = ds._cache_path(d["val"])
    sp = cp.with_name(cp.name + ".shapes.npz")
    assert sp.exists()
    ds2 = YOLODataset(d["val"], imgsz=96, rect=True, batch=4, max_labels=8)
    assert ds2.rect_batches == ds.rect_batches


def test_rect_loader_batches_and_labels(rect_data):
    """Loader yields bucket-shaped batches whose letterboxed labels sit on
    the drawn bright rectangles (geometry consistent with the images)."""
    from xlstm_yolo_tpu.data.dataset import build_dataloader

    loader, _ = build_dataloader(rect_data, "val", batch=4, imgsz=96,
                                 max_labels=8, rect=True)
    seen = 0
    for batch in loader:
        h, w = batch["img"].shape[1:3]
        shp = loader.ds.rect_batches[seen][1]
        assert (h, w) == shp
        for bi in range(len(batch["img"])):
            m = batch["mask"][bi]
            if not m.any():
                continue
            x1, y1, x2, y2 = batch["cls_boxes"][bi][m][0][1:5]
            assert 0 <= x1 < x2 <= w and 0 <= y1 < y2 <= h
            inside = batch["img"][bi, int(y1):int(y2), int(x1):int(x2)].mean()
            assert inside > batch["img"][bi].mean() + 0.05
        seen += 1
    assert seen == len(loader) == len(loader.ds.rect_batches)


def test_pred_to_json_rect_unscale():
    """Boxes in rect-bucket input space round-trip to original pixels: a box
    placed by the exact load+letterbox geometry comes back to its source."""
    from xlstm_yolo_tpu.engine.validator import Validator

    h0, w0, imgsz = 300, 600, 96  # wide image, will long-side-resize to 96
    in_h, in_w = 64, 128          # a rect bucket
    r1 = imgsz / max(h0, w0)
    gain = min(r1, in_h / h0, in_w / w0)
    padx, pady = (in_w - w0 * gain) / 2, (in_h - h0 * gain) / 2
    # original-pixel box -> input-space det
    ox1, oy1, ox2, oy2 = 100.0, 50.0, 400.0, 250.0
    det = np.array([[ox1 * gain + padx, oy1 * gain + pady,
                     ox2 * gain + padx, oy2 * gain + pady, 0.9, 0]])
    jdict = []
    Validator._pred_to_json(jdict, det, ["7.jpg"], 0, (h0, w0),
                            (in_h, in_w), list(range(1, 4)), load_sz=imgsz)
    x, y, bw, bh = jdict[0]["bbox"]
    assert np.allclose([x, y, x + bw, y + bh], [ox1, oy1, ox2, oy2], atol=0.51)


def test_rect_val_smoke(rect_data):
    """Full detect Validator with rect=True runs and finds the objects."""
    from xlstm_yolo_tpu.engine.validator import Validator
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    model = TaskModel("yolov8n.yaml", nc=3)
    variables = model.init(0, imgsz=96)
    v = Validator(model, imgsz=96, batch=4, rect=True, max_labels=8)
    out = v(variables, data=rect_data)
    assert out["images"] == 12
    assert 0.0 <= out["mAP50"] <= 1.0
