"""Native C++ imgproc tests."""
import numpy as np
import pytest

from xlstm_yolo_tpu import native


pytestmark = pytest.mark.smoke


@pytest.mark.skipif(not native.available(), reason="no compiler")
def test_native_letterbox_matches_cv2():
    from xlstm_yolo_tpu.data.augment import letterbox

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:411, 0:633]
    img = np.stack([xx % 256, yy % 256, (xx + yy) % 256], -1).astype(np.uint8)
    out, metas = native.letterbox_batch([img], 320)
    ref, _, (r, px, py) = letterbox(img, 320)
    np.testing.assert_allclose(metas[0], [r, px, py], atol=0.51)
    d = np.abs(out[0] - ref.astype(np.float32) / 255.0)
    assert d.mean() < 5e-3, f"mean abs diff {d.mean()}"


@pytest.mark.skipif(not native.available(), reason="no compiler")
def test_native_scaleup_flag():
    img = np.zeros((100, 200, 3), np.uint8)
    _, m = native.letterbox_batch([img], 320, scaleup=False)
    assert m[0, 0] == 1.0
    _, m = native.letterbox_batch([img], 320, scaleup=True)
    assert m[0, 0] == pytest.approx(1.6)


@pytest.mark.skipif(not native.available(), reason="no compiler")
def test_native_collate_in_loader(tmp_path):
    from xlstm_yolo_tpu.data.dataset import build_dataloader
    from xlstm_yolo_tpu.data.synthetic import make_synthetic_dataset

    data_yaml = make_synthetic_dataset(tmp_path, n_train=2, n_val=4, imgsz=96)
    loader, _ = build_dataloader(data_yaml, "val", batch=4, imgsz=96, max_labels=16)
    batch = next(iter(loader))
    assert batch["img"].shape == (4, 96, 96, 3)
    assert batch["img"].dtype == np.float32
    assert batch["mask"].sum() >= 4
    # labels still align with bright shapes
    ins = []
    for bi in range(4):
        for (cls, x1, y1, x2, y2), m in zip(batch["cls_boxes"][bi], batch["mask"][bi]):
            if m:
                ins.append(batch["img"][bi][int(y1):int(y2), int(x1):int(x2)].mean())
    assert np.mean(ins) > batch["img"].mean() + 0.05
