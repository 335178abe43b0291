"""All-task integration: segment / pose / obb / classify train + val."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.data.synthetic import make_synthetic_dataset
from xlstm_yolo_tpu.engine.trainer import Trainer
from xlstm_yolo_tpu.engine.validator import Validator
from xlstm_yolo_tpu.nn.tasks import TaskModel

COMMON = dict(epochs=2, imgsz=96, batch=4, val=True, max_labels=16, optimizer="SGD",
              lr0=0.005, warmup_epochs=0.0, nbs=4, mosaic=0.0, scale=0.0, translate=0.0,
              fliplr=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0, plots=False)


pytestmark = pytest.mark.slow


def _train(model, data_yaml, tmp_path, name):
    tr = Trainer(model, overrides={**COMMON, "data": data_yaml,
                                   "project": str(tmp_path), "name": name})
    metrics = tr.train()
    assert all(np.isfinite(v) for v in metrics.values() if isinstance(v, float))
    return tr, metrics


def test_segment_train_val(tmp_path):
    data_yaml = make_synthetic_dataset(tmp_path / "d", n_train=4, n_val=2, imgsz=96, task="segment")
    model = TaskModel("yolov8n-seg.yaml", nc=3)
    tr, metrics = _train(model, data_yaml, tmp_path, "seg")
    assert "mAP50(M)" in metrics and "mAP50" in metrics


def test_pose_train_val(tmp_path):
    data_yaml = make_synthetic_dataset(tmp_path / "d", n_train=4, n_val=2, imgsz=96, task="pose")
    from xlstm_yolo_tpu.cfg import load_model_yaml

    cfg, scale = load_model_yaml("yolov8n-pose.yaml")
    cfg["kpt_shape"] = [5, 3]
    model = TaskModel(cfg, scale="n")
    assert model._head_attr("kpt_shape", None) == (5, 3)
    tr, metrics = _train(model, data_yaml, tmp_path, "pose")
    assert "mAP50(P)" in metrics


def test_obb_train_val(tmp_path):
    data_yaml = make_synthetic_dataset(tmp_path / "d", n_train=4, n_val=2, imgsz=96, task="obb")
    model = TaskModel("yolov8n-obb.yaml", nc=3)
    tr, metrics = _train(model, data_yaml, tmp_path, "obb")
    assert "mAP50" in metrics


def test_obb_dataset_roundtrip(tmp_path):
    """OBB label corners -> rbox -> corners must keep geometry."""
    from xlstm_yolo_tpu.data.dataset import build_dataloader

    data_yaml = make_synthetic_dataset(tmp_path / "d", n_train=2, n_val=2, imgsz=96, task="obb")
    loader, d = build_dataloader(data_yaml, "val", batch=2, imgsz=96, max_labels=8, task="obb")
    batch = next(iter(loader))
    assert batch["cls_boxes"].shape[-1] == 6
    valid = batch["cls_boxes"][batch["mask"]]
    assert len(valid) >= 2
    # w, h positive; angle within cv2 minAreaRect range
    assert (valid[:, 3] > 0).all() and (valid[:, 4] > 0).all()
    assert np.abs(valid[:, 5]).max() <= np.pi


def test_segment_dataset_masks(tmp_path):
    from xlstm_yolo_tpu.data.dataset import build_dataloader

    data_yaml = make_synthetic_dataset(tmp_path / "d", n_train=2, n_val=2, imgsz=96, task="segment")
    loader, _ = build_dataloader(data_yaml, "val", batch=2, imgsz=96, max_labels=8, task="segment")
    batch = next(iter(loader))
    assert batch["masks"].shape == (2, 24, 24)
    # each valid instance has nonzero mask pixels
    for bi in range(2):
        n = int(batch["mask"][bi].sum())
        for slot in range(n):
            assert (batch["masks"][bi] == slot + 1).sum() > 0, f"empty mask for instance {slot}"


def test_pose_dataset_keypoints(tmp_path):
    from xlstm_yolo_tpu.data.dataset import build_dataloader

    data_yaml = make_synthetic_dataset(tmp_path / "d", n_train=2, n_val=2, imgsz=96, task="pose")
    loader, d = build_dataloader(data_yaml, "val", batch=2, imgsz=96, max_labels=8, task="pose")
    assert d["kpt_shape"] == [5, 3]
    batch = next(iter(loader))
    assert batch["keypoints"].shape == (2, 8, 5, 3)
    k = batch["keypoints"][batch["mask"]]
    boxes = batch["cls_boxes"][batch["mask"]]
    # keypoints inside (padded) image, center kpt inside its box
    assert k[..., 0].max() <= 96 and k[..., 1].max() <= 96
    cx, cy = k[:, 4, 0], k[:, 4, 1]
    assert ((cx >= boxes[:, 1] - 1) & (cx <= boxes[:, 3] + 1)).all()


def test_classify_pipeline(tmp_path):
    """Classify model: loss + top-1 on folder-style data handled via labels."""
    model = TaskModel("yolov8n-cls.yaml", nc=3)
    v = model.init(0, imgsz=64)
    rng = np.random.default_rng(0)
    batch = {"img": jnp.asarray(rng.random((4, 64, 64, 3)), jnp.float32),
             "label": jnp.asarray([0, 1, 2, 0])}
    (tot, aux), upd = jax.jit(lambda v, b: model.loss(v, b))(v, batch)
    assert np.isfinite(float(tot))
    probs = jax.jit(lambda v, x: model.predictions_full(v, x)["probs"])(v, batch["img"])
    assert probs.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


@pytest.mark.parametrize("task", ["segment", "pose", "obb"])
def test_point_task_mosaic(tmp_path, task):
    """Mosaic for point-carrying tasks keeps annotations aligned with boxes."""
    from xlstm_yolo_tpu.data.dataset import build_dataloader

    data_yaml = make_synthetic_dataset(tmp_path / "d", n_train=6, n_val=2, imgsz=96, task=task)
    hyp = {"mosaic": 1.0, "fliplr": 0.5, "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
           "copy_paste": 0.5 if task == "segment" else 0.0}
    loader, _ = build_dataloader(data_yaml, "train", batch=4, imgsz=96, max_labels=32,
                                 task=task, hyp=hyp, augment=True)
    batch = next(iter(loader))
    n_valid = int(batch["mask"].sum())
    assert n_valid > 0
    valid_boxes = batch["cls_boxes"][batch["mask"]]
    if task == "obb":
        assert batch["cls_boxes"].shape[-1] == 6
        assert (valid_boxes[:, 3] > 0).all() and (valid_boxes[:, 4] > 0).all()
    elif task == "segment":
        # every valid instance must own at least one mask pixel
        for bi in range(4):
            n = int(batch["mask"][bi].sum())
            for slot in range(n):
                assert (batch["masks"][bi] == slot + 1).sum() > 0
    elif task == "pose":
        k = batch["keypoints"][batch["mask"]]
        boxes = valid_boxes
        # center keypoint must sit inside its (mosaic-transformed) box
        cx, cy = k[:, 4, 0], k[:, 4, 1]
        inside = ((cx >= boxes[:, 1] - 2) & (cx <= boxes[:, 3] + 2)
                  & (cy >= boxes[:, 2] - 2) & (cy <= boxes[:, 4] + 2))
        assert inside.mean() > 0.9, f"{inside.mean()} of centers inside boxes"
