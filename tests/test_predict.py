"""Predictor / Results / facade tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained_setup(tmp_path_factory):
    """A lightly-trained tiny model + its synthetic dataset."""
    from xlstm_yolo_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("synthp")
    data_yaml = make_synthetic_dataset(root, n_train=8, n_val=4, imgsz=96)
    return data_yaml, root


def test_predict_on_array():
    from xlstm_yolo_tpu.engine.predictor import Predictor
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    m = TaskModel("yolov8n.yaml", nc=3)
    v = m.init(0, imgsz=64)
    img = np.random.default_rng(0).integers(0, 255, (120, 160, 3)).astype(np.uint8)
    p = Predictor(m, v, imgsz=64, conf=0.0001, verbose=False)
    results = p(img)
    assert len(results) == 1
    r = results[0]
    assert r.orig_shape == (120, 160)
    assert set(r.speed) == {"preprocess", "inference", "postprocess"}
    # boxes rescaled into original-image coords
    if len(r.boxes):
        assert r.boxes.xyxy[:, [0, 2]].max() <= 160 + 1e-3
        assert r.boxes.xyxy[:, [1, 3]].max() <= 120 + 1e-3
        assert (r.boxes.xyxyn <= 1.001).all()


def test_predict_bus_jpg():
    from xlstm_yolo_tpu.engine.predictor import Predictor
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    m = TaskModel("yolov8n.yaml")
    v = m.init(0, imgsz=64)
    p = Predictor(m, v, imgsz=64, conf=0.0001, verbose=False)
    results = p("/root/reference/assets/bus.jpg")
    assert len(results) == 1
    assert results[0].orig_shape[0] > 500  # real image loaded


def test_results_api(tmp_path):
    from xlstm_yolo_tpu.engine.results import Results

    img = np.zeros((100, 200, 3), np.uint8)
    boxes = np.asarray([[10, 10, 50, 60, 0.9, 1], [100, 20, 150, 80, 0.7, 0]], np.float32)
    r = Results(img, names={0: "a", 1: "b"}, boxes=boxes)
    assert len(r) == 2
    np.testing.assert_allclose(r.boxes.xywh[0], [30, 35, 40, 50])
    assert "1 a" in r.verbose() and "1 b" in r.verbose()
    import json

    j = json.loads(r.to_json())  # reference API: to_json returns a string
    assert j[0]["name"] == "b" and j[0]["confidence"] == 0.9
    assert r.summary()[0]["box"]["x1"] == 10.0
    plotted = r.plot()
    assert plotted.shape == img.shape and plotted.sum() > 0
    r.save_txt(tmp_path / "out.txt", save_conf=True)
    lines = (tmp_path / "out.txt").read_text().strip().splitlines()
    assert len(lines) == 2 and lines[0].startswith("1 ")
    out = r.save(tmp_path / "out.jpg")
    assert (tmp_path / "out.jpg").exists()


def test_facade_predict_and_val(trained_setup, tmp_path):
    """YOLO facade: train briefly, save, reload, predict + val."""
    from xlstm_yolo_tpu import YOLO
    from xlstm_yolo_tpu.engine.trainer import Trainer
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    data_yaml, root = trained_setup
    model = TaskModel("yolov8n.yaml", nc=3)
    tr = Trainer(model, overrides={
        "data": data_yaml, "epochs": 2, "imgsz": 96, "batch": 8, "val": True,
        "project": str(tmp_path), "name": "f1", "max_labels": 16, "optimizer": "SGD",
        "lr0": 0.005, "warmup_epochs": 0.0, "nbs": 8, "mosaic": 0.0, "scale": 0.0,
        "translate": 0.0, "fliplr": 0.0, "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
    })
    metrics = tr.train()
    assert "mAP50" in metrics

    # reload best checkpoint through the facade
    y = YOLO(str(tr.save_dir / "last.ckpt"))
    assert y.model.nc == 3
    img_file = str(root / "images" / "val" / "0000.jpg")
    results = y.predict(img_file, imgsz=96, conf=0.0001, verbose=False)
    assert len(results) == 1
    m2 = y.val(data=data_yaml, imgsz=96, max_labels=16, batch=4)
    assert 0.0 <= m2["mAP50"] <= 1.0


def test_predict_segment_and_pose_tasks():
    """Task-aware predictor paths: segment masks + pose keypoints."""
    import numpy as np

    from xlstm_yolo_tpu.engine.predictor import Predictor
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)

    m = TaskModel("yolov8n-seg.yaml", nc=3)
    v = m.init(0, imgsz=64)
    res = Predictor(m, v, imgsz=64, conf=1e-5, verbose=False)(img)[0]
    if len(res):
        assert res.masks is not None
        assert res.masks.shape[1:] == (96, 96)

    m = TaskModel("yolov8n-pose.yaml")
    v = m.init(0, imgsz=64)
    res = Predictor(m, v, imgsz=64, conf=1e-5, verbose=False)(img)[0]
    if len(res):
        assert res.keypoints is not None
        assert res.keypoints.shape[1:] == (17, 3)


def test_predict_obb_and_classify_tasks():
    import numpy as np

    from xlstm_yolo_tpu.engine.predictor import Predictor
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)

    m = TaskModel("yolov8n-obb.yaml")
    v = m.init(0, imgsz=64)
    res = Predictor(m, v, imgsz=64, conf=1e-5, verbose=False)(img)[0]
    assert hasattr(res, "obb")

    m = TaskModel("yolov8n-cls.yaml", nc=4)
    v = m.init(0, imgsz=64)
    res = Predictor(m, v, imgsz=64, verbose=False)(img)[0]
    assert res.probs is not None and res.probs.data.shape == (4,)


def test_predictor_save_outputs(tmp_path):
    """save / save_txt / save_crop write annotated media, YOLO txt labels and
    per-class crops under an incremented run dir (reference predictor
    write_results, engine/predictor.py:325)."""
    import cv2

    from xlstm_yolo_tpu.engine.predictor import Predictor
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    m = TaskModel("yolov8n.yaml", nc=3)
    v = m.init(0, imgsz=64)
    p = Predictor(m, v, imgsz=64, conf=0.0, verbose=False, save=True,
                  save_txt=True, save_crop=True, project=str(tmp_path), name="p")
    res = p("/root/reference/assets/bus.jpg")
    assert len(res) == 1
    sd = p.save_dir
    assert (sd / "bus.jpg").exists()
    assert (sd / "labels" / "bus.txt").exists()

    # tiny synthetic video -> annotated video written and finalized
    vid = tmp_path / "clip.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
    rng = np.random.default_rng(0)
    for _ in range(3):
        w.write(rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
    w.release()
    p2 = Predictor(m, v, imgsz=64, conf=0.0, verbose=False, save=True,
                   project=str(tmp_path), name="v")
    out = p2(str(vid))
    assert len(out) == 3
    vids = list(p2.save_dir.glob("*.mp4"))
    assert vids and vids[0].stat().st_size > 0
