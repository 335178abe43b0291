"""End-to-end training stack tests: data pipeline, trainer, validator,
checkpointing — all on the 8-device virtual CPU mesh."""
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.data.synthetic import make_synthetic_dataset


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def data_yaml(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(root, n_train=8, n_val=4, imgsz=96)


@pytest.mark.smoke
def test_dataset_pipeline(data_yaml):
    from xlstm_yolo_tpu.data.dataset import build_dataloader

    loader, d = build_dataloader(data_yaml, "train", batch=4, imgsz=96, max_labels=16)
    assert d["nc"] == 3
    batch = next(iter(loader))
    assert batch["img"].shape == (4, 96, 96, 3)
    assert batch["cls_boxes"].shape == (4, 16, 5)
    assert batch["mask"].shape == (4, 16)
    assert batch["img"].dtype == np.float32
    assert 0.0 <= batch["img"].min() and batch["img"].max() <= 1.0
    assert batch["mask"].sum() >= 4  # at least one object per image
    # boxes are valid xyxy within the canvas
    valid = batch["cls_boxes"][batch["mask"]]
    assert (valid[:, 3] > valid[:, 1]).all() and (valid[:, 4] > valid[:, 2]).all()
    assert valid[:, 1:].min() >= 0 and valid[:, 1:].max() <= 96


def test_dataset_no_augment_boxes_match_image(data_yaml):
    """Letterboxed eval samples keep labels aligned with drawn shapes: the
    mean brightness inside boxes must exceed outside (shapes are bright)."""
    from xlstm_yolo_tpu.data.dataset import build_dataloader

    loader, _ = build_dataloader(data_yaml, "val", batch=4, imgsz=96, max_labels=16)
    batch = next(iter(loader))
    inside_vals, outside_vals = [], []
    for bi in range(4):
        img = batch["img"][bi]
        for (cls, x1, y1, x2, y2), m in zip(batch["cls_boxes"][bi], batch["mask"][bi]):
            if not m:
                continue
            x1i, y1i, x2i, y2i = map(int, (x1, y1, x2, y2))
            inside_vals.append(img[y1i:y2i, x1i:x2i].mean())
        outside_vals.append(img.mean())
    assert np.mean(inside_vals) > np.mean(outside_vals) + 0.05


def test_trainer_loss_decreases(data_yaml, tmp_path):
    from xlstm_yolo_tpu import YOLO

    from xlstm_yolo_tpu.nn.tasks import TaskModel
    from xlstm_yolo_tpu.engine.trainer import Trainer

    # nc mismatch: the trainer rebuilds the model with the dataset's nc and
    # transfers intersecting weights (reference models/yolo/detect/train.py
    # get_model(nc=data["nc"]) + nn/tasks.py intersect_dicts)
    m80 = TaskModel("yolov8n.yaml")  # nc=80
    tr_mismatch = Trainer(m80, overrides={
        "data": data_yaml, "epochs": 1, "imgsz": 96, "batch": 8, "val": False,
        "project": str(tmp_path), "name": "bad", "max_labels": 16,
        "workers": 0, "plots": False, "seed": 0,
    })
    tr_mismatch.train()
    assert tr_mismatch.model.nc == 3

    model = TaskModel("yolov8n.yaml", nc=3)
    tr = Trainer(model, overrides={
        # clean overfit config: no augmentation, no grad accumulation
        # (nbs == batch), no warmup floor, fixed batch each epoch
        "data": data_yaml, "epochs": 10, "imgsz": 96, "batch": 8, "val": False,
        "project": str(tmp_path), "name": "t1", "max_labels": 16, "optimizer": "SGD",
        "lr0": 0.01, "warmup_epochs": 0.0, "nbs": 8, "mosaic": 0.0, "scale": 0.0,
        "translate": 0.0, "fliplr": 0.0, "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
        "workers": 0, "plots": False, "seed": 0,
    })
    tr.train()
    import csv

    with open(tr.csv) as f:
        rows = list(csv.DictReader(f))
    losses = [float(r["train/loss"]) for r in rows]
    assert len(losses) == 10
    assert all(np.isfinite(losses))
    # loss must come down while overfitting 8 images
    assert losses[-1] < losses[0] * 0.85, f"loss did not decrease: {losses}"
    # checkpoints written
    assert (tr.save_dir / "last.ckpt" / "state.msgpack").exists()


def test_checkpoint_roundtrip(tmp_path):
    from xlstm_yolo_tpu.nn.tasks import TaskModel
    from xlstm_yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    m = TaskModel("yolov8n.yaml", nc=3)
    v = m.init(0, imgsz=64)
    save_checkpoint(tmp_path / "ck.ckpt", m, v, epoch=5, best_fitness=0.5,
                    train_args={"imgsz": 96})
    m2, v2, meta = load_checkpoint(tmp_path / "ck.ckpt")
    assert m2.nc == 3 and meta["epoch"] == 5
    x = jnp.ones((1, 64, 64, 3))
    y1 = jax.jit(m.predictions)(v, x)
    y2 = jax.jit(m2.predictions)(v2, x)
    np.testing.assert_allclose(y1, y2, atol=1e-6)


def test_checkpoint_ema_roundtrip(tmp_path):
    from xlstm_yolo_tpu.nn.tasks import TaskModel
    from xlstm_yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    m = TaskModel("yolov8n.yaml", nc=3)
    v = m.init(0, imgsz=64)
    ema = jax.tree.map(lambda x: x * 0.5, v["params"])
    save_checkpoint(tmp_path / "ck.ckpt", m, v, ema_params=ema)
    _, v_ema, _ = load_checkpoint(tmp_path / "ck.ckpt", use_ema=True)
    leaf = jax.tree.leaves(v["params"])[0]
    leaf_ema = jax.tree.leaves(v_ema["params"])[0]
    np.testing.assert_allclose(np.asarray(leaf_ema), np.asarray(leaf) * 0.5, atol=1e-6)


def test_validator_untrained(data_yaml):
    from xlstm_yolo_tpu.nn.tasks import TaskModel
    from xlstm_yolo_tpu.engine.validator import Validator

    m = TaskModel("yolov8n.yaml", nc=3)
    v = m.init(0, imgsz=96)
    out = Validator(m, imgsz=96, max_labels=16, batch=4)(v, data=data_yaml)
    assert set(out) >= {"mAP50", "mAP50-95", "precision", "recall", "fitness", "images"}
    assert out["images"] == 4
    assert 0.0 <= out["mAP50"] <= 1.0


def test_metrics_perfect_predictions():
    """ap_per_class on perfect detections must give mAP == 1."""
    from xlstm_yolo_tpu.utils import metrics as MET

    gt = np.asarray([[10, 10, 50, 50], [60, 60, 90, 90]], float)
    gt_cls = np.asarray([0.0, 1.0])
    dets = np.concatenate([gt, [[0.9], [0.8]], gt_cls[:, None]], axis=1)
    iou = MET.box_iou_np(gt, dets[:, :4])
    tp = MET.match_predictions(dets[:, 5], gt_cls, iou)
    assert tp.all()
    r = MET.ap_per_class(tp, dets[:, 4], dets[:, 5], gt_cls)
    # 0.995, not 1.0: the 101-point interpolation endpoint artifact — the
    # reference's compute_ap (utils/metrics.py:505) produces the same value
    assert r["map50"] >= 0.99
    assert r["map"] >= 0.99


def test_metrics_localization_threshold():
    """A detection with IoU 0.6 counts at mAP50 but not at strict thresholds."""
    from xlstm_yolo_tpu.utils import metrics as MET

    gt = np.asarray([[0, 0, 100, 100]], float)
    det_box = np.asarray([[0, 0, 100, 60]], float)  # IoU = 0.6
    iou = MET.box_iou_np(gt, det_box)
    tp = MET.match_predictions(np.asarray([0.0]), np.asarray([0.0]), iou)
    assert tp[0, 0] and tp[0, 1]  # 0.50, 0.55
    assert not tp[0, 3]  # 0.65


def test_trainer_preemption_and_profile(data_yaml, tmp_path):
    """Preemption request (SIGTERM handler sets _preempted) checkpoints and
    stops mid-run; profile=True writes a jax.profiler trace directory."""
    from xlstm_yolo_tpu.engine.trainer import Trainer
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    model = TaskModel("yolov8n.yaml", nc=3)
    tr = Trainer(model, overrides={
        "data": data_yaml, "epochs": 50, "imgsz": 96, "batch": 8, "val": False,
        "project": str(tmp_path), "name": "pre", "max_labels": 16,
        "optimizer": "SGD", "warmup_epochs": 0.0, "nbs": 8, "plots": False,
        "profile": True, "mosaic": 0.0, "seed": 0,
    })
    # simulate the SIGTERM handler firing during the first batch
    tr.add_callback("on_train_batch_end", lambda t: setattr(t, "_preempted", True))
    tr.train()
    assert (tr.save_dir / "last.ckpt" / "state.msgpack").exists()
    prof = list((tr.save_dir / "profile").rglob("*"))
    assert prof, "profiler trace not written"


def test_validator_tail_batch_and_save_json(tmp_path):
    """val must evaluate EVERY image (no drop_last tail loss) and can dump
    COCO-format predictions (reference detect/val.py pred_to_json)."""
    import json as _json

    from xlstm_yolo_tpu.engine.validator import Validator
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    data_yaml = make_synthetic_dataset(tmp_path / "ds5", n_train=4, n_val=5, imgsz=96)
    m = TaskModel("yolov8n.yaml", nc=3)
    v = m.init(0, imgsz=96)
    out = Validator(m, imgsz=96, max_labels=16, batch=4, conf=0.5,
                    save_json=True, save_dir=str(tmp_path / "valrun"))(v, data=data_yaml)
    assert out["images"] == 5, f"tail batch dropped: {out['images']}"
    jp = tmp_path / "valrun" / "predictions.json"
    assert jp.exists()
    preds = _json.loads(jp.read_text())
    assert isinstance(preds, list)
    for p in preds[:3]:
        assert set(p) == {"image_id", "category_id", "bbox", "score"}


def test_train_then_val_map_improves(data_yaml, tmp_path):
    """Training efficacy through the FULL loop (reference analogue: coco8
    overfit sanity): train the tiny model to overfit its 8 train images,
    then run the real Validator on those same images — mAP50 must rise from
    the untrained ~0 to a clearly-learned level. This is the end-to-end
    signal that loss decrease actually translates into detections."""
    import yaml as _yaml

    from xlstm_yolo_tpu.engine.trainer import Trainer
    from xlstm_yolo_tpu.engine.validator import Validator
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    # a dataset view whose val split IS the train split (overfit check)
    d = _yaml.safe_load(open(data_yaml))
    d["val"] = d["train"]
    overfit_yaml = tmp_path / "overfit.yaml"
    overfit_yaml.write_text(_yaml.safe_dump(d))

    model = TaskModel("yolov8n.yaml", nc=3)
    v0 = model.init(0, imgsz=96)
    base = Validator(model, imgsz=96, batch=8)(v0, str(overfit_yaml))

    tr = Trainer(model, overrides={
        "data": data_yaml, "epochs": 240, "imgsz": 96, "batch": 8, "val": False,
        "project": str(tmp_path), "name": "map1", "max_labels": 16,
        "optimizer": "SGD", "lr0": 0.02, "warmup_epochs": 0.0, "nbs": 8,
        "mosaic": 0.0, "scale": 0.0, "translate": 0.0, "fliplr": 0.0,
        "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "workers": 0,
        "plots": False, "seed": 0,
    })
    tr.train()
    trained = Validator(model, imgsz=96, batch=8)(tr.variables, str(overfit_yaml))
    assert trained["images"] == 8
    # untrained detections are noise; the trained model must find the
    # shapes it overfit. The bar is calibrated to catch the silent-collapse
    # class of bug (un-detached assigner targets / extinguished top-k gave
    # mAP exactly 0.0 at ANY epoch count while train loss fell to ~0.15);
    # measured healthy runs: mAP50 0.32-0.45 at 240 epochs — AT/ABOVE the
    # torch reference on the same run (0.307; tools/convergence_audit.py
    # + test_matched_run_convergence_parity assert the cross-framework bar).
    assert trained["mAP50"] > 0.25, (base["mAP50"], trained["mAP50"])
    assert trained["mAP50"] > base["mAP50"] + 0.1, (base["mAP50"], trained["mAP50"])


@pytest.mark.smoke
def test_label_cache_roundtrip(tmp_path):
    """Persistent label cache: second construction loads the npz instead of
    re-scanning txt files, and an edited label invalidates the hash
    (reference data/dataset.py cache_labels / .cache, pickle-free here)."""
    import time

    from xlstm_yolo_tpu.data.dataset import YOLODataset, check_det_dataset

    yml = make_synthetic_dataset(tmp_path / "ds", n_train=6, n_val=2, imgsz=64)
    d = check_det_dataset(yml)
    ds1 = YOLODataset(d["train"], imgsz=64, max_labels=8)
    cache = next(Path(d["train"]).glob("labels_*.cache.npz"), None)
    assert cache is not None and cache.exists()

    ds2 = YOLODataset(d["train"], imgsz=64, max_labels=8)
    assert len(ds2.labels) == len(ds1.labels)
    for a, b in zip(ds1.labels, ds2.labels):
        np.testing.assert_array_equal(a["cls"], b["cls"])
        np.testing.assert_allclose(a["xywhn"], b["xywhn"], atol=1e-7)

    # an edited label file invalidates the hash -> rescan picks up new rows
    from xlstm_yolo_tpu.data.dataset import img2label_path

    target = Path(img2label_path(ds1.files[0]))
    time.sleep(0.01)
    target.write_text("2 0.5 0.5 0.25 0.25\n")
    ds3 = YOLODataset(d["train"], imgsz=64, max_labels=8)
    assert len(ds3.labels[0]["cls"]) == 1 and ds3.labels[0]["cls"][0] == 2
    np.testing.assert_allclose(ds3.labels[0]["xywhn"][0], [0.5, 0.5, 0.25, 0.25], atol=1e-6)


@pytest.mark.smoke
def test_disk_image_cache(tmp_path):
    """cache='disk' persists decoded+resized images as .npy beside the
    source (reference data/base.py:189) and returns identical pixels."""
    from xlstm_yolo_tpu.data.dataset import YOLODataset, check_det_dataset

    yml = make_synthetic_dataset(tmp_path / "ds", n_train=3, n_val=1, imgsz=64)
    d = check_det_dataset(yml)
    ds = YOLODataset(d["train"], imgsz=64, max_labels=8, cache="disk")
    a = ds.load_image(0)  # decode + write
    assert Path(ds.files[0]).with_suffix(".cache.npy").exists()
    ds2 = YOLODataset(d["train"], imgsz=64, max_labels=8, cache="disk")
    b = ds2.load_image(0)  # load from npy
    np.testing.assert_array_equal(a, b)
    assert ds2.ori_shapes[0] == ds.ori_shapes[0]


@pytest.mark.smoke
def test_loader_worker_pool_batches_match_meta(tmp_path):
    """workers>0 assembles samples in a thread pool; batches keep the
    fixed shapes and per-image metadata, and a no-augment run is
    deterministic across worker counts."""
    from xlstm_yolo_tpu.data.dataset import Loader, YOLODataset, check_det_dataset

    yml = make_synthetic_dataset(tmp_path / "ds", n_train=8, n_val=2, imgsz=64)
    d = check_det_dataset(yml)

    def batches(workers):
        ds = YOLODataset(d["train"], imgsz=64, max_labels=8, augment=False)
        # force the python collate path (bypass the native assembler) so the
        # pool actually runs
        ds.collate_native = lambda idxs: None
        ld = Loader(ds, 4, shuffle=False, drop_last=False, workers=workers)
        return list(ld)

    b0, b2 = batches(0), batches(2)
    assert len(b0) == len(b2) == 2
    for x, y in zip(b0, b2):
        np.testing.assert_allclose(x["img"], y["img"], atol=1e-7)
        np.testing.assert_allclose(x["cls_boxes"], y["cls_boxes"], atol=1e-6)
        np.testing.assert_array_equal(x["mask"], y["mask"])


def test_multi_scale_training(tmp_path):
    """multi_scale rotates among a static bucket of stride-aligned sizes
    (reference preprocess_batch rescale,
    /root/reference/models/yolo/detect/train.py:57-74): >=2 distinct batch
    shapes must actually train, loss stays finite."""
    from xlstm_yolo_tpu.data.synthetic import make_synthetic_dataset
    from xlstm_yolo_tpu.engine.trainer import Trainer
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    yml = make_synthetic_dataset(tmp_path / "ms", n_train=8, n_val=2, imgsz=96)
    model = TaskModel("yolov8n.yaml", nc=3)
    tr = Trainer(model, overrides=dict(
        data=yml, imgsz=96, batch=2, epochs=2, val=False, max_labels=16,
        optimizer="SGD", lr0=0.002, warmup_epochs=0.0, nbs=2, mosaic=0.0,
        scale=0.0, translate=0.0, fliplr=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
        multi_scale=True, seed=3, project=str(tmp_path), name="ms"))
    metrics = tr.train()
    assert len(tr._ms_sizes_used) >= 2, tr._ms_sizes_used
    assert all(s % 32 == 0 for s in tr._ms_sizes_used)
    assert np.isfinite(metrics["train_loss"])
