"""ConfusionMatrix task coverage (classify/obb; reference utils/metrics.py:294)
and the val-time curve-plot family (reference utils/metrics.py:394-503)."""
import numpy as np
import pytest

from xlstm_yolo_tpu.utils import metrics as MET


def test_confusion_matrix_classify():
    cm = MET.ConfusionMatrix(nc=3, task="classify")
    assert cm.matrix.shape == (3, 3)
    preds = np.array([[0, 1], [1, 0], [2, 0], [0, 2]])
    targets = np.array([0, 1, 1, 2])
    cm.process_cls_preds(preds, targets)
    assert cm.matrix[0, 0] == 1 and cm.matrix[1, 1] == 1
    assert cm.matrix[2, 1] == 1 and cm.matrix[0, 2] == 1
    assert cm.matrix.sum() == 4


def test_confusion_matrix_conf_remap():
    """val-default conf 0.001 remaps to 0.25 (reference utils/metrics.py:311)."""
    assert MET.ConfusionMatrix(2, conf=0.001).conf == 0.25
    assert MET.ConfusionMatrix(2, conf=None).conf == 0.25
    assert MET.ConfusionMatrix(2, conf=0.5).conf == 0.5


def test_confusion_matrix_obb_probiou():
    """(N, 7) dets with trailing angle route through probiou matching."""
    cm = MET.ConfusionMatrix(nc=2, conf=0.25)
    # gt: one axis-aligned rbox at (50, 50) size 20x10, class 0
    gt = np.array([[50.0, 50.0, 20.0, 10.0, 0.0]])
    gt_cls = np.array([0.0])
    # det: same rbox, conf 0.9, class 0, angle 0 -> TP
    dets = np.array([[50.0, 50.0, 20.0, 10.0, 0.9, 0.0, 0.0]])
    cm.process_batch(dets, gt, gt_cls)
    assert cm.matrix[0, 0] == 1
    # far-away det of class 1 -> FP(background col)
    cm2 = MET.ConfusionMatrix(nc=2, conf=0.25)
    far = np.array([[200.0, 200.0, 20.0, 10.0, 0.9, 1.0, 0.3]])
    cm2.process_batch(far, gt, gt_cls)
    assert cm2.matrix[1, 2] == 1  # pred cls 1 vs background
    assert cm2.matrix[2, 0] == 1  # gt cls 0 missed


def test_batch_probiou_np_matches_jnp():
    from xlstm_yolo_tpu.ops.boxes import batch_probiou
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = np.stack([rng.uniform(20, 80, 5), rng.uniform(20, 80, 5),
                  rng.uniform(5, 30, 5), rng.uniform(5, 30, 5),
                  rng.uniform(-1.5, 1.5, 5)], -1)
    b = np.stack([rng.uniform(20, 80, 4), rng.uniform(20, 80, 4),
                  rng.uniform(5, 30, 4), rng.uniform(5, 30, 4),
                  rng.uniform(-1.5, 1.5, 4)], -1)
    got = MET.batch_probiou_np(a, b)
    want = np.asarray(batch_probiou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def _fake_ap_inputs(n=60, nc=3, seed=0):
    rng = np.random.default_rng(seed)
    conf = rng.uniform(0.05, 0.99, n)
    pred_cls = rng.integers(0, nc, n).astype(float)
    tp = rng.random((n, 10)) < conf[:, None] * 0.8
    tp = np.sort(tp, axis=1)[:, ::-1]  # monotone over IoU thresholds
    target_cls = rng.integers(0, nc, 40).astype(float)
    return tp, conf, pred_cls, target_cls


def test_ap_per_class_returns_curves():
    tp, conf, pred_cls, target_cls = _fake_ap_inputs()
    r = MET.ap_per_class(tp, conf, pred_cls, target_cls)
    nc = len(r["unique_classes"])
    assert r["px"].shape == (1000,)
    for k in ("p_curve", "r_curve", "f1_curve", "prec_values"):
        assert r[k].shape == (nc, 1000), k
    # recall decreases with confidence threshold; precision envelope in [0,1]
    assert (r["prec_values"] >= 0).all() and (r["prec_values"] <= 1).all()
    assert r["r_curve"][:, 0].mean() >= r["r_curve"][:, -1].mean()


def test_plot_family_writes_files(tmp_path):
    from xlstm_yolo_tpu.utils import plotting as PLT

    tp, conf, pred_cls, target_cls = _fake_ap_inputs()
    r = MET.ap_per_class(tp, conf, pred_cls, target_cls)
    names = {0: "a", 1: "b", 2: "c"}
    f1 = PLT.plot_pr_curve(r["px"], r["prec_values"], r["ap50"], names=names,
                           fname=tmp_path / "PR_curve.png")
    f2 = PLT.plot_mc_curve(r["px"], r["f1_curve"], names=names, ylabel="F1",
                           fname=tmp_path / "F1_curve.png")
    assert f1.exists() and f1.stat().st_size > 1000
    assert f2.exists() and f2.stat().st_size > 1000
    cm = MET.ConfusionMatrix(nc=3)
    cm.process_batch(
        np.array([[10, 10, 30, 30, 0.9, 0.0]]),
        np.array([[11, 11, 29, 29.0]]), np.array([0.0]))
    out = cm.plot(tmp_path, names=names, normalize=True)
    assert out.exists()
    out2 = cm.plot(tmp_path, names=names, normalize=False)
    assert out2.exists() and out.name != out2.name
    # classify matrix plots without a background lane
    cmc = MET.ConfusionMatrix(nc=3, task="classify")
    cmc.process_cls_preds(np.array([[0], [1]]), np.array([0, 1]))
    assert cmc.plot(tmp_path, names=names).exists()


def test_validator_emits_plots(tmp_path):
    """plots=True produces the confusion matrix + curve pngs end to end."""
    from xlstm_yolo_tpu.engine.validator import Validator
    from xlstm_yolo_tpu.nn.tasks import TaskModel
    from xlstm_yolo_tpu.data.synthetic import make_synthetic_dataset

    data = make_synthetic_dataset(tmp_path, n_train=4, n_val=4, imgsz=64)
    m = TaskModel("yolov8n.yaml", nc=3)
    v = m.init(0)
    val = Validator(m, imgsz=64, batch=4, max_labels=32, plots=True,
                    save_dir=str(tmp_path / "plots"))
    out = val(v, data=data)
    assert "mAP50" in out
    pd = tmp_path / "plots"
    assert (pd / "confusion_matrix_normalized.png").exists()
    assert (pd / "confusion_matrix.png").exists()
