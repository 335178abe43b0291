"""FastSAM + YOLOWorld blocks + trainer resume."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


pytestmark = pytest.mark.slow


def test_world_blocks():
    from xlstm_yolo_tpu.models_extra import C2fAttn, ContrastiveHead, WorldDetectHead

    x = jnp.ones((1, 8, 8, 32))
    txt = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 64)), jnp.float32)

    ch = ContrastiveHead()
    v = ch.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 64)), txt)
    logits = ch.apply(v, jnp.ones((1, 8, 8, 64)), txt)
    assert logits.shape == (1, 8, 8, 5)

    c2fa = C2fAttn(32, n=1, ec=32, nh=2)
    v = c2fa.init(jax.random.PRNGKey(0), x, txt)
    assert c2fa.apply(v, x, txt).shape == (1, 8, 8, 32)

    head = WorldDetectHead(embed_dim=64, ch=(32, 32))
    feats = [jnp.ones((1, 8, 8, 32)), jnp.ones((1, 4, 4, 32))]
    v = head.init(jax.random.PRNGKey(0), feats, txt)
    outs = head.apply(v, feats, txt)
    assert outs[0].shape == (1, 8, 8, 64 + 5)  # 4*reg_max + nt classes


def test_fastsam_prompts():
    from xlstm_yolo_tpu.models_extra import FastSAM

    dets = np.asarray([[10, 10, 50, 50, 0.9, 0], [100, 100, 150, 150, 0.8, 0]], np.float32)
    valid = np.asarray([True, True])
    masks = np.zeros((2, 32, 32), bool)
    masks[0, 2:12, 2:12] = True
    masks[1, 20:30, 20:30] = True

    keep = FastSAM.box_prompt(dets, valid, masks, [12, 12, 48, 48], iou_thres=0.5)
    assert keep == [0]
    keep = FastSAM.point_prompt(dets, valid, masks, [(25, 25)], img_shape=(128, 128))
    assert keep == [0]  # point (25,25) in 128px -> mask px (6,6) inside mask 0
    emb = np.asarray([[1.0, 0.0], [0.0, 1.0]])
    keep = FastSAM.text_prompt(emb, np.asarray([0.9, 0.1]), topk=1)
    assert keep == [0]


def test_trainer_resume(tmp_path):
    from xlstm_yolo_tpu.data.synthetic import make_synthetic_dataset
    from xlstm_yolo_tpu.engine.trainer import Trainer
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    data_yaml = make_synthetic_dataset(tmp_path / "d", n_train=4, n_val=2, imgsz=96)
    common = dict(data=data_yaml, imgsz=96, batch=4, val=False, max_labels=16,
                  optimizer="SGD", lr0=0.005, warmup_epochs=0.0, nbs=4, mosaic=0.0,
                  scale=0.0, translate=0.0, fliplr=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
                  project=str(tmp_path), name="r1")
    model = TaskModel("yolov8n.yaml", nc=3)
    tr = Trainer(model, overrides={**common, "epochs": 2})
    tr.train()
    assert (tr.save_dir / "last.ckpt" / "optimizer.msgpack").exists()

    model2 = TaskModel("yolov8n.yaml", nc=3)
    tr2 = Trainer(model2, overrides={**common, "epochs": 4,
                                     "resume": str(tr.save_dir / "last.ckpt")})
    tr2.train()
    assert tr2.start_epoch == 2
    import csv

    with open(tr2.csv) as f:
        rows = list(csv.DictReader(f))
    epochs_seen = [int(float(r["epoch"])) for r in rows]
    assert epochs_seen == [0, 1, 2, 3]  # 2 original + 2 resumed


def test_world_full_graph():
    """yolov8-world YAML end to end: graph-wired C2fAttn + WorldDetect with
    guide threading (reference nn/tasks.py:737 WorldModel)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from xlstm_yolo_tpu.nn.tasks import TaskModel

    m = TaskModel("yolov8n-world.yaml", nc=4)
    assert m.task == "world" and m.strides == (8, 16, 32)
    assert m.txt_feats.shape == (1, 4, 512)
    v = m.init(0, imgsz=64)
    x = jnp.zeros((2, 64, 64, 3))
    p = jax.jit(m.predictions)(v, x)
    assert p.shape == (2, 84, 8)  # 4+nc channels, 64/8^2+... anchors

    # open-vocab swap: 7 new classes without re-init (same params)
    m.set_classes(np.random.default_rng(0).normal(size=(7, 512)))
    assert m.nc == 7
    assert jax.jit(m.predictions)(v, x).shape == (2, 84, 11)

    # train loss runs and is finite
    gt = jnp.zeros((2, 2, 5)).at[:, :, 1:].set(
        jnp.asarray([[8.0, 8.0, 40.0, 40.0], [4.0, 4.0, 20.0, 20.0]]))
    (total, aux), _ = m.loss(v, {"img": x, "cls_boxes": gt, "mask": jnp.ones((2, 2))})
    assert np.isfinite(float(total))


def test_fastsam_exact_mask_association():
    """Two overlapping same-class instances must keep DISTINCT masks: the
    kept detections re-associate to coefficients by exact NMS source index
    (return_idx), not nearest-center (which swaps under overlap)."""
    from xlstm_yolo_tpu.models_extra import FastSAM
    from xlstm_yolo_tpu.ops.nms import non_max_suppression

    # two candidates, same class, overlapping boxes (IoU < nms iou so both
    # survive), centers 4px apart — a center-match heuristic is ambiguous
    nm, hm = 4, 16
    cands = np.zeros((1, 2, 4 + 1), np.float32)  # xywh + 1 class score
    cands[0, 0] = [30, 30, 40, 40, 0.9]
    cands[0, 1] = [34, 34, 12, 12, 0.8]  # nested small box, IoU ~0.09
    coefs = np.zeros((1, 2, nm), np.float32)
    coefs[0, 0, 0] = 8.0   # instance 0 -> proto plane 0
    coefs[0, 1, 1] = 8.0   # instance 1 -> proto plane 1
    proto = np.full((1, hm, hm, nm), -8.0, np.float32)
    proto[0, :8, :, 0] = 1.0   # plane 0: top half (after coef 8 -> sigmoid>0.5)
    proto[0, 8:, :, 1] = 1.0   # plane 1: bottom half
    dets, valid, src = non_max_suppression(
        jnp.asarray(cands), conf_thres=0.25, iou_thres=0.5, max_det=4,
        return_idx=True)
    dets, valid, src = np.asarray(dets), np.asarray(valid), np.asarray(src)
    assert valid[0].sum() == 2
    masks = FastSAM.masks_from_src(coefs, proto, valid, src)
    # the higher-score det came from candidate 0 (top-half mask); the other
    # from candidate 1 (bottom-half) — distinct, matching their sources
    order = np.argsort(-dets[0, :2, 4])
    m_hi, m_lo = masks[0, order[0]], masks[0, order[1]]
    assert m_hi[:8].all() and not m_hi[8:].any()
    assert m_lo[8:].all() and not m_lo[:8].any()
