"""Unit tests for ops: box conversions, IoU family, anchors, DFL, NMS."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.ops import boxes as B
from xlstm_yolo_tpu.ops import anchors as A
from xlstm_yolo_tpu.ops.nms import non_max_suppression


pytestmark = pytest.mark.smoke


def test_xywh_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(1, 100, (32, 4)), jnp.float32)
    back = B.xyxy2xywh(B.xywh2xyxy(x))
    np.testing.assert_allclose(back, x, rtol=1e-5, atol=1e-5)


def test_xywh2xyxy_known():
    x = jnp.array([[10.0, 10.0, 4.0, 6.0]])
    np.testing.assert_allclose(B.xywh2xyxy(x), [[8.0, 7.0, 12.0, 13.0]])


def test_box_iou_known():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[5.0, 5, 15, 15], [0, 0, 10, 10], [20, 20, 30, 30]])
    iou = B.box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [25 / 175, 1.0, 0.0], atol=1e-6)


def test_ciou_bounds_and_identity():
    rng = np.random.default_rng(1)
    b1 = jnp.asarray(rng.uniform(0, 50, (64, 4)), jnp.float32)
    ciou_self = B.bbox_iou(b1, b1, xywh=True, CIoU=True)
    np.testing.assert_allclose(ciou_self, np.ones(64), atol=1e-4)
    b2 = jnp.asarray(rng.uniform(0, 50, (64, 4)), jnp.float32)
    ciou = B.bbox_iou(b1, b2, xywh=True, CIoU=True)
    assert np.all(np.asarray(ciou) <= 1.0 + 1e-6)
    assert np.all(np.asarray(ciou) >= -2.0)


def test_probiou_identity_and_disjoint():
    box = jnp.array([10.0, 10.0, 4.0, 8.0, 0.3])
    same = B.probiou(box, box)
    assert float(same) > 0.99
    far = B.probiou(box, jnp.array([200.0, 200.0, 4.0, 8.0, 0.3]))
    assert float(far) < 0.01


def test_probiou_rotation_invariance():
    # rotating both boxes by the same angle must not change probiou
    b1 = jnp.array([10.0, 10.0, 6.0, 2.0, 0.0])
    b2 = jnp.array([11.0, 10.5, 5.0, 3.0, 0.4])
    base = float(B.probiou(b1, b2))
    rot = 0.7
    r1 = b1.at[4].add(rot)
    r2 = b2.at[4].add(rot)
    # centers must rotate around a common origin too; use same center offset
    assert abs(float(B.probiou(r1, r2)) - base) < 0.05


def test_make_anchors():
    anc, strides = A.make_anchors([(4, 4), (2, 2)], [8, 16])
    assert anc.shape == (20, 2)
    assert strides.shape == (20, 1)
    np.testing.assert_allclose(anc[0], [0.5, 0.5])
    np.testing.assert_allclose(anc[1], [1.5, 0.5])  # x fastest
    np.testing.assert_allclose(strides[:16], 8.0)
    np.testing.assert_allclose(strides[16:], 16.0)


def test_dist2bbox_bbox2dist_roundtrip():
    anc, _ = A.make_anchors([(8, 8)], [8])
    rng = np.random.default_rng(2)
    dist = jnp.asarray(rng.uniform(0.1, 3.0, (1, 64, 4)), jnp.float32)
    boxes = A.dist2bbox(dist, anc, xywh=False)
    back = A.bbox2dist(anc, boxes, reg_max=16)
    np.testing.assert_allclose(back, dist, atol=1e-5)


def test_dfl_decode_range_and_peak():
    # a sharply peaked distribution must decode to the peak bin
    logits = np.full((2, 3, 64), -10.0, np.float32)
    logits = logits.reshape(2, 3, 4, 16)
    logits[..., 7] = 10.0
    out = A.dfl_decode(jnp.asarray(logits.reshape(2, 3, 64)), 16)
    np.testing.assert_allclose(out, 7.0, atol=1e-3)


def _np_greedy_nms(boxes, scores, iou_thres):
    """Independent numpy greedy NMS for cross-checking."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a1 + a2 - inter + 1e-7) > iou_thres:
                suppressed[j] = True
    return keep


def test_nms_exact_matches_numpy():
    rng = np.random.default_rng(3)
    n = 60
    centers = rng.uniform(20, 300, (n, 2))
    wh = rng.uniform(10, 60, (n, 2))
    boxes_xywh = np.concatenate([centers, wh], -1).astype(np.float32)
    scores = rng.uniform(0.3, 1.0, (n, 1)).astype(np.float32)
    pred = jnp.asarray(np.concatenate([boxes_xywh, scores], -1))[None]  # 1 class

    dets, valid = non_max_suppression(pred, conf_thres=0.1, iou_thres=0.5, max_det=n, pre_topk=n, exact=True)
    got = np.asarray(dets[0][np.asarray(valid[0])])

    boxes_xyxy = np.asarray(B.xywh2xyxy(jnp.asarray(boxes_xywh)))
    keep = _np_greedy_nms(boxes_xyxy, scores[:, 0], 0.5)
    want_scores = np.sort(scores[keep, 0])[::-1]
    np.testing.assert_allclose(np.sort(got[:, 4])[::-1], want_scores, atol=1e-6)


def test_nms_class_separation():
    # identical boxes in different classes must NOT suppress each other
    box = np.array([100.0, 100.0, 20.0, 20.0], np.float32)
    pred = np.zeros((1, 2, 4 + 2), np.float32)
    pred[0, 0, :4] = box
    pred[0, 1, :4] = box
    pred[0, 0, 4] = 0.9  # class 0
    pred[0, 1, 5] = 0.8  # class 1
    dets, valid = non_max_suppression(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.5, max_det=4, pre_topk=2)
    assert int(valid.sum()) == 2
    dets, valid = non_max_suppression(
        jnp.asarray(pred), conf_thres=0.25, iou_thres=0.5, max_det=4, pre_topk=2, class_agnostic=True
    )
    assert int(valid.sum()) == 1


def test_nms_fixed_shape_and_padding():
    pred = np.zeros((2, 16, 5), np.float32)
    pred[0, 0] = [50, 50, 10, 10, 0.9]
    dets, valid = non_max_suppression(jnp.asarray(pred), conf_thres=0.25, max_det=8, pre_topk=16)
    assert dets.shape == (2, 8, 6)
    assert valid.shape == (2, 8)
    assert int(valid[0].sum()) == 1 and int(valid[1].sum()) == 0
    # invalid slots are zeroed with cls -1
    assert float(jnp.abs(dets[1]).sum()) == pytest.approx(8.0)  # only the -1 cls markers


def test_rowwise_kth_value_matches_xla():
    """Pallas single-pass kth-largest (interpret mode) == k-1-pass XLA form,
    incl. lane padding (N not a multiple of 128) and duplicate values."""
    from xlstm_yolo_tpu.kernels.topk_pallas import rowwise_kth_value

    rng = np.random.default_rng(0)
    for R, N, k in ((7, 300, 10), (16, 131, 3), (4, 8400, 10)):
        x = rng.standard_normal((R, N)).astype(np.float32)
        x[0, :5] = x[0, 5]  # ties
        xj = jnp.asarray(x)
        got = np.asarray(rowwise_kth_value(xj, k, interpret=True))[:, 0]
        want = np.partition(x, N - k, axis=1)[:, N - k]
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
