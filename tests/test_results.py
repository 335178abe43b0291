"""Results container/serializer tests (reference engine/results.py:187-1806:
Boxes/Masks/Keypoints/Probs/OBB accessors + summary/to_df/to_csv/to_xml/
to_json/to_sql/save_crop round-trips)."""
import json
import sqlite3

import numpy as np
import pytest

from xlstm_yolo_tpu.engine.results import (
    OBB, Boxes, Keypoints, Masks, Probs, Results, masks2segments,
)

IMG = np.zeros((100, 200, 3), np.uint8)
NAMES = {0: "a", 1: "b"}


pytestmark = pytest.mark.smoke


def _det_results():
    boxes = np.asarray([[10, 10, 50, 60, 0.9, 1], [100, 20, 150, 80, 0.7, 0]], np.float32)
    return Results(IMG, path="t.jpg", names=NAMES, boxes=boxes)


def test_masks_polygons():
    m = np.zeros((2, 50, 100), np.uint8)
    m[0, 10:20, 10:30] = 1  # rectangle in mask space (half-res of IMG)
    m[1, 30:40, 60:90] = 1
    masks = Masks(m, orig_shape=(100, 200))
    xy = masks.xy
    assert len(xy) == 2 and xy[0].shape[1] == 2
    # mask space is half the original -> contours scale x2
    assert xy[0][:, 0].min() >= 19 and xy[0][:, 0].max() <= 60
    assert xy[0][:, 1].min() >= 19 and xy[0][:, 1].max() <= 40
    xyn = masks.xyn
    assert np.all(xyn[0] >= 0) and np.all(xyn[0] <= 1)
    # empty mask -> empty polygon, no crash
    assert masks2segments(np.zeros((1, 8, 8), np.uint8))[0].shape == (0, 2)


def test_keypoints_accessors():
    k = np.asarray([[[10, 20, 0.9], [30, 40, 0.2]]], np.float32)  # 1 inst, 2 kpts
    kp = Keypoints(k, orig_shape=(100, 200))
    assert kp.has_visible
    # low-confidence point zeroed (reference Keypoints.__init__)
    np.testing.assert_allclose(kp.xy[0, 1], [0, 0])
    np.testing.assert_allclose(kp.xy[0, 0], [10, 20])
    np.testing.assert_allclose(kp.xyn[0, 0], [10 / 200, 20 / 100])
    np.testing.assert_allclose(kp.conf[0], [0.9, 0.2])
    kp2 = Keypoints(np.ones((1, 3, 2), np.float32), (100, 200))
    assert kp2.conf is None


def test_probs_top5():
    p = Probs(np.asarray([0.1, 0.5, 0.05, 0.2, 0.1, 0.05]))
    assert p.top1 == 1
    assert p.top5[0] == 1 and len(p.top5) == 5
    assert float(p.top1conf) == pytest.approx(0.5)
    r = Results(IMG, names={i: f"c{i}" for i in range(6)},
                probs=np.asarray([0.1, 0.5, 0.05, 0.2, 0.1, 0.05]))
    s = r.summary()
    assert s[0]["class"] == 1 and s[0]["name"] == "c1"
    assert "c1" in r.verbose()


def test_obb_corners_and_aabb():
    # axis-aligned rbox (angle 0): corners recover the rectangle
    data = np.asarray([[50, 30, 40, 20, 0.0, 0.8, 1]], np.float32)
    obb = OBB(data, orig_shape=(100, 200))
    pts = obb.xyxyxyxy[0]
    assert sorted(np.round(pts[:, 0]).tolist()) == [30, 30, 70, 70]
    assert sorted(np.round(pts[:, 1]).tolist()) == [20, 20, 40, 40]
    np.testing.assert_allclose(obb.xyxy[0], [30, 20, 70, 40], atol=1e-5)
    n = obb.xyxyxyxyn[0]
    assert np.all(n >= 0) and np.all(n <= 1)
    r = Results(IMG, names=NAMES, obb=data)
    s = r.summary()
    assert "x4" in s[0]["box"]  # 4-corner form
    r.save_txt("/tmp/obb.txt", save_conf=True)


def test_results_serializers(tmp_path):
    r = _det_results()
    # summary ordering: as given (conf order handled upstream by NMS)
    s = r.summary(normalize=True)
    assert s[0]["box"]["x1"] == pytest.approx(10 / 200)
    df = r.to_df()
    assert len(df) == 2 and "confidence" in df.columns
    csv = r.to_csv()
    assert "name" in csv.splitlines()[0]
    xml = r.to_xml()
    assert xml.startswith("<?xml")
    j = json.loads(r.to_json())
    assert j[0]["class"] == 1
    db = tmp_path / "r.db"
    r.to_sql(db_path=str(db))
    rows = sqlite3.connect(str(db)).execute("SELECT class_name FROM results").fetchall()
    assert len(rows) == 2


def test_results_save_crop(tmp_path):
    r = _det_results()
    r.save_crop(tmp_path, "img.jpg")
    crops = sorted(p.relative_to(tmp_path).as_posix() for p in tmp_path.rglob("*.jpg"))
    assert any(c.startswith("a/") for c in crops)
    assert any(c.startswith("b/") for c in crops)


def test_results_update_index_track():
    r = _det_results()
    # track-id column form (n, 7)
    r.update(boxes=np.asarray([[10, 10, 50, 60, 3, 0.9, 1]], np.float32))
    assert r.boxes.is_track and int(r.boxes.id[0]) == 3
    assert r.summary()[0]["track_id"] == 3
    r0 = r[0]
    assert len(r0) == 1


def test_results_seg_pose_summary():
    boxes = np.asarray([[10, 10, 50, 60, 0.9, 1]], np.float32)
    m = np.zeros((1, 100, 200), np.uint8)
    m[0, 15:55, 12:48] = 1
    k = np.asarray([[[12, 14, 0.9], [40, 50, 0.8]]], np.float32)
    r = Results(IMG, names=NAMES, boxes=boxes, masks=m, keypoints=k)
    s = r.summary()
    assert "segments" in s[0] and len(s[0]["segments"]["x"]) > 0
    assert "keypoints" in s[0] and s[0]["keypoints"]["x"][0] == 12.0
    r.save_txt("/tmp/seg.txt")
    txt = open("/tmp/seg.txt").read()
    assert txt.startswith("1 ")
    plotted = r.plot()
    assert plotted.shape == IMG.shape and plotted.sum() > 0
