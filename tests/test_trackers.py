"""Tracker tests: Kalman behavior, association logic, identity persistence."""
import numpy as np
import pytest

from xlstm_yolo_tpu.trackers import BOTSORT, BYTETracker, create_tracker


pytestmark = pytest.mark.smoke


def _det(x, y, w=20, h=20, conf=0.9, cls=0):
    return [x - w / 2, y - h / 2, x + w / 2, y + h / 2, conf, cls]


def test_bytetrack_identity_persistence():
    tr = BYTETracker()
    # two objects moving right at different speeds
    ids_per_frame = []
    for f in range(10):
        dets = np.asarray([_det(50 + 3 * f, 50), _det(150 + 5 * f, 120)], np.float32)
        out = tr.update(dets)
        ids_per_frame.append(sorted(out[:, 4].astype(int).tolist()))
    assert all(len(ids) == 2 for ids in ids_per_frame[1:])
    assert ids_per_frame[1] == ids_per_frame[-1], "track ids must persist"


def test_bytetrack_occlusion_rescue():
    """A track missing for a few frames (low conf) is rescued by the second
    association stage."""
    tr = BYTETracker(track_buffer=30)
    for f in range(5):
        tr.update(np.asarray([_det(50 + 3 * f, 50)], np.float32))
    stable_id = int(tr.tracked_stracks[0].track_id)
    # low-confidence detections for 3 frames
    for f in range(5, 8):
        out = tr.update(np.asarray([_det(50 + 3 * f, 50, conf=0.15)], np.float32))
    # back to high confidence: same identity
    out = tr.update(np.asarray([_det(50 + 3 * 8, 50)], np.float32))
    assert len(out) == 1
    assert int(out[0, 4]) == stable_id


def test_bytetrack_lost_and_new():
    tr = BYTETracker(track_buffer=2)
    tr.update(np.asarray([_det(50, 50)], np.float32))
    tr.update(np.asarray([_det(53, 50)], np.float32))
    old_id = int(tr.tracked_stracks[0].track_id)
    for _ in range(5):
        tr.update(np.zeros((0, 6), np.float32))
    # new tracks need a second hit before they are emitted (ByteTrack rule)
    tr.update(np.asarray([_det(300, 300)], np.float32))
    out = tr.update(np.asarray([_det(302, 300)], np.float32))
    # far-away object after the buffer expires gets a new id
    assert len(out) == 1 and int(out[0, 4]) != old_id


def test_botsort_runs_with_gmc():
    tr = BOTSORT(gmc_method="sparseOptFlow")
    rng = np.random.default_rng(0)
    img = (rng.integers(0, 255, (240, 320, 3))).astype(np.uint8)
    for f in range(5):
        shifted = np.roll(img, shift=2 * f, axis=1)
        out = tr.update(np.asarray([_det(100 + 2 * f, 100)], np.float32), shifted)
    assert len(out) == 1
    assert out.shape[1] == 7


def test_create_tracker_names():
    assert isinstance(create_tracker("bytetrack.yaml"), BYTETracker)
    assert isinstance(create_tracker("botsort"), BOTSORT)
    with pytest.raises(ValueError):
        create_tracker("nope")


def test_kalman_converges():
    from xlstm_yolo_tpu.trackers.kalman import KalmanFilterXYAH

    kf = KalmanFilterXYAH()
    mean, cov = kf.initiate(np.asarray([50.0, 50.0, 1.0, 20.0]))
    # constant-velocity object; filter should track with low residual
    for t in range(1, 20):
        mean, cov = kf.predict(mean, cov)
        mean, cov = kf.update(mean, cov, np.asarray([50.0 + 3 * t, 50.0, 1.0, 20.0]))
    assert abs(mean[0] - (50 + 3 * 19)) < 1.0
    assert abs(mean[4] - 3.0) < 0.5  # velocity estimate


@pytest.mark.smoke
def test_gmc_methods_recover_translation():
    """Golden-motion check: every GMC method must recover a pure camera
    translation from a textured frame pair (reference
    trackers/utils/gmc.py supports orb/sift/ecc/sparseOptFlow; the method
    param must actually switch algorithms)."""
    import cv2

    from xlstm_yolo_tpu.trackers.bot_sort import GMC

    rng = np.random.default_rng(0)
    canvas = (rng.integers(0, 255, (300, 400), np.uint8))
    canvas = cv2.GaussianBlur(canvas, (5, 5), 2)  # trackable blobs, not noise
    dx, dy = 6, -4
    f1 = canvas[50:250, 50:350]
    f2 = canvas[50 + dy: 250 + dy, 50 + dx: 350 + dx]

    for method in ("sparseOptFlow", "orb", "sift", "ecc"):
        gmc = GMC(method=method, downscale=1)
        first = gmc.apply(f1)
        np.testing.assert_allclose(first, np.eye(2, 3), atol=1e-6)
        H = gmc.apply(f2)
        # camera moved by (dx, dy): previous-frame content appears at -d
        assert abs(H[0, 2] + dx) < 1.5 and abs(H[1, 2] + dy) < 1.5, (method, H)
        np.testing.assert_allclose(H[:2, :2], np.eye(2), atol=0.05)

    # method switch is real: unknown methods rejected, none is identity
    with pytest.raises(ValueError):
        GMC(method="bogus")
    assert np.allclose(GMC(method="none").apply(f1), np.eye(2, 3))


@pytest.mark.smoke
def test_gmc_features_mask_detections():
    """Detection boxes are excluded from the camera-motion vote (reference
    gmc.py:196-199): a frame pair whose only in-box content moves must
    still report identity-ish motion."""
    from xlstm_yolo_tpu.trackers.bot_sort import GMC

    import cv2

    rng = np.random.default_rng(1)
    bg = cv2.GaussianBlur(rng.integers(0, 255, (200, 300), np.uint8), (5, 5), 2)
    f1, f2 = bg.copy(), bg.copy()
    f1[80:120, 100:140] = 255  # bright object...
    f2[80:120, 130:170] = 255  # ...moves right by 30px; background is static
    gmc = GMC(method="orb", downscale=1)
    gmc.apply(f1, detections=[np.asarray([95, 75, 175, 125], float)])
    H = gmc.apply(f2, detections=[np.asarray([95, 75, 175, 125], float)])
    assert abs(H[0, 2]) < 3 and abs(H[1, 2]) < 3, H
