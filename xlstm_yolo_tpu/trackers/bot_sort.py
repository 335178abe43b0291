"""BoT-SORT tracker (reference trackers/bot_sort.py): ByteTrack + camera
motion compensation (sparse optical flow GMC) and optional ReID embeddings."""
from __future__ import annotations

import numpy as np

from .byte_tracker import BYTETracker, STrack, TrackState
from .kalman import KalmanFilterXYWH
from .matching import embedding_distance, iou_distance, linear_assignment


class GMC:
    """Global (camera) motion compensation (reference trackers/utils/gmc.py:11).

    Methods: ``sparseOptFlow`` (Shi-Tomasi corners + pyramidal LK),
    ``orb`` (FAST detect + ORB describe + Hamming BF match),
    ``sift`` (SIFT detect/describe + L2 BF match),
    ``ecc`` (Enhanced Correlation Coefficient euclidean warp),
    ``none``. Every method returns a 2x3 affine mapping PREVIOUS-frame
    coordinates into the current frame; the translation columns are scaled
    back up when frames are processed downscaled.
    """

    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        import cv2

        self.method = None if method in ("none", "None", None) else str(method)
        self.downscale = max(1, int(downscale))
        if self.method == "orb":
            self.detector = cv2.FastFeatureDetector_create(20)
            self.extractor = cv2.ORB_create()
            self.matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
        elif self.method == "sift":
            self.detector = self.extractor = cv2.SIFT_create(
                nOctaveLayers=3, contrastThreshold=0.02, edgeThreshold=20)
            self.matcher = cv2.BFMatcher(cv2.NORM_L2)
        elif self.method == "ecc":
            self.warp_mode = cv2.MOTION_EUCLIDEAN
            self.criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 5000, 1e-6)
        elif self.method not in ("sparseOptFlow", None):
            raise ValueError(f"unknown GMC method {method!r}")
        self.reset()

    def reset(self) -> None:
        self.prev_gray = None
        self.prev_kps = None
        self.prev_desc = None

    def _gray(self, img) -> np.ndarray:
        import cv2

        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY) if img.ndim == 3 else img
        if self.method == "ecc" and self.downscale > 1:
            gray = cv2.GaussianBlur(gray, (3, 3), 1.5)
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale,
                                     gray.shape[0] // self.downscale))
        return gray

    def _upscaled(self, H: np.ndarray) -> np.ndarray:
        if self.downscale > 1:
            H = H.copy()
            H[0, 2] *= self.downscale
            H[1, 2] *= self.downscale
        return H

    def apply(self, img: np.ndarray, detections=None) -> np.ndarray:
        if self.method is None or img is None:
            return np.eye(2, 3)
        if self.method in ("orb", "sift"):
            return self._apply_features(img, detections)
        if self.method == "ecc":
            return self._apply_ecc(img)
        return self._apply_sparse_flow(img)

    # -- sparse optical flow (reference gmc.py apply_sparseoptflow) ----------
    def _apply_sparse_flow(self, img) -> np.ndarray:
        import cv2

        gray = self._gray(img)
        H = np.eye(2, 3)
        if self.prev_gray is not None:
            pts = cv2.goodFeaturesToTrack(self.prev_gray, maxCorners=200, qualityLevel=0.01,
                                          minDistance=10)
            if pts is not None and len(pts) >= 4:
                nxt, status, _ = cv2.calcOpticalFlowPyrLK(self.prev_gray, gray, pts, None)
                good_prev = pts[status.ravel() == 1]
                good_next = nxt[status.ravel() == 1]
                if len(good_prev) >= 4:
                    m, _ = cv2.estimateAffinePartial2D(good_prev, good_next, method=cv2.RANSAC)
                    if m is not None:
                        H = self._upscaled(m)
        self.prev_gray = gray
        return H

    # -- ECC direct image alignment (reference gmc.py apply_ecc) -------------
    def _apply_ecc(self, img) -> np.ndarray:
        import cv2

        gray = self._gray(img)
        H = np.eye(2, 3, dtype=np.float32)
        if self.prev_gray is not None:
            try:
                _, H = cv2.findTransformECC(self.prev_gray, gray, H, self.warp_mode,
                                            self.criteria, None, 1)
                H = self._upscaled(H)
            except cv2.error:
                H = np.eye(2, 3, dtype=np.float32)  # non-convergence -> identity
        self.prev_gray = gray
        return H

    # -- keypoint methods (reference gmc.py apply_features) ------------------
    def _apply_features(self, img, detections=None) -> np.ndarray:
        import cv2

        gray = self._gray(img)
        h, w = gray.shape
        H = np.eye(2, 3)
        # border mask + detection exclusion: moving objects must not vote on
        # camera motion (reference gmc.py:193-199)
        mask = np.zeros_like(gray)
        mask[int(0.02 * h): int(0.98 * h), int(0.02 * w): int(0.98 * w)] = 255
        if detections is not None:
            for det in detections:
                x1, y1, x2, y2 = (np.asarray(det[:4]) / self.downscale).astype(int)
                mask[y1:y2, x1:x2] = 0
        kps = self.detector.detect(gray, mask)
        kps, desc = self.extractor.compute(gray, kps)

        if self.prev_desc is not None and desc is not None and len(desc) >= 2 \
                and len(self.prev_desc) >= 2:
            # Lowe ratio test + spatial gate (<= 25% of frame) + 2.5-sigma
            # displacement inlier filter, then partial-affine RANSAC
            knn = self.matcher.knnMatch(self.prev_desc, desc, 2)
            max_dxy = 0.25 * np.asarray([w, h])
            cand, disp = [], []
            for pair in knn:
                if len(pair) < 2:
                    continue
                m, n = pair
                if m.distance < 0.9 * n.distance:
                    d = (np.asarray(self.prev_kps[m.queryIdx].pt)
                         - np.asarray(kps[m.trainIdx].pt))
                    if (np.abs(d) < max_dxy).all():
                        cand.append(m)
                        disp.append(d)
            if cand:
                disp = np.asarray(disp)
                ok = (np.abs(disp - disp.mean(0)) < 2.5 * disp.std(0) + 1e-9).all(-1)
                prev_pts = np.asarray([self.prev_kps[m.queryIdx].pt
                                       for m, k in zip(cand, ok) if k])
                curr_pts = np.asarray([kps[m.trainIdx].pt
                                       for m, k in zip(cand, ok) if k])
                if len(prev_pts) > 4:
                    m, _ = cv2.estimateAffinePartial2D(prev_pts, curr_pts, cv2.RANSAC)
                    if m is not None:
                        H = self._upscaled(m)
        self.prev_gray = gray
        self.prev_kps = kps
        self.prev_desc = desc
        return H


class BOTrack(STrack):
    """STrack with XYWH Kalman + exponential-smoothed ReID feature
    (reference bot_sort.py:14)."""

    shared_kalman = KalmanFilterXYWH()

    def __init__(self, xywh, score, cls, feat=None, feat_history=50):
        super().__init__(xywh, score, cls)
        self.smooth_feat = None
        self.curr_feat = None
        if feat is not None:
            self.update_features(feat)
        self.alpha = 0.9

    def update_features(self, feat):
        feat = feat / np.clip(np.linalg.norm(feat), 1e-7, None)
        self.curr_feat = feat
        self.smooth_feat = feat if self.smooth_feat is None else (
            self.alpha * self.smooth_feat + (1 - self.alpha) * feat
        )
        self.smooth_feat /= np.clip(np.linalg.norm(self.smooth_feat), 1e-7, None)

    @staticmethod
    def tlwh_to_xyah(tlwh):
        # BoT-SORT stores xywh directly (KalmanFilterXYWH)
        ret = np.asarray(tlwh, np.float32).copy()
        ret[:2] += ret[2:] / 2
        return ret

    @property
    def tlwh(self):
        if self.mean is None:
            return self._tlwh.copy()
        ret = self.mean[:4].copy()
        ret[:2] -= ret[2:] / 2
        return ret


class BOTSORT(BYTETracker):
    """BoT-SORT association loop (reference bot_sort.py:147)."""

    def __init__(self, proximity_thresh=0.5, appearance_thresh=0.25, with_reid=False,
                 gmc_method="sparseOptFlow", **kwargs):
        super().__init__(**kwargs)
        self.proximity_thresh = proximity_thresh
        self.appearance_thresh = appearance_thresh
        self.with_reid = with_reid
        self.gmc = GMC(method=gmc_method)

    def get_kalmanfilter(self):
        return KalmanFilterXYWH()

    def init_track(self, xywhs, scores, clss, img=None):
        return [BOTrack(x, s, c) for x, s, c in zip(xywhs, scores, clss)]

    def multi_predict(self, tracks):
        for t in tracks:
            t.predict()

    def get_dists(self, tracks, detections):
        dists = iou_distance(tracks, detections)
        dists_mask = dists > (1 - self.proximity_thresh)
        if len(dists):
            det_scores = np.asarray([d.score for d in detections])
            dists = 1 - (1 - dists) * det_scores[None, :]
        if self.with_reid and len(tracks) and len(detections) and all(
            getattr(d, "curr_feat", None) is not None for d in detections
        ):
            emb = embedding_distance(tracks, detections) / 2.0
            emb[emb > self.appearance_thresh] = 1.0
            emb[dists_mask] = 1.0
            dists = np.minimum(dists, emb)
        return dists

    def update(self, dets, img=None):
        if img is not None:
            # camera-motion compensate existing track states
            H = self.gmc.apply(img)
            r = H[:2, :2]
            t = H[:2, 2]
            for track in self.tracked_stracks + self.lost_stracks:
                if track.mean is not None:
                    track.mean[:2] = r @ track.mean[:2] + t
        return super().update(dets, img)
