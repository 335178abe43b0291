"""BoT-SORT tracker (reference trackers/bot_sort.py): ByteTrack + camera
motion compensation (sparse optical flow GMC) and optional ReID embeddings."""
from __future__ import annotations

import numpy as np

from .byte_tracker import BYTETracker, STrack, TrackState
from .kalman import KalmanFilterXYWH
from .matching import embedding_distance, iou_distance, linear_assignment


class GMC:
    """Global (camera) motion compensation via sparse optical flow
    (reference trackers/utils/gmc.py:11, method=sparseOptFlow)."""

    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(1, int(downscale))
        self.prev_gray = None
        self.prev_pts = None

    def apply(self, img: np.ndarray) -> np.ndarray:
        if self.method in ("none", None) or img is None:
            return np.eye(2, 3)
        import cv2

        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY) if img.ndim == 3 else img
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale))
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
                        H = m
                        if self.downscale > 1:
                            H[0, 2] *= self.downscale
                            H[1, 2] *= self.downscale
        self.prev_gray = gray
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
