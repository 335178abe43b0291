"""Tracker wiring: attach tracks to predictor Results (reference
trackers/track.py — there via predictor callbacks; here a simple functional
wrapper the Model facade uses for .track())."""
from __future__ import annotations

from pathlib import Path

import numpy as np
import yaml

from .bot_sort import BOTSORT
from .byte_tracker import BYTETracker

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}

DEFAULT_CFG = {
    "bytetrack": dict(track_high_thresh=0.25, track_low_thresh=0.1, new_track_thresh=0.25,
                      track_buffer=30, match_thresh=0.8),
    "botsort": dict(track_high_thresh=0.25, track_low_thresh=0.1, new_track_thresh=0.25,
                    track_buffer=30, match_thresh=0.8, proximity_thresh=0.5,
                    appearance_thresh=0.25, with_reid=False, gmc_method="sparseOptFlow"),
}


def create_tracker(name_or_yaml: str = "bytetrack.yaml"):
    """Build a tracker from a name or tracker YAML (reference
    cfg/trackers/{botsort,bytetrack}.yaml)."""
    stem = Path(str(name_or_yaml)).stem
    cfg = {}
    if Path(str(name_or_yaml)).exists():
        cfg = yaml.safe_load(Path(name_or_yaml).read_text()) or {}
        stem = cfg.pop("tracker_type", stem)
    if stem not in TRACKER_MAP:
        raise ValueError(f"unknown tracker {stem!r}; choose from {list(TRACKER_MAP)}")
    params = {**DEFAULT_CFG[stem], **cfg}
    return TRACKER_MAP[stem](**params)


def track_results(tracker, results_iter):
    """Generator: run the tracker over a stream of Results, rewriting boxes
    with track ids (reference trackers/track.py:56 on_predict_postprocess_end).

    Output Results carry boxes of shape (n, 7) = x1, y1, x2, y2, id, conf, cls
    exposed via ``r.track_ids``.
    """
    for r in results_iter:
        dets = r.boxes.data if r.boxes is not None else np.zeros((0, 6), np.float32)
        tracks = tracker.update(dets, r.orig_img)
        if len(tracks):
            r.boxes.data = np.concatenate([tracks[:, :4], tracks[:, 5:6], tracks[:, 6:7]], 1)
            r.track_ids = tracks[:, 4].astype(int)
        else:
            r.track_ids = np.zeros((0,), int)
        yield r
