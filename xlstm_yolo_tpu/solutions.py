"""Post-inference solution apps (reference ``solutions/``): region-aware
analytics built on the tracker output stream.

Each solution consumes Results (with ``track_ids`` from Model.track) and
maintains host-side state. Implemented: ObjectCounter, RegionCounter,
Heatmap, SpeedEstimator, QueueManager, TrackZone, DistanceCalculation,
Analytics (the workhorse set of the reference's 13; reference
solutions/solutions.py:12 BaseSolution).

Every ``process`` call also renders the reference's annotated output frame
(each reference solution draws via ``Annotator`` before returning, e.g.
solutions/object_counter.py ``display_counts``): the RGB frame is exposed
as ``solution.plot_im`` after the call, while the return value keeps the
analytic payload.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np


class BaseSolution:
    """Track extraction + region utilities (reference solutions/solutions.py:12)."""

    def __init__(self, region: list | None = None, classes: list | None = None,
                 names: dict | None = None, line_width: int | None = None):
        self.region = np.asarray(region, np.float32) if region is not None else None
        self.classes = set(classes) if classes else None
        self.names = names or {}
        self.line_width = line_width
        self.track_history: dict[int, list] = defaultdict(list)
        self.plot_im: np.ndarray | None = None  # annotated frame of the last process()

    def annotator(self, result):
        """Fresh Annotator over the frame (with names from the Results if
        the solution wasn't given any)."""
        from .utils.annotator import Annotator

        if not self.names and getattr(result, "names", None):
            self.names = result.names
        return Annotator(result.orig_img, line_width=self.line_width)

    def _label(self, cls: int, tid: int, conf: float | None = None) -> str:
        name = self.names.get(int(cls), str(int(cls)))
        s = f"id:{int(tid)} {name}" if tid >= 0 else name
        return f"{s} {conf:.2f}" if conf is not None else s

    def extract_tracks(self, result):
        """-> (boxes (n,4), ids (n,), clss (n,), confs (n,))."""
        if result.boxes is None or len(result.boxes) == 0:
            return (np.zeros((0, 4)), np.zeros(0, int), np.zeros(0, int), np.zeros(0))
        boxes = result.boxes.xyxy
        clss = result.boxes.cls.astype(int)
        confs = result.boxes.conf
        ids = getattr(result, "track_ids", None)
        if ids is None or len(ids) != len(boxes):
            ids = -np.ones(len(boxes), int)
        if self.classes is not None:
            keep = np.isin(clss, list(self.classes))
            boxes, ids, clss, confs = boxes[keep], ids[keep], clss[keep], confs[keep]
        for i, tid in enumerate(ids):
            if tid >= 0:
                cx = (boxes[i, 0] + boxes[i, 2]) / 2
                cy = (boxes[i, 1] + boxes[i, 3]) / 2
                self.track_history[int(tid)].append((float(cx), float(cy)))
                if len(self.track_history[int(tid)]) > 30:
                    self.track_history[int(tid)].pop(0)
        return boxes, ids, clss, confs

    def point_in_region(self, pt) -> bool:
        import cv2

        assert self.region is not None, "solution requires a region"
        return cv2.pointPolygonTest(self.region.astype(np.float32), (float(pt[0]), float(pt[1])), False) >= 0


class ObjectCounter(BaseSolution):
    """In/out counting across a line or polygon region (reference
    solutions/object_counter.py)."""

    def __init__(self, region, **kw):
        super().__init__(region=region, **kw)
        self.in_count = 0
        self.out_count = 0
        self.counted: dict[int, bool] = {}
        self.classwise: dict[int, dict] = defaultdict(lambda: {"in": 0, "out": 0})

    def process(self, result):
        boxes, ids, clss, confs = self.extract_tracks(result)
        for tid, cls in zip(ids, clss):
            if tid < 0 or len(self.track_history[int(tid)]) < 2:
                continue
            prev, cur = self.track_history[int(tid)][-2], self.track_history[int(tid)][-1]
            was_in, is_in = self.point_in_region(prev), self.point_in_region(cur)
            if was_in == is_in or self.counted.get(int(tid)) == is_in:
                continue
            if is_in:
                self.in_count += 1
                self.classwise[int(cls)]["in"] += 1
            else:
                self.out_count += 1
                self.classwise[int(cls)]["out"] += 1
            self.counted[int(tid)] = is_in
        from .utils.annotator import colors

        ann = self.annotator(result)
        ann.draw_region(self.region, color=(104, 0, 123), thickness=ann.lw * 2)
        for b, tid, cls, cf in zip(boxes, ids, clss, confs):
            ann.box_label(b, self._label(cls, tid, cf), color=colors(cls))
            if tid >= 0 and self.track_history[int(tid)]:
                ann.draw_centroid_and_tracks(self.track_history[int(tid)],
                                             color=colors(tid))
        ann.display_analytics({"IN": self.in_count, "OUT": self.out_count})
        self.plot_im = ann.result()
        return {"in": self.in_count, "out": self.out_count}


class RegionCounter(BaseSolution):
    """Live occupancy count per region (reference solutions/region_counter.py)."""

    def process(self, result) -> int:
        from .utils.annotator import colors

        boxes, ids, clss, confs = self.extract_tracks(result)
        n = 0
        ann = self.annotator(result)
        if self.region is not None:
            ann.draw_region(self.region, color=(255, 140, 60), thickness=ann.lw * 2)
        for b, tid, cls, cf in zip(boxes, ids, clss, confs):
            c = ((b[0] + b[2]) / 2, (b[1] + b[3]) / 2)
            inside = self.region is None or self.point_in_region(c)
            n += inside
            ann.box_label(b, self._label(cls, tid, cf),
                          color=colors(cls) if inside else (128, 128, 128))
        if self.region is not None:
            ann.queue_counts_display(f"count: {n}", points=self.region)
        else:
            ann.display_analytics({"count": n})
        self.plot_im = ann.result()
        return n


class QueueManager(RegionCounter):
    """Queue length tracking (reference solutions/queue_management.py)."""

    def __init__(self, region, **kw):
        super().__init__(region=region, **kw)
        self.max_queue = 0

    def process(self, result) -> int:
        n = super().process(result)
        self.max_queue = max(self.max_queue, n)
        return n


class Heatmap(BaseSolution):
    """Accumulated presence heatmap (reference solutions/heatmap.py)."""

    def __init__(self, shape: tuple, **kw):
        super().__init__(**kw)
        self.heat = np.zeros(shape, np.float32)

    def process(self, result):
        import cv2

        boxes, *_ = self.extract_tracks(result)
        for x1, y1, x2, y2 in boxes.astype(int):
            self.heat[max(y1, 0) : y2, max(x1, 0) : x2] += 1.0
        # annotated frame: normalized heat -> JET colormap alpha-blended
        # over the image (reference solutions/heatmap.py display)
        ann = self.annotator(result)
        if self.heat.max() > 0:
            norm = (self.heat / self.heat.max() * 255).astype(np.uint8)
            if norm.shape != ann.im.shape[:2]:
                norm = cv2.resize(norm, (ann.im.shape[1], ann.im.shape[0]))
            cmap = cv2.cvtColor(cv2.applyColorMap(norm, cv2.COLORMAP_JET),
                                cv2.COLOR_BGR2RGB)
            hot = norm > 8
            blend = ann.im.astype(np.float32)
            blend[hot] = 0.5 * blend[hot] + 0.5 * cmap[hot].astype(np.float32)
            ann.im = blend.astype(np.uint8)
        self.plot_im = ann.result()
        return self.heat


class SpeedEstimator(BaseSolution):
    """Pixel-velocity speed estimates per track (reference
    solutions/speed_estimation.py; px/frame * meters_per_pixel * fps)."""

    def __init__(self, fps: float = 30.0, meters_per_pixel: float = 0.05, **kw):
        super().__init__(**kw)
        self.fps = fps
        self.mpp = meters_per_pixel
        self.speeds: dict[int, float] = {}

    def process(self, result) -> dict:
        from .utils.annotator import colors

        boxes, ids, clss, _ = self.extract_tracks(result)
        for tid, hist in self.track_history.items():
            if len(hist) >= 2:
                d = np.hypot(hist[-1][0] - hist[-2][0], hist[-1][1] - hist[-2][1])
                self.speeds[tid] = float(d * self.mpp * self.fps * 3.6)  # km/h
        ann = self.annotator(result)
        for b, tid, cls in zip(boxes, ids, clss):
            v = self.speeds.get(int(tid))
            label = f"{v:.1f} km/h" if v is not None else self._label(cls, tid)
            ann.box_label(b, label, color=colors(tid if tid >= 0 else cls))
            if tid >= 0 and self.track_history[int(tid)]:
                ann.draw_centroid_and_tracks(self.track_history[int(tid)],
                                             color=colors(tid))
        self.plot_im = ann.result()
        return self.speeds


class TrackZone(BaseSolution):
    """Restrict tracking analytics to a zone (reference solutions/trackzone.py)."""

    def process(self, result):
        from .utils.annotator import colors

        boxes, ids, clss, confs = self.extract_tracks(result)
        keep = [i for i, b in enumerate(boxes)
                if self.point_in_region(((b[0] + b[2]) / 2, (b[1] + b[3]) / 2))]
        ann = self.annotator(result)
        ann.draw_region(self.region, color=(255, 255, 255), thickness=ann.lw * 2)
        for i in keep:
            ann.box_label(boxes[i], self._label(clss[i], ids[i], confs[i]),
                          color=colors(clss[i]))
        self.plot_im = ann.result()
        return boxes[keep], ids[keep], clss[keep], confs[keep]


class DistanceCalculation(BaseSolution):
    """Pairwise centroid distance between two selected tracks (reference
    solutions/distance_calculation.py)."""

    def process(self, result, id_a: int, id_b: int, meters_per_pixel: float = 0.05):
        self.extract_tracks(result)
        ha, hb = self.track_history.get(id_a), self.track_history.get(id_b)
        if not ha or not hb:
            self.plot_im = np.ascontiguousarray(result.orig_img).copy()
            return None
        d = np.hypot(ha[-1][0] - hb[-1][0], ha[-1][1] - hb[-1][1])
        dist_m = float(d * meters_per_pixel)
        ann = self.annotator(result)
        ann.plot_distance_and_line(dist_m, (ha[-1], hb[-1]))
        self.plot_im = ann.result()
        return dist_m


class Analytics(BaseSolution):
    """Per-frame class-count time series (reference solutions/analytics.py)."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.series: list[dict] = []

    def process(self, result) -> dict:
        _, _, clss, _ = self.extract_tracks(result)
        counts: dict[int, int] = defaultdict(int)
        for c in clss:
            counts[int(c)] += 1
        frame = dict(counts)
        self.series.append(frame)
        ann = self.annotator(result)
        ann.display_analytics({self.names.get(c, str(c)): n
                               for c, n in sorted(frame.items())} or {"total": 0})
        self.plot_im = ann.result()
        return frame

    def chart(self, kind: str = "line", figsize=(6.4, 3.6)) -> np.ndarray:
        """Render the accumulated series as an RGB chart image (reference
        solutions/analytics.py draws line/bar/pie/area via matplotlib)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        all_cls = sorted({c for fr in self.series for c in fr})
        fig, ax = plt.subplots(figsize=figsize, dpi=100)
        if kind == "pie":
            totals = [sum(fr.get(c, 0) for fr in self.series) for c in all_cls]
            if sum(totals):
                ax.pie(totals, labels=[self.names.get(c, str(c)) for c in all_cls],
                       autopct="%1.0f%%")
        else:
            xs = np.arange(len(self.series))
            for c in all_cls:
                ys = [fr.get(c, 0) for fr in self.series]
                if kind == "bar":
                    ax.bar(xs, ys, label=self.names.get(c, str(c)), alpha=0.6)
                elif kind == "area":
                    ax.fill_between(xs, ys, label=self.names.get(c, str(c)), alpha=0.5)
                else:
                    ax.plot(xs, ys, label=self.names.get(c, str(c)), marker="o")
            if all_cls:
                ax.legend()
            ax.set_xlabel("frame")
            ax.set_ylabel("count")
        fig.canvas.draw()
        img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        return img


class AIGym(BaseSolution):
    """Repetition counting from pose keypoints (reference solutions/ai_gym.py):
    angle at a joint triple crosses up/down thresholds -> one rep."""

    def __init__(self, kpts: tuple = (5, 7, 9), up_angle: float = 145.0,
                 down_angle: float = 90.0, **kw):
        super().__init__(**kw)
        self.kpts = kpts
        self.up_angle = up_angle
        self.down_angle = down_angle
        self.count: dict[int, int] = defaultdict(int)
        self.stage: dict[int, str] = {}

    @staticmethod
    def joint_angle(a, b, c) -> float:
        a, b, c = (np.asarray(p, np.float32) for p in (a, b, c))
        v1, v2 = a - b, c - b
        cos = np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2) + 1e-7)
        return float(np.degrees(np.arccos(np.clip(cos, -1, 1))))

    def process(self, result) -> dict:
        self.extract_tracks(result)
        if result.keypoints is None:
            self.plot_im = np.ascontiguousarray(result.orig_img).copy()
            return dict(self.count)
        ann = self.annotator(result)
        kdata = (np.asarray(result.keypoints)
                 if isinstance(result.keypoints, np.ndarray)
                 else np.asarray(result.keypoints.data))
        kdata = kdata.reshape(-1, kdata.shape[-2], kdata.shape[-1])
        ids = getattr(result, "track_ids", np.arange(len(kdata)))
        for ki, k in enumerate(kdata):
            tid = int(ids[ki]) if ki < len(ids) else ki
            i1, i2, i3 = self.kpts
            ang = self.joint_angle(k[i1, :2], k[i2, :2], k[i3, :2])
            if ang > self.up_angle:
                if self.stage.get(tid) == "down":
                    self.count[tid] += 1
                self.stage[tid] = "up"
            elif ang < self.down_angle:
                self.stage[tid] = "down"
            ann.kpts(np.asarray(k))
            ann.plot_angle_and_count_and_stage(
                ang, self.count[tid], self.stage.get(tid, "-"), k[i2, :2])
        self.plot_im = ann.result()
        return dict(self.count)


class ParkingManagement(BaseSolution):
    """Occupancy of predefined parking slots (reference
    solutions/parking_management.py): each slot is a polygon region."""

    def __init__(self, slots: list, **kw):
        super().__init__(**kw)
        self.slots = [np.asarray(s, np.float32) for s in slots]

    def process(self, result) -> dict:
        import cv2

        boxes, ids, clss, confs = self.extract_tracks(result)
        occupied = 0
        status = []
        for slot in self.slots:
            occ = False
            for b in boxes:
                c = (float((b[0] + b[2]) / 2), float((b[1] + b[3]) / 2))
                if cv2.pointPolygonTest(slot, c, False) >= 0:
                    occ = True
                    break
            status.append(occ)
            occupied += occ
        from .utils.annotator import colors

        ann = self.annotator(result)
        for slot, occ in zip(self.slots, status):
            ann.draw_region(slot, color=(220, 40, 40) if occ else (40, 200, 40),
                            thickness=max(ann.lw, 2))
        for b, tid, cls, cf in zip(boxes, ids, clss, confs):
            ann.box_label(b, self._label(cls, tid, cf), color=colors(cls))
        ann.display_analytics({"occupied": occupied,
                               "available": len(self.slots) - occupied})
        self.plot_im = ann.result()
        return {"occupied": occupied, "available": len(self.slots) - occupied, "slots": status}


class SecurityAlarm(BaseSolution):
    """Threshold-triggered alert on detections (reference
    solutions/security_alarm.py; the email hook becomes a callback)."""

    def __init__(self, records: int = 5, on_alarm=None, **kw):
        super().__init__(**kw)
        self.records = records
        self.on_alarm = on_alarm
        self.triggered = False

    def process(self, result) -> bool:
        from .utils.annotator import colors

        boxes, ids, clss, confs = self.extract_tracks(result)
        if len(boxes) >= self.records and not self.triggered:
            self.triggered = True
            if self.on_alarm:
                self.on_alarm(result)
        ann = self.annotator(result)
        for b, tid, cls, cf in zip(boxes, ids, clss, confs):
            ann.box_label(b, self._label(cls, tid, cf), color=colors(cls))
        if self.triggered:
            ann.text((10, 34), "ALARM", txt_color=(255, 255, 255), box_style=True,
                     bg_color=(200, 0, 0))
        self.plot_im = ann.result()
        return self.triggered


class Inference:
    """Browser GUI for live inference (reference
    solutions/streamlit_inference.py:14). Import-gated on streamlit: the
    class always constructs (so the component exists headless) and
    ``web_ui()`` raises a clear error if streamlit is absent.

    The per-frame work is identical to the reference loop: capture ->
    Model.track()/predict() -> Results.plot() -> display original+annotated.
    ``step(frame)`` exposes that unit directly so it is testable without a
    browser.
    """

    def __init__(self, model: str = "yolov8n.yaml", conf: float = 0.25, iou: float = 0.45,
                 enable_trk: bool = False, classes=None, **kwargs):
        from .engine.model import Model

        self.model = Model(model)
        self.conf = conf
        self.iou = iou
        self.enable_trk = enable_trk
        self.classes = classes
        self.st = None

    def step(self, frame):
        """One frame through predict-or-track + annotation; returns
        (results, annotated_frame)."""
        if self.enable_trk:
            results = self.model.track(frame, conf=self.conf, iou=self.iou,
                                       classes=self.classes, verbose=False)
        else:
            results = self.model.predict(frame, conf=self.conf, iou=self.iou,
                                         classes=self.classes, verbose=False)
        return results, results[0].plot()

    def web_ui(self, source: int | str = 0):
        """Streamlit page: sidebar config + start/stop + live dual-pane view."""
        try:
            import streamlit as st
        except ImportError as e:
            raise ImportError(
                "solutions.Inference.web_ui needs streamlit (`pip install streamlit`); "
                "the per-frame pipeline is available headless via .step(frame)"
            ) from e
        import cv2

        self.st = st
        st.title("xlstm_yolo_tpu inference")
        self.conf = st.sidebar.slider("Confidence", 0.0, 1.0, self.conf)
        self.iou = st.sidebar.slider("IoU", 0.0, 1.0, self.iou)
        self.enable_trk = st.sidebar.radio("Tracking", ("No", "Yes")) == "Yes"
        names = list(self.model.names.values())
        picked = st.sidebar.multiselect("Classes", names, default=names[:3])
        self.classes = [names.index(n) for n in picked] or None
        col1, col2 = st.columns(2)
        org_frame, ann_frame = col1.empty(), col2.empty()
        if st.sidebar.button("Start"):
            stop = st.button("Stop")
            cap = cv2.VideoCapture(source)
            while cap.isOpened():
                ok, frame = cap.read()
                if not ok or stop:
                    break
                _, annotated = self.step(frame)
                org_frame.image(frame, channels="BGR")
                ann_frame.image(annotated, channels="BGR")
            cap.release()
