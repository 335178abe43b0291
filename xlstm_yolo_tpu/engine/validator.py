"""Validator — mAP evaluation over a val split.

Re-design of reference ``engine/validator.py`` (BaseValidator :42) +
``models/yolo/detect/val.py``: device side runs the jitted forward + decode +
fixed-shape multi-label NMS (conf 0.001, like detect/val.py:93); host side
does the greedy IoU matching at 10 thresholds and COCO-style AP integration.
"""
from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import non_max_suppression
from ..utils import metrics as MET


class Validator:
    def __init__(self, model, data=None, imgsz: int = 640, conf: float = 0.001,
                 iou: float = 0.7, max_det: int = 300, max_labels: int = 128,
                 batch: int = 16, verbose: bool = False):
        self.model = model
        self.data = data
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.max_labels = max_labels
        self.batch = batch
        self.verbose = verbose

    def __call__(self, variables: dict, data: str | dict | None = None) -> dict:
        from ..data.dataset import build_dataloader, check_det_dataset

        data = data or self.data
        if isinstance(data, (str, Path)):
            data = check_det_dataset(data)
        loader, _ = build_dataloader(data, "val", batch=self.batch, imgsz=self.imgsz,
                                     augment=False, max_labels=self.max_labels)
        model = self.model

        @jax.jit
        def predict(variables, img):
            pred = model.predictions(variables, img)
            return non_max_suppression(
                pred, conf_thres=self.conf, iou_thres=self.iou,
                max_det=self.max_det, multi_label=True,
            )

        stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        n_img = 0
        t0 = time.time()
        for batch in loader:
            dets, valid = predict(variables, jnp.asarray(batch["img"]))
            dets = np.asarray(dets)
            valid = np.asarray(valid)
            n_img += len(dets)
            for bi in range(len(dets)):
                d = dets[bi][valid[bi]]  # (n, 6) xyxy conf cls
                gt_mask = batch["mask"][bi]
                gt = batch["cls_boxes"][bi][gt_mask]  # (m, 5) cls xyxy
                gt_cls = gt[:, 0]
                if len(d) == 0:
                    if len(gt):
                        stats["target_cls"].append(gt_cls)
                    continue
                iou = MET.box_iou_np(gt[:, 1:5], d[:, :4]) if len(gt) else np.zeros((0, len(d)))
                tp = MET.match_predictions(d[:, 5], gt_cls, iou)
                stats["tp"].append(tp)
                stats["conf"].append(d[:, 4])
                stats["pred_cls"].append(d[:, 5])
                stats["target_cls"].append(gt_cls)

        dt = time.time() - t0
        if not stats["tp"]:
            return {"mAP50": 0.0, "mAP50-95": 0.0, "precision": 0.0, "recall": 0.0,
                    "fitness": 0.0, "images": n_img, "img_s": round(n_img / dt, 1)}
        tp = np.concatenate(stats["tp"])
        conf = np.concatenate(stats["conf"])
        pred_cls = np.concatenate(stats["pred_cls"])
        target_cls = np.concatenate(stats["target_cls"]) if stats["target_cls"] else np.zeros(0)
        r = MET.ap_per_class(tp, conf, pred_cls, target_cls)
        out = {
            "precision": r["mp"], "recall": r["mr"],
            "mAP50": r["map50"], "mAP50-95": r["map"],
            "fitness": MET.fitness(r["map50"], r["map"]),
            "images": n_img, "img_s": round(n_img / dt, 1),
        }
        if self.verbose:
            names = self.model.names
            for ci, c in enumerate(r["unique_classes"]):
                print(f"  {names.get(int(c), c):>12}: n={r['nt'][ci]} "
                      f"P={r['p'][ci]:.3f} R={r['r'][ci]:.3f} AP50={r['ap50'][ci]:.3f} "
                      f"AP={r['ap'][ci].mean():.3f}")
        return out
