"""Validator — mAP evaluation over a val split.

Re-design of reference ``engine/validator.py`` (BaseValidator :42) +
``models/yolo/detect/val.py``: device side runs the jitted forward + decode +
fixed-shape multi-label NMS (conf 0.001, like detect/val.py:93); host side
does the greedy IoU matching at 10 thresholds and COCO-style AP integration.
"""
from __future__ import annotations

import json
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
                 batch: int = 16, verbose: bool = False, callbacks=None,
                 half: bool = False, save_json: bool = False,
                 save_dir: str | None = None, exact_nms: bool = False,
                 pre_topk: int = 1024, plots: bool = False,
                 rect: bool = False):
        from ..utils.callbacks import default_callbacks

        self.callbacks = callbacks if callbacks is not None else default_callbacks()
        self.model = model
        # fp32 by default, matching the reference's half: False
        # (cfg/default.yaml:54); pass half=True for bf16 eval (decode/NMS and
        # metric math stay fp32 either way)
        self.half = half
        # COCO-format predictions dump (reference detect/val.py:281 pred_to_json)
        self.save_json = save_json
        self.save_dir = Path(save_dir) if save_dir else Path("runs/val")
        self.data = data
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.max_labels = max_labels
        self.batch = batch
        self.verbose = verbose
        # exact greedy suppression (the reference's torchvision.ops.nms
        # semantics, utils/ops.py:312) instead of the default matrix
        # Fast-NMS; pre_topk widens the fixed candidate pool
        self.exact_nms = exact_nms
        self.pre_topk = pre_topk
        # rect=True: aspect-ratio-bucketed static batch shapes (reference
        # detect/val.py rect=True, pad=0.5) — one jit compilation per
        # distinct bucket shape (~O(10)) instead of one square program
        self.rect = rect
        # plots=True saves confusion_matrix(.normalized).png + the PR/F1/P/R
        # curve family into save_dir (reference BaseValidator plots,
        # utils/metrics.py:394-503)
        self.plots = plots
        self.cm = None

    def _prep(self, variables, img):
        """In-graph bf16 cast of params + image when half (trace-time flag)."""
        if not self.half:
            return variables, img
        v = dict(variables)
        v["params"] = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            variables["params"])
        return v, img.astype(jnp.bfloat16)

    def __call__(self, variables: dict, data: str | dict | None = None) -> dict:
        from ..data.dataset import build_dataloader, check_det_dataset

        self.callbacks.run("on_val_start", self)
        data = data or self.data
        if isinstance(data, (str, Path)) and self.model.task != "classify":
            data = check_det_dataset(data)
        # rect buckets must quantize to the model's coarsest pyramid stride
        # (P6 configs have stride 64) or the FPN upsample+concat shapes
        # mismatch; reference sizes rect shapes by max(model.stride)
        # (/root/reference/engine/validator.py check_imgsz stride arg)
        stride = max(32, int(max(getattr(self.model, "strides", (32,)) or (32,))))
        loader, _ = build_dataloader(data, "val", batch=self.batch, imgsz=self.imgsz,
                                     augment=False, max_labels=self.max_labels,
                                     task=self.model.task, rect=self.rect,
                                     stride=stride)
        task = self.model.task
        if self.plots:
            self.cm = MET.ConfusionMatrix(
                int(self.model.nc), conf=self.conf,
                task="classify" if task == "classify" else "detect")
        if task == "classify":
            return self._call_classify(variables, loader)
        if task == "obb":
            return self._call_obb(variables, loader)
        if task == "segment":
            return self._call_segment(variables, loader)
        if task == "pose":
            return self._call_pose(variables, loader)
        model = self.model

        @jax.jit
        def predict(variables, img):
            variables, img = self._prep(variables, img)
            pred = model.predictions(variables, img)
            return non_max_suppression(
                pred, conf_thres=self.conf, iou_thres=self.iou,
                max_det=self.max_det, multi_label=True,
                exact=self.exact_nms, pre_topk=self.pre_topk,
            )

        stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        n_img = 0
        jdict = []
        files = list(getattr(loader.ds, "files", []))
        class_map = self._class_map(data)
        t0 = time.time()
        for batch in loader:
            self.callbacks.run("on_val_batch_start", self)
            dets, valid = predict(variables, jnp.asarray(batch["img"]))
            dets = np.asarray(dets)
            valid = np.asarray(valid)
            n_img += len(dets)
            for bi in range(len(dets)):
                d = dets[bi][valid[bi]]  # (n, 6) xyxy conf cls
                if self.save_json:
                    im_idx = int(batch["im_idx"][bi]) if "im_idx" in batch else (
                        n_img - len(dets) + bi)
                    ori = batch.get("ori_shape")
                    ori = tuple(ori[bi]) if ori is not None else None
                    in_shape = batch["img"].shape[1:3]
                    self._pred_to_json(jdict, d, files, im_idx, ori,
                                       (in_shape[0], in_shape[1]), class_map,
                                       load_sz=self.imgsz)
                gt_mask = batch["mask"][bi]
                gt = batch["cls_boxes"][bi][gt_mask]  # (m, 5) cls xyxy
                gt_cls = gt[:, 0]
                if self.cm is not None:
                    self.cm.process_batch(d if len(d) else None, gt[:, 1:5], gt_cls)
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
            self.callbacks.run("on_val_batch_end", self)

        dt = time.time() - t0
        json_path = None
        if self.save_json:
            self.save_dir.mkdir(parents=True, exist_ok=True)
            json_path = self.save_dir / "predictions.json"
            with open(json_path, "w") as f:
                json.dump(jdict, f)
        if not stats["tp"]:
            self._plot_metrics()
            self.callbacks.run("on_val_end", self)
            out = {"mAP50": 0.0, "mAP50-95": 0.0, "precision": 0.0, "recall": 0.0,
                   "fitness": 0.0, "images": n_img, "img_s": round(n_img / dt, 1)}
            if json_path is not None:
                out["save_json_path"] = str(json_path)
            return out
        tp = np.concatenate(stats["tp"])
        conf = np.concatenate(stats["conf"])
        pred_cls = np.concatenate(stats["pred_cls"])
        target_cls = np.concatenate(stats["target_cls"]) if stats["target_cls"] else np.zeros(0)
        r = MET.ap_per_class(tp, conf, pred_cls, target_cls)
        self._plot_metrics(r)
        out = {
            "precision": r["mp"], "recall": r["mr"],
            "mAP50": r["map50"], "mAP50-95": r["map"],
            "fitness": MET.fitness(r["map50"], r["map"]),
            "images": n_img, "img_s": round(n_img / dt, 1),
        }
        if json_path is not None:
            out["save_json_path"] = str(json_path)
        if self.verbose:
            names = self.model.names
            for ci, c in enumerate(r["unique_classes"]):
                print(f"  {names.get(int(c), c):>12}: n={r['nt'][ci]} "
                      f"P={r['p'][ci]:.3f} R={r['r'][ci]:.3f} AP50={r['ap50'][ci]:.3f} "
                      f"AP={r['ap'][ci].mean():.3f}")
        self.callbacks.run("on_val_end", self)
        return out

    def _plot_metrics(self, r=None):
        """Emit the reference's val plot family into save_dir: confusion
        matrices (raw + normalized; utils/metrics.py:394) and the PR/F1/P/R
        confidence curves (utils/metrics.py:456-503). One-shot per run."""
        if not self.plots:
            return
        from ..utils import plotting as PLT

        self.save_dir.mkdir(parents=True, exist_ok=True)
        names = dict(getattr(self.model, "names", {}) or {})
        if self.cm is not None:
            self.cm.plot(self.save_dir, names=names, normalize=False)
            self.cm.plot(self.save_dir, names=names, normalize=True)
        if r is not None and len(r.get("px", ())):
            cnames = {i: names.get(int(c), str(int(c)))
                      for i, c in enumerate(r["unique_classes"])}
            PLT.plot_pr_curve(r["px"], r["prec_values"], r["ap50"],
                              names=cnames, fname=self.save_dir / "PR_curve.png")
            for key, ylabel, fn in (("f1_curve", "F1", "F1_curve.png"),
                                    ("p_curve", "Precision", "P_curve.png"),
                                    ("r_curve", "Recall", "R_curve.png")):
                PLT.plot_mc_curve(r["px"], r[key], names=cnames, ylabel=ylabel,
                                  fname=self.save_dir / fn)
        self.plots = False  # one-shot (segment/pose call _finalize twice)

    def _class_map(self, data):
        """0..nc-1 -> COCO-format category ids: the coco80->coco91 paper map
        when validating full COCO, else 1-based ids (reference
        detect/val.py:71-77)."""
        from ..data.converter import coco80_to_coco91_class

        val = str(data.get("val", "")) if isinstance(data, dict) else ""
        is_coco = "coco" in val and (
            val.endswith("val2017.txt") or val.endswith("test-dev2017.txt"))
        nc = int(getattr(self.model, "nc", 80) or 80)
        return coco80_to_coco91_class() if is_coco else list(range(1, nc + 1))

    @staticmethod
    def _pred_to_json(jdict, dets, files, img_idx, ori_shape, imgsz, class_map,
                      load_sz: float | None = None):
        """COCO-format detection records (reference detect/val.py:281
        pred_to_json): boxes un-letterboxed back to original image pixels
        (reference ops.scale_boxes in _prepare_pred), image_id = numeric stem
        when possible, category ids through ``class_map``."""
        stem = Path(files[img_idx]).stem if img_idx < len(files) else str(img_idx)
        image_id = int(stem) if stem.isnumeric() else stem
        d = np.asarray(dets, dtype=float)
        if len(d) and ori_shape is not None:
            h0, w0 = float(ori_shape[0]), float(ori_shape[1])
            # imgsz: square size or the rect batch's (in_h, in_w). The gain
            # is clamped by the long-side load resize (load_image r =
            # load_sz/max), matching letterbox scaleup=False on rect buckets
            # whose long side exceeds the load size (672 vs 640 at pad 0.5).
            in_h, in_w = ((imgsz, imgsz) if np.isscalar(imgsz) else
                          (float(imgsz[0]), float(imgsz[1])))
            r1 = (load_sz or max(in_h, in_w)) / max(h0, w0)
            gain = min(r1, in_h / h0, in_w / w0)
            padx, pady = (in_w - w0 * gain) / 2, (in_h - h0 * gain) / 2
            d = d.copy()
            d[:, [0, 2]] = np.clip((d[:, [0, 2]] - padx) / gain, 0, w0)
            d[:, [1, 3]] = np.clip((d[:, [1, 3]] - pady) / gain, 0, h0)
        for x1, y1, x2, y2, conf, cls in d:
            ci = int(cls)
            jdict.append({
                "image_id": image_id,
                "category_id": class_map[ci] if ci < len(class_map) else ci,
                "bbox": [round(x1, 3), round(y1, 3),
                         round(x2 - x1, 3), round(y2 - y1, 3)],
                "score": round(float(conf), 5),
            })

    # ------------------------------------------------------------------
    # task-specific eval paths (reference models/yolo/{classify,obb,segment,
    # pose}/val.py)
    # ------------------------------------------------------------------
    def _finalize(self, stats, n_img, dt, extra=None):
        if not stats["tp"]:
            self._plot_metrics()
            out = {"mAP50": 0.0, "mAP50-95": 0.0, "precision": 0.0, "recall": 0.0,
                   "fitness": 0.0, "images": n_img, "img_s": round(n_img / dt, 1)}
            out.update(extra or {})
            self.callbacks.run("on_val_end", self)
            return out
        tp = np.concatenate(stats["tp"])
        conf = np.concatenate(stats["conf"])
        pred_cls = np.concatenate(stats["pred_cls"])
        target_cls = np.concatenate(stats["target_cls"]) if stats["target_cls"] else np.zeros(0)
        r = MET.ap_per_class(tp, conf, pred_cls, target_cls)
        self._plot_metrics(r)
        out = {"precision": r["mp"], "recall": r["mr"], "mAP50": r["map50"],
               "mAP50-95": r["map"], "fitness": MET.fitness(r["map50"], r["map"]),
               "images": n_img, "img_s": round(n_img / dt, 1)}
        out.update(extra or {})
        self.callbacks.run("on_val_end", self)
        return out

    def _call_classify(self, variables, loader):
        import time as _t

        model = self.model
        predict = jax.jit(
            lambda v, img: model.predictions_full(*self._prep(v, img))["probs"])
        correct1 = correct5 = total = 0
        t0 = _t.time()
        for batch in loader:
            probs = np.asarray(predict(variables, jnp.asarray(batch["img"])))
            labels = np.asarray(batch["label"]) if "label" in batch else np.asarray(
                batch["cls_boxes"][:, 0, 0], np.int64)
            top5 = np.argsort(-probs, axis=-1)[:, :5]
            if self.cm is not None:
                self.cm.process_cls_preds(top5, labels)
            correct1 += int((top5[:, 0] == labels).sum())
            correct5 += int((top5 == labels[:, None]).any(-1).sum())
            total += len(labels)
        dt = _t.time() - t0
        self._plot_metrics()
        top1 = correct1 / max(total, 1)
        top5a = correct5 / max(total, 1)
        return {"accuracy_top1": top1, "accuracy_top5": top5a, "fitness": top1,
                "images": total, "img_s": round(total / dt, 1)}

    def _call_obb(self, variables, loader):
        import time as _t

        from ..ops.boxes import batch_probiou
        from ..ops.nms import nms_rotated

        model = self.model

        @jax.jit
        def predict(variables, img):
            variables, img = self._prep(variables, img)
            cands = model.predictions_full(variables, img)["cands"]
            return nms_rotated(cands, conf_thres=self.conf, iou_thres=self.iou,
                               max_det=self.max_det)

        stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        n_img = 0
        t0 = _t.time()
        for batch in loader:
            dets, valid = predict(variables, jnp.asarray(batch["img"]))
            dets = np.asarray(dets)
            valid = np.asarray(valid)
            n_img += len(dets)
            for bi in range(len(dets)):
                d = dets[bi][valid[bi]]  # (n, 7) cx cy w h angle conf cls
                gt_mask = batch["mask"][bi]
                gt = batch["cls_boxes"][bi][gt_mask]  # (m, 6) cls + rbox
                gt_cls = gt[:, 0]
                if self.cm is not None:
                    dcm = d[:, [0, 1, 2, 3, 5, 6, 4]] if len(d) else None
                    self.cm.process_batch(dcm, gt[:, 1:6], gt_cls)
                if len(d) == 0:
                    if len(gt):
                        stats["target_cls"].append(gt_cls)
                    continue
                if len(gt):
                    iou = np.asarray(batch_probiou(jnp.asarray(gt[:, 1:6]), jnp.asarray(d[:, :5])))
                else:
                    iou = np.zeros((0, len(d)))
                tp = MET.match_predictions(d[:, 6], gt_cls, iou)
                stats["tp"].append(tp)
                stats["conf"].append(d[:, 5])
                stats["pred_cls"].append(d[:, 6])
                stats["target_cls"].append(gt_cls)
        return self._finalize(stats, n_img, _t.time() - t0)

    def _call_segment(self, variables, loader):
        import time as _t

        model = self.model

        @jax.jit
        def predict(variables, img):
            variables, img = self._prep(variables, img)
            full = model.predictions_full(variables, img)
            dets, valid, src = non_max_suppression(
                full["cands"], conf_thres=self.conf, iou_thres=self.iou,
                max_det=self.max_det, multi_label=True,
                exact=self.exact_nms, pre_topk=self.pre_topk, return_idx=True,
            )
            return dets, valid, src, full["coefs"], full["proto"]

        box_stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        mask_stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        n_img = 0
        t0 = _t.time()
        for batch in loader:
            dets, valid, src, coefs, proto = predict(variables, jnp.asarray(batch["img"]))
            dets, valid, src = np.asarray(dets), np.asarray(valid), np.asarray(src)
            coefs, proto = np.asarray(coefs), np.asarray(proto)
            n_img += len(dets)
            hm, wm = proto.shape[1:3]
            sx = wm / batch["img"].shape[2]
            sy = hm / batch["img"].shape[1]
            for bi in range(len(dets)):
                keep = valid[bi]
                d = dets[bi][keep]
                gt_mask = batch["mask"][bi]
                gt = batch["cls_boxes"][bi][gt_mask]
                gt_cls = gt[:, 0]
                if self.cm is not None:
                    self.cm.process_batch(d if len(d) else None, gt[:, 1:5], gt_cls)
                if len(d) == 0:
                    if len(gt):
                        box_stats["target_cls"].append(gt_cls)
                        mask_stats["target_cls"].append(gt_cls)
                    continue
                iou = MET.box_iou_np(gt[:, 1:5], d[:, :4]) if len(gt) else np.zeros((0, len(d)))
                tp = MET.match_predictions(d[:, 5], gt_cls, iou)
                box_stats["tp"].append(tp)
                box_stats["conf"].append(d[:, 4])
                box_stats["pred_cls"].append(d[:, 5])
                box_stats["target_cls"].append(gt_cls)

                # mask mAP: PREDICTED masks (coef @ proto, box-cropped,
                # logit > 0 — reference ops.process_mask, utils/ops.py:679)
                # vs GT instance masks, flattened mask_iou
                # (SegmentationValidator._process_batch, segment/val.py:164)
                if len(gt):
                    pm = np.einsum(  # (n, hm, wm) logits
                        "nc,hwc->nhw", coefs[bi, src[bi][keep]], proto[bi])
                    db = d[:, :4] * [sx, sy, sx, sy]  # det boxes at mask res
                    ys = np.arange(hm)[None, :, None]
                    xs = np.arange(wm)[None, None, :]
                    inbox = ((xs >= db[:, 0, None, None]) & (xs < db[:, 2, None, None])
                             & (ys >= db[:, 1, None, None]) & (ys < db[:, 3, None, None]))
                    pmask = (pm > 0.0) & inbox  # (n, hm, wm) bool
                    gtm = np.asarray(batch["masks"][bi])  # (Hm, Wm) overlap ids
                    if gtm.shape != (hm, wm):
                        import cv2 as _cv2

                        gtm = _cv2.resize(gtm.astype(np.float32), (wm, hm),
                                          interpolation=_cv2.INTER_NEAREST).astype(np.int32)
                    gmask = gtm[None] == (np.arange(len(gt)) + 1)[:, None, None]
                    gflat = gmask.reshape(len(gt), -1).astype(np.float32)
                    pflat = pmask.reshape(len(d), -1).astype(np.float32)
                    inter = gflat @ pflat.T
                    union = gflat.sum(1)[:, None] + pflat.sum(1)[None] - inter
                    miou = inter / np.maximum(union, 1e-7)
                    mtp = MET.match_predictions(d[:, 5], gt_cls, miou)
                    mask_stats["tp"].append(mtp)
                    mask_stats["conf"].append(d[:, 4])
                    mask_stats["pred_cls"].append(d[:, 5])
                    mask_stats["target_cls"].append(gt_cls)
        dt = _t.time() - t0
        out = self._finalize(box_stats, n_img, dt)
        m = self._finalize(mask_stats, n_img, dt)
        out.update({"mAP50(M)": m["mAP50"], "mAP50-95(M)": m["mAP50-95"]})
        out["fitness"] = 0.5 * out["fitness"] + 0.5 * m["fitness"]
        return out

    def _call_pose(self, variables, loader):
        import time as _t

        from ..utils.loss import OKS_SIGMA

        model = self.model
        kpt_shape = model._head_attr("kpt_shape", (17, 3))
        nk = int(kpt_shape[0])
        sigmas = np.asarray(OKS_SIGMA if nk == 17 else np.ones(nk) / nk)

        @jax.jit
        def predict(variables, img):
            variables, img = self._prep(variables, img)
            full = model.predictions_full(variables, img)
            # NMS on boxes; keypoints re-associate exactly via source indices
            dets, valid, src = non_max_suppression(
                full["cands"], conf_thres=self.conf, iou_thres=self.iou,
                max_det=self.max_det, multi_label=True,
                exact=self.exact_nms, pre_topk=self.pre_topk, return_idx=True,
            )
            return dets, valid, src, full["kpts"]

        box_stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        pose_stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        n_img = 0
        t0 = _t.time()
        for batch in loader:
            dets, valid, src, kpts_all = predict(variables, jnp.asarray(batch["img"]))
            dets, valid, src = np.asarray(dets), np.asarray(valid), np.asarray(src)
            kpts_all = np.asarray(kpts_all)
            n_img += len(dets)
            for bi in range(len(dets)):
                keep = valid[bi]
                d = dets[bi][keep]
                gt_mask = batch["mask"][bi]
                gt = batch["cls_boxes"][bi][gt_mask]
                gt_cls = gt[:, 0]
                if self.cm is not None:
                    self.cm.process_batch(d if len(d) else None, gt[:, 1:5], gt_cls)
                if len(d) == 0:
                    if len(gt):
                        box_stats["target_cls"].append(gt_cls)
                        pose_stats["target_cls"].append(gt_cls)
                    continue
                iou = MET.box_iou_np(gt[:, 1:5], d[:, :4]) if len(gt) else np.zeros((0, len(d)))
                tp = MET.match_predictions(d[:, 5], gt_cls, iou)
                box_stats["tp"].append(tp)
                box_stats["conf"].append(d[:, 4])
                box_stats["pred_cls"].append(d[:, 5])
                box_stats["target_cls"].append(gt_cls)
                if len(gt):
                    pk = kpts_all[bi, src[bi][keep]].reshape(len(d), nk, -1)
                    gk = np.asarray(batch["keypoints"][bi][gt_mask])  # (m, nk, 3)
                    # 0.53 area factor from cocoeval via the reference
                    # (pose/val.py:179)
                    area = (gt[:, 3] - gt[:, 1]) * (gt[:, 4] - gt[:, 2]) * 0.53
                    oks = _kpt_iou_np(gk, pk, sigmas, area)
                    ptp = MET.match_predictions(d[:, 5], gt_cls, oks)
                    pose_stats["tp"].append(ptp)
                    pose_stats["conf"].append(d[:, 4])
                    pose_stats["pred_cls"].append(d[:, 5])
                    pose_stats["target_cls"].append(gt_cls)
        dt = _t.time() - t0
        out = self._finalize(box_stats, n_img, dt)
        p = self._finalize(pose_stats, n_img, dt)
        out.update({"mAP50(P)": p["mAP50"], "mAP50-95(P)": p["mAP50-95"]})
        out["fitness"] = 0.5 * out["fitness"] + 0.5 * p["fitness"]
        return out


def _kpt_iou_np(gt_kpts, pred_kpts, sigmas, area, eps=1e-7):
    """OKS matrix (m_gt, n_pred), exactly the reference's kpt_iou
    (utils/metrics.py:156): e = d^2 / ((2 sigma)^2 * area * 2), visible-
    keypoint masked mean."""
    m, nk = gt_kpts.shape[0], gt_kpts.shape[1]
    n = pred_kpts.shape[0]
    out = np.zeros((m, n), np.float32)
    for gi in range(m):
        vis = gt_kpts[gi, :, 2] != 0 if gt_kpts.shape[-1] > 2 else np.ones(nk, bool)
        d2 = ((pred_kpts[:, :, 0] - gt_kpts[gi, :, 0]) ** 2
              + (pred_kpts[:, :, 1] - gt_kpts[gi, :, 1]) ** 2)  # (n, nk)
        e = d2 / ((2 * sigmas[None]) ** 2 * (area[gi] + eps) * 2)
        out[gi] = (np.exp(-e) * vis[None]).sum(-1) / (vis.sum() + eps)
    return out
