"""Predictor — source loading, jitted inference, Results assembly.

Re-design of reference ``engine/predictor.py`` (BasePredictor :66,
stream_inference :221): letterbox preprocess on host, ONE jitted
device program for forward + decode + fixed-shape NMS, host-side box
rescale to original image coords. The three Profile timers
(preprocess/inference/postprocess, predictor.py:245-249) are kept as
wall-clock sections with block_until_ready at the device boundary.
"""
from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import letterbox
from ..ops.nms import non_max_suppression
from .results import Results

IMG_FORMATS = {".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp"}
VID_FORMATS = {".avi", ".mp4", ".mkv", ".mov", ".webm", ".m4v", ".mpg", ".mpeg", ".wmv"}


def load_source(source, vid_stride: int = 1, stream_buffer: bool = False,
                **loader_kw):
    """Resolve a source into a LAZY iterable of (path, RGB ndarray) frames.

    Dispatch mirrors reference ``data/build.py:186`` (load_inference_source):
    in-memory arrays/PIL -> LoadPilAndNumpy; webcam index, stream URL or
    ``*.streams`` file -> threaded LoadStreams; ``"screen ..."`` ->
    LoadScreenshots; files/dirs/videos -> LoadImagesAndVideos (one frame
    decoded at a time — constant memory on arbitrarily long videos).
    """
    from ..data.loaders import (LoadImagesAndVideos, LoadPilAndNumpy,
                                LoadScreenshots, LoadStreams)

    if isinstance(source, np.ndarray) or hasattr(source, "convert"):
        return LoadPilAndNumpy(source)
    if isinstance(source, (list, tuple)):
        if all(isinstance(s, np.ndarray) or hasattr(s, "convert") for s in source):
            return LoadPilAndNumpy(list(source))

        def _chain(items):
            for s in items:
                yield from load_source(s, vid_stride=vid_stride,
                                       stream_buffer=stream_buffer, **loader_kw)
        return _chain(source)
    if isinstance(source, str) and source.split()[0] == "screen":
        return LoadScreenshots(source, **loader_kw)
    is_url = isinstance(source, str) and source.split("://")[0] in (
        "rtsp", "rtmp", "http", "https", "tcp")
    is_file_url = is_url and source.rsplit(".", 1)[-1].lower() in (
        "jpg", "png", "jpeg", "mp4", "avi", "mkv")
    if isinstance(source, int) or (is_url and not is_file_url) or (
            isinstance(source, (str, Path)) and str(source).endswith(".streams")):
        return LoadStreams(source, vid_stride=vid_stride, buffer=stream_buffer,
                           **loader_kw)
    p = Path(str(source))
    if p.is_dir():
        files = sorted(f for f in p.iterdir()
                       if f.suffix.lower() in IMG_FORMATS | VID_FORMATS)
        return LoadImagesAndVideos(files, vid_stride=vid_stride)
    if p.is_file() or p.suffix.lower() in VID_FORMATS:
        if not p.is_file():
            raise FileNotFoundError(f"source not found: {source}")
        return LoadImagesAndVideos([p], vid_stride=vid_stride)
    raise FileNotFoundError(f"source not found: {source}")


class Predictor:
    def __init__(self, model, variables, imgsz: int = 640, conf: float = 0.25,
                 iou: float = 0.7, max_det: int = 300, classes=None,
                 agnostic_nms: bool = False, verbose: bool = True, callbacks=None,
                 save: bool = False, save_txt: bool = False, save_conf: bool = False,
                 save_crop: bool = False, project: str | None = None,
                 name: str | None = None, exist_ok: bool = False, **kwargs):
        from ..utils.callbacks import default_callbacks

        self.callbacks = callbacks if callbacks is not None else default_callbacks()
        self.model = model
        self.variables = variables
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.classes = classes
        self.agnostic = agnostic_nms
        self.verbose = verbose
        # result writing (reference predictor.py:325 write_results + the
        # save/save_txt/save_crop flags of cfg/default.yaml)
        self.save = save
        self.save_txt = save_txt
        self.save_conf = save_conf
        self.save_crop = save_crop
        self.save_dir = None
        if save or save_txt or save_crop:
            from ..utils import increment_path

            self.save_dir = increment_path(
                Path(project or "runs/predict") / (name or "exp"),
                exist_ok=exist_ok, mkdir=True)
        self._writers = {}  # video path -> cv2.VideoWriter
        # fp32 by default, matching the reference's half: False
        # (cfg/default.yaml:54); pass dtype='bfloat16' (or half=True) for MXU
        # bf16 inference — decode/NMS stay fp32 inside predictions_full
        self.half = bool(kwargs.get("half", False)) or (
            str(kwargs.get("dtype", "float32")) == "bfloat16")
        self.vid_stride = int(kwargs.get("vid_stride", 1) or 1)
        self.stream_buffer = bool(kwargs.get("stream_buffer", False))
        self._jit = jax.jit(self._device_fn)

    def _device_fn(self, variables, img):
        task = self.model.task
        if self.half:
            img = img.astype(jnp.bfloat16)
            variables = dict(variables)
            variables["params"] = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
                variables["params"])
        if task == "classify":
            return self.model.predictions_full(variables, img)["probs"]
        if task == "rtdetr":
            return self.model.predictions_full(variables, img)["dets"]
        if task == "obb":
            from ..ops.nms import nms_rotated

            cands = self.model.predictions_full(variables, img)["cands"]
            return nms_rotated(cands, conf_thres=self.conf, iou_thres=self.iou,
                               max_det=self.max_det)
        full = self.model.predictions_full(variables, img)
        # pre_topk 512: with conf>=0.25 and max_det 300 a 512-candidate pool
        # is lossless in practice, and the (K, K) IoU matrix + top-k are the
        # NMS cost drivers on TPU (11.0 -> 7.5 ms at b128; eval/mAP keeps the
        # wider default pool + multi_label in validator.py)
        dets, valid = non_max_suppression(
            full["cands"], conf_thres=self.conf, iou_thres=self.iou, max_det=self.max_det,
            pre_topk=512, fast_sel=True, class_agnostic=self.agnostic,
        )
        if task == "segment":
            return dets, valid, full["cands"], full["coefs"], full["proto"]
        if task == "pose":
            return dets, valid, full["cands"], full["kpts"]
        return dets, valid

    def __call__(self, source, stream: bool = False):
        gen = self._run(source)
        return gen if stream else list(gen)

    def _run(self, source):
        task = self.model.task
        frames = load_source(source if source is not None else _default_asset(),
                             vid_stride=self.vid_stride,
                             stream_buffer=self.stream_buffer)
        self.callbacks.run("on_predict_start", self)
        for path, orig in frames:
            self.callbacks.run("on_predict_batch_start", self)
            t0 = time.perf_counter()
            img, _, (r, px, py) = letterbox(orig, self.imgsz)
            x = jnp.asarray(img, jnp.float32)[None] / 255.0
            t1 = time.perf_counter()
            out = self._jit(self.variables, x)
            jax.block_until_ready(out)
            t2 = time.perf_counter()
            kw = {}
            if task == "classify":
                probs = np.asarray(out[0])
                d = None
                kw["probs"] = probs
            elif task == "rtdetr":
                dets = np.asarray(out[0])
                d = dets[dets[:, 4] > self.conf]
            elif task == "obb":
                dets, valid = out
                d7 = np.asarray(dets[0])[np.asarray(valid[0])]
                # map rotated dets to axis-aligned xyxy for the Results box API;
                # raw rboxes attached as .obb
                if len(d7):
                    d7c = d7.copy()
                    d7c[:, 0] = (d7[:, 0] - px) / r
                    d7c[:, 1] = (d7[:, 1] - py) / r
                    d7c[:, 2:4] = d7[:, 2:4] / r
                    kw_obb = d7c
                    x1 = d7c[:, 0] - d7c[:, 2] / 2
                    y1 = d7c[:, 1] - d7c[:, 3] / 2
                    x2 = d7c[:, 0] + d7c[:, 2] / 2
                    y2 = d7c[:, 1] + d7c[:, 3] / 2
                    d = np.stack([x1, y1, x2, y2, d7c[:, 5], d7c[:, 6]], 1)
                else:
                    kw_obb = np.zeros((0, 7), np.float32)
                    d = np.zeros((0, 6), np.float32)
                kw["obb"] = kw_obb
            else:
                dets, valid = out[0], out[1]
                d = np.asarray(dets[0])[np.asarray(valid[0])]
                if task == "segment" and len(d):
                    cands, coefs, proto = (np.asarray(o) for o in out[2:])
                    kw["masks"] = self._assemble_masks(d, cands[0], coefs[0], proto[0],
                                                       orig.shape[:2], r, px, py)
                elif task == "pose" and len(d):
                    cands, kpts = np.asarray(out[2]), np.asarray(out[3])
                    kw["keypoints"] = self._gather_kpts(d, cands[0], kpts[0], r, px, py)
                if self.classes is not None and len(d):
                    d = d[np.isin(d[:, 5].astype(int), list(self.classes))]
                if len(d):
                    d[:, [0, 2]] = np.clip((d[:, [0, 2]] - px) / r, 0, orig.shape[1])
                    d[:, [1, 3]] = np.clip((d[:, [1, 3]] - py) / r, 0, orig.shape[0])
            t3 = time.perf_counter()
            res = Results(
                orig, path=path, names=self.model.names, boxes=d,
                speed={"preprocess": (t1 - t0) * 1e3, "inference": (t2 - t1) * 1e3,
                       "postprocess": (t3 - t2) * 1e3}, **kw,
            )
            self.results = [res]
            self.callbacks.run("on_predict_postprocess_end", self)
            if self.save_dir is not None:
                self._write_results(path, res)
            if self.verbose:
                print(f"{path}: {res.verbose()} "
                      f"({res.speed['inference']:.1f}ms inference)")
            self.callbacks.run("on_predict_batch_end", self)
            yield res
        for w in self._writers.values():
            w.release()
        self._writers.clear()
        self.callbacks.run("on_predict_end", self)

    def _write_results(self, path: str, res):
        """Persist annotated media / labels / crops under save_dir
        (reference engine/predictor.py:325-409 write_results)."""
        import cv2

        base, _, frame = str(path).partition("#")
        stem = Path(base).stem if Path(base).suffix else f"image_{abs(hash(path)) % 10**8}"
        is_video = frame != "" and Path(base).suffix.lower() in VID_FORMATS
        if self.save:
            annotated = cv2.cvtColor(res.plot(), cv2.COLOR_RGB2BGR)
            if is_video:
                w = self._writers.get(base)
                if w is None:
                    h_, w_ = annotated.shape[:2]
                    out = self.save_dir / f"{stem}.mp4"
                    w = cv2.VideoWriter(str(out), cv2.VideoWriter_fourcc(*"mp4v"),
                                        30, (w_, h_))
                    self._writers[base] = w
                w.write(annotated)
            else:
                cv2.imwrite(str(self.save_dir / f"{stem}.jpg"), annotated)
        if self.save_txt:
            sfx = f"_{frame}" if is_video else ""
            (self.save_dir / "labels").mkdir(exist_ok=True)
            res.save_txt(self.save_dir / "labels" / f"{stem}{sfx}.txt",
                         save_conf=self.save_conf)
        if self.save_crop and res.boxes is not None and len(res.boxes):
            for bi in range(len(res.boxes)):
                xyxy = np.asarray(res.boxes.xyxy[bi]).astype(int)
                c = int(np.asarray(res.boxes.cls[bi]))
                cname = res.names.get(c, str(c)) if isinstance(res.names, dict) else str(c)
                crop = res.orig_img[max(0, xyxy[1]):xyxy[3], max(0, xyxy[0]):xyxy[2]]
                if crop.size:
                    d = self.save_dir / "crops" / str(cname)
                    d.mkdir(parents=True, exist_ok=True)
                    cv2.imwrite(str(d / f"{stem}_{bi}.jpg"),
                                cv2.cvtColor(crop, cv2.COLOR_RGB2BGR))

    @staticmethod
    def _match_candidates(d, cands):
        """Re-associate NMS-kept boxes to candidate indices by center distance."""
        cxy = cands[:, :2]
        dxy = (d[:, :2] + d[:, 2:4]) / 2
        return np.argmin(
            np.abs(cxy[None, :, 0] - dxy[:, 0:1]) + np.abs(cxy[None, :, 1] - dxy[:, 1:2]), axis=1
        )

    def _assemble_masks(self, d, cands, coefs, proto, orig_shape, r, px, py):
        """Mask assembly: sigmoid(coef @ proto), crop to box, upsample to the
        original image (reference utils/ops.py:679 process_mask)."""
        import cv2

        idx = self._match_candidates(d, cands)
        hm, wm, nm = proto.shape
        masks = []
        sx, sy = wm / self.imgsz, hm / self.imgsz
        for di, ci in enumerate(idx):
            m = 1 / (1 + np.exp(-(proto.reshape(-1, nm) @ coefs[ci])))
            m = m.reshape(hm, wm)
            x1, y1, x2, y2 = d[di, :4]
            crop = np.zeros_like(m)
            xs, ys = int(x1 * sx), int(y1 * sy)
            xe, ye = max(int(x2 * sx), xs + 1), max(int(y2 * sy), ys + 1)
            crop[ys:ye, xs:xe] = m[ys:ye, xs:xe]
            # unletterbox: crop pad region then resize to original
            pxm, pym = int(px * sx), int(py * sy)
            hm_c = crop[pym : hm - pym or hm, pxm : wm - pxm or wm]
            full = cv2.resize(hm_c, (orig_shape[1], orig_shape[0]), interpolation=cv2.INTER_LINEAR)
            masks.append(full > 0.5)
        return np.stack(masks) if masks else np.zeros((0, *orig_shape), bool)

    def _gather_kpts(self, d, cands, kpts, r, px, py):
        idx = self._match_candidates(d, cands)
        nd = 3 if kpts.shape[-1] % 3 == 0 else 2
        k = kpts[idx].reshape(len(d), -1, nd).copy()
        k[..., 0] = (k[..., 0] - px) / r
        k[..., 1] = (k[..., 1] - py) / r
        return k


def _default_asset():
    # the canonical smoke-test image (reference engine/model.py:539 uses
    # assets/bus.jpg); we look in the mounted reference assets if present
    for cand in ("/root/reference/assets/bus.jpg", "assets/bus.jpg"):
        if Path(cand).exists():
            return cand
    raise FileNotFoundError("no default predict source; pass source=")
