"""YOLO-format detection dataset + fixed-shape batch pipeline.

Re-design of reference ``data/base.py`` + ``data/dataset.py`` +
``data/build.py``: scans an images dir, reads YOLO txt labels
(class cx cy w h, normalized), applies the v8 transform pipeline on the
host, and collates to FIXED-SHAPE device batches:

    img:       (B, imgsz, imgsz, 3) float32 in [0, 1]  (NHWC)
    cls_boxes: (B, max_labels, 5)  = (cls, x1, y1, x2, y2) pixels
    mask:      (B, max_labels) bool

The padded-label layout replaces the reference's ragged concat collate
(data/dataset.py:232) — its own loss pads to (bs, n_max) anyway
(utils/loss.py:180-195), so the pipeline just does it up front. The
infinite worker-recycling loader (data/build.py:28) becomes a simple
epoch-aware iterator with background thread prefetch (XLA likes a steady
stream; on multi-host each process reads its own shard).
"""
from __future__ import annotations

import math
import os
import queue
import threading
from pathlib import Path

import cv2
import numpy as np
import yaml

from . import augment as A

IMG_FORMATS = {".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp"}


def check_det_dataset(data: str | dict) -> dict:
    """Parse a dataset YAML (reference data/utils.py:301 check_det_dataset —
    without auto-download; paths must exist)."""
    if isinstance(data, (str, Path)):
        path = Path(data)
        if not path.exists():
            # bare names like "coco8.yaml" resolve against the bundled zoo
            # (reference cfg/datasets/; ours ships descriptors w/o downloads)
            zoo = Path(__file__).resolve().parent.parent / "cfg" / "datasets" / path.name
            if zoo.exists():
                path = zoo
        with open(path, errors="ignore") as f:
            d = yaml.safe_load(f)
        root = Path(d.get("path", path.parent))
        if not root.is_absolute():
            root = (path.parent / root).resolve()
    else:
        d = dict(data)
        root = Path(d.get("path", "."))
    out = dict(d)
    out["path"] = root
    for split in ("train", "val", "test"):
        if d.get(split):
            v = d[split]
            if isinstance(v, (list, tuple)):  # multi-dir splits (GlobalWheat2020)
                out[split] = [str(Path(p) if Path(p).is_absolute() else root / p)
                              for p in v]
            else:
                p = Path(v)
                out[split] = str(p if p.is_absolute() else root / p)
    names = d.get("names")
    if isinstance(names, list):
        names = dict(enumerate(names))
    out["names"] = names or {}
    out["nc"] = int(d.get("nc", len(out["names"])) or len(out["names"]))
    return out


def img2label_path(img_path: str) -> str:
    """images/xxx.jpg -> labels/xxx.txt (reference data/utils.py img2label_paths)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return sb.join(img_path.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt"


# ---------------------------------------------------------------------------
# persistent label cache (reference data/dataset.py cache_labels -> .cache)
# ---------------------------------------------------------------------------

_CACHE_VERSION = 1


def _labels_hash(files: list) -> str:
    """Validation hash over image paths + label (path, size, mtime) — the
    reference hashes sizes+paths (data/utils.py get_hash); mtime added so an
    edited-in-place label file invalidates too."""
    import hashlib

    h = hashlib.sha256()
    for f in files:
        h.update(f.encode())
        lp = img2label_path(f)
        try:
            st = os.stat(lp)
            h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
        except OSError:
            h.update(b"-")
    return h.hexdigest()


def _pack_labels(labels: list, task: str) -> dict:
    """Per-image label dicts -> flat arrays + offsets (np.savez-able with NO
    pickle — unlike the reference's pickled .cache, this stays loadable
    under any numpy and carries no code-execution surface)."""
    counts = np.asarray([len(lb["cls"]) for lb in labels], np.int64)
    out = {
        "counts": counts,
        "cls": np.concatenate([lb["cls"] for lb in labels]) if counts.sum() else np.zeros(0, np.float32),
        "xywhn": np.concatenate([lb["xywhn"] for lb in labels]) if counts.sum() else np.zeros((0, 4), np.float32),
    }
    if task == "segment":
        seg_counts, seg_lens, pts = [], [], []
        for lb in labels:
            segs = lb["segments"]
            seg_counts.append(len(segs))
            for s in segs:
                seg_lens.append(len(s))
                pts.append(s)
        out["seg_counts"] = np.asarray(seg_counts, np.int64)
        out["seg_lens"] = np.asarray(seg_lens, np.int64)
        out["seg_pts"] = (np.concatenate(pts).astype(np.float32)
                          if pts else np.zeros((0, 2), np.float32))
    elif task == "pose":
        out["keypoints"] = (np.concatenate([lb["keypoints"] for lb in labels])
                            if counts.sum() else np.zeros((0, 1, 3), np.float32))
    elif task == "obb":
        out["obb_corners"] = (np.concatenate([lb["obb_corners"] for lb in labels])
                              if counts.sum() else np.zeros((0, 4, 2), np.float32))
    return out


def _unpack_labels(z, task: str) -> list:
    counts = z["counts"]
    offs = np.concatenate([[0], np.cumsum(counts)])
    labels = []
    if task == "segment":
        seg_offs = np.concatenate([[0], np.cumsum(z["seg_counts"])])
        pt_offs = np.concatenate([[0], np.cumsum(z["seg_lens"])])
    for i, n in enumerate(counts):
        a, b = offs[i], offs[i + 1]
        lb = {"cls": z["cls"][a:b].astype(np.float32),
              "xywhn": z["xywhn"][a:b].astype(np.float32)}
        if task == "segment":
            sa, sb = seg_offs[i], seg_offs[i + 1]
            lb["segments"] = [z["seg_pts"][pt_offs[k]: pt_offs[k + 1]].astype(np.float32)
                              for k in range(sa, sb)]
        elif task == "pose":
            lb["keypoints"] = z["keypoints"][a:b].astype(np.float32)
        elif task == "obb":
            lb["obb_corners"] = z["obb_corners"][a:b].astype(np.float32)
        labels.append(lb)
    return labels


class YOLODataset:
    """Dataset over a YOLO-format directory tree.

    Tasks (label txt formats, reference data/dataset.py:45 + data/utils.py):
      * detect:  cls cx cy w h (normalized)
      * segment: cls x1 y1 x2 y2 ... (normalized polygon; bbox derived)
      * pose:    cls cx cy w h px py pv * K
      * obb:     cls x1 y1 x2 y2 x3 y3 x4 y4 (normalized corners -> rbox)

    Geometric augmentation note: the mosaic/perspective pipeline currently
    applies to detect only; segment/pose/obb use letterbox + HSV + flip
    (points transformed consistently).
    """

    def __init__(self, img_path: str, imgsz: int = 640, augment: bool = False, hyp=None,
                 max_labels: int = 128, rect: bool = False, single_cls: bool = False,
                 fraction: float = 1.0, task: str = "detect", kpt_shape: tuple = (17, 3),
                 mask_ratio: int = 4, cache: str | bool = False,
                 batch: int | None = None, stride: int = 32, pad: float = 0.5):
        self.imgsz = imgsz
        # "ram" (or True) keeps decoded+resized images in memory after first
        # touch (reference data/base.py:151 cache_images) — on this 1-core
        # host JPEG decode dominates the producer thread, so epoch 2+ feeds
        # from memory. ~3*imgsz^2 bytes/img resident.
        self.cache = "ram" if cache is True else (cache or "")
        self._im_cache: dict[int, np.ndarray] = {}
        self.augment = augment
        self.hyp = hyp or {}
        self.max_labels = max_labels
        self.single_cls = single_cls
        self.task = task
        self.kpt_shape = tuple(kpt_shape)
        self.mask_ratio = mask_ratio
        self.files = self._scan(img_path)
        if fraction < 1.0:
            self.files = self.files[: max(1, round(len(self.files) * fraction))]
        self.labels = self._load_labels_cached(img_path)
        self.ni = len(self.files)
        # original (h, w) per image, filled lazily by load_image; used by the
        # validator to un-letterbox predictions (reference ops.scale_boxes)
        self.ori_shapes: dict[int, tuple[int, int]] = {}
        if self.ni == 0:
            raise FileNotFoundError(f"no images found in {img_path}")
        # rect mode (reference data/base.py set_rectangle, static-shape
        # flavored): aspect-ratio-sorted batches, each batch one
        # stride-aligned (h, w) — a small set of static shapes (one XLA
        # compilation each) instead of per-image dynamic shapes
        self.rect = bool(rect) and not augment
        self.stride = int(stride)
        self.pad = float(pad)
        self.rect_batches: list[tuple[list, tuple[int, int]]] = []
        self.rect_shape_of: dict[int, tuple[int, int]] = {}
        self._img_path = img_path  # kept so Loader can re-bucket on bs change
        self.batch = int(batch or 16)
        # emit uint8 images from collate (device normalizes): the fp32
        # [0,1] batch is 4x the bytes over the host->device link — at 640px
        # b128 that is 629 MB/batch through the axon relay, which measured
        # as the entire train-loop bottleneck (bench_train.py --loop r5)
        self.uint8_images = False
        if self.rect:
            self._set_rectangle(self.batch, img_path)

    @staticmethod
    def _scan(img_path) -> list:
        if isinstance(img_path, (list, tuple)):  # multi-dir split
            out = []
            for sub in img_path:
                out.extend(YOLODataset._scan(sub))
            return out
        p = Path(img_path)
        if p.is_dir():
            files = sorted(str(f) for f in p.rglob("*") if f.suffix.lower() in IMG_FORMATS)
        elif p.is_file() and p.suffix == ".txt":
            base = p.parent
            files = []
            for line in p.read_text().splitlines():
                line = line.strip()
                if line:
                    fp = Path(line)
                    files.append(str(fp if fp.is_absolute() else base / fp))
        else:
            raise FileNotFoundError(f"invalid dataset path {img_path}")
        return files

    def _cache_path(self, img_path) -> Path | None:
        """labels.cache.npz beside the labels dir (reference cache_labels
        writes ``<labels>.cache``, data/dataset.py)."""
        p = Path(img_path[0] if isinstance(img_path, (list, tuple)) else img_path)
        base = p if p.is_dir() else p.parent
        try:
            base.mkdir(parents=True, exist_ok=True)
            return base / f"labels_{self.task}.cache.npz"
        except OSError:
            return None

    def _load_labels_cached(self, img_path) -> list:
        """Hash-validated persistent label cache: the per-file txt scan runs
        once per dataset state; later runs load one npz (reference
        data/dataset.py cache_labels / .cache, but pickle-free)."""
        cp = self._cache_path(img_path)
        want = _labels_hash(self.files)
        if cp is not None and cp.exists():
            try:
                with np.load(cp, allow_pickle=False) as z:
                    if (int(z["version"]) == _CACHE_VERSION and str(z["hash"]) == want
                            and int(z["counts"].shape[0]) == len(self.files)):
                        return _unpack_labels(z, self.task)
            except Exception:
                pass  # corrupt/stale cache -> rescan below
        labels = [self._load_label(f) for f in self.files]
        if cp is not None:
            try:
                np.savez(cp, version=_CACHE_VERSION, hash=want,
                         **_pack_labels(labels, self.task))
            except OSError:
                pass  # read-only dataset dir: stay scan-per-run
        return labels

    def _image_shapes(self, img_path) -> np.ndarray:
        """(ni, 2) original (h, w) per image via header-only reads, persisted
        beside the label cache (the reference stores verified shapes inside
        its .cache and reads them for set_rectangle, data/base.py)."""
        cp = self._cache_path(img_path)
        sp = cp.with_name(cp.name + ".shapes.npz") if cp is not None else None
        # hash the IMAGE files' own size/mtime (not the label files'): an
        # image replaced in place with different dimensions must invalidate
        # the shape cache or bucketing silently serves stale shapes
        import hashlib

        h = hashlib.sha256()
        for f in self.files:
            h.update(f.encode())
            try:
                st = os.stat(f)
                h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
            except OSError:
                h.update(b"-")
        want = h.hexdigest()
        if sp is not None and sp.exists():
            try:
                with np.load(sp, allow_pickle=False) as z:
                    if str(z["hash"]) == want and z["shapes"].shape[0] == self.ni:
                        return z["shapes"]
            except Exception:
                pass  # corrupt/stale shape cache -> re-read headers below
        from PIL import Image

        shapes = np.zeros((self.ni, 2), np.int32)
        for i, f in enumerate(self.files):
            try:
                with Image.open(f) as im:
                    w, h = im.size  # header only, no pixel decode
            except Exception:
                h = w = self.imgsz
            shapes[i] = (h, w)
        if sp is not None:
            try:
                np.savez(sp, hash=want, shapes=shapes)
            except OSError:
                pass  # read-only dataset dir
        return shapes

    def _set_rectangle(self, batch: int, img_path) -> None:
        """Group images into loader batches by aspect ratio and give each
        batch one stride-aligned static (h, w) (reference data/base.py
        set_rectangle + val pad=0.5, models/yolo/detect/val.py). The batch
        shapes quantize to the stride grid, so a val run compiles only as
        many XLA programs as there are distinct bucket shapes (~O(10))."""
        shapes = self._image_shapes(img_path).astype(np.float64)
        ar = shapes[:, 0] / np.maximum(shapes[:, 1], 1)  # h / w
        order = np.argsort(ar, kind="stable")
        nb = int(math.ceil(self.ni / batch))
        self.rect_batches = []
        self.rect_shape_of = {}
        for b in range(nb):
            idx = order[b * batch : (b + 1) * batch]
            ari = ar[idx]
            mini, maxi = float(ari.min()), float(ari.max())
            shp = [1.0, 1.0]
            if maxi < 1:
                shp = [maxi, 1.0]
            elif mini > 1:
                shp = [1.0, 1.0 / mini]
            hw = (np.ceil(np.asarray(shp) * self.imgsz / self.stride + self.pad)
                  .astype(int) * self.stride)
            hw = (int(hw[0]), int(hw[1]))
            self.rect_batches.append(([int(i) for i in idx], hw))
            for i in idx:
                self.rect_shape_of[int(i)] = hw

    def _target_shape(self, i: int):
        """Letterbox target for sample i: the rect bucket shape when rect
        mode is on, else the square imgsz."""
        return self.rect_shape_of.get(int(i), self.imgsz) if self.rect else self.imgsz

    def _load_label(self, img_file: str):
        """Task-dependent label dict:
        {"cls": (n,), "xywhn": (n, 4)} + task extras
        ("segments": list of (m, 2) normalized, "keypoints": (n, K, 3),
        "rboxn": (n, 5) = cx cy w h angle normalized-coords)."""
        lp = img2label_path(img_file)
        rows = []
        if os.path.exists(lp):
            with open(lp) as f:
                for line in f:
                    parts = [float(x) for x in line.split()]
                    if len(parts) >= 5:
                        rows.append(parts)
        n = len(rows)
        out = {"cls": np.zeros(n, np.float32), "xywhn": np.zeros((n, 4), np.float32)}
        if self.task == "segment":
            out["segments"] = []
        elif self.task == "pose":
            nk, nd = self.kpt_shape
            out["keypoints"] = np.zeros((n, nk, 3), np.float32)
        elif self.task == "obb":
            out["obb_corners"] = np.zeros((n, 4, 2), np.float32)
        for i, parts in enumerate(rows):
            out["cls"][i] = 0 if self.single_cls else parts[0]
            if self.task == "segment" and len(parts) > 5:
                poly = np.asarray(parts[1:], np.float32).reshape(-1, 2)
                out["segments"].append(poly)
                x1, y1 = poly.min(0)
                x2, y2 = poly.max(0)
                out["xywhn"][i] = [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1]
            elif self.task == "obb" and len(parts) >= 9:
                pts = np.asarray(parts[1:9], np.float32).reshape(4, 2)
                out["obb_corners"][i] = pts
                x1, y1 = pts.min(0)
                x2, y2 = pts.max(0)
                out["xywhn"][i] = [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1]
            else:
                out["xywhn"][i] = parts[1:5]
                if self.task == "pose" and len(parts) > 5:
                    nk, nd = self.kpt_shape
                    k = np.asarray(parts[5 : 5 + nk * nd], np.float32).reshape(nk, nd)
                    if nd == 2:
                        k = np.concatenate([k, np.ones((nk, 1), np.float32) * 2], -1)
                    out["keypoints"][i] = k
                elif self.task == "segment":
                    # box-only line in a segment dataset: rectangle polygon
                    cx, cy, w, h = parts[1:5]
                    out["segments"].append(np.asarray(
                        [[cx - w / 2, cy - h / 2], [cx + w / 2, cy - h / 2],
                         [cx + w / 2, cy + h / 2], [cx - w / 2, cy + h / 2]], np.float32))
        return out

    def __len__(self):
        return self.ni

    def load_image(self, i: int):
        if self.cache == "ram":
            hit = self._im_cache.get(i)
            if hit is not None:
                return hit
        src = Path(self.files[i])
        if self.cache == "disk":
            # decoded+resized image persisted beside the source (reference
            # data/base.py:189 cache_images_to_disk .npy): epoch 1 of run 1
            # pays the JPEG decode, everything after memory-maps
            npy = src.with_suffix(".cache.npy")
            if npy.exists() and npy.stat().st_mtime >= src.stat().st_mtime:
                img = np.load(npy, mmap_mode="r", allow_pickle=False)
                self.ori_shapes.setdefault(i, tuple(
                    np.load(src.with_suffix(".cache.shape.npy"), allow_pickle=False)))
                return np.asarray(img)
        img = cv2.imread(self.files[i])
        if img is None:
            raise FileNotFoundError(self.files[i])
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        # long-side resize to imgsz (reference data/base.py:151)
        h, w = img.shape[:2]
        self.ori_shapes[i] = (h, w)
        r = self.imgsz / max(h, w)
        if r != 1:
            img = cv2.resize(img, (min(math.ceil(w * r), self.imgsz), min(math.ceil(h * r), self.imgsz)),
                             interpolation=cv2.INTER_LINEAR)
        if self.cache == "ram":
            self._im_cache[i] = img
        elif self.cache == "disk":
            try:
                np.save(src.with_suffix(".cache.npy"), img)
                np.save(src.with_suffix(".cache.shape.npy"), np.asarray([h, w]))
            except OSError:
                pass  # read-only dataset dir
        return img

    def labels_px(self, i: int, shape) -> np.ndarray:
        """Labels as (n, 5) = cls, x1, y1, x2, y2 in pixels of `shape` (h, w)."""
        lb = self.labels[i]
        n = len(lb["cls"])
        out = np.zeros((n, 5), np.float32)
        if n:
            h, w = shape
            xywhn = lb["xywhn"]
            cx, cy, bw, bh = xywhn[:, 0] * w, xywhn[:, 1] * h, xywhn[:, 2] * w, xywhn[:, 3] * h
            out[:, 0] = lb["cls"]
            out[:, 1] = cx - bw / 2
            out[:, 2] = cy - bh / 2
            out[:, 3] = cx + bw / 2
            out[:, 4] = cy + bh / 2
        return out

    # -- native fast path (eval) ------------------------------------------------
    def collate_native(self, idxs) -> dict | None:
        """Fused C++ letterbox+normalize batch assembly for the no-augment
        detect path (native/imgproc.cpp); None if the library is unavailable."""
        from .. import native

        if not native.available():
            return None
        imgs = [self.load_image(int(i)) for i in idxs]
        batch_imgs, metas = native.letterbox_batch(imgs, self.imgsz, scaleup=False)
        b = len(idxs)
        boxes = np.zeros((b, self.max_labels, 5), np.float32)
        mask = np.zeros((b, self.max_labels), bool)
        for bi, i in enumerate(idxs):
            lb = self.labels_px(int(i), imgs[bi].shape[:2])
            r, px, py = metas[bi]
            if len(lb):
                lb = lb.copy()
                lb[:, 1:5] *= r
                lb[:, [1, 3]] += px
                lb[:, [2, 4]] += py
                wh = lb[:, 3:5] - lb[:, 1:3]
                lb = lb[(wh > 1).all(-1)][: self.max_labels]
            n = len(lb)
            if n:
                boxes[bi, :n] = lb
                mask[bi, :n] = True
        return {"img": batch_imgs, "cls_boxes": boxes, "mask": mask,
                **self._batch_meta(idxs)}

    def _batch_meta(self, idxs) -> dict:
        """Host-side per-image metadata for val batches: original (h, w)
        (for un-letterboxing, reference ops.scale_boxes) and the dataset
        index (shard-correct file lookup)."""
        idxs = [int(i) for i in idxs]
        shapes = np.asarray(
            [self.ori_shapes.get(i, (self.imgsz, self.imgsz)) for i in idxs],
            np.float32)
        return {"ori_shape": shapes, "im_idx": np.asarray(idxs, np.int32)}

    # -- sample assembly ------------------------------------------------------
    def get_sample(self, i: int, rng: np.random.Generator):
        if self.task != "detect":
            return self._get_sample_points(i, rng)
        return self._get_sample_detect(i, rng)

    def _points_px(self, i: int, shape) -> dict:
        """Task point annotations in pixel coords of ``shape`` (h, w)."""
        lb = self.labels[i]
        h0, w0 = shape
        wh = np.asarray([w0, h0], np.float32)
        if self.task == "segment":
            return {"segments": [p * wh for p in lb["segments"]]}
        if self.task == "pose":
            k = lb["keypoints"].copy()
            k[..., 0] *= w0
            k[..., 1] *= h0
            return {"keypoints": k}
        if self.task == "obb":
            return {"corners": lb["obb_corners"] * wh}
        return {}

    def _get_sample_points(self, i: int, rng: np.random.Generator):
        """Sample assembly for point-carrying tasks (segment/pose/obb):
        mosaic (optional) or letterbox, copy-paste (segment), HSV, flip —
        every point set transformed consistently with the boxes."""
        hyp = self.hyp
        g = lambda k, d: float(hyp.get(k, d)) if isinstance(hyp, dict) else float(getattr(hyp, k, d))

        if self.augment and rng.random() < g("mosaic", 1.0):
            n = int(g("mosaic_n", 4))
            fn = {3: A.mosaic3_points, 9: A.mosaic9_points}.get(n, A.mosaic4_points)
            idxs = [i] + [int(rng.integers(self.ni)) for _ in range(max(n, 3) - 1)]
            samples = []
            for j in idxs:
                im = self.load_image(j)
                samples.append((im, self.labels_px(j, im.shape[:2]),
                                self._points_px(j, im.shape[:2])))
            img, labels, extra = fn(samples, self.imgsz, rng)
            # mosaic canvas is 2*imgsz; scale everything down by half
            img = cv2.resize(img, (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
            labels = labels.copy()
            labels[:, 1:5] *= 0.5
            extra = A._shift_points(extra, 0.5, 0.0, 0.0)
        else:
            img = self.load_image(i)
            h0, w0 = img.shape[:2]
            labels = self.labels_px(i, (h0, w0))
            pts = self._points_px(i, (h0, w0))
            img, labels, (r, px, py) = A.letterbox(img, self._target_shape(i), labels,
                                                   scaleup=self.augment)
            extra = A._shift_points(pts, r, px, py)

        if self.task == "segment" and self.augment and g("copy_paste", 0.0) > 0:
            mode = (hyp.get("copy_paste_mode", "flip") if isinstance(hyp, dict)
                    else getattr(hyp, "copy_paste_mode", "flip")) or "flip"
            if mode == "mixup":
                # cross-image paste (reference CopyPaste mode="mixup",
                # data/augment.py:1636): donor sample letterboxed to imgsz
                j = int(rng.integers(self.ni))
                im2 = self.load_image(j)
                lb2 = self.labels_px(j, im2.shape[:2])
                pts2 = self._points_px(j, im2.shape[:2])
                im2, lb2, (r2, px2, py2) = A.letterbox(im2, self.imgsz, lb2)
                segs2 = A._shift_points(pts2, r2, px2, py2).get("segments", [])
                img, labels, segs = A.copy_paste_mix(
                    img, labels, extra.get("segments", []), im2, lb2, segs2,
                    p=g("copy_paste", 0.0), rng=rng)
            else:
                img, labels, segs = A.copy_paste_flip(
                    img, labels, extra.get("segments", []), p=g("copy_paste", 0.0), rng=rng
                )
            extra["segments"] = segs

        if self.augment:
            img = A.random_hsv(img, g("hsv_h", 0.015), g("hsv_s", 0.7), g("hsv_v", 0.4), rng)
            if g("fliplr", 0.5) and rng.random() < g("fliplr", 0.5):
                W = img.shape[1]
                img = np.ascontiguousarray(img[:, ::-1])
                if len(labels):
                    x1 = labels[:, 1].copy()
                    labels[:, 1] = W - labels[:, 3]
                    labels[:, 3] = W - x1
                if "segments" in extra:
                    extra["segments"] = [np.stack([W - p[:, 0], p[:, 1]], -1) for p in extra["segments"]]
                if "keypoints" in extra:
                    k = extra["keypoints"]
                    k[..., 0] = W - k[..., 0]
                    flip_idx = self.hyp.get("flip_idx") if isinstance(self.hyp, dict) else None
                    if flip_idx:
                        k = k[:, list(flip_idx)]
                    extra["keypoints"] = k
                if "corners" in extra:
                    c = extra["corners"]
                    c[..., 0] = W - c[..., 0]
                    extra["corners"] = c
        if self.task == "obb":
            # corners -> (cx, cy, w, h, angle) via minAreaRect in final pixel
            # space (the angle is only well-defined after all geometry is done)
            corners = extra.pop("corners", np.zeros((0, 4, 2), np.float32))
            rb = np.zeros((len(corners), 5), np.float32)
            for ci, pts in enumerate(corners):
                (cx, cy), (w, h), ang = cv2.minAreaRect(pts.astype(np.float32))
                rb[ci] = [cx, cy, w, h, ang * math.pi / 180.0]
            extra["rbox"] = rb
        return img, labels, extra

    def _get_sample_detect(self, i: int, rng: np.random.Generator) -> tuple:
        hyp = self.hyp
        g = lambda k, d: float(hyp.get(k, d)) if isinstance(hyp, dict) else float(getattr(hyp, k, d))
        if self.augment and rng.random() < g("mosaic", 1.0):
            n = int(g("mosaic_n", 4))
            idxs = [i] + [int(rng.integers(self.ni)) for _ in range(max(n, 3) - 1)]
            imgs, lbs = [], []
            for j in idxs:
                im = self.load_image(j)
                imgs.append(im)
                lbs.append(self.labels_px(j, im.shape[:2]))
            if n in (3, 9):
                fn = A.mosaic3_points if n == 3 else A.mosaic9_points
                img, labels, _ = fn([(im, lb, {}) for im, lb in zip(imgs, lbs)],
                                    self.imgsz, rng)
            else:
                img, labels = A.mosaic4(imgs, lbs, self.imgsz, rng)
            border = (-self.imgsz // 2, -self.imgsz // 2)
            img, labels = A.random_perspective(
                img, labels, degrees=g("degrees", 0.0), translate=g("translate", 0.1),
                scale=g("scale", 0.5), shear=g("shear", 0.0), perspective=g("perspective", 0.0),
                border=border, rng=rng,
            )
            if rng.random() < g("mixup", 0.0):
                j = int(rng.integers(self.ni))
                im2 = self.load_image(j)
                lb2 = self.labels_px(j, im2.shape[:2])
                im2, lb2, _ = A.letterbox(im2, self.imgsz, lb2)
                img, labels = A.mixup(img, labels, im2, lb2, rng)
        else:
            img = self.load_image(i)
            labels = self.labels_px(i, img.shape[:2])
            img, labels, _ = A.letterbox(img, self._target_shape(i), labels,
                                         scaleup=self.augment)
            if self.augment:
                img, labels = A.random_perspective(
                    img, labels, degrees=g("degrees", 0.0), translate=g("translate", 0.1),
                    scale=g("scale", 0.5), shear=g("shear", 0.0), perspective=g("perspective", 0.0),
                    rng=rng,
                )
        if self.augment:
            # reference train order: ... MixUp -> Albumentations -> HSV -> flip
            # (data/augment.py:2280-2344)
            if not hasattr(self, "_albumentations"):
                self._albumentations = A.Albumentations()
            img = self._albumentations(img, rng)
            img = A.random_hsv(img, g("hsv_h", 0.015), g("hsv_s", 0.7), g("hsv_v", 0.4), rng)
            img, labels = A.random_flip(img, labels, g("fliplr", 0.5), g("flipud", 0.0), rng)
        return img, labels

    def collate(self, samples: list, idxs=None) -> dict:
        b = len(samples)
        # rect mode: every sample in a batch shares its bucket (h, w)
        sh, sw = samples[0][0].shape[:2] if samples else (self.imgsz, self.imgsz)
        imgs = np.zeros((b, sh, sw, 3),
                        np.uint8 if self.uint8_images else np.float32)
        box_dim = 6 if self.task == "obb" else 5
        boxes = np.zeros((b, self.max_labels, box_dim), np.float32)
        mask = np.zeros((b, self.max_labels), bool)
        extras: dict = {}
        if self.task == "segment":
            extras["masks"] = np.zeros(
                (b, sh // self.mask_ratio, sw // self.mask_ratio), np.int32)
        elif self.task == "pose":
            nk = self.kpt_shape[0]
            extras["keypoints"] = np.zeros((b, self.max_labels, nk, 3), np.float32)

        for bi, sample in enumerate(samples):
            img, labels = sample[0], sample[1]
            extra = sample[2] if len(sample) > 2 else {}
            imgs[bi] = img if self.uint8_images else img.astype(np.float32) / 255.0
            keep = np.arange(len(labels))
            if len(labels):
                wh = labels[:, 3:5] - labels[:, 1:3]
                keep = np.nonzero((wh > 1).all(-1))[0]
            keep = keep[: self.max_labels]
            n = len(keep)
            if not n:
                continue
            mask[bi, :n] = True
            if self.task == "obb":
                rb = extra["rbox"][keep]
                boxes[bi, :n, 0] = labels[keep, 0]
                boxes[bi, :n, 1:6] = rb
            else:
                boxes[bi, :n] = labels[keep]
            if self.task == "segment":
                scale = 1.0 / self.mask_ratio
                for slot, gi in enumerate(keep):
                    poly = (extra["segments"][gi] * scale).astype(np.int32)
                    # overlap encoding: instance index + 1 (reference overlap_mask)
                    cv2.fillPoly(extras["masks"][bi], [poly], int(slot) + 1)
            elif self.task == "pose":
                extras["keypoints"][bi, :n] = extra["keypoints"][keep]
        meta = {} if (idxs is None or self.augment) else self._batch_meta(idxs)
        return {"img": imgs, "cls_boxes": boxes, "mask": mask, **extras, **meta}


class Loader:
    """Epoch iterator with a background prefetch thread
    (replaces reference InfiniteDataLoader, data/build.py:28)."""

    def __init__(self, dataset: YOLODataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, prefetch: int = 2,
                 shard_index: int = 0, num_shards: int = 1, workers: int = 0):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.num_shards = num_shards
        # decode/augment worker threads inside the producer (the reference's
        # dataloader workers, data/build.py:135). Threads, not processes:
        # cv2's decode/warp/resize release the GIL, so samples assemble in
        # parallel on multi-core hosts without pickling batches across
        # process boundaries. 0 = assemble inline in the producer thread.
        self.workers = max(0, int(workers))
        self.epoch = 0

    def _rect_batches(self):
        """Sharded rect bucket groups, re-bucketed if this Loader's bs differs
        from the dataset's (a directly-constructed Loader with bs != ds.batch
        would otherwise emit the dataset's batch size, not its own)."""
        if self.bs != getattr(self.ds, "batch", self.bs):
            self.ds.batch = self.bs
            self.ds._set_rectangle(self.bs, self.ds._img_path)
        groups = [np.asarray(g[0])
                  for g in self.ds.rect_batches[self.shard_index :: self.num_shards]]
        if self.drop_last:
            groups = [b for b in groups if len(b) == self.bs] or groups
        return groups

    def __len__(self):
        if getattr(self.ds, "rect", False) and not self.shuffle:
            return len(self._rect_batches())
        n = len(self.ds) // self.num_shards
        return n // self.bs if self.drop_last else math.ceil(n / self.bs)

    def __iter__(self):
        if getattr(self.ds, "rect", False) and self.shuffle:
            raise ValueError(
                "shuffle=True on a rect dataset: rect buckets are aspect-"
                "sorted sequential batches; shuffling would mix per-index "
                "bucket shapes inside one batch. Build the dataset with "
                "rect=False for shuffled loading.")
        rng = np.random.default_rng(self.seed + self.epoch)
        rect = bool(getattr(self.ds, "rect", False)) and not self.shuffle
        if rect:
            # aspect-ratio bucket groups, sharded at batch granularity so a
            # batch never mixes bucket shapes (reference rect=True keeps the
            # sampler sequential over the sorted order, data/build.py)
            batches = self._rect_batches()
            nb = len(batches)
        else:
            idxs = np.arange(len(self.ds))
            if self.shuffle:
                rng.shuffle(idxs)
            idxs = idxs[self.shard_index :: self.num_shards]
            nb = len(idxs) // self.bs if self.drop_last else math.ceil(len(idxs) / self.bs)
            batches = [idxs[b * self.bs : (b + 1) * self.bs] for b in range(nb)]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # native C++ letterbox emits fp32-normalized batches; under
        # uint8_images the 4x-smaller device transfer beats the host-side
        # assembly win, so take the python collate there
        use_native = ((not self.ds.augment) and self.ds.task == "detect"
                      and not rect and not getattr(self.ds, "uint8_images", False))

        def _put(item) -> bool:
            # bounded put that re-checks the stop flag: an abandoned iterator
            # (consumer broke out early) must not leave this thread blocked
            # on a full queue holding dataset references forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        pool = None
        if self.workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(self.workers, thread_name_prefix="loader")

        def _assemble(batch_idx):
            if pool is not None:
                # per-sample seeds: the shared rng is not thread-safe, and
                # derived seeds keep sample streams reproducible regardless
                # of worker scheduling order
                seeds = rng.integers(0, 2**31 - 1, len(batch_idx))
                samples = list(pool.map(
                    lambda a: self.ds.get_sample(int(a[0]), np.random.default_rng(int(a[1]))),
                    zip(batch_idx, seeds)))
            else:
                samples = [self.ds.get_sample(int(i), rng) for i in batch_idx]
            return self.ds.collate(samples, batch_idx)

        def producer():
            # any producer exception must reach the consumer — a silently
            # dead producer leaves q.get() blocked forever (observed as a
            # SIGTERM-proof hang in the world-trainer test)
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    batch_idx = batches[b]
                    batch = self.ds.collate_native(batch_idx) if use_native else None
                    if batch is None:
                        batch = _assemble(batch_idx)
                    if not _put(batch):
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                _put(e)
                return
            finally:
                if pool is not None:
                    pool.shutdown(wait=False)
            _put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
            self.epoch += 1
        finally:
            stop.set()


def build_dataloader(data_yaml: str | dict, split: str = "train", batch: int = 16,
                     imgsz: int = 640, augment: bool | None = None, hyp=None,
                     max_labels: int = 128, seed: int = 0, fraction: float = 1.0,
                     single_cls: bool = False, task: str = "detect",
                     embed_fn=None, text_cfg: dict | None = None,
                     cache: str | bool = False, workers: int = 0,
                     rect: bool = False, stride: int = 32, pad: float = 0.5):
    """Convenience: dataset YAML/dir -> (Loader, data_dict).

    task="world": open-vocab training — a MultiModalDataset samples per-batch
    class texts (reference YOLOMultiModalDataset + RandomLoadText) and, with
    embed_fn (a CLIP-style text tower), attaches txt_feats to every batch.
    """
    augment = (split == "train") if augment is None else augment
    if task == "classify":
        # classify datasets are plain directories: root/{train,val}/{class}/
        root = Path(str(data_yaml))
        split_dir = root / split if (root / split).exists() else root
        ds = ClassificationDataset(str(split_dir), imgsz=imgsz, augment=augment,
                                   hyp=hyp, fraction=fraction)
        d = {"names": ds.names, "nc": len(ds.names), "path": root}
        return Loader(ds, batch, shuffle=augment, seed=seed, drop_last=augment,
                      workers=workers), d
    d = check_det_dataset(data_yaml)
    kpt_shape = tuple(d.get("kpt_shape", (17, 3)))
    if isinstance(hyp, dict) and d.get("flip_idx"):
        hyp = {**hyp, "flip_idx": d["flip_idx"]}
    if task == "world":
        from .multimodal import MultiModalDataset

        ds = MultiModalDataset(d[split], d["names"], text_cfg=text_cfg,
                               embed_fn=embed_fn, imgsz=imgsz, augment=augment,
                               hyp=hyp, max_labels=max_labels,
                               single_cls=single_cls, fraction=fraction)
    else:
        ds = YOLODataset(d[split], imgsz=imgsz, augment=augment, hyp=hyp,
                         max_labels=max_labels, single_cls=single_cls,
                         fraction=fraction, task=task, kpt_shape=kpt_shape,
                         cache=cache, rect=rect, batch=batch, stride=stride,
                         pad=pad)
    # per-host shard on multi-host pods (DistributedSampler equivalent)
    from ..parallel.distributed import local_shard

    shard_index, num_shards = local_shard()
    # eval must see EVERY image: keep the tail batch (one extra XLA program
    # for its smaller shape) instead of silently dropping the remainder
    return Loader(ds, batch, shuffle=augment, seed=seed, drop_last=augment,
                  shard_index=shard_index, num_shards=num_shards,
                  workers=workers), d


class ClassificationDataset:
    """Folder-per-class dataset (reference data/dataset.py:389
    ClassificationDataset; torchvision ImageFolder layout)."""

    def __init__(self, root: str, imgsz: int = 224, augment: bool = False, hyp=None,
                 fraction: float = 1.0):
        self.root = Path(root)
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp or {}
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.names = dict(enumerate(classes))
        self.samples = []
        for c in classes:
            for f in sorted((self.root / c).rglob("*")):
                if f.suffix.lower() in IMG_FORMATS:
                    self.samples.append((str(f), self.class_to_idx[c]))
        if fraction < 1.0:
            self.samples = self.samples[: max(1, round(len(self.samples) * fraction))]
        self.ni = len(self.samples)
        if self.ni == 0:
            raise FileNotFoundError(f"no class folders with images under {root}")
        self.task = "classify"

    def __len__(self):
        return self.ni

    def get_sample(self, i: int, rng: np.random.Generator):
        path, label = self.samples[i]
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        g = lambda k, d: self.hyp.get(k, d) if isinstance(self.hyp, dict) else getattr(self.hyp, k, d)
        if self.augment:
            # reference classify_augmentations (data/augment.py:2405; wired
            # with scale=(1-args.scale, 1) at data/dataset.py:445-458)
            img = A.classify_train_transform(
                img, self.imgsz, rng,
                scale=(1.0 - float(g("scale", 0.5)), 1.0),
                hflip=float(g("fliplr", 0.5)), vflip=float(g("flipud", 0.0)),
                auto_augment=g("auto_augment", "randaugment") or None,
                hsv_h=float(g("hsv_h", 0.015)), hsv_s=float(g("hsv_s", 0.4)),
                hsv_v=float(g("hsv_v", 0.4)), erasing=float(g("erasing", 0.4)))
        else:
            # reference classify_transforms (data/augment.py:2348)
            img = A.classify_eval_transform(
                img, self.imgsz, crop_fraction=float(g("crop_fraction", 1.0)))
        return img, label

    def collate(self, samples: list, idxs=None) -> dict:
        imgs = np.stack([s[0] for s in samples]).astype(np.float32) / 255.0
        labels = np.asarray([s[1] for s in samples], np.int64)
        return {"img": imgs, "label": labels}

    def collate_native(self, idxs):
        return None
