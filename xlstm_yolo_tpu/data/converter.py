"""Dataset format converters (reference ``data/converter.py`` +
``data/split_dota.py``): COCO JSON -> YOLO txt labels, class-id remapping,
DOTA image tiling for OBB training.
"""
from __future__ import annotations

import json
import math
from collections import defaultdict
from pathlib import Path

import numpy as np


def coco91_to_coco80_class() -> list:
    """91-index (paper) -> 80-index (dataset) map (reference converter.py)."""
    x = [None] * 91
    i80 = 0
    skip = {11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90}
    for i in range(91):
        if i in skip:
            continue
        x[i] = i80
        i80 += 1
    return x


def coco80_to_coco91_class() -> list:
    """80-index (dataset) -> 91-index (paper) category ids, the map
    pycocotools scoring expects (reference converter.py coco80_to_coco91_class)."""
    inv = [None] * 80
    for i91, i80 in enumerate(coco91_to_coco80_class()):
        if i80 is not None:
            inv[i80] = i91 + 1  # COCO annotation category ids are 1-based
    return inv


def convert_coco(labels_json: str | Path, save_dir: str | Path, use_segments: bool = False,
                 cls91to80: bool = True) -> Path:
    """COCO instances JSON -> YOLO-format labels/ tree (reference
    convert_coco, data/converter.py)."""
    save_dir = Path(save_dir)
    (save_dir / "labels").mkdir(parents=True, exist_ok=True)
    data = json.loads(Path(labels_json).read_text())
    images = {img["id"]: img for img in data["images"]}
    cmap = coco91_to_coco80_class() if cls91to80 else None
    # category id -> contiguous index
    cats = sorted(c["id"] for c in data.get("categories", []))
    cat_idx = {cid: i for i, cid in enumerate(cats)}

    per_image = defaultdict(list)
    for ann in data["annotations"]:
        if ann.get("iscrowd"):
            continue
        per_image[ann["image_id"]].append(ann)

    for img_id, anns in per_image.items():
        img = images[img_id]
        w, h = img["width"], img["height"]
        lines = []
        for ann in anns:
            cid = ann["category_id"]
            if cmap is not None and cid - 1 < len(cmap) and cmap[cid - 1] is not None:
                c = cmap[cid - 1]
            else:
                c = cat_idx.get(cid, cid)
            if use_segments and ann.get("segmentation"):
                seg = np.asarray(ann["segmentation"][0], dtype=np.float64).reshape(-1, 2)
                seg[:, 0] /= w
                seg[:, 1] /= h
                lines.append(f"{c} " + " ".join(f"{v:.6f}" for v in seg.reshape(-1)))
            else:
                x, y, bw, bh = ann["bbox"]
                cx, cy = (x + bw / 2) / w, (y + bh / 2) / h
                lines.append(f"{c} {cx:.6f} {cy:.6f} {bw / w:.6f} {bh / h:.6f}")
        stem = Path(img["file_name"]).stem
        (save_dir / "labels" / f"{stem}.txt").write_text("\n".join(lines) + "\n")
    return save_dir


def yolo_bbox2segment(labels_dir: str | Path, save_dir: str | Path) -> Path:
    """Detect labels -> rectangle-polygon segment labels (reference
    converter.py yolo_bbox2segment, without the SAM refinement)."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    for f in sorted(Path(labels_dir).glob("*.txt")):
        lines = []
        for line in f.read_text().splitlines():
            parts = line.split()
            if len(parts) < 5:
                continue
            c, cx, cy, w, h = parts[0], *map(float, parts[1:5])
            x1, y1, x2, y2 = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
            lines.append(f"{c} {x1:.6f} {y1:.6f} {x2:.6f} {y1:.6f} {x2:.6f} {y2:.6f} {x1:.6f} {y2:.6f}")
        (save_dir / f.name).write_text("\n".join(lines) + "\n")
    return save_dir


def split_dota_image(img: np.ndarray, labels: np.ndarray, crop_size: int = 1024,
                     gap: int = 200, keep_frac: float = 0.7):
    """Tile one large aerial image into overlapping crops, reassigning OBB
    labels to tiles (reference data/split_dota.py).

    labels: (n, 9) = cls + 4 corners in pixels. Yields (tile, tile_labels,
    (x0, y0)); labels normalized to tile coords, filtered by the fraction of
    the box area inside the tile.
    """
    h, w = img.shape[:2]
    stride = crop_size - gap
    xs = list(range(0, max(w - crop_size, 0) + 1, stride)) or [0]
    ys = list(range(0, max(h - crop_size, 0) + 1, stride)) or [0]
    if xs[-1] + crop_size < w:
        xs.append(w - crop_size)
    if ys[-1] + crop_size < h:
        ys.append(h - crop_size)
    for y0 in ys:
        for x0 in xs:
            tile = img[y0 : y0 + crop_size, x0 : x0 + crop_size]
            keep = []
            for row in labels:
                pts = row[1:9].reshape(4, 2)
                area = _poly_area(pts)
                clipped = np.clip(pts - [x0, y0], 0, crop_size)
                if area <= 0:
                    continue
                if _poly_area(clipped) / area >= keep_frac:
                    keep.append(np.concatenate([[row[0]], (pts - [x0, y0]).reshape(-1)]))
            yield tile, (np.stack(keep) if keep else np.zeros((0, 9), np.float32)), (x0, y0)


def _poly_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1))))
