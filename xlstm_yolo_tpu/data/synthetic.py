"""Synthetic tiny datasets for tests and smoke training.

The reference relies on the coco8 download fixtures (cfg/datasets/coco8.yaml);
in a zero-egress environment we generate an equivalent tiny YOLO-format
dataset on disk: colored shapes on textured backgrounds, classes =
shape type. A model that trains correctly overfits it within a few dozen
steps, which gives the integration tests a real learnability signal.
"""
from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np
import yaml

CLASSES = ["rect", "circle", "triangle"]


def make_synthetic_dataset(root: str | Path, n_train: int = 8, n_val: int = 4,
                           imgsz: int = 160, max_objs: int = 3, seed: int = 0,
                           task: str = "detect") -> str:
    """Write a YOLO-format dataset for any task; returns the dataset YAML path.

    Label formats match the reference conventions: detect = xywhn, segment =
    normalized polygons, pose = xywhn + 5 keypoints (corners + center),
    obb = 4 normalized corners of a rotated rectangle.
    """
    root = Path(root)
    rng = np.random.default_rng(seed)
    kpt_shape = (5, 3)
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        img_dir.mkdir(parents=True, exist_ok=True)
        lbl_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (rng.integers(0, 60, (imgsz, imgsz, 3))).astype(np.uint8) + 60
            lines = []
            for _ in range(int(rng.integers(1, max_objs + 1))):
                cls = int(rng.integers(len(CLASSES)))
                size = int(rng.integers(imgsz // 8, imgsz // 3))
                cx = int(rng.integers(size // 2 + 6, imgsz - size // 2 - 6))
                cy = int(rng.integers(size // 2 + 6, imgsz - size // 2 - 6))
                color = tuple(int(c) for c in rng.integers(150, 256, 3))
                x1, y1 = cx - size // 2, cy - size // 2
                x2, y2 = cx + size // 2, cy + size // 2
                if task == "obb":
                    ang = float(rng.uniform(-60, 60))
                    rect = ((cx, cy), (size, size * 0.6), ang)
                    corners = cv2.boxPoints(rect)
                    cv2.fillPoly(img, [corners.astype(np.int32)], color)
                    flat = " ".join(f"{v/imgsz:.6f}" for v in corners.reshape(-1))
                    lines.append(f"{cls} {flat}")
                    continue
                if cls == 0:
                    poly = np.asarray([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32)
                    cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
                elif cls == 1:
                    th = np.linspace(0, 2 * np.pi, 13)[:-1]
                    poly = np.stack([cx + size / 2 * np.cos(th), cy + size / 2 * np.sin(th)], -1).astype(np.float32)
                    cv2.circle(img, (cx, cy), size // 2, color, -1)
                else:
                    poly = np.asarray([[cx, y1], [x1, y2], [x2, y2]], np.float32)
                    cv2.fillPoly(img, [poly.astype(np.int32)], color)
                if task == "segment":
                    flat = " ".join(f"{v/imgsz:.6f}" for v in poly.reshape(-1))
                    lines.append(f"{cls} {flat}")
                elif task == "pose":
                    kpts = [(x1, y1, 2), (x2, y1, 2), (x2, y2, 2), (x1, y2, 2), (cx, cy, 2)]
                    flat = " ".join(f"{x/imgsz:.6f} {y/imgsz:.6f} {v}" for x, y, v in kpts)
                    lines.append(f"0 {cx/imgsz:.6f} {cy/imgsz:.6f} {size/imgsz:.6f} {size/imgsz:.6f} {flat}")
                else:
                    lines.append(f"{cls} {cx/imgsz:.6f} {cy/imgsz:.6f} {size/imgsz:.6f} {size/imgsz:.6f}")
            cv2.imwrite(str(img_dir / f"{i:04d}.jpg"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            (lbl_dir / f"{i:04d}.txt").write_text("\n".join(lines) + "\n")
    nc = 1 if task == "pose" else len(CLASSES)
    names = {0: "person"} if task == "pose" else dict(enumerate(CLASSES))
    d = {
        "path": str(root),
        "train": "images/train",
        "val": "images/val",
        "names": names,
        "nc": nc,
    }
    if task == "pose":
        d["kpt_shape"] = list(kpt_shape)
    yaml_path = root / "data.yaml"
    yaml_path.write_text(yaml.safe_dump(d))
    return str(yaml_path)
