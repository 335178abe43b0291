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
                           imgsz: int = 160, max_objs: int = 3, seed: int = 0) -> str:
    """Write a YOLO-format dataset; returns the dataset YAML path."""
    root = Path(root)
    rng = np.random.default_rng(seed)
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
                cx = int(rng.integers(size // 2 + 2, imgsz - size // 2 - 2))
                cy = int(rng.integers(size // 2 + 2, imgsz - size // 2 - 2))
                color = tuple(int(c) for c in rng.integers(150, 256, 3))
                x1, y1 = cx - size // 2, cy - size // 2
                x2, y2 = cx + size // 2, cy + size // 2
                if cls == 0:
                    cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
                elif cls == 1:
                    cv2.circle(img, (cx, cy), size // 2, color, -1)
                else:
                    pts = np.asarray([[cx, y1], [x1, y2], [x2, y2]])
                    cv2.fillPoly(img, [pts], color)
                lines.append(f"{cls} {cx/imgsz:.6f} {cy/imgsz:.6f} {size/imgsz:.6f} {size/imgsz:.6f}")
            cv2.imwrite(str(img_dir / f"{i:04d}.jpg"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            (lbl_dir / f"{i:04d}.txt").write_text("\n".join(lines) + "\n")
    d = {
        "path": str(root),
        "train": "images/train",
        "val": "images/val",
        "names": dict(enumerate(CLASSES)),
        "nc": len(CLASSES),
    }
    yaml_path = root / "data.yaml"
    yaml_path.write_text(yaml.safe_dump(d))
    return str(yaml_path)
