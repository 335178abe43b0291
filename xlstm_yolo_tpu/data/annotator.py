"""Auto-annotation: detector proposes boxes, SAM turns them into polygons
(reference ``data/annotator.py`` auto_annotate: YOLO det -> SAM box prompts
-> segment label txts).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def _mask_to_polygon(mask: np.ndarray, max_points: int = 200) -> np.ndarray:
    """Largest external contour of a bool mask, normalized xy (N, 2)."""
    import cv2

    m = (mask.astype(np.uint8)) * 255
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return np.zeros((0, 2), np.float32)
    c = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
    if len(c) > max_points:
        c = c[:: len(c) // max_points + 1]
    h, w = mask.shape
    return c / np.asarray([w, h], np.float32)


def auto_annotate(source, det_model, sam_predictor, output_dir: str | Path | None = None,
                  conf: float = 0.25, max_det: int = 32) -> list:
    """Annotate images with segment labels (reference data/annotator.py:9).

    source: image path / dir / list of paths; det_model: an engine Model
    (or anything with ``.predict``); sam_predictor: models_sam.SAMPredictor
    (weights supplied by the caller). Writes YOLO-segment txts
    (``cls x1 y1 x2 y2 ...`` normalized) to output_dir and returns the
    written paths.
    """
    import cv2

    paths: list[Path]
    p = Path(source) if isinstance(source, (str, Path)) else None
    if p is not None and p.is_dir():
        paths = sorted(q for q in p.iterdir()
                       if q.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp"))
    elif p is not None:
        paths = [p]
    else:
        paths = [Path(s) for s in source]
    out_dir = Path(output_dir) if output_dir else (paths[0].parent / "auto_annotate_labels")
    out_dir.mkdir(parents=True, exist_ok=True)

    written = []
    for img_path in paths:
        img = cv2.cvtColor(cv2.imread(str(img_path)), cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        results = det_model.predict(img, conf=conf, verbose=False)
        r = results[0]
        boxes = np.asarray(r.boxes.xyxy) if len(r.boxes) else np.zeros((0, 4))
        clses = np.asarray(r.boxes.cls).astype(int) if len(r.boxes) else np.zeros(0, int)
        lines = []
        sam_predictor.set_image(img)
        for box, c in zip(boxes[:max_det], clses[:max_det]):
            masks, iou = sam_predictor.predict(boxes=box, multimask_output=False)
            poly = _mask_to_polygon(masks[0])
            if len(poly) >= 3:
                coords = " ".join(f"{v:.6f}" for v in poly.reshape(-1))
                lines.append(f"{int(c)} {coords}")
        out = out_dir / f"{img_path.stem}.txt"
        out.write_text("\n".join(lines) + ("\n" if lines else ""))
        written.append(out)
    return written
