"""Plotting: batch mosaics, training curves, PR curves, confusion matrix,
label statistics (reference ``utils/plotting.py``, 1405 LoC). matplotlib Agg
backend; every function writes a file and returns its path.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_images(batch: dict, names: dict | None = None, fname: str | Path = "batch.jpg",
                max_images: int = 16) -> Path:
    """Annotated grid of a training batch (reference plot_images)."""
    import cv2

    imgs = batch["img"][:max_images]
    n = len(imgs)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    sz = imgs.shape[1]
    canvas = np.full((rows * sz, cols * sz, 3), 255, np.uint8)
    for i in range(n):
        r, c = divmod(i, cols)
        img = (np.asarray(imgs[i]) * 255).astype(np.uint8).copy()
        boxes = np.asarray(batch["cls_boxes"][i])
        mask = np.asarray(batch["mask"][i])
        for (cls, x1, y1, x2, y2), m in zip(boxes[:, :5], mask):
            if not m:
                continue
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), (255, 64, 64), 1)
            label = (names or {}).get(int(cls), str(int(cls)))
            cv2.putText(img, str(label), (int(x1), max(int(y1) - 2, 8)), 0, 0.4, (255, 64, 64), 1)
        canvas[r * sz : (r + 1) * sz, c * sz : (c + 1) * sz] = img
    fname = Path(fname)
    fname.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(fname), cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
    return fname


def plot_results(csv_file: str | Path, fname: str | Path | None = None) -> Path:
    """Training curves from results.csv (reference plot_results)."""
    import csv

    csv_file = Path(csv_file)
    with open(csv_file) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        raise ValueError(f"empty csv {csv_file}")
    keys = [k for k in rows[0] if k not in ("epoch",) and _is_num(rows[0][k])]
    n = len(keys)
    cols = min(4, n)
    r = int(np.ceil(n / cols))
    fig, axes = plt.subplots(r, cols, figsize=(4 * cols, 3 * r), squeeze=False)
    epochs = [int(float(row["epoch"])) for row in rows]
    for i, k in enumerate(keys):
        ax = axes[i // cols][i % cols]
        ax.plot(epochs, [float(row[k] or 0) for row in rows], marker=".")
        ax.set_title(k, fontsize=9)
    for j in range(n, r * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    fname = Path(fname or csv_file.with_name("results.png"))
    fig.savefig(fname, dpi=120)
    plt.close(fig)
    return fname


def plot_pr_curve(px: np.ndarray, py: np.ndarray, ap: np.ndarray, names: dict | None = None,
                  fname: str | Path = "PR_curve.png") -> Path:
    """Per-class PR curves (reference plot_pr_curve)."""
    fig, ax = plt.subplots(figsize=(6, 5))
    for i in range(py.shape[0]):
        label = (names or {}).get(i, str(i))
        ax.plot(px, py[i], label=f"{label} {ap[i]:.3f}", linewidth=1)
    ax.plot(px, py.mean(0), color="black", linewidth=2,
            label=f"all classes {ap.mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(fontsize=7)
    fname = Path(fname)
    fname.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(fname, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return fname


def smooth(y: np.ndarray, f: float = 0.05) -> np.ndarray:
    """Box filter of fraction f (reference utils/metrics.py:446)."""
    nf = round(len(y) * f * 2) // 2 + 1
    p = np.ones(nf // 2)
    yp = np.concatenate((p * y[0], y, p * y[-1]), 0)
    return np.convolve(yp, np.ones(nf) / nf, mode="valid")


def plot_mc_curve(px: np.ndarray, py: np.ndarray, fname: str | Path = "mc_curve.png",
                  names: dict | None = None, xlabel: str = "Confidence",
                  ylabel: str = "Metric") -> Path:
    """Metric-confidence curve — the F1/P/R_curve.png family (reference
    plot_mc_curve, utils/metrics.py:481). py: (nc, n) per-class curves."""
    fig, ax = plt.subplots(figsize=(6, 5))
    if 0 < py.shape[0] < 21:
        for i in range(py.shape[0]):
            ax.plot(px, py[i], linewidth=1, label=(names or {}).get(i, str(i)))
    else:
        ax.plot(px, py.T, linewidth=1, color="grey")
    y = smooth(py.mean(0), 0.05) if py.shape[0] else np.zeros_like(px)
    ax.plot(px, y, linewidth=3, color="blue",
            label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(fontsize=7)
    ax.set_title(f"{ylabel}-Confidence Curve")
    fname = Path(fname)
    fname.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(fname, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return fname


def plot_confusion_matrix(matrix: np.ndarray, names: dict | None = None,
                          fname: str | Path = "confusion_matrix.png", normalize: bool = True,
                          background: bool = True) -> Path:
    """Confusion-matrix heatmap (reference ConfusionMatrix.plot).
    background=False for classify matrices (no background row/col)."""
    m = matrix.astype(np.float64)
    if normalize:
        m = m / np.clip(m.sum(0, keepdims=True), 1, None)
    nc = m.shape[0] - (1 if background else 0)
    labels = [(names or {}).get(i, str(i)) for i in range(nc)] + (
        ["background"] if background else [])
    fig, ax = plt.subplots(figsize=(max(5, nc * 0.6), max(4, nc * 0.5)))
    im = ax.imshow(m, cmap="Blues", vmin=0)
    ax.set_xticks(range(len(labels)))
    ax.set_yticks(range(len(labels)))
    ax.set_xticklabels(labels, rotation=90, fontsize=7)
    ax.set_yticklabels(labels, fontsize=7)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    fig.colorbar(im)
    fname = Path(fname)
    fname.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(fname, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return fname


def plot_labels(cls: np.ndarray, boxes_xywhn: np.ndarray, names: dict | None = None,
                fname: str | Path = "labels.png") -> Path:
    """Label statistics: class histogram + box center/size scatter
    (reference plot_labels)."""
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    axes[0].hist(cls, bins=max(int(cls.max()) + 1 if len(cls) else 1, 1))
    axes[0].set_title("classes")
    if len(boxes_xywhn):
        axes[1].scatter(boxes_xywhn[:, 0], boxes_xywhn[:, 1], s=3, alpha=0.5)
        axes[1].set_title("centers (x, y)")
        axes[2].scatter(boxes_xywhn[:, 2], boxes_xywhn[:, 3], s=3, alpha=0.5)
        axes[2].set_title("sizes (w, h)")
    for ax in axes[1:]:
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
    fname = Path(fname)
    fname.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(fname, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return fname


def feature_visualization(feats, fname: str | Path = "features.png", n: int = 16) -> Path:
    """Feature-map channel grid (reference feature_visualization)."""
    f = np.asarray(feats)
    if f.ndim == 4:
        f = f[0]
    c = min(n, f.shape[-1])
    cols = int(np.ceil(np.sqrt(c)))
    rows = int(np.ceil(c / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 1.5, rows * 1.5), squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i < c:
            ax.imshow(f[..., i], cmap="viridis")
    fname = Path(fname)
    fname.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(fname, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return fname


def _is_num(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False
