"""Additional model families: FastSAM (prompted everything-segmentation) and
YOLOWorld (open-vocabulary detection).

FastSAM (reference ``models/fastsam/``): a single-class YOLOv8-seg run as an
"everything" segmenter + host-side prompt filtering (boxes / points / text).
The text prompt path accepts precomputed text embeddings: in the reference it
calls the CLIP package at runtime; in a zero-egress deployment you embed the
vocabulary offline and pass the vectors in.

YOLOWorld (reference ``models/yolo/world/`` + ``nn/tasks.py:737`` WorldModel):
vision-language detection where class logits are similarities between image
features and text embeddings (ContrastiveHead). The text encoder is external
(precomputed embeddings), matching how the exported reference models embed
their vocabulary.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .nn.modules import C2f, ConvBN


# ---------------------------------------------------------------------------
# FastSAM
# ---------------------------------------------------------------------------

class FastSAM:
    """Everything-segmentation + prompt filtering (reference
    models/fastsam/model.py + predict.py:14)."""

    def __init__(self, model=None, variables=None, imgsz: int = 640):
        from .nn.tasks import TaskModel

        self.model = model or TaskModel("yolov8s-seg.yaml", nc=1)
        self.variables = variables
        self.imgsz = imgsz

    def everything(self, variables, img, conf: float = 0.4, iou: float = 0.9,
                   max_det: int = 100):
        """Run the segmenter; returns (dets (B, max_det, 6), valid, masks
        (B, max_det, Hm, Wm) binary)."""
        from .ops.nms import non_max_suppression

        full = jax.jit(self.model.predictions_full)(variables, img)
        # exact payload re-association: return_idx gives the SOURCE candidate
        # index of every kept detection, so mask coefficients match their
        # boxes even for overlapping same-class instances (the seg validator's
        # path; replaces a nearest-center heuristic that could swap masks —
        # reference keeps payloads inline in the ragged det tensor,
        # /root/reference/models/fastsam/predict.py:14-86)
        dets, valid, src = non_max_suppression(
            full["cands"], conf_thres=conf, iou_thres=iou, max_det=max_det,
            return_idx=True)
        dets_np, valid_np = np.asarray(dets), np.asarray(valid)
        masks = self.masks_from_src(
            np.asarray(full["coefs"]), np.asarray(full["proto"]),
            valid_np, np.asarray(src))
        return dets_np, valid_np, masks

    @staticmethod
    def masks_from_src(coefs, proto, valid, src):
        """Decode binary masks for NMS-kept detections from their SOURCE
        candidate coefficients. coefs (B, N, nm), proto (B, Hm, Wm, nm),
        valid/src (B, max_det) -> (B, max_det, Hm, Wm) bool."""
        masks = np.zeros((src.shape[0], src.shape[1], proto.shape[1], proto.shape[2]), bool)
        for bi in range(src.shape[0]):
            pm = proto[bi].reshape(-1, coefs.shape[-1]).T
            for di in range(src.shape[1]):
                if not valid[bi, di] or src[bi, di] < 0:
                    continue
                m = 1 / (1 + np.exp(-(coefs[bi, src[bi, di]] @ pm)))
                masks[bi, di] = (m > 0.5).reshape(proto.shape[1], proto.shape[2])
        return masks

    # -- prompts (reference FastSAMPredictor.prompt) --------------------------
    @staticmethod
    def box_prompt(dets, valid, masks, box, iou_thres: float = 0.5):
        """Keep instances whose box IoU with the prompt box exceeds thres."""
        from .utils.metrics import box_iou_np

        keep = []
        for di in range(len(dets)):
            if not valid[di]:
                continue
            iou = box_iou_np(np.asarray([box], np.float32), dets[di : di + 1, :4])[0, 0]
            if iou > iou_thres:
                keep.append(di)
        return keep

    @staticmethod
    def point_prompt(dets, valid, masks, points, labels=None, img_shape=None, mask_shape=None):
        """Keep instances whose mask contains the prompt point(s)."""
        keep = []
        mh, mw = masks.shape[1:3]
        ih, iw = img_shape if img_shape else (mh, mw)
        for di in range(len(dets)):
            if not valid[di]:
                continue
            for pi, (px, py) in enumerate(points):
                inside = masks[di, int(py * mh / ih), int(px * mw / iw)]
                want = True if labels is None else bool(labels[pi])
                if inside == want and inside:
                    keep.append(di)
                    break
        return keep

    @staticmethod
    def text_prompt(crop_embeddings: np.ndarray, text_embedding: np.ndarray, topk: int = 1):
        """Rank instances by cosine similarity of their crop embeddings to a
        text embedding (embeddings computed offline — the reference calls
        CLIP here)."""
        c = crop_embeddings / np.clip(np.linalg.norm(crop_embeddings, axis=-1, keepdims=True), 1e-7, None)
        t = text_embedding / np.clip(np.linalg.norm(text_embedding), 1e-7, None)
        sims = c @ t
        return np.argsort(-sims)[:topk].tolist()


# YOLOWorld blocks live in nn/world.py (graph-registered); re-exported here
# for back-compat.
from .nn.world import (  # noqa: E402,F401
    C2fAttn, ContrastiveHead, MaxSigmoidAttnBlock, WorldDetectHead,
)
