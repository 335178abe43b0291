"""Text-conditioned (open-vocabulary) training data — YOLOWorld support.

TPU-native equivalents of the reference's multimodal data stack:

  * ``RandomLoadText``      — reference ``data/augment.py:2143``: sample the
    positive class texts present in an image plus random negatives, remap
    label class ids into the sampled-text index space.
  * ``MultiModalDataset``   — reference ``data/dataset.py:251``
    (YOLOMultiModalDataset): a YOLODataset whose labels carry per-class
    texts derived from the dataset ``names`` (synonyms joined with "/").
  * ``GroundingDataset``    — reference ``data/dataset.py:283``: detection
    labels from a grounding JSON (per-image ``caption`` + per-annotation
    ``tokens_positive`` character spans).

Static-shape discipline: texts are always padded to ``max_samples`` slots
(padding slots get ``padding_value`` and never receive labels), so the
embedded guide tensor is a fixed (B, max_samples, C) and one XLA program
serves every batch. The text -> vector encoder is pluggable (``embed_fn``,
e.g. a CLIP text tower); batches carry ``texts`` (list of B lists of
max_samples strings) and, when an ``embed_fn`` is given, ``txt_feats``.
"""
from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

import numpy as np

from .dataset import YOLODataset


class RandomLoadText:
    """Sample positive + negative class texts; remap cls ids to text slots.

    Mirrors reference data/augment.py:2143 — one synonym is chosen per class,
    positives keep their instances, negatives are distractor texts.
    """

    def __init__(self, prompt_format: str = "{}", neg_samples: tuple = (80, 80),
                 max_samples: int = 80, padding: bool = True,
                 padding_value: str = "", seed: int | None = None):
        self.prompt_format = prompt_format
        self.neg_samples = neg_samples
        self.max_samples = max_samples
        self.padding = padding
        self.padding_value = padding_value
        self.rng = np.random.default_rng(seed)

    def __call__(self, cls: np.ndarray, texts: list) -> tuple:
        """cls (n,) int class ids; texts: per-class synonym lists.

        Returns (new_cls (n,), sampled_texts: list[str]) with new_cls indexing
        into sampled_texts; unsampled-positive instances never occur (all
        positives are kept, as in the reference).
        """
        cls = np.asarray(cls, np.int64).reshape(-1)
        pos = sorted(set(int(c) for c in cls))
        num_neg = int(self.rng.integers(self.neg_samples[0], self.neg_samples[1] + 1))
        neg_pool = [i for i in range(len(texts)) if i not in pos]
        self.rng.shuffle(neg_pool)
        keep = min(len(pos), self.max_samples)
        chosen = pos[:keep] + neg_pool[: min(len(neg_pool), num_neg, self.max_samples - keep)]
        remap = {c: i for i, c in enumerate(chosen)}

        out_texts = []
        for c in chosen:
            syn = texts[c]
            pick = syn[int(self.rng.integers(len(syn)))] if len(syn) > 1 else syn[0]
            out_texts.append(self.prompt_format.format(pick))
        if self.padding:
            out_texts += [self.padding_value] * (self.max_samples - len(out_texts))

        new_cls = np.asarray([remap.get(int(c), -1) for c in cls], np.float32)
        return new_cls, out_texts


def names_to_texts(names: dict) -> list:
    """Dataset ``names`` {idx: "name"} -> per-class synonym lists; the
    reference concatenates synonyms with "/" (data/dataset.py:270)."""
    return [str(names[k]).split("/") for k in sorted(names)]


class MultiModalDataset(YOLODataset):
    """YOLODataset emitting per-batch sampled texts (+ optional embeddings).

    embed_fn: list[str] -> (n, C) array (a CLIP-style text tower); applied
    per unique batch text set so the collated batch carries ``txt_feats``
    (B, max_samples, C) ready to feed TaskModel's guide input.
    """

    def __init__(self, img_path: str, names: dict, *, text_cfg: dict | None = None,
                 embed_fn=None, **kw):
        super().__init__(img_path, **kw)
        self.texts = names_to_texts(names)
        cfg = dict(neg_samples=(min(80, max(1, len(self.texts) - 1)),) * 2,
                   max_samples=min(80, len(self.texts)))
        cfg.update(text_cfg or {})
        self.loader_text = RandomLoadText(**cfg)
        self.embed_fn = embed_fn

    def collate_native(self, idxs):
        batch = super().collate_native(idxs)
        return self._attach_texts(batch)

    def collate(self, samples, idxs=None):
        batch = super().collate(samples, idxs)
        return self._attach_texts(batch)

    def _attach_texts(self, batch):
        if batch is None:
            return batch
        cb, mask = np.asarray(batch["cls_boxes"]), np.asarray(batch["mask"])
        all_texts = []
        for bi in range(cb.shape[0]):
            cls = cb[bi, mask[bi], 0]
            new_cls, texts = self.loader_text(cls, self.texts)
            cb[bi, mask[bi], 0] = new_cls
            # drop instances whose class fell outside the sampled slots
            drop = np.zeros(mask.shape[1], bool)
            drop[np.flatnonzero(mask[bi])[new_cls < 0]] = True
            mask[bi] &= ~drop
            all_texts.append(texts)
        batch["cls_boxes"], batch["mask"] = cb, mask
        batch["texts"] = all_texts
        if self.embed_fn is not None:
            flat = [t for ts in all_texts for t in ts]
            emb = np.asarray(self.embed_fn(flat), np.float32)
            batch["txt_feats"] = emb.reshape(len(all_texts), -1, emb.shape[-1])
        return batch


class GroundingDataset(YOLODataset):
    """Grounding-JSON detection dataset (reference data/dataset.py:283).

    JSON schema: {"images": [{id, height, width, file_name, caption}],
    "annotations": [{image_id, bbox (COCO xywh), iscrowd, tokens_positive}]}.
    Per-image phrase vocabularies become the texts; cls ids index them.
    """

    def __init__(self, img_path: str, json_file: str, **kw):
        self.json_file = json_file
        super().__init__(img_path, **kw)

    def _scan(self, img_path):
        images, anns = self._read_json()
        files = []
        self._grounding = {}
        for img_id, img in images.items():
            f = Path(img_path) / img["file_name"]
            if not f.exists() or img_id not in anns:
                continue
            files.append(str(f))
            self._grounding[str(f)] = (img, anns[img_id])
        return files

    def _read_json(self):
        with open(self.json_file) as fh:
            data = json.load(fh)
        images = {int(x["id"]): x for x in data["images"]}
        img_to_anns = defaultdict(list)
        for ann in data["annotations"]:
            img_to_anns[int(ann["image_id"])].append(ann)
        return images, img_to_anns

    def _load_label(self, img_file: str):
        img, anns = self._grounding[img_file]
        h, w = float(img["height"]), float(img["width"])
        caption = img["caption"]
        cat2id, texts, cls, boxes = {}, [], [], []
        for ann in anns:
            if ann.get("iscrowd"):
                continue
            x, y, bw, bh = map(float, ann["bbox"])
            if bw <= 0 or bh <= 0:
                continue
            phrase = " ".join(caption[t[0]:t[1]] for t in ann["tokens_positive"])
            if phrase not in cat2id:
                cat2id[phrase] = len(cat2id)
                texts.append([phrase])
            cls.append(cat2id[phrase])
            boxes.append([(x + bw / 2) / w, (y + bh / 2) / h, bw / w, bh / h])
        n = len(cls)
        return {
            "cls": np.asarray(cls, np.float32).reshape(n),
            "xywhn": np.asarray(boxes, np.float32).reshape(n, 4),
            "texts": texts,
        }
