"""Task models: thin stateless wrappers binding a compiled graph to task logic.

Re-design of reference ``nn/tasks.py`` (BaseModel :112, DetectionModel :318).
A TaskModel holds the parsed graph + flax module + static metadata (strides,
nc, task); parameters live outside the object as pytrees (functional style),
so the same model object serves init / train / eval / export.

Strides are derived with ``jax.eval_shape`` (abstract — zero FLOPs) at
imgsz=512, mirroring the fork's 512 stride probe (nn/tasks.py:353, upstream
uses 256).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import load_model_yaml
from . import heads as H
from . import vil_blocks  # noqa: F401  (registers ViL YAML blocks)
from .graph import GraphModel, ParsedModel, parse_model


class TaskModel:
    """A compiled model graph + task metadata. Parameters are external pytrees."""

    def __init__(self, cfg: str | dict, ch: int = 3, nc: int | None = None, scale: str | None = None,
                 verbose: bool = False):
        self.cfg_name = cfg if isinstance(cfg, str) else None
        if isinstance(cfg, (str,)):
            self.yaml, yscale = load_model_yaml(cfg)
            scale = scale or yscale
        else:
            self.yaml = dict(cfg)
        if nc is not None:
            self.yaml["nc"] = nc
        self.scale = scale
        self.parsed: ParsedModel = parse_model(self.yaml, ch=ch, scale=scale, verbose=verbose)
        self.module = GraphModel(self.parsed)
        self.nc = self.parsed.nc
        self.task = self.parsed.task
        self.reg_max = 16
        self.ch = ch
        self.e2e = self.parsed.specs[self.parsed.head_index].name == "v10Detect" \
            if self.parsed.head_index >= 0 else False
        if self.task == "world":
            # default text embeddings (reference WorldModel.txt_feats randn
            # buffer, nn/tasks.py:747); replace via set_classes()
            embed = int(self.parsed.specs[self.parsed.head_index].args[0])
            self.txt_feats = jax.random.normal(jax.random.PRNGKey(0), (1, self.parsed.nc, embed))
        else:
            self.txt_feats = None
        self.strides = self._probe_strides()
        self.names = {i: f"{i}" for i in range(self.nc)}

    def set_classes(self, embeddings, encoder=None) -> None:
        """Swap the open-vocabulary text embeddings (reference
        WorldModel.set_classes, nn/tasks.py:752).

        embeddings: precomputed CLIP text vectors — (nt, embed) or
        (1, nt, embed) — or a list of class STRINGS, encoded in-framework by
        ``encoder`` (``nn.clip_text.ClipTextEncoder`` or any
        ``list[str] -> (nt, embed)`` callable; the reference's clip.tokenize
        + encode_text path, nn/tasks.py:746-763). nt becomes nc."""
        names = None
        if isinstance(embeddings, (list, tuple)) and embeddings and isinstance(embeddings[0], str):
            if encoder is None:
                raise ValueError(
                    "set_classes received strings but no text encoder; pass "
                    "encoder=ClipTextEncoder(...) (nn/clip_text.py) or "
                    "precomputed embeddings")
            names = {i: t for i, t in enumerate(embeddings)}
            embeddings = encoder(list(embeddings))
        e = jnp.asarray(embeddings, jnp.float32)
        if e.ndim == 2:
            e = e[None]
        self.txt_feats = e / jnp.clip(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-6, None)
        self.nc = int(e.shape[1])
        self.names = names or {i: f"{i}" for i in range(self.nc)}

    def enable_pipeline(self, mesh, microbatches: int = 0) -> int:
        """Turn on pipeline parallelism for this model's ViL trunk.

        Rewrites every ViLBlockPairBlock spec to the stacked-parameter GPipe
        layout (nn/vil_blocks.py) over ``mesh``'s pp axis and rebuilds the
        graph module. Must be called BEFORE init() — the parameter tree
        changes (per-pair subtrees become one stacked 'pairs' tree). Returns
        the number of pipelined blocks (0 = model has no ViL stages; the pp
        axis then only replicates). A capability the reference lacks
        (SURVEY.md §2.11: its trainer is DP-only, engine/trainer.py:198-229).
        """
        import dataclasses

        pp = int(mesh.shape.get("pp", 1))
        count = 0
        specs = []
        for s in self.parsed.specs:
            if s.name == "ViLBlockPairBlock" and pp > 1:
                kw = dict(s.kwargs)
                n = int(kw.get("n", 1))
                if n % pp:
                    raise ValueError(
                        f"layer {s.i}: {n} ViL pairs not divisible by pp={pp} "
                        f"(pick a model scale with n % pp == 0)")
                kw.update(pp_stages=pp, pp_microbatches=int(microbatches),
                          pp_mesh=mesh)
                s = dataclasses.replace(s, kwargs=tuple(kw.items()))
                count += 1
            specs.append(s)
        self.parsed = dataclasses.replace(self.parsed, specs=tuple(specs))
        self.module = GraphModel(self.parsed)
        return count

    # -- construction ---------------------------------------------------------
    def _probe_strides(self, imgsz: int = 512) -> tuple:
        """Abstract forward to find detection-scale strides (fork probes at 512)."""
        if self.task in ("classify", "rtdetr"):
            return () if self.task == "classify" else (8, 16, 32)
        dummy = jnp.zeros((1, imgsz, imgsz, self.ch), jnp.float32)
        guide = self.txt_feats

        def fwd(x):
            variables = self.module.init(jax.random.PRNGKey(0), x, train=False, guide=guide)
            return self.module.apply(variables, x, train=False, guide=guide)

        out = jax.eval_shape(fwd, dummy)
        if isinstance(out, dict):
            det = out.get("det") or out.get("one2one")
        else:
            det = out
        from . import heads as H

        return tuple(imgsz // H.map_shape(m)[1] for m in det)

    def init(self, key: jax.Array | int = 0, imgsz: int = 64) -> dict:
        """Initialize variables ({'params': ..., 'batch_stats': ...})."""
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        dummy = jnp.zeros((1, imgsz, imgsz, self.ch), jnp.float32)
        head_kwargs = None
        if self.task == "rtdetr":
            # touch the cdn path so denoising_class_embed params exist
            dn_cls = jnp.zeros((1, 6), jnp.int32)
            dn_box = jnp.full((1, 6, 4), 0.5, jnp.float32)
            head_kwargs = {"dn": (dn_cls, dn_box, 3)}
        return self.module.init(key, dummy, train=False, head_kwargs=head_kwargs,
                                guide=self.txt_feats)

    # -- forward --------------------------------------------------------------
    def apply(self, variables: dict, x: jnp.ndarray, train: bool = False, mutable: Sequence[str] | bool = False):
        return self.module.apply(variables, x, train=train, mutable=mutable,
                                 guide=self.txt_feats)

    def raw_forward(self, variables: dict, x: jnp.ndarray, guide=None):
        """Eval-mode forward returning the head's raw output."""
        guide = guide if guide is not None else self.txt_feats
        return self.module.apply(variables, x, train=False, guide=guide)

    def predictions(self, variables: dict, x: jnp.ndarray) -> jnp.ndarray:
        """Eval forward -> decoded (B, N, 4+nc) candidates (pixel xywh + scores)."""
        out = self.raw_forward(variables, x)
        if isinstance(out, dict):
            det = out.get("det") or out.get("one2one")
        else:
            det = out
        return H.decode_detections(det, self.strides, self.nc, self.reg_max)

    def predictions_full(self, variables: dict, x: jnp.ndarray) -> dict:
        """Eval forward -> task-specific decoded outputs (all static shape):
        detect:  {"cands": (B, N, 4+nc)}
        segment: + {"coefs": (B, N, nm), "proto": (B, Hm, Wm, nm)}
        pose:    + {"kpts": (B, N, nk*nd)} pixel coords
        obb:     {"cands": (B, N, 5+nc)} (cxcywh + scores + angle -> nms_rotated)
        classify:{"probs": (B, nc)}
        """
        out = self.raw_forward(variables, x)
        if self.task == "rtdetr":
            from . import rtdetr as R

            dets = R.rtdetr_postprocess(out, float(x.shape[1]))
            return {"dets": dets}
        if self.task == "classify":
            return {"probs": jax.nn.softmax(out, axis=-1)}
        if self.task == "obb":
            cands = H.decode_obb(out["det"], out["angle"], self.strides, self.nc, self.reg_max)
            # reorder to nms_rotated layout: cxcywh, scores..., angle is last already
            return {"cands": cands}
        det = out["det"] if isinstance(out, dict) else out
        res = {"cands": H.decode_detections(det, self.strides, self.nc, self.reg_max)}
        if self.task == "segment":
            b = x.shape[0]
            res["coefs"] = jnp.concatenate(
                [m.reshape(b, -1, m.shape[-1]) for m in out["coefs"]], axis=1
            )
            res["proto"] = out["proto"]
        elif self.task == "pose":
            kpt_shape = self._head_attr("kpt_shape", (17, 3))
            res["kpts"] = H.decode_keypoints(out["kpts"], self.strides, tuple(kpt_shape))
        return res

    def loss(self, variables: dict, batch: dict, hyp: Any = None, train: bool = True):
        """Train-mode forward + task loss (dispatch per task, mirroring the
        reference's per-task v8*Loss classes, utils/loss.py:157-743).

        batch: {"img": (B, H, W, 3) float, "cls_boxes": (B, n_max, 5|6),
                "mask": (B, n_max) bool} + task extras ("masks" for segment,
                "keypoints" for pose, "label" for classify).

        Models containing MoE blocks (MoEFFN) sow a Switch-style
        load-balance loss into the "losses" collection; it is added here
        weighted by hyp.moe_aux (default 0.01) — a capability the reference
        lacks (no MoE anywhere in its zoo).
        """
        (total, aux), updates = self._loss_impl(variables, batch, hyp, train)
        if isinstance(updates, dict) and "losses" in updates:
            sown = jax.tree.leaves(updates["losses"])
            if sown:
                moe = sum(jnp.sum(jnp.asarray(v)) for v in sown)
                w = float(getattr(hyp, "moe_aux", 0.01)) if hyp is not None else 0.01
                total = total + w * moe
                aux = {**aux, "moe_aux": moe}
            updates = {k: v for k, v in updates.items() if k != "losses"}
        return (total, aux), updates

    def _loss_impl(self, variables: dict, batch: dict, hyp: Any = None, train: bool = True):
        from ..utils import loss as L

        g = lambda k, d: float(getattr(hyp, k, d)) if hyp is not None else d
        gains = dict(box=g("box", 7.5), cls=g("cls", 0.5), dfl=g("dfl", 1.5))

        head_kwargs, dn_meta = None, None
        if train and self.task == "rtdetr" and batch.get("cls_boxes") is not None:
            # contrastive denoising groups (reference models/utils/ops.py:150)
            from . import rtdetr as R

            imgsz = float(batch["img"].shape[1])
            gt = batch["cls_boxes"]
            gt_cls = gt[..., 0].astype(jnp.int32)
            xyxy = gt[..., 1:5] / imgsz
            cxcywh = jnp.concatenate([(xyxy[..., :2] + xyxy[..., 2:]) / 2,
                                      xyxy[..., 2:] - xyxy[..., :2]], -1)
            key = batch.get("dn_key")
            key = key if key is not None else jax.random.PRNGKey(0)
            num_group = 3
            dn_cls, dn_box, dn_pos, dn_valid, dn_gt_idx = R.get_cdn_group(
                gt_cls, cxcywh, batch["mask"].astype(jnp.float32), self.nc, key,
                num_group=num_group)
            head_kwargs = {"dn": (dn_cls, dn_box, num_group)}
            dn_meta = (dn_pos, dn_valid, dn_gt_idx)

        guide = batch.get("txt_feats", self.txt_feats)
        if train:
            out, updates = self.module.apply(
                variables, batch["img"], train=True,
                mutable=["batch_stats", "losses"],
                head_kwargs=head_kwargs, guide=guide,
            )
        else:
            out, updates = self.module.apply(variables, batch["img"], train=False,
                                             guide=guide), {}

        if self.task == "classify":
            total = L.classification_loss(out, batch["label"])
            return (total, {"cls": total}), updates
        if self.task == "rtdetr":
            from . import rtdetr as R

            imgsz = float(batch["img"].shape[1])
            total, aux = R.rtdetr_loss(out, batch, self.nc, imgsz)
            if dn_meta is not None:
                dn_total, dn_aux = R.cdn_loss(out, dn_meta, batch, self.nc, imgsz)
                total = total + dn_total
                aux = {**aux, **dn_aux}
            return (total, aux), updates
        if self.task == "segment":
            lo = L.segmentation_loss(out, batch, self.strides, self.nc, self.reg_max,
                                     box_gain=gains["box"], cls_gain=gains["cls"], dfl_gain=gains["dfl"])
            aux = {"box": lo.box, "seg": lo.seg, "cls": lo.cls, "dfl": lo.dfl}
            return (lo.total, aux), updates
        if self.task == "pose":
            kpt_shape = self._head_attr("kpt_shape", (17, 3))
            lo = L.pose_loss(out, batch, self.strides, self.nc, kpt_shape, self.reg_max,
                             box_gain=gains["box"], cls_gain=gains["cls"], dfl_gain=gains["dfl"],
                             pose_gain=g("pose", 12.0), kobj_gain=g("kobj", 1.0))
            aux = {"box": lo.box, "pose": lo.pose, "kobj": lo.kobj, "cls": lo.cls, "dfl": lo.dfl}
            return (lo.total, aux), updates
        if self.task == "obb":
            lo = L.obb_loss(out, batch, self.strides, self.nc, self.reg_max,
                            box_gain=gains["box"], cls_gain=gains["cls"], dfl_gain=gains["dfl"])
            aux = {"box": lo.box, "cls": lo.cls, "dfl": lo.dfl}
            return (lo.total, aux), updates
        if self.e2e and isinstance(out, dict) and "one2one" in out:
            # E2EDetectLoss (reference utils/loss.py:700): one2many (topk 10)
            # + one2one (topk 1)
            lm = L.detection_loss(out["one2many"], batch["cls_boxes"], batch["mask"],
                                  self.strides, self.nc, self.reg_max,
                                  box_gain=gains["box"], cls_gain=gains["cls"],
                                  dfl_gain=gains["dfl"], tal_topk=10)
            lo = L.detection_loss(out["one2one"], batch["cls_boxes"], batch["mask"],
                                  self.strides, self.nc, self.reg_max,
                                  box_gain=gains["box"], cls_gain=gains["cls"],
                                  dfl_gain=gains["dfl"], tal_topk=1)
            total = lm.total + lo.total
            aux = {"box": lm.box + lo.box, "cls": lm.cls + lo.cls, "dfl": lm.dfl + lo.dfl}
            return (total, aux), updates

        det = out["det"] if isinstance(out, dict) else out
        lo = L.detection_loss(
            det, batch["cls_boxes"], batch["mask"], self.strides, self.nc, self.reg_max,
            box_gain=gains["box"], cls_gain=gains["cls"], dfl_gain=gains["dfl"],
        )
        aux = {"box": lo.box, "cls": lo.cls, "dfl": lo.dfl}
        return (lo.total, aux), updates

    def _head_attr(self, name: str, default):
        spec = self.parsed.specs[self.parsed.head_index]
        kwargs = dict(spec.kwargs)
        if name in kwargs:
            return kwargs[name]
        # positional: Pose YAML args = [nc, kpt_shape]
        if name == "kpt_shape" and len(spec.args) >= 2 and isinstance(spec.args[1], tuple):
            return spec.args[1]
        return default

    # -- info -----------------------------------------------------------------
    def num_params(self, variables: dict) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables.get("params", variables)))

    def info(self, variables: dict | None = None) -> str:
        n_layers = len(self.parsed.specs)
        s = f"{self.task} model: {n_layers} layers, strides {self.strides}, nc={self.nc}"
        if variables is not None:
            s += f", {self.num_params(variables):,} params"
        return s


class DetectionModel(TaskModel):
    """Alias kept for API parity with the reference (nn/tasks.py:318)."""


class Ensemble:
    """Multi-model ensembled inference (reference nn/tasks.py:826 Ensemble +
    attempt_load_weights :1007): decoded candidates from every member are
    concatenated along the anchor axis and NMS picks across all of them
    (the reference's ensemble concatenates head outputs the same way)."""

    def __init__(self, members: list):
        """members: [(TaskModel, variables), ...] — same task + nc."""
        assert members, "empty ensemble"
        tasks = {m.task for m, _ in members}
        assert len(tasks) == 1, f"mixed ensemble tasks {tasks}"
        self.members = members
        self.task = members[0][0].task
        self.nc = members[0][0].nc
        self.names = members[0][0].names
        self.strides = members[0][0].strides

    def predictions(self, _variables_unused, x):
        outs = [m.predictions(v, x) for m, v in self.members]
        return jnp.concatenate(outs, axis=1)  # (B, sum_N, 4+nc)
