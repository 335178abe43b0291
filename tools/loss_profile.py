"""Fine-grained attribution of the detection-loss time on the accelerator.

CAVEAT (round 5): every host readback through the axon relay costs
~25-30 ms of pure latency, so each metric here carries a +25/iters ms
constant — DIFFERENCES between variants are meaningful, absolute values
are not. For op-level truth use tools/xprof_step.py (device-lane trace).

Times each suspect stage of the TAL/loss path in isolation at the production
shape (B=128, A=8400 anchors, n_max=32, nc=80), fori_loop-chained like
bench.py. Run after tools/train_step_profile.py localizes the step time to
the loss.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from xlstm_yolo_tpu.ops.boxes import bbox_iou
    from xlstm_yolo_tpu.utils import loss as L
    from xlstm_yolo_tpu.utils import tal

    B, A, NM, NC = (int(sys.argv[1]) if len(sys.argv) > 1 else 128), 8400, 32, 80
    iters = 4
    rng = np.random.default_rng(0)

    gt_boxes = jnp.asarray(rng.uniform(0, 600, (B, NM, 4)), jnp.float32)
    gt_boxes = jnp.concatenate([jnp.minimum(gt_boxes[..., :2], gt_boxes[..., 2:]),
                                jnp.maximum(gt_boxes[..., :2], gt_boxes[..., 2:]) + 4], -1)
    pd_boxes = jnp.asarray(rng.uniform(0, 640, (B, A, 4)), jnp.float32)
    pd_boxes = jnp.concatenate([jnp.minimum(pd_boxes[..., :2], pd_boxes[..., 2:]),
                                jnp.maximum(pd_boxes[..., :2], pd_boxes[..., 2:]) + 4], -1)
    pd_scores = jnp.asarray(rng.random((B, A, NC)), jnp.float32)
    gt_labels = jnp.asarray(rng.integers(0, NC, (B, NM, 1)), jnp.float32)
    mask_gt = jnp.ones((B, NM, 1), jnp.float32)
    anc = jnp.asarray(rng.uniform(0, 640, (A, 2)), jnp.float32)
    metric = jnp.asarray(rng.random((B, NM, A)), jnp.float32)

    def timed(fn, *args):
        # first arg gets a loop-carried float perturbation so nothing hoists
        def many(*a):
            def body(i, acc):
                a0 = a[0] + (acc * 1e-12 + i).astype(a[0].dtype) * 1e-6
                r = fn(a0, *a[1:])
                return acc + jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        jit = jax.jit(many)
        _ = float(jit(*args))
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(jit(*args))
            best = min(best, (time.perf_counter() - t0) / iters)
        return round(1e3 * best, 2)

    out = {"batch": B}
    out["pairwise_ciou_ms"] = timed(
        lambda g, p: jnp.clip(bbox_iou(g[:, :, None, :], p[:, None, :, :],
                                       xywh=False, CIoU=True), 0.0, None),
        gt_boxes, pd_boxes)
    out["pairwise_iou_plain_ms"] = timed(
        lambda g, p: jnp.clip(bbox_iou(g[:, :, None, :], p[:, None, :, :],
                                       xywh=False), 0.0, None),
        gt_boxes, pd_boxes)
    out["score_gather_ms"] = timed(
        lambda s, c: jnp.take_along_axis(
            jnp.swapaxes(s, 1, 2), jnp.clip(c[..., 0].astype(jnp.int32), 0, NC - 1)[:, :, None],
            axis=1),
        pd_scores, gt_labels)
    out["kth_mask_ms"] = timed(lambda m: tal.topk_positive_mask(m, 10), metric)
    out["in_gts_ms"] = timed(
        lambda a, g: tal.select_candidates_in_gts(a, g), anc, gt_boxes)
    out["assign_full_ms"] = timed(
        lambda s, p, a, l, g, m: tal.assign(s, p, a, l, g, m, topk=10, num_classes=NC),
        pd_scores, pd_boxes, anc, gt_labels, gt_boxes, mask_gt)

    # loss fwd+bwd given raw head maps (loss only, no model)
    shapes = [(B, 80, 80, 64 + NC), (B, 40, 40, 64 + NC), (B, 20, 20, 64 + NC)]
    maps = [jnp.asarray(rng.normal(0, 1, s), jnp.float32) for s in shapes]
    targets = jnp.concatenate([gt_labels, gt_boxes], -1)
    tmask = jnp.ones((B, NM), bool)

    def loss_fn(ms):
        return L.detection_loss(ms, targets, tmask, (8, 16, 32), NC).total

    out["loss_fwd_ms"] = timed(lambda *ms: loss_fn(list(ms)), *maps)
    out["loss_fwd_bwd_ms"] = timed(
        lambda *ms: jax.value_and_grad(lambda mm: loss_fn(mm))(list(ms))[0], *maps)

    # sub-stages of detection_loss (utils/loss.py:56)
    from xlstm_yolo_tpu.ops.anchors import (bbox2dist, dfl_decode, dist2bbox,
                                            make_anchors)

    anchors_g, stride_t = make_anchors([s[1:3] for s in shapes], (8, 16, 32))

    def cat(ms):
        return jnp.concatenate([m.reshape(B, -1, m.shape[-1]) for m in ms], 1)

    out["decode_ms"] = timed(
        lambda *ms: dist2bbox(dfl_decode(cat(list(ms))[..., :64], 16),
                              anchors_g, xywh=False), *maps)
    pred_sl = jnp.asarray(rng.normal(0, 1, (B, A, NC)), jnp.float32)
    tsc = jnp.asarray(rng.random((B, A, NC)) * (rng.random((B, A, NC)) < 0.01),
                      jnp.float32)
    out["bce_ms"] = timed(
        lambda s, t: jnp.sum(L._bce_logits(s, t)), pred_sl, tsc)
    pdl = jnp.asarray(rng.normal(0, 1, (B, A, 64)), jnp.float32)  # raw (..., 4*reg_max) lane layout
    tgt_ltrb = jnp.asarray(rng.uniform(0, 15, (B, A, 4)), jnp.float32)
    out["dfl_ms"] = timed(lambda p, t: L.df_loss(p, t, 16), pdl, tgt_ltrb)
    out["bbox2dist_ms"] = timed(
        lambda g: bbox2dist(anchors_g, g, 16),
        jnp.asarray(rng.uniform(0, 80, (B, A, 4)), jnp.float32))
    fg_boxes = jnp.asarray(rng.uniform(0, 80, (B, A, 4)), jnp.float32)
    out["boxloss_ciou_ms"] = timed(
        lambda p, t: jnp.sum(1.0 - bbox_iou(p, t, xywh=False, CIoU=True)),
        fg_boxes, fg_boxes + 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
