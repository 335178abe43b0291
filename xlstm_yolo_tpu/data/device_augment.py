"""Device-side augmentation — the v8_transforms pipeline as jitted XLA ops.

The reference runs its whole augment stack on CPU dataloader workers
(``data/augment.py:2280-2344``: Mosaic -> RandomPerspective -> HSV -> Flip).
This host has one CPU core, so that design caps training throughput; here the
geometric + photometric stages run ON DEVICE inside the train step, fused by
XLA with the normalize/forward that follows. The host only decodes and
letterboxes to a fixed (S, S) — everything random is driven by a jax PRNG key
so the step stays pure and reproducible.

Pipeline (mirrors the reference order and hyp names):
  1. mosaic4: within-batch: image i is combined with images i+1, i+2, i+3
     (mod B) on a (2S, 2S) canvas — the reference samples 3 partners from the
     whole dataset (data/augment.py:490); within-batch-permutation is an
     equivalent distribution when the loader shuffles.
  2. random affine (degrees/translate/scale/shear) mapping the 2S canvas back
     to (S, S) — same structure as the reference's warpAffine with
     border=-S/2 after mosaic. Bilinear sampling, border value 114.
  3. HSV jitter (hgain/sgain/vgain) in device float math.
  4. horizontal/vertical flip.

Labels ride as padded (B, M, 5) cls+xyxy pixel tensors + validity mask;
mosaic concatenates the 4 partners' slots (4M) and the affine re-clips,
filters (same criteria as reference _box_candidates) and re-packs the first
M valid slots.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

FILL = 114.0


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def _affine_matrix(key, degrees, translate, scale, shear, src: int, dst: int):
    """Random inverse-affine (dst pixel -> src pixel), centered like the
    reference (data/augment.py:81-131): center canvas, rotate+scale+shear,
    translate into the dst window."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    a = jax.random.uniform(k1, (), minval=-degrees, maxval=degrees) * jnp.pi / 180.0
    s = jax.random.uniform(k2, (), minval=1.0 - scale, maxval=1.0 + scale)
    shx = jnp.tan(jax.random.uniform(k3, (), minval=-shear, maxval=shear) * jnp.pi / 180.0)
    shy = jnp.tan(jax.random.uniform(k4, (), minval=-shear, maxval=shear) * jnp.pi / 180.0)
    tx = jax.random.uniform(k5, (), minval=0.5 - translate, maxval=0.5 + translate) * dst
    ty = jax.random.uniform(jax.random.fold_in(k5, 1), (),
                            minval=0.5 - translate, maxval=0.5 + translate) * dst

    ca, sa = jnp.cos(a) * s, jnp.sin(a) * s
    # forward: p_dst = T(tx,ty) @ Shear @ RotScale @ T(-cx,-cy) p_src
    cx = cy = src / 2.0
    m00 = ca + shx * sa
    m01 = -sa + shx * ca
    m10 = sa + shy * ca
    m11 = ca + shy * -sa
    # constant column: map src center to (tx, ty)
    c0 = tx - (m00 * cx + m01 * cy)
    c1 = ty - (m10 * cx + m11 * cy)
    fwd = jnp.array([[m00, m01, c0], [m10, m11, c1], [0.0, 0.0, 1.0]])
    return fwd, jnp.linalg.inv(fwd)


def _sample_bilinear(img, inv, out_size: int):
    """img (H, W, C) fp32; inv: 3x3 dst->src matrix; returns (out, out, C)."""
    ys, xs = jnp.mgrid[0:out_size, 0:out_size]
    ones = jnp.ones_like(xs)
    pts = jnp.stack([xs, ys, ones], 0).reshape(3, -1).astype(jnp.float32)
    src = inv @ pts  # (3, N)
    sx, sy = src[0], src[1]

    H, W = img.shape[:2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        val = img[yi, xi]  # (N, C)
        return jnp.where(inb[:, None], val, FILL)

    out = (tap(y0, x0) * ((1 - wx) * (1 - wy))[:, None]
           + tap(y0, x0 + 1) * (wx * (1 - wy))[:, None]
           + tap(y0 + 1, x0) * ((1 - wx) * wy)[:, None]
           + tap(y0 + 1, x0 + 1) * (wx * wy)[:, None])
    return out.reshape(out_size, out_size, img.shape[2])


def _transform_boxes(boxes, mask, fwd, out_size: int):
    """boxes (M, 4) xyxy -> transformed, clipped, candidate-filtered."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    corners = jnp.stack([
        jnp.stack([x1, y1], -1), jnp.stack([x2, y1], -1),
        jnp.stack([x1, y2], -1), jnp.stack([x2, y2], -1),
    ], 1)  # (M, 4, 2)
    ones = jnp.ones((*corners.shape[:2], 1))
    p = jnp.concatenate([corners, ones], -1) @ fwd.T  # (M, 4, 3)
    xy = p[..., :2]
    new = jnp.concatenate([xy.min(1), xy.max(1)], -1)
    new = jnp.clip(new, 0.0, out_size)
    # reference _box_candidates (augment.py:133): min size 2px, area ratio
    # 0.1, aspect < 100
    w_old = jnp.maximum(x2 - x1, 1e-6)
    h_old = jnp.maximum(y2 - y1, 1e-6)
    w_new = new[:, 2] - new[:, 0]
    h_new = new[:, 3] - new[:, 1]
    ar = jnp.maximum(w_new / jnp.maximum(h_new, 1e-16),
                     h_new / jnp.maximum(w_new, 1e-16))
    keep = (w_new > 2) & (h_new > 2) & (w_new * h_new / (w_old * h_old) > 0.1) & (ar < 100)
    return new, mask & keep


def _pack_first(cls_boxes, mask, m_out: int):
    """Stable-pack valid slots to the front; truncate to m_out. Also returns
    the slot permutation so co-indexed payloads (keypoints, slot-encoded
    masks) can follow it."""
    order = jnp.argsort(~mask, stable=True)  # valid slots first, stable
    cb = jnp.take(cls_boxes, order, axis=0)[:m_out]
    mk = jnp.take(mask, order, axis=0)[:m_out]
    return cb, mk, order


def _sample_mask_nearest(msk, inv, out_size: int, ratio: float):
    """Slot-encoded int mask (h, w) warped with the image's dst->src affine
    at mask resolution (mask px = image px * ratio); nearest sampling keeps
    slot ids intact, out-of-canvas -> 0 (background)."""
    H, W = msk.shape
    ys, xs = jnp.mgrid[0:out_size, 0:out_size]
    pts = jnp.stack([xs * ratio, ys * ratio, jnp.ones_like(xs)],
                    0).reshape(3, -1).astype(jnp.float32)
    src = inv @ pts
    sx = src[0] / ratio
    sy = src[1] / ratio
    xi = jnp.round(sx).astype(jnp.int32)
    yi = jnp.round(sy).astype(jnp.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    v = msk[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
    return jnp.where(inb, v, 0).reshape(out_size, out_size)


def _transform_kpts(kpts, fwd, out_size: int):
    """kpts (M, K, 3) px+vis -> affine-transformed; points leaving the
    canvas get visibility 0 (the host pipeline's convention)."""
    xy = kpts[..., :2]
    p = jnp.concatenate([xy, jnp.ones((*xy.shape[:2], 1))], -1) @ fwd.T
    nxy = p[..., :2]
    inb = ((nxy[..., 0] >= 0) & (nxy[..., 0] < out_size)
           & (nxy[..., 1] >= 0) & (nxy[..., 1] < out_size))
    vis = jnp.where(inb, kpts[..., 2], 0.0)
    return jnp.concatenate([nxy, vis[..., None]], -1)


# ---------------------------------------------------------------------------
# photometric
# ---------------------------------------------------------------------------

def hsv_jitter(key, img, hgain=0.015, sgain=0.7, vgain=0.4):
    """img (..., 3) fp32 RGB 0..255; random gains like reference
    data/augment.py:45-58 (r = uniform(-1,1)*gain + 1)."""
    r = jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0)
    rh, rs, rv = r[0] * hgain + 1.0, r[1] * sgain + 1.0, r[2] * vgain + 1.0

    x = img / 255.0
    mx = x.max(-1)
    mn = x.min(-1)
    diff = mx - mn
    rgb = [x[..., 0], x[..., 1], x[..., 2]]
    safe = jnp.where(diff > 0, diff, 1.0)
    h = jnp.where(
        mx == rgb[0], (rgb[1] - rgb[2]) / safe % 6.0,
        jnp.where(mx == rgb[1], (rgb[2] - rgb[0]) / safe + 2.0,
                  (rgb[0] - rgb[1]) / safe + 4.0),
    ) / 6.0
    h = jnp.where(diff > 0, h, 0.0)
    s = jnp.where(mx > 0, diff / jnp.maximum(mx, 1e-12), 0.0)
    v = mx

    h = (h * rh) % 1.0
    s = jnp.clip(s * rs, 0.0, 1.0)
    v = jnp.clip(v * rv, 0.0, 1.0)

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    rgb_out = jnp.stack([
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v]),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p]),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q]),
    ], -1)
    return jnp.clip(rgb_out * 255.0, 0.0, 255.0)


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

def _mosaic_canvas(imgs, cls_boxes, mask, idx):
    """Build one (2S, 2S) canvas from 4 batch images; labels offset into
    quadrants. imgs (B, S, S, C) fp32."""
    B, S = imgs.shape[0], imgs.shape[1]
    quads = [imgs[(idx + j) % B] for j in range(4)]
    top = jnp.concatenate([quads[0], quads[1]], axis=1)
    bot = jnp.concatenate([quads[2], quads[3]], axis=1)
    canvas = jnp.concatenate([top, bot], axis=0)  # (2S, 2S, C)

    offs = jnp.asarray([[0, 0], [S, 0], [0, S], [S, S]], jnp.float32)
    cbs, mks = [], []
    for j in range(4):
        cb = cls_boxes[(idx + j) % B]
        off = jnp.concatenate([jnp.zeros(1), jnp.tile(offs[j], 2)])
        cbs.append(cb + off[None, :])
        mks.append(mask[(idx + j) % B])
    return canvas, jnp.concatenate(cbs, 0), jnp.concatenate(mks, 0)


@partial(jax.jit, static_argnames=("hyp_t", "flip_idx"))
def _device_augment_jit(imgs, cls_boxes, mask, key, mosaic_p, hyp_t,
                        seg_masks=None, kpts=None, flip_idx=None):
    """mosaic_p is a traced scalar so close_mosaic can zero it mid-training
    without a recompile (reference trainer.py:343 mosaic close).

    ``seg_masks`` (B, ms, ms) int32 slot-encoded instance masks (slot+1 per
    pixel, collate layout) and ``kpts`` (B, M, K, 3) px keypoints ride the
    SAME geometry: mosaic slot-concat (partner j's slots shift by j*M),
    affine warp (nearest for mask ids), the pack-first slot permutation, and
    the flip — so labels never desynchronize from their payloads.
    ``flip_idx`` is the pose left/right keypoint swap of the dataset yaml."""
    hyp = dict(hyp_t)
    B, S = imgs.shape[0], imgs.shape[1]
    M = cls_boxes.shape[1]
    imgs = imgs.astype(jnp.float32)
    use_mosaic = float(hyp.get("mosaic", 1.0)) > 0.0

    def per_image(idx, key):
        kmo, kaff, khsv, kflip = jax.random.split(key, 4)
        mcv = kp = None
        if use_mosaic:
            src, cb, mk = _mosaic_canvas(imgs, cls_boxes, mask, idx)
            mos = jax.random.uniform(kmo) < mosaic_p
            src = jnp.where(mos, src,
                            jnp.pad(imgs[idx], ((0, S), (0, S), (0, 0)),
                                    constant_values=FILL))
            own = jnp.concatenate([mask[idx], jnp.zeros(3 * M, bool)])
            cb0 = jnp.concatenate([cls_boxes[idx], jnp.zeros((3 * M, 5))], 0)
            cb = jnp.where(mos, cb, cb0)
            mk = jnp.where(mos, mk, own)
            src_size = 2 * S
            if seg_masks is not None:
                ms = seg_masks.shape[1]
                mq = [seg_masks[(idx + j) % B] for j in range(4)]
                mq = [jnp.where(m > 0, m + j * M, 0) for j, m in enumerate(mq)]
                mcv = jnp.concatenate([jnp.concatenate([mq[0], mq[1]], 1),
                                       jnp.concatenate([mq[2], mq[3]], 1)], 0)
                mcv = jnp.where(mos, mcv, jnp.pad(seg_masks[idx], ((0, ms), (0, ms))))
            if kpts is not None:
                K = kpts.shape[2]
                offs = jnp.asarray([[0, 0], [S, 0], [0, S], [S, S]], jnp.float32)
                kq = jnp.concatenate([
                    kpts[(idx + j) % B]
                    + jnp.concatenate([offs[j], jnp.zeros(1)])[None, None, :]
                    for j in range(4)], 0)
                k0 = jnp.concatenate([kpts[idx], jnp.zeros((3 * M, K, 3))], 0)
                kp = jnp.where(mos, kq, k0)
        else:
            src, cb, mk = imgs[idx], cls_boxes[idx], mask[idx]
            src_size = S
            if seg_masks is not None:
                mcv = seg_masks[idx]
            if kpts is not None:
                kp = kpts[idx]

        fwd, inv = _affine_matrix(
            kaff, float(hyp.get("degrees", 0.0)), float(hyp.get("translate", 0.1)),
            float(hyp.get("scale", 0.5)), float(hyp.get("shear", 0.0)),
            src_size, S)
        out = _sample_bilinear(src, inv, S)
        boxes, mk = _transform_boxes(cb[:, 1:5], mk, fwd, S)
        cb = jnp.concatenate([cb[:, :1], boxes], -1)
        cb, mk, order = _pack_first(cb, mk, M)

        if seg_masks is not None:
            ms_out = seg_masks.shape[1]
            mwarp = _sample_mask_nearest(mcv, inv, ms_out, S / ms_out)
            # slot permutation + drop-filter as a lookup: old slot id (1-based
            # in the pre-pack index space) -> packed id or 0
            n_slots = order.shape[0]
            remap = jnp.zeros((n_slots + 1,), jnp.int32)
            remap = remap.at[order[:M] + 1].set(
                jnp.where(mk, jnp.arange(M, dtype=jnp.int32) + 1, 0))
            mwarp = remap[mwarp]
        if kpts is not None:
            kp = _transform_kpts(kp, fwd, S)
            kp = jnp.take(kp, order, axis=0)[:M]
            kp = jnp.where(mk[:, None, None], kp, 0.0)

        out = hsv_jitter(khsv, out, float(hyp.get("hsv_h", 0.015)),
                         float(hyp.get("hsv_s", 0.7)), float(hyp.get("hsv_v", 0.4)))

        do_lr = jax.random.uniform(kflip) < float(hyp.get("fliplr", 0.5))
        flipped = out[:, ::-1]
        out = jnp.where(do_lr, flipped, out)
        fb = cb.at[:, 1].set(S - cb[:, 3]).at[:, 3].set(S - cb[:, 1])
        cb = jnp.where(do_lr, fb, cb)
        if seg_masks is not None:
            mwarp = jnp.where(do_lr, mwarp[:, ::-1], mwarp)
        if kpts is not None:
            kf = kp.at[..., 0].set(
                jnp.where(kp[..., 2] > 0, S - kp[..., 0], kp[..., 0]))
            if flip_idx is not None:
                kf = kf[:, list(flip_idx)]
            kp = jnp.where(do_lr, kf, kp)

        extras = []
        if seg_masks is not None:
            extras.append(mwarp)
        if kpts is not None:
            extras.append(kp)
        return (out, cb, mk, *extras)

    keys = jax.random.split(key, B)
    return jax.vmap(per_image)(jnp.arange(B), keys)


def device_augment(batch: dict, key, hyp: dict | None = None,
                   flip_idx=None) -> dict:
    """Augment a collated batch on device. batch: {"img" (B,S,S,3) uint8/f32,
    "cls_boxes" (B,M,5) cls+xyxy px, "mask" (B,M) bool} plus optionally
    "masks" (B, ms, ms) slot-encoded int32 (segment) and/or "keypoints"
    (B, M, K, 3) px (pose). Returns same keys (img fp32 0..255). Other keys
    pass through untouched."""
    hyp = hyp or {}
    keep = {k: (float(v) if isinstance(v, (int, float)) else v) for k, v in hyp.items()
            if k in ("mosaic", "degrees", "translate", "scale", "shear",
                     "hsv_h", "hsv_s", "hsv_v", "fliplr") and v is not None}
    seg = jnp.asarray(batch["masks"]) if "masks" in batch else None
    kp = jnp.asarray(batch["keypoints"]) if "keypoints" in batch else None
    res = _device_augment_jit(
        jnp.asarray(batch["img"]), jnp.asarray(batch["cls_boxes"]),
        jnp.asarray(batch["mask"]), key,
        jnp.float32(keep.get("mosaic", 1.0)), tuple(sorted(keep.items())),
        seg_masks=seg, kpts=kp,
        flip_idx=tuple(flip_idx) if flip_idx is not None else None)
    img, cb, mk = res[:3]
    out = dict(batch)
    out.update(img=img, cls_boxes=cb, mask=mk)
    i = 3
    if seg is not None:
        out["masks"] = res[i]
        i += 1
    if kp is not None:
        out["keypoints"] = res[i]
    return out
