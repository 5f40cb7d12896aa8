"""Mask post-processing for the SAM+CLIP feature extraction pipeline.

Parity oracles in `/root/reference/preprocess.py`:
  - `mask_nms` (:215-279): score-sorted NMS with an extra inner-overlap suppression and
    top-3 fallbacks. The reference's O(M^2) Python double loop over mask pairs becomes a
    single [M, HW] x [HW, M] intersection matmul (MXU work on TPU via jnp);
  - `masks_update` (:281-294): score = stability * predicted_iou, NMS per granularity;
  - `get_seg_img`/`pad_img`/`mask2segmap` (:191-206, :304-317): crop -> pad-to-square ->
    224^2 CLIP tiles and the -1-filled segment-id map.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def _mask_nms_matrices(masks_flat: jnp.ndarray):
    """[M, HW] float (score-sorted) -> (iou_matrix, inner_iou_matrix) per reference."""
    area = jnp.sum(masks_flat, axis=1)                       # [M]
    inter = masks_flat @ masks_flat.T                        # [M, M] intersections
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-12)

    frac_i = inter / jnp.maximum(area[:, None], 1e-12)       # intersection / area_row
    frac_j = inter / jnp.maximum(area[None, :], 1e-12)       # intersection / area_col
    inner_val = 1.0 - frac_j * frac_i                        # symmetric
    cond_upper = (frac_i < 0.5) & (frac_j >= 0.85)           # col nested inside row
    cond_lower = (frac_i >= 0.85) & (frac_j < 0.5)           # row nested inside col
    # The reference visits pairs j >= i and writes cond_upper at [i, j] (upper triangle)
    # and cond_lower at [j, i] (lower triangle). Rebuild that exact matrix:
    r = jax.lax.broadcasted_iota(jnp.int32, iou.shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, iou.shape, 1)
    upper = jnp.where((c > r) & cond_upper, inner_val, 0.0)
    lower = jnp.where((r > c) & cond_lower.T, inner_val, 0.0)
    return iou, upper + lower


def mask_nms(masks: np.ndarray, scores: np.ndarray, iou_thr: float = 0.7,
             score_thr: float = 0.1, inner_thr: float = 0.2) -> np.ndarray:
    """Returns indices (into the ORIGINAL order) of masks kept — reference mask_nms."""
    scores = np.asarray(scores, np.float64)
    order = np.argsort(-scores, kind="stable")
    scores_ord = scores[order]
    m = len(order)
    flat = jnp.asarray(np.asarray(masks, np.float32)[order].reshape(m, -1))
    iou, inner = (np.asarray(x) for x in _mask_nms_matrices(flat))

    iou = np.triu(iou, k=1)
    iou_max = iou.max(axis=0) if m else np.zeros(0)
    inner_u = np.triu(inner, k=1)
    inner_max_u = inner_u.max(axis=0) if m else np.zeros(0)
    inner_l = np.tril(inner, k=1)
    inner_max_l = inner_l.max(axis=0) if m else np.zeros(0)

    keep = iou_max <= iou_thr
    keep_conf = scores_ord > score_thr
    keep_inner_u = inner_max_u <= 1 - inner_thr
    keep_inner_l = inner_max_l <= 1 - inner_thr

    top3 = np.argsort(-scores_ord, kind="stable")[:3]
    if keep_conf.sum() == 0:
        keep_conf[top3] = True
    if keep_inner_u.sum() == 0:
        keep_inner_u[top3] = True
    if keep_inner_l.sum() == 0:
        keep_inner_l[top3] = True
    keep = keep & keep_conf & keep_inner_u & keep_inner_l
    return order[keep]


def masks_update(*mask_lists, iou_thr: float = 0.8, score_thr: float = 0.7,
                 inner_thr: float = 0.5):
    """NMS per granularity level on stability*iou scores (reference masks_update)."""
    out = []
    for masks_lvl in mask_lists:
        if not masks_lvl:
            out.append(masks_lvl)
            continue
        seg = np.stack([m["segmentation"] for m in masks_lvl], axis=0)
        iou_pred = np.array([m["predicted_iou"] for m in masks_lvl])
        stability = np.array([m["stability_score"] for m in masks_lvl])
        keep = set(mask_nms(seg, stability * iou_pred, iou_thr=iou_thr,
                            score_thr=score_thr, inner_thr=inner_thr).tolist())
        out.append([m for i, m in enumerate(masks_lvl) if i in keep])
    return tuple(out)


def get_seg_img(mask: dict, image: np.ndarray) -> np.ndarray:
    """Zero-background crop of the mask's bbox (reference get_seg_img)."""
    img = image.copy()
    img[mask["segmentation"] == 0] = np.array([0, 0, 0], dtype=np.uint8)
    x, y, w, h = np.int32(mask["bbox"])
    return img[y:y + h, x:x + w, ...]


def pad_img(img: np.ndarray) -> np.ndarray:
    """Pad to square with zeros, centered (reference pad_img)."""
    h, w, _ = img.shape
    side = max(w, h)
    pad = np.zeros((side, side, 3), dtype=np.uint8)
    if h > w:
        pad[:, (h - w) // 2:(h - w) // 2 + w, :] = img
    else:
        pad[(w - h) // 2:(w - h) // 2 + h, :, :] = img
    return pad


def mask_to_segmap(masks: list[dict], image: np.ndarray,
                   tile_size: int = 224) -> tuple[np.ndarray, np.ndarray]:
    """-> (clip tiles [M, 3, 224, 224] float in [0,1], seg map [H, W] int32 with -1
    background) — reference mask2segmap."""
    import cv2
    seg_imgs = []
    seg_map = -np.ones(image.shape[:2], dtype=np.int32)
    for i, mask in enumerate(masks):
        seg_img = get_seg_img(mask, image)
        seg_imgs.append(cv2.resize(pad_img(seg_img), (tile_size, tile_size)))
        seg_map[mask["segmentation"]] = i
    tiles = (np.stack(seg_imgs, axis=0).astype(np.float32) / 255.0
             ).transpose(0, 3, 1, 2)
    return tiles, seg_map
