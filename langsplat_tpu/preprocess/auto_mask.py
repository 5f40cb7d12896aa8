"""Automatic mask generation at four granularities (whole / subpart / part).

TPU-native equivalent of the reference's `segment-anything-langsplat` fork (component N6,
SURVEY.md §2.1): upstream SAM's `SamAutomaticMaskGenerator` keeps only the best of the 3
multimask heads; the LangSplat fork returns FOUR lists — (default, s, m, l) — where
default is the best-by-IoU head and s/m/l are the three granularity heads
(call-site contract `/root/reference/preprocess.py:299`).

This module is model-agnostic: it takes any `predictor(image, points [P,2]) -> (masks
[P,3,H,W] bool, iou_preds [P,3], logits [P,3,H,W])` (e.g. a transformers SamModel
wrapper, see backends.py) and reimplements the generation loop in vectorized numpy:
32x32 point grid, predicted-IoU and stability filtering, per-head box NMS, crop
layers (a second prompting pass over overlapping image crops that adds small/
part-level masks, with near-crop-edge filtering and cross-crop NMS preferring
smaller crops), small-region removal. Reference hyperparameters
(`preprocess.py:362-372`): points_per_side=32, pred_iou_thresh=0.7,
box_nms_thresh=0.7, stability_score_thresh=0.85, crop_n_layers=1,
min_mask_region_area=100.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np


@dataclass
class AutoMaskConfig:
    points_per_side: int = 32
    pred_iou_thresh: float = 0.7
    box_nms_thresh: float = 0.7
    stability_score_thresh: float = 0.85
    stability_score_offset: float = 1.0
    crop_n_layers: int = 0          # 1 in the reference config (preprocess.py:368)
    crop_overlap_ratio: float = 512 / 1500
    crop_nms_thresh: float = 0.7
    crop_n_points_downscale_factor: int = 1
    min_mask_region_area: int = 100
    points_per_batch: int = 64
    mask_threshold: float = 0.0


def build_point_grid(n_per_side: int) -> np.ndarray:
    """[n^2, 2] normalized (x, y) grid points in (0,1) (SAM convention)."""
    offset = 1.0 / (2 * n_per_side)
    coords = np.linspace(offset, 1 - offset, n_per_side)
    gx, gy = np.meshgrid(coords, coords)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def stability_score(logits: np.ndarray, mask_threshold: float,
                    offset: float) -> np.ndarray:
    """IoU between masks at threshold +- offset (SAM's stability measure)."""
    hi = (logits > (mask_threshold + offset)).reshape(logits.shape[0], -1).sum(-1)
    lo = (logits > (mask_threshold - offset)).reshape(logits.shape[0], -1).sum(-1)
    return hi / np.maximum(lo, 1)


def mask_to_bbox(mask: np.ndarray) -> np.ndarray:
    """XYWH bbox of a binary mask (zeros -> (0,0,0,0))."""
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return np.zeros(4, np.float64)
    x0, x1 = xs.min(), xs.max()
    y0, y1 = ys.min(), ys.max()
    return np.array([x0, y0, x1 - x0 + 1, y1 - y0 + 1], np.float64)


def box_nms(boxes_xywh: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy IoU NMS on XYWH boxes -> kept indices."""
    if len(boxes_xywh) == 0:
        return np.zeros(0, np.int64)
    x0, y0 = boxes_xywh[:, 0], boxes_xywh[:, 1]
    x1 = x0 + boxes_xywh[:, 2]
    y1 = y0 + boxes_xywh[:, 3]
    areas = (x1 - x0) * (y1 - y0)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        xx0 = np.maximum(x0[i], x0[order[1:]])
        yy0 = np.maximum(y0[i], y0[order[1:]])
        xx1 = np.minimum(x1[i], x1[order[1:]])
        yy1 = np.minimum(y1[i], y1[order[1:]])
        inter = np.maximum(0, xx1 - xx0) * np.maximum(0, yy1 - yy0)
        iou = inter / np.maximum(areas[i] + areas[order[1:]] - inter, 1e-9)
        order = order[1:][iou <= thresh]
    return np.asarray(keep, np.int64)


def generate_crop_boxes(im_size: tuple[int, int], n_layers: int,
                        overlap_ratio: float):
    """XYXY crop boxes per layer: layer 0 = full image, layer i has (2^i)^2
    overlapping crops (upstream SAM generate_crop_boxes semantics, the crop pass
    the reference enables with crop_n_layers=1 at preprocess.py:368)."""
    import math
    from itertools import product
    im_h, im_w = im_size
    boxes = [[0, 0, im_w, im_h]]
    layers = [0]
    short_side = min(im_h, im_w)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_per_side))
        cw = crop_len(im_w, n_per_side, overlap)
        ch = crop_len(im_h, n_per_side, overlap)
        x0s = [int((cw - overlap) * i) for i in range(n_per_side)]
        y0s = [int((ch - overlap) * i) for i in range(n_per_side)]
        for x0, y0 in product(x0s, y0s):
            boxes.append([x0, y0, min(x0 + cw, im_w), min(y0 + ch, im_h)])
            layers.append(i_layer + 1)
    return boxes, layers


def is_box_near_crop_edge(bbox_xywh: np.ndarray, crop_box, orig_size,
                          atol: float = 20.0) -> bool:
    """True if the (full-image-coords) box touches the crop boundary without
    touching the image boundary — such masks are clipped artifacts of the crop
    and are dropped (upstream SAM is_box_near_crop_edge)."""
    h, w = orig_size
    box = np.array([bbox_xywh[0], bbox_xywh[1],
                    bbox_xywh[0] + bbox_xywh[2] - 1,
                    bbox_xywh[1] + bbox_xywh[3] - 1], np.float64)
    crop = np.asarray(crop_box, np.float64)
    orig = np.array([0, 0, w, h], np.float64)
    near_crop = np.abs(box - crop) <= atol
    near_image = np.abs(box - orig) <= atol
    return bool(np.any(near_crop & ~near_image))


def remove_small_regions(mask: np.ndarray, min_area: int) -> np.ndarray:
    """Drop disconnected islands and fill holes smaller than min_area (SAM postproc)."""
    import cv2
    m = mask.astype(np.uint8)
    n, regions, stats, _ = cv2.connectedComponentsWithStats(m, 8)
    small = [i for i in range(1, n) if stats[i, cv2.CC_STAT_AREA] < min_area]
    if small:
        m[np.isin(regions, small)] = 0
    n, regions, stats, _ = cv2.connectedComponentsWithStats(1 - m, 8)
    small = [i for i in range(1, n) if stats[i, cv2.CC_STAT_AREA] < min_area]
    if small:
        m[np.isin(regions, small)] = 1
    return m.astype(bool)


class AutoMaskGenerator:
    """generate(image) -> (masks_default, masks_s, masks_m, masks_l), each a list of
    dicts with `segmentation`, `bbox`, `predicted_iou`, `stability_score` (the key set
    the pipeline consumes, `/root/reference/preprocess.py:193-194,286-287`)."""

    def __init__(self, predictor: Callable, config: AutoMaskConfig | None = None):
        self.predictor = predictor
        self.config = config or AutoMaskConfig()

    def generate(self, image: np.ndarray):
        cfg = self.config
        h, w = image.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            (h, w), cfg.crop_n_layers, cfg.crop_overlap_ratio)

        per_head: list[list[dict]] = [[], [], [], []]  # default, s, m, l
        for crop_box, layer_idx in zip(crop_boxes, layer_idxs):
            crop_heads = self._process_crop(image, crop_box, layer_idx, (h, w))
            for i in range(4):
                per_head[i].extend(crop_heads[i])

        out = []
        for recs in per_head:
            if not recs:
                out.append([])
                continue
            if len(crop_boxes) > 1:
                # cross-crop dedup preferring masks found in SMALLER crops (they
                # see the object at higher effective resolution) — upstream
                # SAM's 1/crop-area NMS scoring
                boxes = np.stack([r["bbox"] for r in recs])
                areas = np.array([
                    (r["crop_box"][2] - r["crop_box"][0])
                    * (r["crop_box"][3] - r["crop_box"][1]) for r in recs],
                    np.float64)
                keep = box_nms(boxes, 1.0 / areas, cfg.crop_nms_thresh)
                recs = [recs[i] for i in sorted(keep)]
            out.append(recs)
        return tuple(out)

    def _process_crop(self, image: np.ndarray, crop_box, layer_idx: int,
                      orig_size) -> list[list[dict]]:
        """Run the point grid over one crop; masks come back in full-image
        coordinates, per-crop NMS'd per head (upstream SAM _process_crop)."""
        cfg = self.config
        h, w = orig_size
        x0, y0, x1, y1 = crop_box
        crop = image[y0:y1, x0:x1]
        ch, cw = crop.shape[:2]
        is_full = (x0, y0, x1, y1) == (0, 0, w, h)
        n_pts = max(cfg.points_per_side
                    // (cfg.crop_n_points_downscale_factor ** layer_idx), 1)
        grid = build_point_grid(n_pts) * np.array([cw, ch])

        per_head: list[list[dict]] = [[], [], [], []]
        for start in range(0, len(grid), cfg.points_per_batch):
            pts = grid[start:start + cfg.points_per_batch]
            masks, iou_preds, logits = self.predictor(crop, pts)
            masks = np.asarray(masks)
            iou_preds = np.asarray(iou_preds)
            logits = np.asarray(logits)
            stab = stability_score(
                logits.reshape(-1, ch, cw), cfg.mask_threshold,
                cfg.stability_score_offset).reshape(iou_preds.shape)

            best_head = np.argmax(iou_preds, axis=1)
            for p in range(len(pts)):
                for head in range(3):
                    record_to = [head + 1]
                    if head == best_head[p]:
                        record_to.append(0)
                    if iou_preds[p, head] < cfg.pred_iou_thresh:
                        continue
                    if stab[p, head] < cfg.stability_score_thresh:
                        continue
                    seg_crop = masks[p, head]
                    if not seg_crop.any():
                        continue
                    if cfg.min_mask_region_area > 0:
                        seg_crop = remove_small_regions(
                            seg_crop, cfg.min_mask_region_area)
                        if not seg_crop.any():
                            continue
                    bbox = mask_to_bbox(seg_crop)
                    bbox = bbox + np.array([x0, y0, 0, 0], np.float64)  # uncrop
                    if not is_full and is_box_near_crop_edge(bbox, crop_box,
                                                             orig_size):
                        continue  # clipped artifact of the crop window
                    if is_full:
                        seg = seg_crop
                    else:
                        seg = np.zeros((h, w), bool)
                        seg[y0:y1, x0:x1] = seg_crop
                    rec = {
                        "segmentation": seg,
                        "bbox": bbox,
                        "predicted_iou": float(iou_preds[p, head]),
                        "stability_score": float(stab[p, head]),
                        "point_coords": [[pts[p][0] + x0, pts[p][1] + y0]],
                        "crop_box": list(crop_box),
                    }
                    for lst in record_to:
                        per_head[lst].append(rec)

        out = []
        for recs in per_head:
            if not recs:
                out.append([])
                continue
            boxes = np.stack([r["bbox"] for r in recs])
            scores = np.array([r["predicted_iou"] for r in recs])
            keep = box_nms(boxes, scores, cfg.box_nms_thresh)
            out.append([recs[i] for i in sorted(keep)])
        return out
