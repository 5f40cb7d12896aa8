"""Automatic mask generation at four granularities (whole / subpart / part).

TPU-native equivalent of the reference's `segment-anything-langsplat` fork (component N6,
SURVEY.md §2.1): upstream SAM's `SamAutomaticMaskGenerator` keeps only the best of the 3
multimask heads; the LangSplat fork returns FOUR lists — (default, s, m, l) — where
default is the best-by-IoU head and s/m/l are the three granularity heads
(call-site contract `/root/reference/preprocess.py:299`).

This module is model-agnostic: it takes any `predictor(points [P,2]) -> (masks
[P,3,H,W] bool, iou_preds [P,3], logits [P,3,H,W])` (e.g. a transformers SamModel
wrapper, see sam_backend.py) and reimplements the generation loop in vectorized numpy:
32x32 point grid, predicted-IoU and stability filtering, per-head box NMS, optional crop
layers, small-region removal. Reference hyperparameters (`preprocess.py:362-372`):
points_per_side=32, pred_iou_thresh=0.7, box_nms_thresh=0.7,
stability_score_thresh=0.85, crop_n_layers=1, min_mask_region_area=100.
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
    crop_n_layers: int = 0          # crop refinement; 0 is usually sufficient
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
        grid = build_point_grid(cfg.points_per_side) * np.array([w, h])

        per_head: list[list[dict]] = [[], [], [], []]  # default, s, m, l
        for start in range(0, len(grid), cfg.points_per_batch):
            pts = grid[start:start + cfg.points_per_batch]
            masks, iou_preds, logits = self.predictor(image, pts)
            masks = np.asarray(masks)
            iou_preds = np.asarray(iou_preds)
            logits = np.asarray(logits)
            stab = stability_score(
                logits.reshape(-1, h, w), cfg.mask_threshold,
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
                    seg = masks[p, head]
                    if not seg.any():
                        continue
                    if cfg.min_mask_region_area > 0:
                        seg = remove_small_regions(seg, cfg.min_mask_region_area)
                        if not seg.any():
                            continue
                    rec = {
                        "segmentation": seg,
                        "bbox": mask_to_bbox(seg),
                        "predicted_iou": float(iou_preds[p, head]),
                        "stability_score": float(stab[p, head]),
                        "point_coords": [pts[p].tolist()],
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
        return tuple(out)
