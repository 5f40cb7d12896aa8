"""Preprocess pipeline: mask NMS vs a direct port of the reference loop, seg-map
utilities, the automatic mask generator with a toy predictor, and create() output
contract."""

import os

import numpy as np
import pytest

from langsplat_tpu.preprocess import masks as M
from langsplat_tpu.preprocess.auto_mask import (AutoMaskConfig, AutoMaskGenerator,
                                                box_nms, build_point_grid,
                                                mask_to_bbox, stability_score)
from langsplat_tpu.preprocess.pipeline import create, embed_image


def reference_mask_nms(masks, scores, iou_thr=0.7, score_thr=0.1, inner_thr=0.2):
    """Direct numpy port of the reference loop (preprocess.py:215-279)."""
    scores = np.asarray(scores, np.float64)
    idx = np.argsort(-scores, kind="stable")
    scores_ord = scores[idx]
    num = len(idx)
    masks_ord = np.asarray(masks, bool)[idx]
    area = masks_ord.reshape(num, -1).sum(axis=1).astype(np.float64)

    iou_matrix = np.zeros((num, num))
    inner = np.zeros((num, num))
    for i in range(num):
        for j in range(i, num):
            inter = np.logical_and(masks_ord[i], masks_ord[j]).sum()
            union = np.logical_or(masks_ord[i], masks_ord[j]).sum()
            iou_matrix[i, j] = inter / union if union else 0.0
            if inter / area[i] < 0.5 and inter / area[j] >= 0.85:
                inner[i, j] = 1 - (inter / area[j]) * (inter / area[i])
            if inter / area[i] >= 0.85 and inter / area[j] < 0.5:
                inner[j, i] = 1 - (inter / area[j]) * (inter / area[i])
    iou_matrix = np.triu(iou_matrix, 1)
    iou_max = iou_matrix.max(axis=0)
    inner_u = np.triu(inner, 1).max(axis=0)
    inner_l = np.tril(inner, 1).max(axis=0)
    keep = iou_max <= iou_thr
    keep_conf = scores_ord > score_thr
    keep_iu = inner_u <= 1 - inner_thr
    keep_il = inner_l <= 1 - inner_thr
    top3 = np.argsort(-scores_ord, kind="stable")[:3]
    if keep_conf.sum() == 0:
        keep_conf[top3] = True
    if keep_iu.sum() == 0:
        keep_iu[top3] = True
    if keep_il.sum() == 0:
        keep_il[top3] = True
    keep = keep & keep_conf & keep_iu & keep_il
    return idx[keep]


def random_masks(m, h=32, w=40, seed=0):
    rng = np.random.default_rng(seed)
    out = np.zeros((m, h, w), bool)
    for i in range(m):
        cx, cy = rng.integers(5, w - 5), rng.integers(5, h - 5)
        r = rng.integers(3, 12)
        yy, xx = np.mgrid[:h, :w]
        out[i] = (xx - cx) ** 2 + (yy - cy) ** 2 < r ** 2
    return out


def test_mask_nms_matches_reference_loop():
    for seed in range(3):
        m = random_masks(12, seed=seed)
        scores = np.random.default_rng(seed + 10).uniform(0.2, 1.0, 12)
        ours = M.mask_nms(m, scores, iou_thr=0.7, score_thr=0.3, inner_thr=0.2)
        ref = reference_mask_nms(m, scores, iou_thr=0.7, score_thr=0.3,
                                 inner_thr=0.2)
        np.testing.assert_array_equal(np.sort(ours), np.sort(ref))


def test_mask_nms_nested_suppression():
    h = w = 40
    big = np.zeros((h, w), bool)
    big[5:35, 5:35] = True
    inner_m = np.zeros((h, w), bool)
    inner_m[10:20, 10:20] = True  # fully inside big, small relative area
    masks = np.stack([big, inner_m])
    keep = M.mask_nms(masks, np.array([0.9, 0.8]), iou_thr=0.7, score_thr=0.1,
                      inner_thr=0.5)
    ref = reference_mask_nms(masks, np.array([0.9, 0.8]), iou_thr=0.7,
                             score_thr=0.1, inner_thr=0.5)
    np.testing.assert_array_equal(np.sort(keep), np.sort(ref))


def test_pad_and_segmap():
    img = np.arange(20 * 30 * 3, dtype=np.uint8).reshape(20, 30, 3)
    seg = np.zeros((20, 30), bool)
    seg[5:15, 10:20] = True
    mask = {"segmentation": seg, "bbox": mask_to_bbox(seg)}
    crop = M.get_seg_img(mask, img)
    assert crop.shape == (10, 10, 3)
    padded = M.pad_img(np.zeros((10, 6, 3), np.uint8) + 7)
    assert padded.shape == (10, 10, 3)
    assert (padded[:, 2:8] == 7).all() and (padded[:, :2] == 0).all()

    tiles, seg_map = M.mask_to_segmap([mask], img)
    assert tiles.shape == (1, 3, 224, 224)
    assert seg_map[10, 15] == 0 and seg_map[0, 0] == -1


class ToyPredictor:
    """Predicts 3 nested circles (small/medium/large) around each point."""

    def __call__(self, image, points):
        h, w = image.shape[:2]
        yy, xx = np.mgrid[:h, :w]
        masks, ious, logits = [], [], []
        for (px, py) in points:
            ms, ls = [], []
            for r in (4, 8, 14):
                d2 = (xx - px) ** 2 + (yy - py) ** 2
                ms.append(d2 < r * r)
                # stability = area(d2 < r^2 - r)/area(d2 < r^2 + r) ~ (r-1)/(r+1)
                ls.append((r * r - d2).astype(np.float32) / r)
            masks.append(ms)
            ious.append([0.8, 0.9, 0.85])
            logits.append(ls)
        return np.asarray(masks), np.asarray(ious), np.asarray(logits)


def test_auto_mask_generator_four_levels():
    gen = AutoMaskGenerator(ToyPredictor(), AutoMaskConfig(
        points_per_side=4, pred_iou_thresh=0.7, stability_score_thresh=0.5,
        box_nms_thresh=0.7, min_mask_region_area=0, points_per_batch=8))
    image = np.zeros((64, 64, 3), np.uint8)
    d, s, m, l = gen.generate(image)
    assert len(d) > 0 and len(s) > 0 and len(m) > 0 and len(l) > 0
    for rec in d + s + m + l:
        assert set(rec) >= {"segmentation", "bbox", "predicted_iou",
                            "stability_score"}
    # s-level masks are the smallest, l-level the biggest
    area = lambda recs: np.mean([r["segmentation"].sum() for r in recs])
    assert area(s) < area(m) < area(l)
    # default level is the best-iou head (r=8 circles here)
    assert abs(area(d) - area(m)) < 1e-6


def test_crop_layers_add_part_masks():
    """crop_n_layers=1 runs a second prompting pass over 4 overlapping crops
    (upstream SAM crop semantics, enabled by the reference at
    preprocess.py:368) — the crop grid hits objects the coarse full-image grid
    misses, and the 4-head contract still holds."""
    from langsplat_tpu.preprocess.auto_mask import generate_crop_boxes

    # crop box geometry matches the upstream formula
    boxes, layers = generate_crop_boxes((60, 80), 1, 512 / 1500)
    assert boxes[0] == [0, 0, 80, 60] and layers[0] == 0
    assert len(boxes) == 5 and layers[1:] == [1, 1, 1, 1]
    for x0, y0, x1, y1 in boxes[1:]:
        assert 0 <= x0 < x1 <= 80 and 0 <= y0 < y1 <= 60
    # overlap: crops jointly cover the image
    cover = np.zeros((60, 80), bool)
    for x0, y0, x1, y1 in boxes[1:]:
        cover[y0:y1, x0:x1] = True
    assert cover.all()

    class TinyObjectPredictor:
        """Only yields a mask when the prompt lands within 3px of one of many
        small objects — a coarse grid misses most of them."""
        centers = [(x, y) for x in range(6, 64, 9) for y in range(6, 64, 9)]

        def __call__(self, image, points):
            h, w = image.shape[:2]
            yy, xx = np.mgrid[:h, :w]
            masks, ious, logits = [], [], []
            for (px, py) in points:
                near = [(cx, cy) for cx, cy in self.centers
                        if abs(cx - px) < 3 and abs(cy - py) < 3]
                ms, ls, iu = [], [], []
                for r, iou in ((2, 0.85), (3, 0.9), (4, 0.87)):
                    if near:
                        cx, cy = near[0]
                        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
                        ms.append(d2 < r * r)
                        ls.append((r * r - d2).astype(np.float32) / r)
                        iu.append(iou)
                    else:
                        ms.append(np.zeros((h, w), bool))
                        ls.append(np.full((h, w), -10.0, np.float32))
                        iu.append(0.0)
                masks.append(ms)
                ious.append(iu)
                logits.append(ls)
            return np.asarray(masks), np.asarray(ious), np.asarray(logits)

    image = np.zeros((64, 64, 3), np.uint8)
    base_cfg = dict(points_per_side=8, pred_iou_thresh=0.7,
                    stability_score_thresh=0.3, box_nms_thresh=0.7,
                    min_mask_region_area=0, points_per_batch=16)
    flat = AutoMaskGenerator(TinyObjectPredictor(),
                             AutoMaskConfig(**base_cfg, crop_n_layers=0))
    crops = AutoMaskGenerator(TinyObjectPredictor(),
                              AutoMaskConfig(**base_cfg, crop_n_layers=1))
    d0, s0, m0, l0 = flat.generate(image)
    d1, s1, m1, l1 = crops.generate(image)
    # the crop pass finds strictly more part-level masks
    assert len(d1) > len(d0)
    for rec in d1 + s1 + m1 + l1:
        assert set(rec) >= {"segmentation", "bbox", "predicted_iou",
                            "stability_score"}
        assert rec["segmentation"].shape == (64, 64)
        # bbox is in full-image coordinates and tight around the segmentation
        np.testing.assert_array_equal(rec["bbox"],
                                      mask_to_bbox(rec["segmentation"]))


def test_box_nms_and_grid():
    grid = build_point_grid(4)
    assert grid.shape == (16, 2)
    assert grid.min() > 0 and grid.max() < 1
    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [30, 30, 5, 5]], float)
    keep = box_nms(boxes, np.array([0.9, 0.8, 0.7]), 0.5)
    assert set(keep) == {0, 2}


def test_stability_score():
    logits = np.full((1, 10, 10), -2.0, np.float32)
    logits[0, :5] = 2.0
    logits[0, 5:8] = 0.5
    s = stability_score(logits, mask_threshold=0.0, offset=1.0)
    np.testing.assert_allclose(s, [50 / 80])


def test_create_output_contract(tmp_path):
    gen = AutoMaskGenerator(ToyPredictor(), AutoMaskConfig(
        points_per_side=3, pred_iou_thresh=0.7, stability_score_thresh=0.5,
        min_mask_region_area=0, points_per_batch=16))
    rng = np.random.default_rng(0)

    def fake_clip(tiles):
        return rng.normal(size=(len(tiles), 512)).astype(np.float32)

    imgs = [np.full((48, 48, 3), 100, np.uint8)]
    create(imgs, ["view0.png"], str(tmp_path), gen, fake_clip)
    seg = np.load(tmp_path / "view0_s.npy")
    feats = np.load(tmp_path / "view0_f.npy")
    assert seg.shape == (4, 48, 48)
    assert feats.ndim == 2 and feats.shape[1] == 512
    assert feats.dtype == np.float16
    # ids reference valid feature rows with cumulative offsets
    assert seg.max() == len(feats) - 1
    assert seg.min() >= -1
    # every level's used ids form a contiguous range
    used = [np.unique(seg[i][seg[i] >= 0]) for i in range(4)]
    for u in used:
        assert len(u) > 0
    # l2 normalized
    np.testing.assert_allclose(np.linalg.norm(feats.astype(np.float32), axis=1),
                               1.0, atol=1e-2)
