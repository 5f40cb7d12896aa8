"""LERF open-vocabulary IoU + localization evaluation protocol.

Parity oracle: `/root/reference/eval/evaluate_iou_loc.py` — exact protocol reimplemented:
labelme GT parsing, per-prompt relevancy maps smoothed with a 30x30 mean filter averaged
50/50 with the raw map, min-max normalization into [-1,1] clipped to [0,1], threshold at
`mask_thresh` into a binary mask cleaned by a 7x7 majority (mode) filter, best-of-levels
selection by max activation, and localization as smoothed-argmax-in-bbox. The reference's
O(H*W*49) Python-loop mode filter becomes an integral-image majority vote with the SAME
window clamping (including its `h-1`/`w-1` off-by-one) for bit parity.
"""

from __future__ import annotations

import glob
import json
import os
from collections import defaultdict
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from langsplat_tpu.evaluation.relevancy import get_max_across


def polygon_to_mask(img_shape, points_list) -> np.ndarray:
    import cv2
    points = np.asarray(points_list, dtype=np.int32)
    mask = np.zeros(img_shape, dtype=np.uint8)
    cv2.fillPoly(mask, [points], 1)
    return mask


def stack_mask(mask_base, mask_add):
    mask = mask_base.copy()
    mask[mask_add != 0] = 1
    return mask


def eval_gt_lerfdata(json_folder: str):
    """Parse LERF labelme GT (reference eval_gt_lerfdata, evaluate_iou_loc.py:46-87).

    Returns (gt_ann {frame_idx: {label: {bboxes, mask}}}, (h, w), image_paths).
    """
    gt_json_paths = sorted(glob.glob(os.path.join(json_folder, "frame_*.json")))
    img_paths = sorted(glob.glob(os.path.join(json_folder, "frame_*.jpg")))
    gt_ann = {}
    h = w = 0
    for js_path in gt_json_paths:
        img_ann = defaultdict(dict)
        with open(js_path) as f:
            gt_data = json.load(f)
        h, w = gt_data["info"]["height"], gt_data["info"]["width"]
        idx = int(gt_data["info"]["name"].split("_")[-1].split(".jpg")[0]) - 1
        for prompt_data in gt_data["objects"]:
            label = prompt_data["category"]
            box = np.asarray(prompt_data["bbox"]).reshape(-1)
            mask = polygon_to_mask((h, w), prompt_data["segmentation"])
            if img_ann[label].get("mask", None) is not None:
                mask = stack_mask(img_ann[label]["mask"], mask)
                img_ann[label]["bboxes"] = np.concatenate(
                    [img_ann[label]["bboxes"].reshape(-1, 4), box.reshape(-1, 4)],
                    axis=0)
            else:
                img_ann[label]["bboxes"] = box
            img_ann[label]["mask"] = mask
        gt_ann[f"{idx}"] = dict(img_ann)
    return gt_ann, (h, w), img_paths


def mode_filter(mask: np.ndarray, scale: int = 3) -> np.ndarray:
    """Binary majority filter == reference `smooth` (eval/utils.py:46-55), vectorized.

    Window rows are [max(0, i-scale), min(i+scale+1, h-1)) — note the h-1 clamp (the
    reference excludes the last row/col for interior pixels); ties resolve to 0.
    """
    h, w = mask.shape[:2]
    ii = np.zeros((h + 1, w + 1), np.int64)
    ii[1:, 1:] = np.cumsum(np.cumsum(mask.astype(np.int64), axis=0), axis=1)
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    r0 = np.maximum(0, i - scale)
    r1 = np.minimum(i + scale + 1, h - 1)
    c0 = np.maximum(0, j - scale)
    c1 = np.minimum(j + scale + 1, w - 1)
    r1 = np.maximum(r1, r0)
    c1 = np.maximum(c1, c0)
    r0b, r1b = np.broadcast_arrays(r0, r1 * np.ones_like(j))
    c0b, c1b = np.broadcast_arrays(c0 * np.ones_like(i), c1)
    ones = (ii[r1b, c1b] - ii[r0b, c1b] - ii[r1b, c0b] + ii[r0b, c0b])
    area = (r1b - r0b) * (c1b - c0b)
    out = (ones * 2 > area).astype(mask.dtype)
    return np.where(area > 0, out, mask)


def mean_filter_30(x: np.ndarray, scale: int = 30) -> np.ndarray:
    """30x30 box filter with reflect-101 padding (cv2.filter2D default semantics)."""
    import cv2
    kernel = np.ones((scale, scale), np.float32) / (scale * scale)
    return cv2.filter2D(x.astype(np.float32), -1, kernel)


def activate_stream(valid_map: np.ndarray, img_ann: dict, positives: list[str],
                    thresh: float = 0.5, out_dir: str | None = None,
                    rgb_img: np.ndarray | None = None):
    """Per-prompt IoU with best-of-levels selection (evaluate_iou_loc.py:90-159).

    valid_map: [L, P, H, W] raw relevancy maps (get_max_across output).
    With out_dir, writes the reference's per-prompt heatmap / composited /
    chosen-mask artifacts (evaluate_iou_loc.py:113-143, 155-157).
    Returns (chosen_ious, chosen_levels, smoothed_map, masks [L,P,H,W]).
    """
    from langsplat_tpu.evaluation import viz

    n_head, n_prompt, h, w = valid_map.shape
    smoothed = valid_map.copy()
    chosen_iou_list, chosen_lvl_list = [], []
    masks = np.zeros_like(valid_map, dtype=np.uint8)
    for k in range(n_prompt):
        iou_lvl = np.zeros(n_head)
        for i in range(n_head):
            avg = mean_filter_30(valid_map[i, k])
            smoothed[i, k] = 0.5 * (avg + valid_map[i, k])

            if out_dir is not None:
                viz.heatmap_png(smoothed[i, k], os.path.join(
                    out_dir, "heatmap", f"{positives[k]}_{i}.png"))
                if rgb_img is not None:
                    viz.composited_png(smoothed[i, k], rgb_img, os.path.join(
                        out_dir, "composited", f"{positives[k]}_{i}.png"))

            output = smoothed[i, k]
            output = output - output.min()
            output = output / (output.max() + 1e-9)
            output = output * (1.0 - (-1.0)) + (-1.0)
            output = np.clip(output, 0, 1)

            mask_pred = (output > thresh).astype(np.uint8)
            mask_pred = mode_filter(mask_pred)
            masks[i, k] = mask_pred
            mask_gt = img_ann[positives[k]]["mask"].astype(np.uint8)
            intersection = np.sum(np.logical_and(mask_gt, mask_pred))
            union = np.sum(np.logical_or(mask_gt, mask_pred))
            iou_lvl[i] = intersection / union if union > 0 else 0.0

        score_lvl = smoothed[:, k].reshape(n_head, -1).max(axis=1)
        chosen_lvl = int(np.argmax(score_lvl))
        chosen_iou_list.append(float(iou_lvl[chosen_lvl]))
        chosen_lvl_list.append(chosen_lvl)
        if out_dir is not None:
            viz.save_mask(masks[chosen_lvl, k], os.path.join(
                out_dir, f"chosen_{positives[k]}.png"))
    return chosen_iou_list, chosen_lvl_list, smoothed, masks


def lerf_localization(valid_map: np.ndarray, img_ann: dict,
                      positives: list[str], out_dir: str | None = None,
                      rgb_img: np.ndarray | None = None) -> int:
    """Smoothed-argmax-in-bbox accuracy count (evaluate_iou_loc.py:162-217).

    With out_dir (+ rgb_img), writes the per-prompt localization composites
    (evaluate_iou_loc.py:205-216)."""
    from langsplat_tpu.evaluation import viz

    n_head, n_prompt, h, w = valid_map.shape
    acc_num = 0
    for k in range(n_prompt):
        avg_filtered = np.stack([mean_filter_30(valid_map[i, k])
                                 for i in range(n_head)], axis=-1)   # [H, W, L]
        score_lvl = np.zeros(n_head)
        coord_lvl = []
        for i in range(n_head):
            score = avg_filtered[..., i].max()
            coord = np.nonzero(avg_filtered[..., i] == score)
            score_lvl[i] = score
            coord_lvl.append(np.asarray(coord).transpose(1, 0)[..., ::-1])  # (x, y)
        selec_head = int(np.argmax(score_lvl))
        coord_final = coord_lvl[selec_head]

        if out_dir is not None and rgb_img is not None:
            from langsplat_tpu.evaluation.colormaps import (ColormapOptions,
                                                            apply_colormap)
            relev = 0.5 * (avg_filtered[..., selec_head]
                           + valid_map[selec_head, k])
            p_i = np.clip(relev - 0.5, 0, 1)[..., None].astype(np.float32)
            composited = apply_colormap(p_i / (p_i.max() + 1e-6),
                                        ColormapOptions(colormap="turbo"))
            composited[relev < 0.5, :] = np.asarray(rgb_img)[relev < 0.5, :] * 0.3
            viz.localization_png(
                composited, coord_final[0],
                img_ann[positives[k]]["bboxes"],
                os.path.join(out_dir, "localization", f"{positives[k]}.png"))

        for box in img_ann[positives[k]]["bboxes"].reshape(-1, 4):
            flag = 0
            x1, y1, x2, y2 = box
            x_min, x_max = min(x1, x2), max(x1, x2)
            y_min, y_max = min(y1, y2), max(y1, y2)
            for cord in coord_final:
                if x_min <= cord[0] <= x_max and y_min <= cord[1] <= y_max:
                    acc_num += 1
                    flag = 1
                    break
            if flag != 0:
                break
    return acc_num


def evaluate(feat_dirs: list[str], json_folder: str, decode_fn, encode_text_fn,
             mask_thresh: float = 0.4, logger=print,
             output_path: str | None = None) -> dict:
    """Full evaluation (evaluate_iou_loc.py:220-285).

    Args:
      feat_dirs: one rendered-feature dir per level (renders_npy with [H,W,3] files).
      decode_fn: [N, 3] -> [N, 512] autoencoder decoder.
      encode_text_fn: list[str] -> [K, 512] L2-normalized CLIP text embeddings.
      output_path: when given, per-frame visualization artifacts are written to
        `<output_path>/<idx+1:05d>/{heatmap,composited,localization,chosen_*}`
        mirroring the reference layout (evaluate_iou_loc.py:249-250).
    Returns {"miou": float, "localization_acc": float, "chosen_levels": [...]}.
    """
    from langsplat_tpu.evaluation.relevancy import NEGATIVE_PROMPTS

    gt_ann, (h, w), img_paths = eval_gt_lerfdata(json_folder)
    eval_idx = [int(i) for i in gt_ann.keys()]

    neg_embeds = np.asarray(encode_text_fn(list(NEGATIVE_PROMPTS)))
    chosen_iou_all, chosen_lvl_all = [], []
    acc_num = 0
    for j, idx in enumerate(eval_idx):
        sem_feat = []
        for d in feat_dirs:
            paths = sorted(glob.glob(os.path.join(d, "*.npy")),
                           key=lambda p: int(os.path.basename(p).split(".npy")[0]))
            sem_feat.append(np.load(paths[idx]))
        sem_feat = np.stack(sem_feat)                       # [L, H, W, 3]
        lvl = sem_feat.shape[0]
        restored = np.asarray(decode_fn(
            jnp.asarray(sem_feat.reshape(-1, sem_feat.shape[-1]))))
        restored = restored.reshape(lvl, h, w, -1)

        img_ann = gt_ann[f"{idx}"]
        positives = list(img_ann.keys())
        pos_embeds = np.asarray(encode_text_fn(positives))
        valid_map = np.asarray(get_max_across(jnp.asarray(restored),
                                              jnp.asarray(pos_embeds),
                                              jnp.asarray(neg_embeds)))

        out_dir = rgb_img = None
        if output_path is not None:
            out_dir = os.path.join(output_path, f"{idx + 1:0>5}")
            os.makedirs(out_dir, exist_ok=True)
            if j < len(img_paths):
                from PIL import Image
                rgb_img = np.asarray(Image.open(img_paths[j]).convert("RGB"),
                                     np.float32) / 255.0

        ious, lvls, smoothed, _ = activate_stream(valid_map, img_ann, positives,
                                                  thresh=mask_thresh,
                                                  out_dir=out_dir,
                                                  rgb_img=rgb_img)
        chosen_iou_all.extend(ious)
        chosen_lvl_all.extend(lvls)
        acc_num += lerf_localization(valid_map, img_ann, positives,
                                     out_dir=out_dir, rgb_img=rgb_img)

    miou = float(np.mean(chosen_iou_all)) if chosen_iou_all else 0.0
    total_bboxes = sum(len(a) for a in gt_ann.values())
    acc = acc_num / total_bboxes if total_bboxes else 0.0
    logger(f"trunc thresh: {mask_thresh}")
    logger(f"iou chosen: {miou:.4f}")
    logger(f"Localization accuracy: {acc:.4f}")
    return {"miou": miou, "localization_acc": acc, "chosen_levels": chosen_lvl_all}
