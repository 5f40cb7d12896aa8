"""Evaluation protocol tests: relevancy math vs the reference formula, mode filter vs the
reference loop, and a synthetic end-to-end IoU/localization run."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from langsplat_tpu.evaluation import colormaps
from langsplat_tpu.evaluation.iou_loc import (activate_stream, eval_gt_lerfdata,
                                              evaluate, lerf_localization,
                                              mode_filter)
from langsplat_tpu.evaluation.relevancy import get_max_across, relevancy


def reference_relevancy(embed, pos_embeds, neg_embeds, positive_id):
    """Direct numpy port of OpenCLIPNetwork.get_relevancy (openclip_encoder.py:41-56)."""
    phrases = np.concatenate([pos_embeds, neg_embeds], axis=0)
    output = embed @ phrases.T
    positive_vals = output[:, positive_id:positive_id + 1]
    negative_vals = output[:, len(pos_embeds):]
    repeated_pos = np.repeat(positive_vals, len(neg_embeds), axis=1)
    sims = np.stack([repeated_pos, negative_vals], axis=-1)
    e = np.exp(10 * sims - 10 * sims.max(axis=-1, keepdims=True))
    softmax = e / e.sum(axis=-1, keepdims=True)
    best_id = softmax[..., 0].argmin(axis=1)
    return softmax[np.arange(len(embed)), best_id]


def test_relevancy_matches_reference_formula():
    rng = np.random.default_rng(0)
    embeds = rng.normal(size=(100, 512)).astype(np.float32)
    embeds /= np.linalg.norm(embeds, axis=-1, keepdims=True)
    pos = rng.normal(size=(3, 512)).astype(np.float32)
    pos /= np.linalg.norm(pos, axis=-1, keepdims=True)
    neg = rng.normal(size=(4, 512)).astype(np.float32)
    neg /= np.linalg.norm(neg, axis=-1, keepdims=True)
    for pid in range(3):
        ours = np.asarray(relevancy(jnp.asarray(embeds), jnp.asarray(pos[pid]),
                                    jnp.asarray(neg)))
        ref = reference_relevancy(embeds, pos, neg, pid)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_get_max_across_shape_and_consistency():
    rng = np.random.default_rng(1)
    sem = rng.normal(size=(3, 8, 10, 512)).astype(np.float32)
    pos = rng.normal(size=(2, 512)).astype(np.float32)
    neg = rng.normal(size=(4, 512)).astype(np.float32)
    out = np.asarray(get_max_across(jnp.asarray(sem), jnp.asarray(pos),
                                    jnp.asarray(neg)))
    assert out.shape == (3, 2, 8, 10)
    # spot check one (level, prompt, pixel) against flat relevancy
    flat = np.asarray(relevancy(jnp.asarray(sem[1].reshape(-1, 512)),
                                jnp.asarray(pos[0]), jnp.asarray(neg)))[:, 0]
    np.testing.assert_allclose(out[1, 0].reshape(-1), flat, atol=1e-6)


def reference_smooth(mask, scale=3):
    """Direct port of the reference `smooth` loop (eval/utils.py:46-55)."""
    h, w = mask.shape[:2]
    im_smooth = mask.copy()
    for i in range(h):
        for j in range(w):
            square = mask[max(0, i - scale):min(i + scale + 1, h - 1),
                          max(0, j - scale):min(j + scale + 1, w - 1)]
            im_smooth[i, j] = np.argmax(np.bincount(square.reshape(-1)))
    return im_smooth


def test_mode_filter_matches_reference_loop():
    rng = np.random.default_rng(2)
    for shape in [(20, 25), (9, 9)]:
        mask = (rng.uniform(size=shape) > 0.6).astype(np.uint8)
        np.testing.assert_array_equal(mode_filter(mask), reference_smooth(mask))


def make_labelme_scene(tmp_path, h=64, w=80):
    """Two frames with one 'cup' box each + matching jpg."""
    from PIL import Image
    for frame in (1, 5):
        poly = [[10, 10], [30, 10], [30, 30], [10, 30]]
        data = {
            "info": {"height": h, "width": w, "name": f"frame_{frame:05d}.jpg"},
            "objects": [{"category": "cup", "bbox": [10, 10, 30, 30],
                         "segmentation": poly}],
        }
        with open(tmp_path / f"frame_{frame:05d}.json", "w") as f:
            json.dump(data, f)
        Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(
            tmp_path / f"frame_{frame:05d}.jpg")
    return h, w


def test_eval_gt_lerfdata(tmp_path):
    h, w = make_labelme_scene(tmp_path)
    gt, (gh, gw), img_paths = eval_gt_lerfdata(str(tmp_path))
    assert (gh, gw) == (h, w)
    assert set(gt.keys()) == {"0", "4"}
    assert "cup" in gt["0"]
    assert gt["0"]["cup"]["mask"].shape == (h, w)
    assert gt["0"]["cup"]["mask"][15, 15] == 1
    assert gt["0"]["cup"]["mask"][50, 50] == 0
    assert len(img_paths) == 2


def test_activate_stream_and_localization_synthetic():
    # relevancy already computed: prompt strongly activates inside the GT box
    h, w = 64, 80
    valid_map = np.full((3, 1, h, w), 0.05, np.float32)
    valid_map[1, 0, 10:31, 10:31] = 0.95  # level 1 is the good one
    mask_gt = np.zeros((h, w), np.uint8)
    mask_gt[10:31, 10:31] = 1
    img_ann = {"cup": {"mask": mask_gt,
                       "bboxes": np.array([10, 10, 30, 30])}}
    ious, lvls, smoothed, masks = activate_stream(valid_map, img_ann, ["cup"],
                                                  thresh=0.4)
    assert lvls[0] == 1
    assert ious[0] > 0.5
    acc = lerf_localization(valid_map, img_ann, ["cup"])
    assert acc == 1


def test_evaluate_end_to_end_synthetic(tmp_path):
    h, w = make_labelme_scene(tmp_path, h=48, w=64)
    rng = np.random.default_rng(3)
    # "CLIP space": 2 orthogonal unit dirs; cup features inside box, bg outside
    d_cup = np.zeros(512, np.float32)
    d_cup[0] = 1
    d_bg = np.zeros(512, np.float32)
    d_bg[1] = 1

    # "3-d latents" are literally first-3-dims here; decode embeds to 512
    def decode_fn(z):
        out = jnp.zeros((z.shape[0], 512))
        return out.at[:, :3].set(z)

    def encode_text(prompts):
        table = {"cup": d_cup, "object": d_bg, "things": d_bg, "stuff": d_bg,
                 "texture": d_bg}
        return np.stack([table[p] for p in prompts])

    # rendered 3-d feature maps for 3 levels x 10 frames
    for lvl in range(1, 4):
        d = tmp_path / f"feat_{lvl}"
        d.mkdir()
        for idx in range(5):
            fm = np.zeros((48, 64, 3), np.float32)
            fm[..., :] = [0, 1, 0]        # bg latent -> d_bg
            if lvl == 2:
                fm[10:31, 10:31] = [1, 0, 0]  # cup latent
            np.save(d / f"{idx:05d}.npy", fm)

    vis_out = tmp_path / "eval_result"
    res = evaluate([str(tmp_path / f"feat_{i}") for i in (1, 2, 3)],
                   str(tmp_path), decode_fn, encode_text, mask_thresh=0.4,
                   logger=lambda *_: None, output_path=str(vis_out))
    assert res["miou"] > 0.5
    assert res["localization_acc"] == 1.0
    assert all(l == 1 for l in res["chosen_levels"])
    # visualization artifacts mirror the reference layout
    # (evaluate_iou_loc.py:128-143,205-216): frames are {idx+1:05d} dirs
    for frame in ("00001", "00005"):
        base = vis_out / frame
        for lvl in range(3):
            assert (base / "heatmap" / f"cup_{lvl}.png").exists()
            assert (base / "composited" / f"cup_{lvl}.png").exists()
        assert (base / "chosen_cup.png").exists()
        assert (base / "localization" / "cup.png").exists()


def test_colormaps():
    x = np.random.default_rng(4).uniform(size=(8, 8, 1)).astype(np.float32)
    rgb = colormaps.apply_colormap(x, colormaps.ColormapOptions("turbo"))
    assert rgb.shape == (8, 8, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    hi = np.random.default_rng(5).normal(size=(8, 8, 16)).astype(np.float32)
    pca = colormaps.apply_pca_colormap(hi)
    assert pca.shape == (8, 8, 3)
    assert np.isfinite(pca).all()
