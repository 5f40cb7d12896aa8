"""Language-feature extraction pipeline (process.sh step 1).

TPU-native `/root/reference/preprocess.py` `create()`: per image, generate 4-granularity
SAM masks, NMS them (masks.masks_update, iou_thr=0.8/score_thr=0.7/inner_thr=0.5 as at
`preprocess.py:302`), crop/pad/resize each mask to a 224^2 CLIP tile, embed with CLIP,
L2-normalize, and write the `<image>_f.npy` [M, 512] feature table + `<image>_s.npy`
[4, H, W] seg maps with cumulative-offset ids — the exact contract
`scene/cameras.py:58-92` consumes.

The SAM and CLIP backends are injected (see backends.py): any
callable pair works, which keeps the pipeline testable offline and lets the embeddings
run through flax/jax ports of the encoders when their weights are available.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from langsplat_tpu.preprocess.masks import mask_to_segmap, masks_update


def embed_image(image: np.ndarray, mask_generator, clip_encode: Callable,
                levels=("default", "s", "m", "l")):
    """One image -> ({level: [Mi, D] embeds}, {level: [H, W] seg map}).

    Mirrors `_embed_clip_sam_tiles` + `sam_encoder` (preprocess.py:176-329).
    """
    masks_4 = mask_generator.generate(image)
    masks_4 = masks_update(*masks_4, iou_thr=0.8, score_thr=0.7, inner_thr=0.5)

    embeds, seg_maps = {}, {}
    for level, masks_lvl in zip(levels, masks_4):
        if len(masks_lvl) == 0:
            if level == "default":
                raise ValueError("no masks at the default level")
            continue
        tiles, seg_map = mask_to_segmap(masks_lvl, image)
        emb = np.asarray(clip_encode(tiles))
        emb = emb / (np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
        embeds[level] = emb.astype(np.float16)
        seg_maps[level] = seg_map
    return embeds, seg_maps


def create(image_list: list[np.ndarray], name_list: list[str], save_folder: str,
           mask_generator, clip_encode: Callable) -> None:
    """Process a scene's images into language feature files (reference create())."""
    os.makedirs(save_folder, exist_ok=True)
    for image, name in zip(image_list, name_list):
        embeds, seg_maps = embed_image(image, mask_generator, clip_encode)
        levels = list(embeds.keys())
        lengths = [len(embeds[k]) for k in levels]
        features = np.concatenate([embeds[k] for k in levels], axis=0)

        # cumulative-offset ids: level j's ids shift by sum of earlier levels' counts
        offsets = np.cumsum([0] + lengths[:-1])
        stacked = []
        for j, k in enumerate(levels):
            v = seg_maps[k].copy()
            assert v.max() == lengths[j] - 1
            if j > 0:
                v[v != -1] += offsets[j]
            stacked.append(v)
        # absent levels (reference keeps 4 rows; missing levels replicate default)
        while len(stacked) < 4:
            stacked.append(stacked[0])
        seg_map = np.stack(stacked[:4], axis=0)

        base = os.path.join(save_folder, os.path.splitext(name)[0])
        np.save(base + "_s.npy", seg_map)
        np.save(base + "_f.npy", features)


def load_scene_images(dataset_path: str, resolution: int = -1,
                      images_dir: str = "images"):
    """Load + auto-downscale scene images (>1080p -> 1080p; preprocess.py:374-400).

    Returns (list of [H, W, 3] uint8 RGB arrays, list of file names).
    """
    import cv2
    img_folder = os.path.join(dataset_path, images_dir)
    data_list = sorted(os.listdir(img_folder))
    images = []
    for name in data_list:
        bgr = cv2.imread(os.path.join(img_folder, name))
        orig_h, orig_w = bgr.shape[:2]
        if resolution == -1:
            global_down = orig_h / 1080 if orig_h > 1080 else 1.0
        else:
            global_down = orig_w / resolution
        size = (int(orig_w / global_down), int(orig_h / global_down))
        bgr = cv2.resize(bgr, size)
        images.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
    return images, data_list
