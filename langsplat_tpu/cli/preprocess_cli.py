"""Preprocessing CLI: the TPU-native `/root/reference/preprocess.py` entry.

  python -m langsplat_tpu.cli.preprocess_cli --dataset_path <scene> \
      [--sam_model <local hf path>] [--clip_model <local hf path>]
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np


def seed_everything(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", type=str, required=True)
    parser.add_argument("--resolution", type=int, default=-1)
    parser.add_argument("--sam_model", type=str, default="facebook/sam-vit-huge")
    parser.add_argument("--clip_model", type=str,
                        default="laion/CLIP-ViT-B-16-laion2B-s34b-b88k")
    parser.add_argument("--device", type=str, default="cpu")
    parser.add_argument("--points_per_side", type=int, default=32)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)
    seed_everything(args.seed)

    from langsplat_tpu.preprocess.auto_mask import AutoMaskConfig, AutoMaskGenerator
    from langsplat_tpu.preprocess.backends import (TransformersClipImageEncoder,
                                                   TransformersSamPredictor)
    from langsplat_tpu.preprocess.pipeline import create, load_scene_images

    predictor = TransformersSamPredictor(args.sam_model, device=args.device)
    clip_encode = TransformersClipImageEncoder(args.clip_model, device=args.device)
    generator = AutoMaskGenerator(
        predictor,
        AutoMaskConfig(points_per_side=args.points_per_side, pred_iou_thresh=0.7,
                       box_nms_thresh=0.7, stability_score_thresh=0.85,
                       crop_n_layers=1, min_mask_region_area=100))

    images, names = load_scene_images(args.dataset_path, args.resolution)
    save_folder = os.path.join(args.dataset_path, "language_features")
    create(images, names, save_folder, generator, clip_encode)
    print(f"wrote language features for {len(images)} images to {save_folder}")


if __name__ == "__main__":
    main(sys.argv[1:])
