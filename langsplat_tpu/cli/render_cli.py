"""Render CLI: the TPU-native `/root/reference/render.py`.

Writes per-view renders/*.png + renders_npy/*.npy (H,W,C) and the GT equivalents —
the .npy files are the eval pipeline's input contract (render.py:35-52). With
--include_feature the output switches to the language feature image and the GT to
`get_language_feature`.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from langsplat_tpu.cli.args import add_model_args, add_pipeline_args, extract_configs
from langsplat_tpu.config import load_config


def render_set(model_path, name, iteration, cams, field, pipe, sh_degree,
               include_feature, bg, lf_path, feature_level):
    from PIL import Image
    from langsplat_tpu.train.loop import render_full

    base = os.path.join(model_path, name, f"ours_{iteration}")
    for sub in ("renders", "gt", "renders_npy", "gt_npy"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    for idx, cam in enumerate(cams):
        out = render_full(field, cam, pipe, sh_degree, include_feature, bg)
        if include_feature:
            rendering = np.asarray(out["language_feature_image"])
            gt = cam.get_language_feature(lf_path, feature_level)[0] \
                if lf_path and os.path.isdir(lf_path) else None
        else:
            rendering = np.asarray(out["render"])
            gt = cam.image
        np.save(os.path.join(base, "renders_npy", f"{idx:05d}.npy"),
                rendering.transpose(1, 2, 0))
        img8 = (np.clip(rendering, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(img8).save(os.path.join(base, "renders", f"{idx:05d}.png"))
        if gt is not None:
            np.save(os.path.join(base, "gt_npy", f"{idx:05d}.npy"),
                    gt.transpose(1, 2, 0))
            gt8 = (np.clip(gt, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
            Image.fromarray(gt8).save(os.path.join(base, "gt", f"{idx:05d}.png"))


def main(argv=None):
    parser = argparse.ArgumentParser(description="langsplat_tpu rendering")
    add_model_args(parser)
    add_pipeline_args(parser)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--include_feature", action="store_true")
    args = parser.parse_args(argv)

    cfg = extract_configs(args)
    # merge the saved run config like get_combined_args (arguments/__init__.py:96-116)
    saved = os.path.join(cfg.model.model_path, "cfg_args.json")
    if os.path.exists(saved):
        run_cfg = load_config(saved)
        run_cfg.model.model_path = cfg.model.model_path
        if cfg.model.source_path:
            run_cfg.model.source_path = cfg.model.source_path
        cfg = run_cfg

    import jax.numpy as jnp
    from langsplat_tpu.data.scene import Scene
    from langsplat_tpu.models import field_io

    scene = Scene(cfg.model, load_iteration=args.iteration, shuffle=False)
    field = scene.gaussians
    iteration = scene.loaded_iter

    ck = os.path.join(cfg.model.model_path, f"chkpnt{iteration}.npz")
    if args.include_feature and os.path.exists(ck):
        field, _, _, _, _ = field_io.load_field(ck, field.with_language_feature(3))

    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background else [0., 0., 0.])
    sh_degree = cfg.model.sh_degree
    common = dict(field=field, pipe=cfg.pipeline, sh_degree=sh_degree,
                  include_feature=args.include_feature, bg=bg,
                  lf_path=cfg.model.lf_path, feature_level=cfg.model.feature_level)
    if not args.skip_train:
        render_set(cfg.model.model_path, "train", iteration,
                   scene.get_train_cameras(), **common)
    if not args.skip_test:
        render_set(cfg.model.model_path, "test", iteration,
                   scene.get_test_cameras(), **common)


if __name__ == "__main__":
    main(sys.argv[1:])
