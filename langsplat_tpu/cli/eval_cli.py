"""Evaluation CLI: the TPU-native `/root/reference/eval/evaluate_iou_loc.py` entry.

  python -m langsplat_tpu.cli.eval_cli --dataset_name teatime \
      --feat_dir output --ae_ckpt_dir ckpt --json_folder lerf_ovs/label \
      [--clip_model <local hf path> | --text_embeddings prompts.npz]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description="open-vocab IoU + localization eval")
    parser.add_argument("--dataset_name", type=str, required=True)
    parser.add_argument("--feat_dir", type=str, required=True)
    parser.add_argument("--ae_ckpt_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="eval_result")
    parser.add_argument("--json_folder", type=str, required=True)
    parser.add_argument("--mask_thresh", type=float, default=0.4)
    parser.add_argument("--encoder_dims", nargs="+", type=int,
                        default=[256, 128, 64, 32, 3])
    parser.add_argument("--decoder_dims", nargs="+", type=int,
                        default=[16, 32, 64, 128, 256, 256, 512])
    parser.add_argument("--clip_model", type=str, default=None,
                        help="HF path of CLIP ViT-B-16 laion2b weights")
    parser.add_argument("--text_embeddings", type=str, default=None,
                        help="npz of precomputed prompt embeddings (offline mode)")
    parser.add_argument("--iteration", type=str, default="None",
                        help="render iteration in the feat dir layout")
    parser.add_argument("--no_vis", action="store_true",
                        help="skip heatmap/composited/localization artifacts")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from langsplat_tpu.cli.autoencoder_cli import load_ae_checkpoint
    from langsplat_tpu.evaluation.iou_loc import evaluate
    from langsplat_tpu.models.autoencoder import init_autoencoder

    feat_dirs = [os.path.join(args.feat_dir, f"{args.dataset_name}_{i}",
                              "train", f"ours_{args.iteration}", "renders_npy")
                 for i in range(1, 4)]
    json_folder = os.path.join(args.json_folder, args.dataset_name)
    ae_ckpt = os.path.join(args.ae_ckpt_dir, args.dataset_name, "best_ckpt.npz")
    if not os.path.exists(ae_ckpt):
        ae_ckpt = os.path.join(args.ae_ckpt_dir, args.dataset_name, "ae_ckpt",
                               "best_ckpt.npz")

    output_path = os.path.join(args.output_dir, args.dataset_name)
    os.makedirs(output_path, exist_ok=True)
    timestamp = time.strftime("%Y%m%d_%H%M%S", time.localtime())
    logging.basicConfig(
        level=logging.INFO,
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(output_path,
                                                   f"{timestamp}.log"), "w")],
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    logger = logging.getLogger(args.dataset_name)

    model, variables = init_autoencoder(jax.random.key(0), args.encoder_dims,
                                        args.decoder_dims)
    variables = load_ae_checkpoint(ae_ckpt, variables)

    @jax.jit
    def decode_fn(z):
        return model.apply(variables, z, train=False, method="decode")

    if args.text_embeddings:
        from langsplat_tpu.evaluation.clip_text import PrecomputedTextEncoder
        encode_text = PrecomputedTextEncoder(args.text_embeddings)
    else:
        from langsplat_tpu.evaluation.clip_text import ClipTextEncoder, DEFAULT_MODEL
        encode_text = ClipTextEncoder(args.clip_model or DEFAULT_MODEL)

    result = evaluate(feat_dirs, json_folder, decode_fn, encode_text,
                      mask_thresh=args.mask_thresh, logger=logger.info,
                      output_path=None if args.no_vis else output_path)
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
