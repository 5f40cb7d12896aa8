"""Training CLI: the TPU-native `/root/reference/train.py`.

Usage parity:
  python train.py -s <scene> -m out --no_include_feature          # phase A (RGB 3DGS)
  python train.py -s <scene> -m out --start_checkpoint out_3/chkpnt30000.npz \
                  --feature_level 3                               # phase B (language)
"""

from __future__ import annotations

import argparse
import sys

from langsplat_tpu.cli.args import (add_model_args, add_optimization_args,
                                    add_pipeline_args, extract_configs)


def main(argv=None):
    parser = argparse.ArgumentParser(description="langsplat_tpu training")
    add_model_args(parser)
    add_optimization_args(parser)
    add_pipeline_args(parser)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--start_checkpoint", type=str, default="")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=0,
                        help="SIBR viewer bridge port (0 = disabled)")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="capture a jax.profiler trace of a few steps here")
    parser.add_argument("--profile_from", type=int, default=50)
    parser.add_argument("--profile_steps", type=int, default=5)
    args = parser.parse_args(argv)
    args.save_iterations.append(args.iterations)

    cfg = extract_configs(args)
    # reference quirk preserved: model_path is suffixed with the feature level
    # (train.py:222)
    if cfg.model.model_path:
        cfg.model.model_path = f"{cfg.model.model_path}_{cfg.model.feature_level}"
    print(f"Optimizing {cfg.model.model_path}")
    from dataclasses import replace
    cfg = replace(cfg,
                  test_iterations=tuple(args.test_iterations),
                  save_iterations=tuple(args.save_iterations),
                  checkpoint_iterations=tuple(args.checkpoint_iterations),
                  start_checkpoint=args.start_checkpoint,
                  seed=args.seed, quiet=args.quiet,
                  profile_dir=args.profile_dir, profile_from=args.profile_from,
                  profile_steps=args.profile_steps)

    from langsplat_tpu.train.loop import training
    training(cfg, gui_host=args.ip, gui_port=args.port)
    print("\nTraining complete.")


if __name__ == "__main__":
    main(sys.argv[1:])
