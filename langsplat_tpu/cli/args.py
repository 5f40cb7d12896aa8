"""Reference-compatible argparse front end over the typed configs.

Flag names/shorthands match the reference ParamGroups (`/root/reference/arguments/
__init__.py`): --source_path/-s, --model_path/-m, --images/-i, --resolution/-r,
--white_background/-w, --feature_level/-f, plus all OptimizationParams flags.
"""

from __future__ import annotations

import argparse

from langsplat_tpu.config import (ModelConfig, OptimizationConfig, PipelineConfig,
                                  TrainConfig)


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--source_path", "-s", type=str, default="")
    p.add_argument("--model_path", "-m", type=str, default="")
    p.add_argument("--language_features_name", "-l", type=str,
                   default="language_features_dim3")
    p.add_argument("--images", "-i", type=str, default="images")
    p.add_argument("--resolution", "-r", type=int, default=-1)
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--feature_level", "-f", type=int, default=-1)
    p.add_argument("--eval", action="store_true")


def add_pipeline_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--convert_SHs_python", action="store_true")
    p.add_argument("--compute_cov3D_python", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--tile_size", type=int, default=16)
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--budget_factor", type=int, default=6)
    p.add_argument("--allow_budget_truncation", action="store_true")
    p.add_argument("--interpret", action="store_true",
                   help="CPU-testable path (tiled JAX backend)")
    p.add_argument("--depth_shards", type=int, default=0,
                   help="feature-phase training over a depth-rank sharded "
                        "mesh of this many devices (ring/blockwise analog)")
    p.add_argument("--data_shards", type=int, default=0,
                   help="data-parallel training over this many devices (one "
                        "view per device per step; grads — and in phase A "
                        "densify stats — all-reduced over ICI; in the feature "
                        "phase mutually exclusive with --depth_shards)")
    p.add_argument("--gauss_shards", type=int, default=0,
                   help="tensor-parallel training over the Gaussian axis on "
                        "this many devices (params/Adam/stats sharded, blend "
                        "tile-banded, shard-local densification; mutually "
                        "exclusive with --data_shards/--depth_shards)")
    p.add_argument("--zero2", action="store_true",
                   help="with --data_shards: shard Adam moments over the data "
                        "axis (ZeRO-2 reduce-scatter/all-gather step)")
    p.add_argument("--dp_views_per_device", type=int, default=1,
                   help="with --data_shards: views per device per step")


def add_optimization_args(p: argparse.ArgumentParser) -> None:
    d = OptimizationConfig()
    p.add_argument("--iterations", type=int, default=d.iterations)
    p.add_argument("--position_lr_init", type=float, default=d.position_lr_init)
    p.add_argument("--position_lr_final", type=float, default=d.position_lr_final)
    p.add_argument("--position_lr_delay_mult", type=float,
                   default=d.position_lr_delay_mult)
    p.add_argument("--position_lr_max_steps", type=int, default=d.position_lr_max_steps)
    p.add_argument("--feature_lr", type=float, default=d.feature_lr)
    p.add_argument("--opacity_lr", type=float, default=d.opacity_lr)
    p.add_argument("--language_feature_lr", type=float, default=d.language_feature_lr)
    p.add_argument("--include_feature", action="store_true", default=d.include_feature)
    p.add_argument("--no_include_feature", dest="include_feature",
                   action="store_false",
                   help="train the original 3DGS (phase A)")
    p.add_argument("--scaling_lr", type=float, default=d.scaling_lr)
    p.add_argument("--rotation_lr", type=float, default=d.rotation_lr)
    p.add_argument("--percent_dense", type=float, default=d.percent_dense)
    p.add_argument("--lambda_dssim", type=float, default=d.lambda_dssim)
    p.add_argument("--densification_interval", type=int,
                   default=d.densification_interval)
    p.add_argument("--opacity_reset_interval", type=int,
                   default=d.opacity_reset_interval)
    p.add_argument("--densify_from_iter", type=int, default=d.densify_from_iter)
    p.add_argument("--densify_until_iter", type=int, default=d.densify_until_iter)
    p.add_argument("--densify_grad_threshold", type=float,
                   default=d.densify_grad_threshold)
    p.add_argument("--initial_capacity_factor", type=float,
                   default=d.initial_capacity_factor,
                   help="padded capacity = factor * init points (static-shape "
                        "headroom; one recompile per geometric growth beyond)")
    p.add_argument("--capacity_growth_factor", type=float,
                   default=d.capacity_growth_factor)


def extract_configs(args) -> TrainConfig:
    model = ModelConfig(
        sh_degree=args.sh_degree, source_path=args.source_path,
        model_path=args.model_path,
        language_features_name=args.language_features_name, images=args.images,
        resolution=args.resolution, white_background=args.white_background,
        feature_level=args.feature_level, eval=args.eval)
    pipeline = PipelineConfig(
        convert_shs_python=getattr(args, "convert_SHs_python", False),
        compute_cov3d_python=getattr(args, "compute_cov3D_python", False),
        debug=getattr(args, "debug", False),
        tile_size=getattr(args, "tile_size", 16),
        chunk=getattr(args, "chunk", 128),
        budget_factor=getattr(args, "budget_factor", 6),
        allow_budget_truncation=getattr(args, "allow_budget_truncation", False),
        interpret=getattr(args, "interpret", False),
        depth_shards=getattr(args, "depth_shards", 0),
        data_shards=getattr(args, "data_shards", 0),
        gauss_shards=getattr(args, "gauss_shards", 0),
        zero2=getattr(args, "zero2", False),
        dp_views_per_device=getattr(args, "dp_views_per_device", 1))
    okw = {}
    for f in OptimizationConfig.__dataclass_fields__:
        if hasattr(args, f):
            okw[f] = getattr(args, f)
    return TrainConfig(model=model, pipeline=pipeline,
                       optimization=OptimizationConfig(**okw))
