"""Typed configuration dataclasses + file/CLI merge.

Replaces the reference's reflection-based `ParamGroup` argparse system
(`/root/reference/arguments/__init__.py:19-116`) with plain dataclasses: same parameter
names and defaults, but no `eval()` of config files (SURVEY.md §5 flags the reference's
`eval(cfg_args)` quirk) — run configs serialize to/from JSON.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field


@dataclass
class ModelConfig:
    """Mirrors ModelParams (/root/reference/arguments/__init__.py:47-65)."""
    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    language_features_name: str = "language_features_dim3"
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    feature_level: int = -1
    eval: bool = False

    @property
    def lf_path(self) -> str:
        return os.path.join(self.source_path, self.language_features_name)


@dataclass
class PipelineConfig:
    """Mirrors PipelineParams (/root/reference/arguments/__init__.py:67-72) plus the
    TPU-specific rasterizer knobs."""
    convert_shs_python: bool = False   # model-layer SH->color cross-check path
    compute_cov3d_python: bool = False  # model-layer covariance cross-check path
    debug: bool = False                # per-step budget/drop diagnostics
    tile_size: int = 16
    chunk: int = 128
    budget_factor: int = 6             # instance budget CAP = factor * capacity
    adaptive_budget: bool = True       # size the budget from measured instance counts
    budget_headroom: float = 1.3       # measured count -> budget multiplier
    max_tiles_per_gaussian: int = 32
    allow_budget_truncation: bool = False  # opt-in: proceed (with a warning) when
                                           # the instance budget cap is hit instead
                                           # of failing loudly
    interpret: bool = False            # Pallas interpret mode (CPU testing)
    depth_shards: int = 0              # feature-phase training over a depth-rank
                                       # sharded device mesh (the ring/blockwise
                                       # analog, parallel/depth_sharded.py): >1
                                       # shards the instance stream across that
                                       # many devices; 0/1 = single-device
    data_shards: int = 0               # training data-parallel over a
                                       # view-sharded mesh (parallel/
                                       # data_parallel.py): >1 renders that many
                                       # views per optimizer step (one per
                                       # device) and psums grads over ICI.
                                       # Phase A additionally psums densify
                                       # stats and runs densification + opacity
                                       # resets + capacity growth on the
                                       # replicated state; phase B batches the
                                       # masked feature L1 over the views
                                       # (mutually exclusive with
                                       # --depth_shards). 0/1 = single-device
    gauss_shards: int = 0              # tensor-parallel training over the
                                       # Gaussian axis (parallel/
                                       # gauss_sharded.py): >1 shards params +
                                       # Adam moments + densify stats over that
                                       # many devices (ZeRO-3-like capacity
                                       # scaling), blends tile-banded over the
                                       # same axis, and runs densification
                                       # shard-local (parallel/
                                       # gauss_densify.py). Mutually exclusive
                                       # with --data_shards/--depth_shards.
                                       # 0/1 = single-device
    zero2: bool = False                # with data_shards: shard the Adam moments
                                       # over the data axis (ZeRO-2); capacity
                                       # rounds up to a mesh-divisible size
    dp_views_per_device: int = 1       # with data_shards: views per device per
                                       # step (microbatch; total batch =
                                       # data_shards * dp_views_per_device)


@dataclass
class OptimizationConfig:
    """Mirrors OptimizationParams (/root/reference/arguments/__init__.py:74-94)."""
    iterations: int = 30_000
    position_lr_init: float = 0.000_16
    position_lr_final: float = 0.000_001_6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    language_feature_lr: float = 0.0025
    include_feature: bool = True
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    # TPU capacity management (SURVEY.md §7 hard part 1): densification works inside a
    # fixed alive-masked capacity; capacity grows geometrically on overflow (recompile).
    initial_capacity_factor: float = 1.5
    capacity_growth_factor: float = 1.5


@dataclass
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    test_iterations: tuple = (7_000, 30_000)
    save_iterations: tuple = (7_000, 30_000)
    checkpoint_iterations: tuple = (7_000, 30_000)
    start_checkpoint: str = ""
    seed: int = 0
    quiet: bool = False
    # jax.profiler trace window (SURVEY.md §5 tracing): iterations
    # [profile_from, profile_from + profile_steps) are captured to profile_dir
    profile_dir: str = ""
    profile_from: int = 50
    profile_steps: int = 5


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def save_config(cfg, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2, default=list)


def _from_dict(cls, d: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) or f.name in ("model", "pipeline",
                                                          "optimization"):
            sub = {"model": ModelConfig, "pipeline": PipelineConfig,
                   "optimization": OptimizationConfig}[f.name]
            kwargs[f.name] = _from_dict(sub, v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def load_config(path: str) -> TrainConfig:
    with open(path) as f:
        return _from_dict(TrainConfig, json.load(f))


def apply_overrides(cfg, overrides: dict):
    """dot-path overrides, e.g. {"optimization.iterations": 100}. Returns a new config."""
    for key, value in overrides.items():
        parts = key.split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        name = parts[-1]
        cur = getattr(obj, name)
        if cur is not None and value is not None and not isinstance(value, type(cur)):
            if isinstance(cur, bool):
                value = str(value).lower() in ("1", "true", "yes")
            elif isinstance(cur, tuple):
                value = tuple(type(cur[0])(x) for x in value) if cur else tuple(value)
            else:
                value = type(cur)(value)
        setattr(obj, name, value)
    return cfg
