"""Jitted training steps + optax optimizer mirroring the reference's two optimizer modes.

Reference parity (`/root/reference/scene/gaussian_model.py:198-241`, `train.py:60-142`):
  - RGB phase: six param groups with per-group LRs (xyz on an exponential-decay schedule
    scaled by the scene extent), Adam eps=1e-15;
  - feature phase: geometry frozen, Adam on `language_feature` only;
  - densification stat accumulation from the screen-space means2D gradient tap;
  - Adam moment zeroing on densify/prune slot churn and on opacity reset.

TPU design: one jitted step per (phase, active SH degree); parameters are a flat dict
extracted from the GaussianField so `jax.grad` never sees the bool alive mask. The
optimizer state is a plain optax multi_transform state whose [capacity, ...] moment rows
can be surgically zeroed under jit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from langsplat_tpu.config import OptimizationConfig
from langsplat_tpu.core import losses
from langsplat_tpu.models.gaussian_field import GaussianField
from langsplat_tpu.ops.render import RenderSettings, render
from langsplat_tpu.train.densify import DensifyStats, update_stats

PARAM_KEYS_RGB = ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity")
PARAM_KEYS_FEATURE = ("language_feature",)


def expon_lr(lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-linear LR decay with optional sine delay (reference get_expon_lr_func,
    `/root/reference/utils/general_utils.py:29-62`)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        else:
            delay = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        return delay * log_lerp
    return schedule


def extract_params(field: GaussianField, include_feature: bool) -> dict:
    if include_feature:
        return {"language_feature": field.get_language_feature}
    return {"xyz": field.xyz, "f_dc": field.features_dc, "f_rest": field.features_rest,
            "scaling": field.scaling, "rotation": field.rotation,
            "opacity": field.opacity}


def merge_params(field: GaussianField, params: dict) -> GaussianField:
    from dataclasses import replace
    if "language_feature" in params and len(params) == 1:
        return replace(field, language_feature=params["language_feature"])
    return replace(field, xyz=params["xyz"], features_dc=params["f_dc"],
                   features_rest=params["f_rest"], scaling=params["scaling"],
                   rotation=params["rotation"], opacity=params["opacity"])


def make_optimizer(cfg: OptimizationConfig, spatial_lr_scale: float,
                   include_feature: bool) -> optax.GradientTransformation:
    eps = 1e-15
    if include_feature:
        transforms = {"language_feature": optax.adam(cfg.language_feature_lr, eps=eps)}
        labels = {"language_feature": "language_feature"}
    else:
        xyz_sched = expon_lr(cfg.position_lr_init * spatial_lr_scale,
                             cfg.position_lr_final * spatial_lr_scale,
                             lr_delay_mult=cfg.position_lr_delay_mult,
                             max_steps=cfg.position_lr_max_steps)
        transforms = {
            "xyz": optax.chain(optax.scale_by_adam(eps=eps),
                               optax.scale_by_schedule(lambda s: -xyz_sched(s))),
            "f_dc": optax.adam(cfg.feature_lr, eps=eps),
            "f_rest": optax.adam(cfg.feature_lr / 20.0, eps=eps),
            "opacity": optax.adam(cfg.opacity_lr, eps=eps),
            "scaling": optax.adam(cfg.scaling_lr, eps=eps),
            "rotation": optax.adam(cfg.rotation_lr, eps=eps),
        }
        labels = {k: k for k in PARAM_KEYS_RGB}
    return optax.multi_transform(transforms, labels)


def zero_moment_rows(opt_state, mask: jnp.ndarray, capacity: int,
                     only_label: str | None = None):
    """Zero Adam mu/nu rows where mask is True (the replace/cat_tensors_to_optimizer
    moment reset). With only_label, restricts to that param group's state."""
    def zero_rows(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == capacity and \
                jnp.issubdtype(x.dtype, jnp.floating):
            m = mask.reshape((capacity,) + (1,) * (x.ndim - 1))
            return jnp.where(m, 0.0, x)
        return x

    if only_label is None:
        return jax.tree.map(zero_rows, opt_state)

    def maybe(path_state):
        return jax.tree.map(zero_rows, path_state)

    # optax.multi_transform state: .inner_states dict label -> MaskedState
    inner = dict(opt_state.inner_states)
    inner[only_label] = maybe(inner[only_label])
    return opt_state._replace(inner_states=inner)


class StepOutput(NamedTuple):
    field: GaussianField
    opt_state: object
    stats: DensifyStats
    loss: jnp.ndarray
    l1: jnp.ndarray
    psnr: jnp.ndarray
    dropped: jnp.ndarray       # budget-cap overflow (grow the instance budget)
    rect_dropped: jnp.ndarray  # max_tiles-cap overflow (grow max_tiles_per_gaussian)


@functools.partial(jax.jit, static_argnames=("settings", "optimizer", "lambda_dssim"))
def train_step_rgb(field: GaussianField, opt_state, stats: DensifyStats,
                   viewmatrix, projmatrix, campos, gt_image, bg,
                   *, settings: RenderSettings, optimizer, lambda_dssim: float
                   ) -> StepOutput:
    params = extract_params(field, include_feature=False)
    zeros2d = jnp.zeros((field.capacity, 2), jnp.float32)

    def loss_fn(p, ss):
        f = merge_params(field, p)
        out = render(f, settings, viewmatrix, projmatrix, campos, bg,
                     screenspace_offset=ss)
        l1 = losses.l1_loss(out["render"], gt_image)
        loss = ((1.0 - lambda_dssim) * l1
                + lambda_dssim * (1.0 - losses.ssim(out["render"], gt_image)))
        return loss, (out, l1)

    (loss, (out, l1)), (grads, ss_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, zeros2d)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    new_field = merge_params(field, params)
    vis = out["visibility_filter"]
    stats = update_stats(stats, ss_grad, vis, out["radii"],
                         settings.image_width, settings.image_height)
    return StepOutput(new_field, opt_state, stats, loss, l1,
                      losses.psnr(jnp.clip(out["render"], 0, 1),
                                  jnp.clip(gt_image, 0, 1)),
                      out["instances_dropped"], out["rect_dropped"])


@functools.partial(jax.jit, static_argnames=("settings", "optimizer"))
def train_step_feature(field: GaussianField, opt_state, stats: DensifyStats,
                       viewmatrix, projmatrix, campos, gt_feature, feature_mask, bg,
                       *, settings: RenderSettings, optimizer) -> StepOutput:
    """Phase-B step: masked L1 on the rendered language features, geometry frozen
    (`/root/reference/train.py:96-99`)."""
    params = extract_params(field, include_feature=True)

    def loss_fn(p):
        f = merge_params(field, p)
        out = render(f, settings, viewmatrix, projmatrix, campos, bg)
        l1 = losses.masked_l1_loss(out["language_feature_image"], gt_feature,
                                   feature_mask)
        return l1, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return StepOutput(merge_params(field, params), opt_state, stats, loss, loss,
                      jnp.zeros(()), out["instances_dropped"],
                      out["rect_dropped"])
