"""Adaptive density control under static capacity: clone / split / prune as masked
scatters inside jit.

TPU-native re-design of the reference's densification machinery
(`/root/reference/scene/gaussian_model.py:422-482` with the optimizer-state surgery at
`:326-446`): instead of reallocating tensors and rebuilding torch.optim state, Gaussians
live in fixed `capacity` arrays with an `alive` mask. Clones/splits scatter children into
free slots; pruning clears the mask; the caller zeroes Adam moments for `reset_mask` slots
(the analog of `replace_tensor_to_optimizer` / `cat_tensors_to_optimizer` zero-init).
Capacity overflow is reported so the host can grow capacity geometrically (one
recompile per growth, SURVEY.md §7 hard part 1).

Semantics parity:
  - clone: grad-norm >= threshold and max(scale) <= percent_dense*extent -> 1 copy;
  - split: grad-norm >= threshold and max(scale) >  percent_dense*extent -> 2 children
    sampled from the Gaussian (xyz + R @ N(0, scale)), scales /= 1.6, original pruned;
  - prune: opacity < min_opacity, or (when size_threshold given) screen radius >
    size_threshold or world size > 0.1*extent;
  - children inherit the parent's prune verdict on the opacity test (the reference prunes
    after growing, so low-opacity parents' children die immediately too);
  - densification stats and max radii reset to zero afterwards.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from langsplat_tpu.core.transforms import quat_to_rotmat
from langsplat_tpu.models.gaussian_field import GaussianField


@jax.tree_util.register_dataclass
@dataclass
class DensifyStats:
    """Densification bookkeeping (reference xyz_gradient_accum/denom/max_radii2D)."""
    grad_accum: jnp.ndarray   # [cap] accumulated ||d means2d||
    denom: jnp.ndarray        # [cap]
    max_radii2d: jnp.ndarray  # [cap] float (max screen radius seen)

    @staticmethod
    def zeros(capacity: int) -> "DensifyStats":
        z = jnp.zeros((capacity,), jnp.float32)
        return DensifyStats(grad_accum=z, denom=z, max_radii2d=z)


def update_stats(stats: DensifyStats, screenspace_grad: jnp.ndarray,
                 visibility: jnp.ndarray, radii: jnp.ndarray,
                 image_width: int, image_height: int) -> DensifyStats:
    """Per-iteration accumulation (`train.py:125-126`, `gaussian_model.py:480-482`).

    `screenspace_grad` is dL/d(means2D) in PIXEL coordinates (our means2D
    convention, projection.py:152-154). The reference's CUDA backward reports
    dL/dmean2D in half-image units — backward.cu multiplies the pixel-space
    gradient by ddelx_dx = 0.5*W, ddely_dy = 0.5*H [inferred, upstream
    diff-gaussian-rasterization] — and the densify_grad_threshold default
    2e-4 (`arguments/__init__.py:92`) is calibrated to THOSE units. Without
    this scaling densification under-fires by ~0.5*max(W,H) (~300x at
    640x480): observed as a 28k -> 150 death spiral once the post-reset
    size-prune removed splats and nothing replaced them.
    """
    scale = jnp.asarray([0.5 * image_width, 0.5 * image_height], jnp.float32)
    gnorm = jnp.linalg.norm(screenspace_grad[:, :2] * scale, axis=-1)
    vis = visibility.astype(jnp.float32)
    return DensifyStats(
        grad_accum=stats.grad_accum + gnorm * vis,
        denom=stats.denom + vis,
        max_radii2d=jnp.maximum(stats.max_radii2d,
                                jnp.where(visibility, radii.astype(jnp.float32),
                                          0.0)),
    )


class DensifyResult(NamedTuple):
    field: GaussianField
    stats: DensifyStats
    reset_mask: jnp.ndarray   # [cap] bool — zero Adam moments for these slots
    overflow: jnp.ndarray     # [] int32 — children dropped for lack of capacity
    num_alive: jnp.ndarray    # [] int32


@partial(jax.jit, static_argnames=("percent_dense", "grad_threshold", "min_opacity",
                                   "use_size_threshold", "size_threshold"))
def densify_and_prune(field: GaussianField, stats: DensifyStats, rng: jax.Array,
                      *, extent: float, grad_threshold: float = 0.0002,
                      percent_dense: float = 0.01, min_opacity: float = 0.005,
                      use_size_threshold: bool = False,
                      size_threshold: float = 20.0) -> DensifyResult:
    noise = jax.random.normal(rng, (field.capacity, 2, 3), field.xyz.dtype)
    return densify_core(field, stats, noise, extent=extent,
                        grad_threshold=grad_threshold,
                        percent_dense=percent_dense, min_opacity=min_opacity,
                        use_size_threshold=use_size_threshold,
                        size_threshold=size_threshold)


def densify_core(field: GaussianField, stats: DensifyStats, noise: jnp.ndarray,
                 *, extent: float, grad_threshold: float = 0.0002,
                 percent_dense: float = 0.01, min_opacity: float = 0.005,
                 use_size_threshold: bool = False,
                 size_threshold: float = 20.0) -> DensifyResult:
    """densify_and_prune with the split-sample STANDARD-NORMAL noise [cap, 2, 3]
    passed in. Clone/split/prune decisions are purely per-row, so this core runs
    unchanged on a Gaussian-axis SHARD inside shard_map (shard-local free-slot
    allocation; see parallel/gauss_densify.py) — passing globally-generated
    noise keeps split children identical across mesh shapes."""
    cap = field.capacity
    alive = field.alive
    grads = jnp.where(stats.denom > 0, stats.grad_accum / stats.denom, 0.0)
    scales = field.get_scaling
    max_scale = jnp.max(scales, axis=-1)
    opa = field.get_opacity[:, 0]

    hot = alive & (grads >= grad_threshold)
    small = max_scale <= percent_dense * extent
    clone_mask = hot & small
    split_mask = hot & ~small

    prune_pred = opa < min_opacity
    if use_size_threshold:
        prune_pred = (prune_pred | (stats.max_radii2d > size_threshold)
                      | (max_scale > 0.1 * extent))
    prune_orig = alive & (prune_pred | split_mask)

    # children: slot j in {0,1}; clones emit 1, splits emit 2
    emit = jnp.stack([clone_mask | split_mask, split_mask], axis=1)     # [cap, 2]
    noise = noise * scales[:, None, :]
    R = quat_to_rotmat(field.rotation)                                  # [cap, 3, 3]
    offsets = jnp.einsum("cij,ckj->cki", R, noise,
                          precision=jax.lax.Precision.HIGHEST)    # [cap, 2, 3]
    is_split = split_mask[:, None]                                      # [cap, 1]
    child_xyz = jnp.where(is_split[..., None],
                          field.xyz[:, None, :] + offsets,
                          jnp.broadcast_to(field.xyz[:, None, :], (cap, 2, 3)))
    split_scaling = jnp.log(scales / (0.8 * 2.0))
    child_scaling = jnp.where(is_split[..., None],
                              jnp.broadcast_to(split_scaling[:, None, :], (cap, 2, 3)),
                              jnp.broadcast_to(field.scaling[:, None, :], (cap, 2, 3)))
    # children inherit the opacity-based prune verdict (reference prunes post-grow);
    # their max_radii2d restarts at 0 so the size tests don't apply to them
    child_valid = emit & ~(opa < min_opacity)[:, None]

    # allocate free slots: freed = dead or pruned; stable index order
    survivors = alive & ~prune_orig
    free = ~survivors
    free_ids = jnp.argsort(~free, stable=True).astype(jnp.int32)        # free slots first
    free_count = jnp.sum(free)

    flat_valid = child_valid.reshape(-1)                                # [cap*2]
    rank = jnp.cumsum(flat_valid) - 1
    can_place = flat_valid & (rank < free_count)
    dest = jnp.where(can_place, free_ids[jnp.clip(rank, 0, cap - 1)], cap)  # cap => drop
    overflow = jnp.sum(flat_valid & ~can_place).astype(jnp.int32)

    parent = jnp.repeat(jnp.arange(cap, dtype=jnp.int32), 2)

    def scatter(base, child_values):
        return base.at[dest].set(child_values, mode="drop")

    new_field = GaussianField(
        xyz=scatter(field.xyz, child_xyz.reshape(-1, 3)),
        features_dc=scatter(field.features_dc, field.features_dc[parent]),
        features_rest=scatter(field.features_rest, field.features_rest[parent]),
        scaling=scatter(field.scaling, child_scaling.reshape(-1, 3)),
        rotation=scatter(field.rotation, field.rotation[parent]),
        opacity=scatter(field.opacity, field.opacity[parent]),
        language_feature=None if field.language_feature is None else
        scatter(field.language_feature, field.language_feature[parent]),
        alive=survivors.at[dest].set(True, mode="drop"),
    )
    newly_occupied = jnp.zeros((cap,), bool).at[dest].set(True, mode="drop")
    reset_mask = free | newly_occupied
    return DensifyResult(field=new_field, stats=DensifyStats.zeros(cap),
                         reset_mask=reset_mask, overflow=overflow,
                         num_alive=jnp.sum(new_field.alive).astype(jnp.int32))


@jax.jit
def reset_opacity(field: GaussianField) -> GaussianField:
    """Clamp opacities to <= 0.01 (`reset_opacity`, gaussian_model.py:277-280).

    Caller must zero the Adam moments of the opacity parameter for ALL slots.
    """
    clamped = jnp.minimum(field.get_opacity, 0.01)
    logits = jnp.log(clamped / (1.0 - clamped))
    from dataclasses import replace
    return replace(field, opacity=logits)
