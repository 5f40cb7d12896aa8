"""Data-parallel training step: views sharded across the mesh, parameters replicated,
gradients all-reduced over ICI.

Each device renders its shard of the view batch through the full differentiable
rasterization pipeline, computes local gradients, and joins a `psum` (ICI all-reduce)
before the (replicated) Adam update — the standard JAX DP recipe expressed with
`shard_map`, replacing nothing in the reference (it has no distributed layer; SURVEY.md
§2.3). Densification statistics are summed across devices the same way so clone/split
decisions see every view's gradients, matching the sequential reference semantics of
accumulating stats view-by-view (`/root/reference/train.py:125-126`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from langsplat_tpu.core import losses
from langsplat_tpu.models.gaussian_field import GaussianField
from langsplat_tpu.ops.render import RenderSettings, render
from langsplat_tpu.train.densify import DensifyStats
from langsplat_tpu.train.trainer import extract_params, merge_params


class DpStepOutput(NamedTuple):
    field: GaussianField
    opt_state: object
    stats: DensifyStats
    loss: jnp.ndarray
    dropped: jnp.ndarray       # [] int32, summed over views/devices
    rect_dropped: jnp.ndarray  # [] int32


def make_dp_train_step(mesh: Mesh, settings: RenderSettings, optimizer,
                       include_feature: bool, lambda_dssim: float = 0.2,
                       axis: str = "data", zero2: bool = False,
                       capacity: int | None = None, opt_state_template=None):
    """Build a jitted DP train step.

    Batched camera arrays have leading view dim V (divisible by mesh axis size):
      viewmats [V,4,4], projmats [V,4,4], campos [V,3], and either gt_images [V,3,H,W]
      (RGB phase) or gt_features [V,F,H,W] + masks [V,1,H,W] (feature phase).

    With `zero2=True` (requires `capacity` + `opt_state_template`), the optimizer
    state shards over the data axis and the gradient all-reduce becomes a
    reduce-scatter: each device Adam-updates only its 1/D slice of the parameter
    rows and an all_gather rebuilds the replicated parameters — the ZeRO-2 DP
    plan from docs/SCALING.md for >1.5M-Gaussian scenes, where replicated Adam
    moments (2 x 59 floats/Gaussian) dominate DP memory. Numerics are identical
    to the replicated step (elementwise Adam; reduce-scatter sums the same
    per-device partials psum does). Use `shard_opt_state` to lay the optimizer
    state out before the first step."""
    if zero2 and (capacity is None or opt_state_template is None):
        raise ValueError("zero2=True needs capacity and opt_state_template")
    ndev = mesh.shape[axis]
    if zero2 and capacity % ndev != 0:
        raise ValueError(f"capacity {capacity} must divide by the {axis} axis "
                         f"size {ndev}")

    def shard_fn(field, opt_state, stats, viewmats, projmats, campos, gts, masks, bg):
        params = extract_params(field, include_feature)
        v_local = viewmats.shape[0]
        # PER-VIEW screenspace offsets: the densify stat is the reference's
        # per-view accumulation (sum over views of ||dL_v/dmean2D_v||, denom +=
        # visible per view — train.py:125-126) — a shared offset would only
        # recover the norm of the SUM across views, which under-fires the
        # densify threshold as random view directions cancel
        zeros3d = jnp.zeros((v_local, field.capacity, 2), jnp.float32)

        def loss_fn(p, ss):
            f = merge_params(field, p)

            def one_view(view, proj, cpos, gt, mask, ss_v):
                out = render(f, settings, view, proj, cpos, bg,
                             screenspace_offset=ss_v)
                if include_feature:
                    local = losses.masked_l1_loss(out["language_feature_image"],
                                                  gt, mask)
                else:
                    l1 = losses.l1_loss(out["render"], gt)
                    local = ((1.0 - lambda_dssim) * l1 + lambda_dssim *
                             (1.0 - losses.ssim(out["render"], gt)))
                return local, (out["visibility_filter"], out["radii"],
                               out["instances_dropped"], out["rect_dropped"])

            per_view, aux = jax.vmap(one_view)(viewmats, projmats, campos, gts,
                                               masks, ss)
            return jnp.mean(per_view), aux

        (local_loss, (vis, radii, drop_v, rect_v)), (grads, ss_grad) =             jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, zeros3d)

        # ICI reductions; loss is the mean over the whole view batch
        loss = jax.lax.pmean(local_loss, axis)
        dropped = jax.lax.psum(jnp.sum(drop_v), axis)
        rect_dropped = jax.lax.psum(jnp.sum(rect_v), axis)
        # stat tap in the reference's per-view half-image units: each view's
        # gradient norm enters separately; the local loss is the mean over the
        # LOCAL views only (the device pmean happens after differentiation), so
        # v_local undoes exactly the factor the grad carries and the
        # densify_grad_threshold keeps its single-view calibration
        # (arguments/__init__.py:92)
        stat_scale = jnp.asarray([0.5 * settings.image_width,
                                  0.5 * settings.image_height], jnp.float32)
        gnorm_v = jnp.linalg.norm(ss_grad[:, :, :2] * stat_scale,
                                  axis=-1) * v_local          # [v_local, cap]
        visf = vis.astype(jnp.float32)
        gnorm_sum = jax.lax.psum(jnp.sum(gnorm_v * visf, axis=0), axis)
        denom_sum = jax.lax.psum(jnp.sum(visf, axis=0), axis)
        max_radii = jax.lax.pmax(jnp.max(
            jnp.where(vis, radii.astype(jnp.float32), 0.0), axis=0), axis)

        if zero2:
            # reduce-scatter the grads along the parameter-row axis: each device
            # receives the cross-device SUM for its 1/D row slice; /ndev makes it
            # the same mean pmean produces
            grads = jax.tree.map(
                lambda g: jax.lax.psum_scatter(g, axis, scatter_dimension=0,
                                               tiled=True) / ndev, grads)
            shard_rows = capacity // ndev
            row0 = jax.lax.axis_index(axis) * shard_rows
            params_shard = jax.tree.map(
                lambda p: jax.lax.dynamic_slice_in_dim(p, row0, shard_rows, 0),
                params)
            updates, new_opt_state = optimizer.update(grads, opt_state,
                                                      params_shard)
            new_shard = optax.apply_updates(params_shard, updates)
            new_params = jax.tree.map(
                lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
                new_shard)
        else:
            grads = jax.lax.pmean(grads, axis)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
        new_field = merge_params(field, new_params)
        new_stats = DensifyStats(
            grad_accum=stats.grad_accum + gnorm_sum,
            denom=stats.denom + denom_sum,
            max_radii2d=jnp.maximum(stats.max_radii2d, max_radii))
        return DpStepOutput(new_field, new_opt_state, new_stats, loss,
                            dropped, rect_dropped)

    rep = P()
    sh = P(axis)
    if zero2:
        from langsplat_tpu.parallel.gauss_sharded import capacity_specs
        opt_specs = capacity_specs(opt_state_template, capacity, axis)
    else:
        opt_specs = rep
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep, opt_specs, rep, sh, sh, sh, sh, sh, rep),
        out_specs=DpStepOutput(rep, opt_specs, rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(mapped)


def shard_opt_state(mesh: Mesh, opt_state, capacity: int, axis: str = "data"):
    """Lay a replicated optimizer state out with its [capacity, ...] moment rows
    sharded over `axis` (ZeRO-2 setup)."""
    from langsplat_tpu.parallel.gauss_sharded import shard_state
    return shard_state(mesh, opt_state, capacity, axis)
