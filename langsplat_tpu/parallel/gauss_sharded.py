"""Gaussian-axis (tensor-parallel) sharded training: parameters, optimizer state and
densification statistics are sharded over the primitive axis; blending is tile-sharded
over the SAME mesh axis.

This is the TP row of SURVEY.md §2.3 composed with the SP/CP row in its Ulysses-style
formulation (SURVEY.md §5 "long-context"): each device

  1. runs preprocess (project / EWA / conic / SH) on ITS shard of the Gaussians —
     the per-Gaussian FLOPs and the [cap, ...] parameter + Adam-moment memory both
     scale 1/D (a ZeRO-3-like layout, natural here because preprocess is
     embarrassingly parallel along the primitive axis);
  2. `all_gather`s the compact per-Gaussian screen-space outputs (means2d, conic,
     color, depth, tile rect — ~16 floats/Gaussian, far smaller than the 48-float SH
     tables that stay sharded) over ICI — this is the reshard from Gaussian-sharded
     preprocess to tile-sharded blend;
  3. bins and blends only its horizontal tile-row band of the image
     (parallel/spatial.py band math);
  4. backward: band losses flow through the all_gather, whose VJP is a
     `psum_scatter` — each device receives exactly its shard's parameter gradients,
     summed over every band's contribution, with no explicit grad all-reduce and no
     replicated [cap, ...] gradient buffers.

The reference has no distributed layer at all (single process, cuda:0 pinned at
`/root/reference/utils/general_utils.py:133`); this layout is new TPU-native design.

A 2D ('data', 'gauss') mesh composes this with view data-parallelism: views shard over
'data', parameters shard over 'gauss' (replicated over 'data'), and shard-local
parameter gradients join one small `pmean` over the data axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from langsplat_tpu.core import losses
from langsplat_tpu.models.gaussian_field import GaussianField
from langsplat_tpu.ops import projection
from langsplat_tpu.ops.render import RenderSettings
from langsplat_tpu.parallel.spatial import band_from_prep, band_height
from langsplat_tpu.train.densify import DensifyStats
from langsplat_tpu.train.trainer import extract_params, merge_params


class GaussShardedStepOutput(NamedTuple):
    field: GaussianField
    opt_state: object
    stats: DensifyStats
    loss: jnp.ndarray
    dropped: jnp.ndarray       # [] int32, psum over bands (budget-cap overflow)
    rect_dropped: jnp.ndarray  # [] int32, psum over bands


def capacity_specs(tree, capacity: int, axis: str):
    """PartitionSpec tree: leaves with a leading `capacity` dim shard on `axis`,
    everything else (schedule counts, scalars) replicates."""
    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == capacity:
            return P(axis)
        return P()
    return jax.tree.map(spec, tree)


def shard_state(mesh: Mesh, tree, capacity: int, axis: str = "gauss"):
    """Place a (host or replicated) pytree onto the mesh with the capacity axis
    sharded — use once at setup to lay out field/opt_state/stats."""
    specs = capacity_specs(tree, capacity, axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def spread_rows(tree, capacity: int, ndev: int):
    """Round-robin permute [capacity, ...] rows across the ndev contiguous row
    shards (old row i -> shard i % ndev).

    Row ids are semantically arbitrary, but shard-LOCAL densification
    (parallel/gauss_densify.py) allocates children from the shard's own free
    rows — and `create_from_pcd` packs alive rows into a prefix, which would
    leave shard 0 with zero free slots (every densify there overflows) while
    the last shards sit empty. Apply the same permutation to field, optimizer
    state and stats together; re-apply after capacity growth, whose padding
    otherwise lands entirely in the tail shard."""
    if capacity % ndev:
        raise ValueError(f"capacity {capacity} must divide by ndev {ndev}")
    rows = capacity // ndev
    j = jnp.arange(capacity)
    perm = (j % rows) * ndev + j // rows  # new slot j takes old row perm[j]

    def f(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == capacity:
            return x[perm]
        return x

    return jax.tree.map(f, tree)


def make_gauss_sharded_train_step(mesh: Mesh, settings: RenderSettings, optimizer,
                                  include_feature: bool, capacity: int,
                                  field_template, opt_state_template,
                                  lambda_dssim: float = 0.2,
                                  gauss_axis: str = "gauss",
                                  data_axis: str | None = None):
    """Build a jitted train step with parameters/optimizer/stats sharded on the
    Gaussian axis and blending sharded over tile-row bands of the same axis.

    `field_template` / `opt_state_template` fix the pytree structures for the
    sharding specs (pass the real values or `jax.eval_shape` structs). Batched camera
    arrays have leading view dim V: viewmats [V,4,4], projmats [V,4,4], campos [V,3],
    gts [V,3,H,W] or [V,F,H,W], masks [V,1,H,W] (or broadcastable). On a 1D mesh all
    devices see every view; with `data_axis` views shard over it and V must divide by
    its size.

    Band-local losses: L1 terms are exact under banding; SSIM differs from full-image
    SSIM only within 5 pixels of band boundaries (same accepted approximation as
    parallel/dp_spatial.py; exact for the feature phase, which is pure masked L1).
    """
    n_bands = mesh.shape[gauss_axis]
    if capacity % n_bands != 0:
        raise ValueError(f"capacity {capacity} must divide by the gauss axis size "
                         f"{n_bands}")
    bh = band_height(settings, n_bands)
    padded_h = bh * n_bands
    budget = (settings.budget or 6 * capacity) // n_bands

    def shard_fn(field, opt_state, stats, viewmats, projmats, campos, gts, masks, bg):
        band = jax.lax.axis_index(gauss_axis)
        y0 = band * bh
        cap_local = field.xyz.shape[0]
        params = extract_params(field, include_feature)
        v_local = viewmats.shape[0]
        # per-view screenspace offsets: the densify stat is the reference's
        # per-view accumulation (see data_parallel.make_dp_train_step)
        zeros3d = jnp.zeros((v_local, cap_local, 2), jnp.float32)

        def loss_fn(p, ss):
            f = merge_params(field, p)
            shs = f.get_features
            scales = f.get_scaling
            opac = f.get_opacity[:, 0]
            feats = None
            if settings.include_feature:
                lf = f.get_language_feature
                norm = jnp.sqrt(jnp.sum(lf * lf, axis=-1, keepdims=True) + 1e-18)
                feats = lf / (norm + 1e-9)

            def one_view(view, proj, cpos_, gt, mask, ss_v):
                # shard-local preprocess over this device's Gaussians
                prep = projection.preprocess(
                    f.xyz, scales, f.rotation, shs, view, proj, cpos_,
                    image_height=settings.image_height,
                    image_width=settings.image_width,
                    tanfovx=settings.tanfovx, tanfovy=settings.tanfovy,
                    sh_degree=settings.sh_degree, tile_size=settings.tile_size,
                    scale_modifier=settings.scale_modifier, alive=f.alive)
                # means2D grad tap rides the gather so its gradient arrives
                # shard-local through the psum_scatter
                prep = prep._replace(means2d=prep.means2d + ss_v)

                # reshard: Gaussian-sharded -> replicated screen-space quantities;
                # VJP is psum_scatter (grads return summed over bands, shard-local)
                gathered = jax.tree.map(
                    lambda x: jax.lax.all_gather(x, gauss_axis, axis=0, tiled=True),
                    (prep, opac, feats))
                prep_full, opac_full, feats_full = gathered

                out = band_from_prep(prep_full, opac_full, feats_full, settings,
                                     band, n_bands, bg, budget=budget)
                gt_band = jax.lax.dynamic_slice_in_dim(
                    _pad_rows(gt, padded_h), y0, bh, axis=1)
                row = jnp.arange(bh) + y0
                row_ok = (row < settings.image_height).astype(gt.dtype)[:, None]
                if include_feature:
                    mask_band = jax.lax.dynamic_slice_in_dim(
                        _pad_rows(mask, padded_h), y0, bh, axis=1)
                    local = losses.masked_l1_loss(
                        out["language_feature_image"] * row_ok, gt_band * row_ok,
                        mask_band * row_ok)
                else:
                    pred = out["render"] * row_ok
                    l1 = losses.l1_loss(pred, gt_band)
                    local = ((1.0 - lambda_dssim) * l1 + lambda_dssim *
                             (1.0 - losses.ssim(pred, gt_band)))
                return local, (prep.radii > 0, prep.radii,
                               out["instances_dropped"], out["rect_dropped"])

            per_view, aux = jax.vmap(one_view)(viewmats, projmats, campos, gts,
                                               masks, ss)
            # full-image loss = (scale / n_bands) * sum of band losses; each band
            # differentiates its own share and the gather's psum_scatter sums the
            # band contributions, so no explicit grad reduction over gauss is needed
            scale = padded_h / settings.image_height
            return jnp.mean(per_view) * (scale / n_bands), aux

        (local_loss, (vis, radii, drop_v, rect_v)), (grads, ss_grad) = \
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, zeros3d)
        # each band bins its own tiles: totals sum over the gauss (band) axis
        dropped = jax.lax.psum(jnp.sum(drop_v), gauss_axis)
        rect_dropped = jax.lax.psum(jnp.sum(rect_v), gauss_axis)

        # densify-stat tap in the reference's per-view half-image units
        # (matches data_parallel/dp_spatial): each view's full-image gradient
        # arrives shard-local through the gather's psum_scatter; v_local undoes
        # the local view-mean factor, norms accumulate per view
        stat_scale = jnp.asarray([0.5 * settings.image_width,
                                  0.5 * settings.image_height], jnp.float32)
        gnorm_v = jnp.linalg.norm(ss_grad[:, :, :2] * stat_scale,
                                  axis=-1) * v_local       # [v_local, cap_l]
        visf = vis.astype(jnp.float32)
        gnorm_sum = jnp.sum(gnorm_v * visf, axis=0)
        denom_sum = jnp.sum(visf, axis=0)
        # loss report: undo the per-band grad scaling, average bands (and data rows)
        loss = jax.lax.psum(local_loss, gauss_axis)
        max_radii = jnp.max(jnp.where(vis, radii.astype(jnp.float32), 0.0),
                            axis=0)
        if data_axis is not None:
            grads = jax.lax.pmean(grads, data_axis)
            gnorm_sum = jax.lax.psum(gnorm_sum, data_axis)
            denom_sum = jax.lax.psum(denom_sum, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
            max_radii = jax.lax.pmax(max_radii, data_axis)
            dropped = jax.lax.psum(dropped, data_axis)
            rect_dropped = jax.lax.psum(rect_dropped, data_axis)

        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_field = merge_params(field, new_params)
        new_stats = DensifyStats(
            grad_accum=stats.grad_accum + gnorm_sum,
            denom=stats.denom + denom_sum,
            max_radii2d=jnp.maximum(stats.max_radii2d, max_radii))
        return GaussShardedStepOutput(new_field, new_opt_state, new_stats, loss,
                                      dropped, rect_dropped)

    rep = P()
    views_spec = P(data_axis) if data_axis is not None else rep
    field_specs = capacity_specs(field_template, capacity, gauss_axis)
    opt_specs = capacity_specs(opt_state_template, capacity, gauss_axis)
    stats_specs = capacity_specs(DensifyStats.zeros(capacity), capacity, gauss_axis)
    out_specs = GaussShardedStepOutput(field_specs, opt_specs, stats_specs, rep,
                                       rep, rep)
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(field_specs, opt_specs, stats_specs,
                  views_spec, views_spec, views_spec, views_spec, views_spec, rep),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped)


def _pad_rows(img: jnp.ndarray, padded_h: int) -> jnp.ndarray:
    """Pad [..., H, W] with zeros to [..., padded_h, W]."""
    pad = [(0, 0)] * (img.ndim - 2) + [(0, padded_h - img.shape[-2]), (0, 0)]
    return jnp.pad(img, pad)
