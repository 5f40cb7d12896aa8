"""2D-mesh training step: views sharded over 'data', tile rows over 'tiles'.

Composes the DP recipe (parallel/data_parallel.py) with spatial tile-row sharding
(parallel/spatial.py) on one `Mesh(('data', 'tiles'))`: every device renders the
tile-row band of the views assigned to its data row, computes band-local losses, and
parameter gradients join a two-axis `pmean` over ICI before the replicated Adam
update. The reference has no distributed layer at all (SURVEY.md §2.3); this is the
DP x SP/CP composition from the checklist there.

Band-local losses: L1 terms are exact under banding (full-image mean == mean of
equal-height band means). SSIM is windowed (11x11), so band-local SSIM differs from
full-image SSIM only in the rows within 5 pixels of a band boundary — an accepted
approximation, documented here, exact when lambda_dssim == 0 (the feature phase uses
masked L1 only, so phase B is exact).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from langsplat_tpu.core import losses
from langsplat_tpu.models.gaussian_field import GaussianField
from langsplat_tpu.ops.render import RenderSettings
from langsplat_tpu.parallel.spatial import band_height, render_band
from langsplat_tpu.train.densify import DensifyStats
from langsplat_tpu.train.trainer import extract_params, merge_params


class DpSpatialStepOutput(NamedTuple):
    field: GaussianField
    opt_state: object
    stats: DensifyStats
    loss: jnp.ndarray


def _pad_rows(img: jnp.ndarray, padded_h: int) -> jnp.ndarray:
    """Pad [..., H, W] with zeros to [..., padded_h, W]."""
    pad = [(0, 0)] * (img.ndim - 2) + [(0, padded_h - img.shape[-2]), (0, 0)]
    return jnp.pad(img, pad)


def make_dp_spatial_train_step(mesh: Mesh, settings: RenderSettings, optimizer,
                               include_feature: bool, lambda_dssim: float = 0.2,
                               data_axis: str = "data", tile_axis: str = "tiles"):
    """Build a jitted train step over a 2D ('data', 'tiles') mesh.

    Inputs as in make_dp_train_step: viewmats [V,4,4], projmats [V,4,4], campos
    [V,3], gt images [V,3,H,W] (RGB) or features [V,F,H,W] + masks [V,1,H,W]
    (feature phase). V must divide by the data axis; gts replicate over 'tiles'.
    """
    n_bands = mesh.shape[tile_axis]
    bh = band_height(settings, n_bands)
    padded_h = bh * n_bands

    def shard_fn(field, opt_state, stats, viewmats, projmats, campos, gts, masks, bg):
        band = jax.lax.axis_index(tile_axis)
        y0 = band * bh
        params = extract_params(field, include_feature)
        v_local = viewmats.shape[0]
        # per-view screenspace offsets: see data_parallel.make_dp_train_step —
        # the densify stat is the reference's per-view accumulation
        zeros3d = jnp.zeros((v_local, field.capacity, 2), jnp.float32)

        def loss_fn(p, ss):
            f = merge_params(field, p)

            def one_view(view, proj, cpos, gt, mask, ss_v):
                out = render_band(f, settings, band, n_bands, view, proj, cpos,
                                  bg, screenspace_offset=ss_v)
                gt_band = jax.lax.dynamic_slice_in_dim(
                    _pad_rows(gt, padded_h), y0, bh, axis=1)
                # rows past the true image are padded on BOTH sides: render_band
                # emits pure background there; mask them out of the loss
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
                return local, (out["visibility_filter"], out["radii"])

            per_view, aux = jax.vmap(one_view)(viewmats, projmats, campos,
                                               gts, masks, ss)
            # bands past the true image contribute zero loss but still count in the
            # band pmean; rescale so the mean of band losses equals the full-image
            # per-pixel mean
            scale = padded_h / settings.image_height
            return jnp.mean(per_view) * scale, aux

        (local_loss, (vis, radii)), (grads, ss_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, zeros3d)

        # two-axis ICI reduction: grads/loss average over views AND bands; the
        # means2D stat tap and visibility are summed/maxed so densification sees
        # every view and every band (reference accumulates per view)
        grads = jax.lax.pmean(jax.lax.pmean(grads, tile_axis), data_axis)
        loss = jax.lax.pmean(jax.lax.pmean(local_loss, tile_axis), data_axis)
        # band psums reassemble each VIEW's full means2D gradient first (the
        # loss rescale cancels the band/image pixel-count ratio exactly); the
        # per-view norms then accumulate in the reference's per-view half-image
        # units, with the local-mean 1/v_local undone (see data_parallel)
        ss_grad = jax.lax.psum(ss_grad, tile_axis) / n_bands  # [v_local, cap, 2]
        stat_scale = jnp.asarray([0.5 * settings.image_width,
                                  0.5 * settings.image_height], jnp.float32)
        gnorm_v = jnp.linalg.norm(ss_grad[:, :, :2] * stat_scale,
                                  axis=-1) * v_local
        vis_any_band = jax.lax.psum(vis.astype(jnp.int32), tile_axis) > 0
        visf = vis_any_band.astype(jnp.float32)
        gnorm_sum = jax.lax.psum(jnp.sum(gnorm_v * visf, axis=0), data_axis)
        denom_sum = jax.lax.psum(jnp.sum(visf, axis=0), data_axis)
        max_radii = jax.lax.pmax(
            jax.lax.pmax(jnp.max(jnp.where(vis, radii.astype(jnp.float32), 0.0),
                                 axis=0), tile_axis), data_axis)

        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_field = merge_params(field, new_params)
        new_stats = DensifyStats(
            grad_accum=stats.grad_accum + gnorm_sum,
            denom=stats.denom + denom_sum,
            max_radii2d=jnp.maximum(stats.max_radii2d, max_radii))
        return DpSpatialStepOutput(new_field, new_opt_state, new_stats, loss)

    rep = P()
    sh = P(data_axis)  # view batch sharded over data, replicated over tiles
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep, rep, rep, sh, sh, sh, sh, sh, rep),
        out_specs=rep,
        check_vma=False,
    )
    return jax.jit(mapped)
