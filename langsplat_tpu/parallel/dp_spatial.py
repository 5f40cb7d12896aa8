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
from langsplat_tpu.train.densify import DensifyStats, update_stats
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
        zeros2d = jnp.zeros((field.capacity, 2), jnp.float32)

        def loss_fn(p, ss):
            f = merge_params(field, p)

            def one_view(view, proj, cpos, gt, mask):
                out = render_band(f, settings, band, n_bands, view, proj, cpos,
                                  bg, screenspace_offset=ss)
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
                                               gts, masks)
            # bands past the true image contribute zero loss but still count in the
            # band pmean; rescale so the mean of band losses equals the full-image
            # per-pixel mean
            scale = padded_h / settings.image_height
            return jnp.mean(per_view) * scale, aux

        (local_loss, (vis, radii)), (grads, ss_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, zeros2d)

        # two-axis ICI reduction: grads/loss average over views AND bands; the
        # means2D stat tap and visibility are summed/maxed so densification sees
        # every view and every band (reference accumulates per view)
        grads = jax.lax.pmean(jax.lax.pmean(grads, tile_axis), data_axis)
        loss = jax.lax.pmean(jax.lax.pmean(local_loss, tile_axis), data_axis)
        # band psums reassemble to n_bands x the per-view means2D gradient (the
        # loss rescale cancels the band/image pixel-count ratio exactly)
        ss_grad = jax.lax.psum(jax.lax.psum(ss_grad, tile_axis),
                               data_axis) / n_bands
        any_vis = jax.lax.psum(
            jax.lax.psum(jnp.any(vis, axis=0).astype(jnp.int32), tile_axis),
            data_axis) > 0
        max_radii = jax.lax.pmax(
            jax.lax.pmax(jnp.max(radii, axis=0), tile_axis), data_axis)

        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_field = merge_params(field, new_params)
        new_stats = update_stats(stats, ss_grad, any_vis, max_radii,
                                 settings.image_width, settings.image_height)
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
