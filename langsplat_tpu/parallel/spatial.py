"""Spatial (tile-axis) sharding: one view rendered cooperatively by the mesh.

The sequence/context-parallel analog for this workload (SURVEY.md §2.3 SP/CP row): the
image's tile rows are sharded across devices — each device bins and blends only the
Gaussians touching its horizontal band, so per-device blend work shrinks with the mesh
while the Gaussian axis stays replicated (preprocess is cheap, ~9% of a step). The band
outputs concatenate into the full image along H; gradients flow back band-locally and
join in the parameter `psum`.

Implementation: preprocess runs with the full camera; the band view is a pure index
shift — means2D y and the tile rect rows move down by the band's pixel offset, then
binning/blending run against the band-local tile grid. The shift is linear, so autodiff
through it is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from langsplat_tpu.ops import projection
from langsplat_tpu.ops.rasterize_pallas import rasterize_pallas
from langsplat_tpu.ops.rasterize_tiled import rasterize_tiled
from langsplat_tpu.ops.tiles import bin_gaussians
from langsplat_tpu.ops.render import RenderSettings


def band_height(settings: RenderSettings, n_bands: int) -> int:
    """Per-band pixel height: tile rows divided across bands (last band may pad)."""
    rows_total = settings.grid_y
    rows_per_band = -(-rows_total // n_bands)
    return rows_per_band * settings.tile_size


def band_from_prep(prep, opacity, features, settings: RenderSettings, band_index,
                   n_bands: int, bg_color, *, budget: int,
                   screenspace_offset=None) -> dict:
    """Bin + blend tile rows [band_index*rows_per_band, ...) from full-image
    preprocess output.

    `prep` is a full-image PreprocessOut over the (global) Gaussian axis; `opacity`
    [N] and `features` [N, F] or None are the activated blend inputs. Returns band
    images [C, band_h, W]; rows past the true image height are background. The band
    view of the preprocess output is a pure index shift, so autodiff through it is
    exact. Split out of `render_band` so the gauss-sharded path can blend a band from
    an all-gathered preprocess (parallel/gauss_sharded.py).
    """
    bh = band_height(settings, n_bands)
    rows_per_band = bh // settings.tile_size
    y0 = band_index * bh

    # shift into band-local coordinates and clip tile rects to the band
    means2d = prep.means2d - jnp.stack([jnp.zeros_like(y0, prep.means2d.dtype),
                                        y0.astype(prep.means2d.dtype)])
    tmin_y = jnp.clip(prep.tiles_min[:, 1] - band_index * rows_per_band,
                      0, rows_per_band)
    tmax_y = jnp.clip(prep.tiles_max[:, 1] - band_index * rows_per_band,
                      0, rows_per_band)
    visible = prep.visible & (tmax_y > tmin_y)
    band_prep = prep._replace(
        means2d=means2d,
        tiles_min=prep.tiles_min.at[:, 1].set(tmin_y),
        tiles_max=prep.tiles_max.at[:, 1].set(tmax_y),
        visible=visible,
        radii=jnp.where(visible, prep.radii, 0),
    )
    if screenspace_offset is not None:
        means2d = means2d + screenspace_offset

    inst = bin_gaussians(jax.tree.map(jax.lax.stop_gradient, band_prep),
                         grid_x=settings.grid_x, grid_y=rows_per_band,
                         budget=budget,
                         max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
                         tile_size=settings.tile_size,
                         opacities=jax.lax.stop_gradient(opacity))

    if settings.backend == "tiled":
        out = rasterize_tiled(band_prep._replace(means2d=means2d), inst, opacity,
                              features, bg_color,
                              image_height=bh, image_width=settings.image_width,
                              tile_size=settings.tile_size,
                              max_per_tile=settings.max_per_tile)
    else:
        out = rasterize_pallas(band_prep, inst, opacity, features, bg_color,
                               image_height=bh, image_width=settings.image_width,
                               tile_size=settings.tile_size, chunk=settings.chunk,
                               interpret=settings.interpret,
                               means2d_override=means2d)
    out["radii"] = band_prep.radii
    out["visibility_filter"] = band_prep.radii > 0
    out["instances_dropped"] = inst.dropped
    out["rect_dropped"] = inst.rect_dropped
    return out


def render_band(field, settings: RenderSettings, band_index, n_bands: int,
                viewmatrix, projmatrix, campos, bg_color,
                screenspace_offset=None) -> dict:
    """Render tile rows [band_index*rows_per_band, ...) of the image.

    Returns band images [C, band_h, W]; rows past the true image height are background.
    """
    shs = field.get_features
    prep = projection.preprocess(
        field.xyz, field.get_scaling, field.rotation, shs,
        viewmatrix, projmatrix, campos,
        image_height=settings.image_height, image_width=settings.image_width,
        tanfovx=settings.tanfovx, tanfovy=settings.tanfovy,
        sh_degree=settings.sh_degree, tile_size=settings.tile_size,
        scale_modifier=settings.scale_modifier, alive=field.alive)

    features = None
    if settings.include_feature:
        lf = field.get_language_feature
        norm = jnp.sqrt(jnp.sum(lf * lf, axis=-1, keepdims=True) + 1e-18)
        features = lf / (norm + 1e-9)

    cap = field.xyz.shape[0]
    budget = (settings.budget or 6 * cap) // n_bands
    return band_from_prep(prep, field.get_opacity[:, 0], features, settings,
                          band_index, n_bands, bg_color, budget=budget,
                          screenspace_offset=screenspace_offset)


def make_spatial_render(mesh: Mesh, settings: RenderSettings, axis: str = "tiles"):
    """Build a jitted full-image render that shards tile rows over `mesh`.

    Returns fn(field, viewmatrix, projmatrix, campos, bg) -> dict with full-image
    `render` [3, H, W] (+ `language_feature_image`). Parameters replicated; each
    device renders its band; bands concatenate along H.
    """
    n_bands = mesh.shape[axis]

    def shard_fn(field, viewmatrix, projmatrix, campos, bg):
        band = jax.lax.axis_index(axis)
        out = render_band(field, settings, band, n_bands,
                          viewmatrix, projmatrix, campos, bg)
        result = {"render": out["render"]}
        if settings.include_feature:
            result["language_feature_image"] = out["language_feature_image"]
        result["final_transmittance"] = out["final_transmittance"]
        # surface the truncation counters (summed over bands) so callers can run
        # the same grow-and-retry policy as the single-device render_full path
        result["instances_dropped"] = jax.lax.psum(out["instances_dropped"], axis)
        result["rect_dropped"] = jax.lax.psum(out["rect_dropped"], axis)
        return result

    rep = P()
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep),
        out_specs={"render": P(None, axis, None),
                   **({"language_feature_image": P(None, axis, None)}
                      if settings.include_feature else {}),
                   "final_transmittance": P(axis, None),
                   "instances_dropped": P(), "rect_dropped": P()},
        check_vma=False,
    )

    def full_render(field, viewmatrix, projmatrix, campos, bg):
        out = mapped(field, viewmatrix, projmatrix, campos, bg)
        h = settings.image_height
        out["render"] = out["render"][:, :h]
        if "language_feature_image" in out:
            out["language_feature_image"] = out["language_feature_image"][:, :h]
        out["final_transmittance"] = out["final_transmittance"][:h]
        return out

    return jax.jit(full_render)
