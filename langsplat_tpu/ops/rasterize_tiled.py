"""Tiled pure-JAX rasterizer: blends each tile's (tile,depth)-sorted instance list.

Bridges the dense oracle and the Pallas kernel: consumes the `InstanceBuffer` from
`tiles.bin_gaussians`, gathers at most `max_per_tile` instances per tile, and applies the
same blend semantics as `rasterize_reference.blend_weights`. Fully differentiable through
XLA autodiff (gather -> scatter-add in the backward pass, deterministic on TPU); the binning
indices carry no gradient. CPU-runnable — this is the correctness harness for the Pallas
path and the fallback when Pallas is unavailable.

vs CUDA (`renderCUDA`, component N4): identical math; the only departure is the static
`max_per_tile` cap (overflowing tiles truncate the *farthest* instances — report via
`InstanceBuffer.dropped` + per-tile counts; the Pallas kernel has no such cap since it
streams chunks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from langsplat_tpu.ops.projection import PreprocessOut
from langsplat_tpu.ops.rasterize_reference import blend_weights, compute_alphas
from langsplat_tpu.ops.tiles import InstanceBuffer


def rasterize_tiled(
    prep: PreprocessOut,
    inst: InstanceBuffer,
    opacities: jnp.ndarray,
    features: jnp.ndarray | None,
    bg: jnp.ndarray,
    *,
    image_height: int,
    image_width: int,
    tile_size: int,
    max_per_tile: int,
) -> dict:
    grid_x = (image_width + tile_size - 1) // tile_size
    grid_y = (image_height + tile_size - 1) // tile_size
    num_tiles = grid_x * grid_y
    budget = inst.gauss_id.shape[0]
    n = prep.means2d.shape[0]

    # Pad the per-Gaussian attributes with one dead slot so gauss_id == n (padding) reads
    # zeros / off-screen values instead of clamping onto a real Gaussian.
    means2d = jnp.concatenate([prep.means2d, jnp.full((1, 2), -1e8, prep.means2d.dtype)])
    conics = jnp.concatenate([prep.conics, jnp.ones((1, 3), prep.conics.dtype)])
    colors = jnp.concatenate([prep.colors, jnp.zeros((1, 3), prep.colors.dtype)])
    opac = jnp.concatenate([opacities, jnp.zeros((1,), opacities.dtype)])
    feats = None
    if features is not None:
        feats = jnp.concatenate([features, jnp.zeros((1, features.shape[1]),
                                                     features.dtype)])

    def render_tile(tile_idx):
        start = inst.tile_start[tile_idx]
        end = inst.tile_start[tile_idx + 1]
        idx = jnp.minimum(start + jnp.arange(max_per_tile, dtype=jnp.int32), budget - 1)
        in_range = (start + jnp.arange(max_per_tile, dtype=jnp.int32)) < end
        gid = jnp.where(in_range, inst.gauss_id[idx], n)

        ty, tx = tile_idx // grid_x, tile_idx % grid_x
        px = (tx * tile_size + jnp.arange(tile_size)).astype(means2d.dtype)
        py = (ty * tile_size + jnp.arange(tile_size)).astype(means2d.dtype)
        pix_y, pix_x = jnp.meshgrid(py, px, indexing="ij")

        alphas = compute_alphas(means2d[gid], conics[gid], opac[gid],
                                pix_x, pix_y, in_range)
        weights, t_final = blend_weights(alphas)
        tile_rgb = (jnp.einsum("khw,kc->chw", weights, colors[gid])
                    + t_final[None] * bg[:, None, None])
        if feats is not None:
            tile_feat = jnp.einsum("khw,kf->fhw", weights, feats[gid])
        else:
            tile_feat = jnp.zeros((0,) + t_final.shape, tile_rgb.dtype)
        return tile_rgb, tile_feat, t_final

    tiles_rgb, tiles_feat, tiles_t = jax.vmap(render_tile)(
        jnp.arange(num_tiles, dtype=jnp.int32))

    def assemble(tiles):  # [num_tiles, C, ts, ts] -> [C, H, W]
        c = tiles.shape[1]
        img = tiles.reshape(grid_y, grid_x, c, tile_size, tile_size)
        img = img.transpose(2, 0, 3, 1, 4).reshape(c, grid_y * tile_size,
                                                   grid_x * tile_size)
        return img[:, :image_height, :image_width]

    out = {
        "render": assemble(tiles_rgb),
        "final_transmittance": assemble(tiles_t[:, None])[0],
    }
    if features is not None:
        out["language_feature_image"] = assemble(tiles_feat)
    return out
