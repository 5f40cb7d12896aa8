"""Depth-sharded blending: the ring/blockwise-attention analog (SURVEY.md §5).

When a scene's depth-sorted instance stream exceeds one chip's memory/VMEM
envelope, the stream is partitioned into contiguous GLOBAL depth-rank intervals
— chip d blends only Gaussians whose depth rank falls in its interval, producing
a partial blend state per pixel: (C_d, F_d, T_d) = (accumulated color, accumulated
feature, remaining transmittance) with background OFF. Front-to-back alpha
blending is associative over such states:

    (C_a, T_a) ∘ (C_b, T_b) = (C_a + T_a * C_b, T_a * T_b)

so the full image is the in-depth-order composition of the D partial states plus
`T_total * bg` — exactly the running-(C, T) chunk formulation the single-chip
Pallas kernel already streams (rasterize_pallas.py), lifted across chips. Rank
intervals preserve the per-pixel blend order (global depth order with index
tie-breaks, identical to tiles.bin_gaussians), so the composed image equals the
single-device render up to fp reassociation.

This is the blockwise variant: partial states are all_gathered over the ICI axis
(volume = D x 7 floats/pixel, tiny next to the instance stream) and composed
locally; a ppermute ring that pipelines the running state chip-to-chip would
save the gather buffer but serializes on D and buys nothing at this volume.

The reference has no counterpart (single GPU, reallocates until it fits);
cite: SURVEY.md §2.3 "Ring attention / Ulysses" row, §5 long-context.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from langsplat_tpu.ops import projection
from langsplat_tpu.ops.render import RenderSettings
from langsplat_tpu.ops.tiles import bin_gaussians
from langsplat_tpu.ops.rasterize_pallas import rasterize_pallas
from langsplat_tpu.ops.rasterize_tiled import rasterize_tiled


def make_depth_sharded_render(mesh: Mesh, settings: RenderSettings,
                              axis: str = "depth"):
    """Jitted full render with the depth axis sharded over `axis`.

    Returns fn(field, viewmatrix, projmatrix, campos, bg) -> dict with `render`,
    `language_feature_image` (when settings.include_feature),
    `final_transmittance`, `radii`, `visibility_filter`, `instances_dropped` —
    the same contract as ops.render.render, replicated on every device.
    """
    n_chunks = mesh.shape[axis]

    def shard_fn(field, viewmatrix, projmatrix, campos, bg):
        d = jax.lax.axis_index(axis)
        cap = field.xyz.shape[0]
        shard = -(-cap // n_chunks)
        budget = (settings.budget or 6 * cap) // n_chunks

        shs = field.get_features
        prep = projection.preprocess(
            field.xyz, field.get_scaling, field.rotation, shs,
            viewmatrix, projmatrix, campos,
            image_height=settings.image_height,
            image_width=settings.image_width,
            tanfovx=settings.tanfovx, tanfovy=settings.tanfovy,
            sh_degree=settings.sh_degree, tile_size=settings.tile_size,
            scale_modifier=settings.scale_modifier, alive=field.alive)

        # global depth ranks, identical tie-break to tiles.bin_gaussians
        n = cap
        depth_keys = jnp.where(prep.visible, prep.depths, jnp.inf)
        _, by_depth = jax.lax.sort((depth_keys, jnp.arange(n, dtype=jnp.int32)),
                                   num_keys=1, is_stable=True)
        _, rank = jax.lax.sort((by_depth, jnp.arange(n, dtype=jnp.int32)),
                               num_keys=1, is_stable=False)
        keep = (rank >= d * shard) & (rank < (d + 1) * shard)
        prep_d = prep._replace(visible=prep.visible & keep)

        opac = field.get_opacity[:, 0]
        feats = None
        if settings.include_feature:
            lf = field.get_language_feature
            norm = jnp.sqrt(jnp.sum(lf * lf, axis=-1, keepdims=True) + 1e-18)
            feats = lf / (norm + 1e-9)

        inst = bin_gaussians(
            prep_d, grid_x=settings.grid_x, grid_y=settings.grid_y,
            budget=budget,
            max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
            tile_size=settings.tile_size, opacities=opac)
        zero_bg = jnp.zeros_like(bg)
        if settings.backend == "tiled":
            out = rasterize_tiled(
                prep_d, inst, opac, feats, zero_bg,
                image_height=settings.image_height,
                image_width=settings.image_width,
                tile_size=settings.tile_size,
                max_per_tile=settings.max_per_tile)
        else:
            out = rasterize_pallas(
                prep_d, inst, opac, feats, zero_bg,
                image_height=settings.image_height,
                image_width=settings.image_width,
                tile_size=settings.tile_size, chunk=settings.chunk,
                interpret=settings.interpret, grad_mode=settings.grad_mode,
                grad_precision=settings.grad_precision)

        # gather the D partial states and compose in depth order
        c_all = jax.lax.all_gather(out["render"], axis)             # [D,3,H,W]
        t_all = jax.lax.all_gather(out["final_transmittance"], axis)  # [D,H,W]
        f_all = None
        if feats is not None:
            f_all = jax.lax.all_gather(out["language_feature_image"], axis)

        def compose(carry, xs):
            c_acc, f_acc, t_acc = carry
            if f_all is not None:
                c_d, f_d, t_d = xs
                f_acc = f_acc + t_acc[None] * f_d
            else:
                c_d, t_d = xs
            c_acc = c_acc + t_acc[None] * c_d
            return (c_acc, f_acc, t_acc * t_d), None

        h, w = out["final_transmittance"].shape
        f0 = (jnp.zeros((feats.shape[1], h, w)) if feats is not None
              else jnp.zeros((0, h, w)))
        init = (jnp.zeros((3, h, w)), f0, jnp.ones((h, w)))
        xs = (c_all, f_all, t_all) if f_all is not None else (c_all, t_all)
        (c_total, f_total, t_total), _ = jax.lax.scan(compose, init, xs)

        result = {
            "render": c_total + t_total[None] * bg[:, None, None],
            "final_transmittance": t_total,
            "radii": prep.radii,
            "visibility_filter": prep.radii > 0,
            "instances_dropped": jax.lax.psum(inst.dropped, axis),
            "rect_dropped": jax.lax.psum(inst.rect_dropped, axis),
        }
        if feats is not None:
            result["language_feature_image"] = f_total
        return result

    rep = P()
    out_specs = {"render": rep, "final_transmittance": rep, "radii": rep,
                 "visibility_filter": rep, "instances_dropped": rep,
                 "rect_dropped": rep}
    if settings.include_feature:
        out_specs["language_feature_image"] = rep
    mapped = jax.shard_map(shard_fn, mesh=mesh,
                           in_specs=(rep, rep, rep, rep, rep),
                           out_specs=out_specs, check_vma=False)
    return jax.jit(mapped)
