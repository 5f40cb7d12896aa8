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


def _make_mapped_render(mesh: Mesh, settings: RenderSettings,
                        axis: str = "depth"):
    """The shard_map'd (un-jitted) depth-sharded render — differentiable, so it
    can be embedded inside a larger jitted loss/train-step. See
    make_depth_sharded_render for the contract."""
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

        # global depth ranks, identical tie-break to tiles.bin_gaussians;
        # pure index bookkeeping — no gradient flows through the ranking
        # (the sorted float keys are discarded), but stop_gradient makes
        # that explicit and keeps the backward free of sort transposes
        n = cap
        depth_keys = jax.lax.stop_gradient(
            jnp.where(prep.visible, prep.depths, jnp.inf))
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
            jax.tree.map(jax.lax.stop_gradient, prep_d),
            grid_x=settings.grid_x, grid_y=settings.grid_y,
            budget=budget,
            max_tiles_per_gaussian=settings.max_tiles_per_gaussian,
            tile_size=settings.tile_size,
            opacities=jax.lax.stop_gradient(opac))
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
    return jax.shard_map(shard_fn, mesh=mesh,
                         in_specs=(rep, rep, rep, rep, rep),
                         out_specs=out_specs, check_vma=False)


def make_depth_sharded_render(mesh: Mesh, settings: RenderSettings,
                              axis: str = "depth"):
    """Jitted full render with the depth axis sharded over `axis`.

    Returns fn(field, viewmatrix, projmatrix, campos, bg) -> dict with `render`,
    `language_feature_image` (when settings.include_feature),
    `final_transmittance`, `radii`, `visibility_filter`, `instances_dropped` —
    the same contract as ops.render.render, replicated on every device.
    Differentiable: gradients flow through the per-shard blend, the all_gather,
    and the scan composition back to every field parameter (the all_gather /
    replicated-input transposes become the parameter psum).
    """
    key = (mesh, settings, axis)
    hit = _RENDER_CACHE.get(key)
    if hit is None:
        hit = jax.jit(_make_mapped_render(mesh, settings, axis))
        _RENDER_CACHE[key] = hit
    return hit


# jax.jit caches by function identity, so rebuilding the shard_map closure on
# every call would recompile even with unchanged settings; keyed on the
# (hashable) mesh + frozen settings + axis, steady-state callers — including
# depth_sharded_render_full's retry loop — hit the compile cache
_RENDER_CACHE: dict = {}


def depth_sharded_render_full(mesh: Mesh, settings: RenderSettings, field,
                              viewmatrix, projmatrix, campos, bg,
                              axis: str = "depth", budget_cap_factor: int = 10):
    """Render one view on the depth mesh, retrying with grown per-shard budget /
    max_tiles caps until nothing is dropped — the depth-mesh analog of
    train.loop.render_full (the reference CUDA rasterizer reallocates and never
    truncates). Depth-rank intervals equalize *Gaussian* counts per shard, not
    *instance* counts, so a shard holding large splats can overflow while others
    idle; growth is geometric and recompiles once per new (budget, tmax).
    """
    import dataclasses

    cap = field.xyz.shape[0]
    budget = settings.budget or 6 * cap
    budget_cap = budget_cap_factor * cap
    n_chunks = mesh.shape[axis]
    tmax = settings.max_tiles_per_gaussian
    grid_cap = settings.grid_x * settings.grid_y
    while True:
        s = dataclasses.replace(settings, budget=budget,
                                max_tiles_per_gaussian=tmax)
        out = make_depth_sharded_render(mesh, s, axis)(
            field, viewmatrix, projmatrix, campos, bg)
        dropped, rect = int(out["instances_dropped"]), int(out["rect_dropped"])
        if dropped == 0 and rect == 0:
            return out
        grew = False
        if rect > 0 and tmax < grid_cap:
            tmax = min(tmax * 2, grid_cap)
            grew = True
        if dropped > 0 and budget < budget_cap:
            # per-shard budget is budget // n_chunks: grow by at least one
            # shard quantum so the retry actually changes the compiled shape
            budget = min(max(int(budget * 1.5), budget + n_chunks), budget_cap)
            grew = True
        if not grew:
            raise RuntimeError(
                f"depth-sharded render dropped {dropped} instances at budget "
                f"cap {budget_cap} + {rect} rect positions at max_tiles="
                f"{tmax}; raise budget_cap_factor")


def make_depth_sharded_feature_step(mesh: Mesh, settings: RenderSettings,
                                    optimizer, axis: str = "depth"):
    """Jitted phase-B train step over the depth mesh: masked feature L1 with
    geometry frozen (`/root/reference/train.py:96-99`), gradients flowing
    through the all_gather/scan composition — the ring analog as a TRAINING
    path for scenes whose instance stream exceeds one chip (SURVEY §5
    long-context). Same step semantics as trainer.train_step_feature; returns
    (field, opt_state, loss, instances_dropped, rect_dropped) so callers can
    apply the usual grow-and-retry policy on truncation.
    """
    from langsplat_tpu.core import losses
    from langsplat_tpu.train import trainer as tr
    import optax

    mapped = _make_mapped_render(mesh, settings, axis)

    @jax.jit
    def step(field, opt_state, viewmatrix, projmatrix, campos,
             gt_feature, feature_mask, bg):
        params = tr.extract_params(field, include_feature=True)

        def loss_fn(p):
            f = tr.merge_params(field, p)
            out = mapped(f, viewmatrix, projmatrix, campos, bg)
            l1 = losses.masked_l1_loss(out["language_feature_image"],
                                       gt_feature, feature_mask)
            return l1, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (tr.merge_params(field, params), new_opt_state, loss,
                out["instances_dropped"], out["rect_dropped"])

    return step
