"""Full two-phase training loop: the TPU-native `training()` (/root/reference/train.py:33).

Orchestrates the jitted train steps with the host-side control the reference runs
per-iteration: SH-degree warmup every 1k iters, random camera stack, densify/clone/
split/prune between densify_from/until every densification_interval, opacity reset every
opacity_reset_interval, periodic test/save/checkpoint — under the static-capacity regime:
Adam moment rows are zeroed for churned slots and capacity grows geometrically (one
recompile) when densification overflows.
"""

from __future__ import annotations

import os
import random
import time
from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp

from langsplat_tpu.config import TrainConfig, save_config, to_dict
from langsplat_tpu.core import losses as loss_lib
from langsplat_tpu.data.prefetch import FeaturePrefetcher
from langsplat_tpu.data.scene import Scene
from langsplat_tpu.models import field_io
from langsplat_tpu.models.gaussian_field import grow_capacity
from langsplat_tpu.ops.render import RenderSettings, render
from langsplat_tpu.train import densify as dn
from langsplat_tpu.train import trainer as tr
from langsplat_tpu.utils.logging import RunLogger, Timer


def pad_opt_state(opt_state, old_cap: int, new_cap: int):
    """Pad every [old_cap, ...] optimizer leaf with zero rows (capacity growth)."""
    def pad(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == old_cap:
            pad_block = jnp.zeros((new_cap - old_cap,) + x.shape[1:], x.dtype)
            return jnp.concatenate([x, pad_block], axis=0)
        return x
    return jax.tree.map(pad, opt_state)


def _device_image(cam):
    """Device-resident GT image, uploaded once per camera and memoized on the
    camera object — the reference keeps images on-device too (Camera tensors
    default to data_device='cuda', scene/cameras.py:39-46), and re-uploading
    8 MB per step dominates step time through the tunneled-chip RPC."""
    img = getattr(cam, "_dev_image", None)
    if img is None:
        img = jnp.asarray(cam.image)
        try:
            cam._dev_image = img
        except AttributeError:
            pass
        return img
    return img


def make_settings(cam, pipe, active_sh_degree: int, include_feature: bool,
                  capacity: int, budget: int = 0,
                  max_tiles: int | None = None) -> RenderSettings:
    return RenderSettings(
        image_height=cam.height, image_width=cam.width,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        sh_degree=active_sh_degree, include_feature=include_feature,
        tile_size=pipe.tile_size, chunk=pipe.chunk,
        budget=budget or pipe.budget_factor * capacity,
        max_tiles_per_gaussian=max_tiles or pipe.max_tiles_per_gaussian,
        backend="tiled" if pipe.interpret else "pallas",
        interpret=pipe.interpret,
        convert_shs_python=pipe.convert_shs_python,
        compute_cov3d_python=pipe.compute_cov3d_python,
        # the feature phase freezes geometry (reference train.py:96-99): the
        # backward then only needs d(language_feature), which skips the whole
        # geometric gradient chain in the blend kernel
        grad_mode="feature" if include_feature else "full")


class BudgetPolicy:
    """Adaptive instance-budget sizing for the static-shape rasterizer.

    Budget-sized host ops (binning sort, packing gather and its backward) scale
    with the STATIC budget, not the live instance count, so a loose bound taxes
    every iteration (~40% of step time at budget_factor=6 on v5e). Policy:
    start from a probed per-view count x headroom, grow geometrically (one
    recompile) whenever a step reports dropped instances, and cap at
    budget_factor * capacity. Steps that dropped are re-run — the reference
    CUDA rasterizer reallocates and never truncates, so neither do we.

    The second cap, `max_tiles_per_gaussian`, is handled by `TmaxPolicy`: a
    Gaussian whose clipped tile rect exceeds it reports `rect_dropped` tile
    positions that NO budget can recover — only a larger tmax (one recompile)
    fixes those, so the two caps grow independently.
    """

    GRANULE = 4096

    def __init__(self, pipe, capacity: int):
        self.pipe = pipe
        self._budget = 0
        self.resize(capacity)

    def _round(self, x: float) -> int:
        return max(int(-(-x // self.GRANULE)) * self.GRANULE, self.GRANULE)

    @property
    def budget(self) -> int:
        return self._budget

    def cap(self, capacity: int) -> int:
        return self._round(self.pipe.budget_factor * capacity)

    def resize(self, capacity: int, probe_count: int | None = None) -> None:
        if not self.pipe.adaptive_budget:
            self._budget = self.cap(capacity)
            return
        if probe_count is not None:
            want = self._round(probe_count * self.pipe.budget_headroom)
            self._budget = min(max(self._budget, want), self.cap(capacity))
        elif self._budget == 0:
            self._budget = min(self._round(capacity), self.cap(capacity))

    def grow(self, capacity: int) -> bool:
        """Geometric growth after an overflow; False if already at the cap."""
        if not self.pipe.adaptive_budget:
            return False
        new = min(self._round(self._budget * 1.5), self.cap(capacity))
        if new == self._budget:
            return False
        self._budget = new
        return True


class TmaxPolicy:
    """Adaptive `max_tiles_per_gaussian`: doubled (one recompile) whenever a
    step reports `rect_dropped` tile positions, capped at the largest tile grid
    any camera uses — at that point every clipped rect fits and rect drops are
    impossible. The reference bins the FULL rect always (duplicateWithKeys has
    no cap, SURVEY N3), so truncating huge splats would silently diverge from
    it; tmax above tiles.MAX_CULL_TMAX additionally disables the bitmask cull
    (correct, just more instances)."""

    def __init__(self, pipe, cameras):
        self.tmax = pipe.max_tiles_per_gaussian
        ts = pipe.tile_size
        self.grid_cap = max((-(-c.width // ts)) * (-(-c.height // ts))
                            for c in cameras) if cameras else pipe.tile_size ** 2

    def grow(self) -> bool:
        new = min(self.tmax * 2, self.grid_cap)
        if new <= self.tmax:
            return False
        self.tmax = new
        return True


def training(cfg: TrainConfig, gui_host: str = "127.0.0.1",
             gui_port: int = 0) -> dict:
    mcfg, ocfg, pipe = cfg.model, cfg.optimization, cfg.pipeline
    include_feature = ocfg.include_feature
    logger = RunLogger(mcfg.model_path or None, quiet=cfg.quiet)
    key = jax.random.key(cfg.seed)

    gui = None
    if gui_port:
        from langsplat_tpu.utils.network_gui import NetworkGUI
        gui = NetworkGUI()
        try:
            gui.init(gui_host, gui_port)
        except OSError as e:
            logger.log(f"network GUI disabled ({e})")
            gui = None

    scene = Scene(mcfg, initial_capacity_factor=ocfg.initial_capacity_factor,
                  seed=cfg.seed)
    field = scene.gaussians
    spatial_lr_scale = scene.cameras_extent
    active_sh_degree = 0
    first_iter = 0

    if include_feature and not cfg.start_checkpoint:
        raise ValueError("feature training requires a phase-A checkpoint "
                         "(--start_checkpoint), as in the reference train.py:41-43")

    resume_full = False
    if cfg.start_checkpoint:
        field, first_iter, spatial_lr_scale, active_sh_degree, ck_has_feature = \
            field_io.load_field(cfg.start_checkpoint, field)
        # same-phase checkpoints with optimizer+stats groups resume the FULL
        # training state (reference capture()/restore(),
        # scene/gaussian_model.py:63-131); cross-phase ones restore params only
        resume_full = (ck_has_feature == include_feature
                       and field_io.checkpoint_has_state(cfg.start_checkpoint))
        if include_feature and not ck_has_feature:
            first_iter = 0  # phase handoff resets the iteration counter (train.py:46-47)
    if include_feature:
        field = field.with_language_feature(3, seed=cfg.seed)

    optimizer = tr.make_optimizer(ocfg, spatial_lr_scale, include_feature)
    opt_state = optimizer.init(tr.extract_params(field, include_feature))
    stats = dn.DensifyStats.zeros(field.capacity)
    if resume_full:
        field, opt_state, stats, first_iter, spatial_lr_scale, active_sh_degree = \
            field_io.load_checkpoint(cfg.start_checkpoint, field, opt_state, stats)
        logger.log(f"resumed full training state at iteration {first_iter} "
                   f"(capacity {field.capacity})")

    if mcfg.model_path:
        save_config(cfg, os.path.join(mcfg.model_path, "cfg_args.json"))

    bg = jnp.asarray([1.0, 1.0, 1.0] if mcfg.white_background else [0.0, 0.0, 0.0])
    budget_policy = BudgetPolicy(pipe, field.capacity)
    tmax_policy = TmaxPolicy(pipe, scene.get_train_cameras()
                             + scene.get_test_cameras())
    if pipe.adaptive_budget:
        from langsplat_tpu.ops.render import count_instances
        probe_cam = scene.get_train_cameras()[0]
        probe_settings = make_settings(probe_cam, pipe, 0, include_feature,
                                       field.capacity, budget=BudgetPolicy.GRANULE,
                                       max_tiles=tmax_policy.tmax)
        cnt = int(count_instances(
            field, probe_settings, jnp.asarray(probe_cam.world_view_transform),
            jnp.asarray(probe_cam.full_proj_transform),
            jnp.asarray(probe_cam.camera_center)))
        budget_policy.resize(field.capacity, cnt)
        logger.log(f"instance budget {budget_policy.budget} "
                   f"(probed {cnt}, cap {budget_policy.cap(field.capacity)})")
    # Deterministic per-epoch camera schedule: the shuffled order is a pure
    # function of (seed, epoch) and the position of (iteration), so an
    # interrupted run resumes on the exact view sequence an uninterrupted run
    # would have used — the reference's stateful pop-from-shuffled-stack
    # (train.py:85-87) cannot resume deterministically mid-epoch.
    train_cams = scene.get_train_cameras()
    cur_epoch, epoch_order = -1, []

    def schedule_cam(idx: int):
        """Camera at absolute schedule position idx (epoch-shuffled, pure in
        (seed, idx)); returns (camera, within-epoch position)."""
        nonlocal cur_epoch, epoch_order
        epoch, pos = divmod(idx, len(train_cams))
        if epoch != cur_epoch:
            epoch_order = list(range(len(train_cams)))
            random.Random(cfg.seed * 1_000_003 + epoch).shuffle(epoch_order)
            cur_epoch = epoch
        return train_cams[epoch_order[pos]], pos

    def cam_at(iteration: int):
        return schedule_cam(iteration - 1)

    timer = Timer()
    history: list[float] = []
    # async decode + host->device staging of the next view's feature maps (the
    # reference re-reads them from disk synchronously every iteration, train.py:96)
    prefetcher = FeaturePrefetcher(mcfg.lf_path, mcfg.feature_level) \
        if include_feature else None

    # Depth-rank sharded feature training (the ring/blockwise analog): the
    # instance stream splits into contiguous depth-rank intervals across a
    # device mesh; gradients flow back through the all_gather/scan composition
    # (parallel/depth_sharded.py). Steps are cached per settings so the usual
    # budget/tmax growth policy recompiles at most once per new cap.
    depth_mesh = None
    depth_steps: dict = {}
    if include_feature and pipe.depth_shards > 1:
        from langsplat_tpu.parallel.mesh import make_mesh
        depth_mesh = make_mesh(pipe.depth_shards, axis_names=("depth",))
        logger.log(f"feature phase depth-sharded over {pipe.depth_shards} "
                   f"devices")

    def depth_step_for(settings):
        if settings not in depth_steps:
            from langsplat_tpu.parallel.depth_sharded import (
                make_depth_sharded_feature_step)
            depth_steps[settings] = make_depth_sharded_feature_step(
                depth_mesh, settings, optimizer)
        return depth_steps[settings]

    # Data-parallel training over a view-sharded mesh. Phase A: the
    # reference's train.py:121-133 densification dynamic — each step renders
    # one view per device, psums grads + densify stats over ICI, and the
    # host-side densify/prune/reset/capacity-growth surgery runs on the
    # replicated (zero2: gathered-row) state exactly as the single-device
    # loop. Phase B: the masked feature L1 (reference train.py:96-99) is a
    # mean over the view batch, so view sharding + grad pmean reproduces the
    # serial per-view step numerics exactly — this is the scaling path for
    # the 3-of-4 phases the reference trains in feature mode (process.sh:19-23).
    data_mesh = None
    dp_steps: dict = {}
    dp_ndev = max(pipe.data_shards, 1)
    dp_batch = dp_ndev * max(pipe.dp_views_per_device, 1)
    if pipe.data_shards > 1:
        if include_feature and pipe.depth_shards > 1:
            raise ValueError(
                "--data_shards and --depth_shards cannot be combined in the "
                "feature phase; pick view parallelism or depth parallelism")
        from langsplat_tpu.parallel.mesh import make_mesh
        data_mesh = make_mesh(pipe.data_shards, axis_names=("data",))
        if pipe.zero2:
            from langsplat_tpu.parallel.data_parallel import shard_opt_state
            if field.capacity % dp_ndev:
                old_cap = field.capacity
                new_cap = -(-old_cap // dp_ndev) * dp_ndev
                field = grow_capacity(field, new_cap)
                opt_state = pad_opt_state(opt_state, old_cap, new_cap)
                stats = dn.DensifyStats.zeros(new_cap)
            opt_state = shard_opt_state(data_mesh, opt_state, field.capacity)
        logger.log(f"phase {'B (feature)' if include_feature else 'A'} "
                   f"data-parallel over {dp_ndev} devices"
                   + (" (ZeRO-2 optimizer sharding)" if pipe.zero2 else ""))

    def dp_step_for(settings, capacity, opt_state):
        key = (settings, capacity)
        if key not in dp_steps:
            from langsplat_tpu.parallel.data_parallel import make_dp_train_step
            dp_steps[key] = make_dp_train_step(
                data_mesh, settings, optimizer,
                include_feature=include_feature,
                lambda_dssim=ocfg.lambda_dssim, zero2=pipe.zero2,
                capacity=capacity if pipe.zero2 else None,
                opt_state_template=opt_state if pipe.zero2 else None)
        return dp_steps[key]

    # Tensor-parallel (gauss-sharded) training from the CLI: parameters, Adam
    # moments and densify stats shard over the 'gauss' axis (ZeRO-3-like
    # capacity scaling, docs/SCALING.md TP row), blending is tile-banded over
    # the same axis, and densification runs shard-local with serial-equal
    # decisions (parallel/gauss_densify.py).
    gauss_mesh = None
    gs_steps: dict = {}
    gs_densify: dict = {}
    gs_ndev = max(pipe.gauss_shards, 1)
    if pipe.gauss_shards > 1:
        if pipe.data_shards > 1 or pipe.depth_shards > 1:
            raise ValueError(
                "--gauss_shards cannot be combined with --data_shards or "
                "--depth_shards; pick one parallelism axis per run")
        from langsplat_tpu.parallel.mesh import make_mesh
        from langsplat_tpu.parallel.gauss_sharded import (shard_state,
                                                          spread_rows)
        gauss_mesh = make_mesh(pipe.gauss_shards, axis_names=("gauss",))
        if field.capacity % gs_ndev:
            old_cap = field.capacity
            new_cap = -(-old_cap // gs_ndev) * gs_ndev
            field = grow_capacity(field, new_cap)
            opt_state = pad_opt_state(opt_state, old_cap, new_cap)
            stats = dn.DensifyStats.zeros(new_cap)
        # round-robin rows across shards: a front-packed init would leave
        # shard 0 with no free densify slots (see spread_rows)
        field = spread_rows(field, field.capacity, gs_ndev)
        opt_state = spread_rows(opt_state, field.capacity, gs_ndev)
        stats = spread_rows(stats, field.capacity, gs_ndev)
        field = shard_state(gauss_mesh, field, field.capacity)
        opt_state = shard_state(gauss_mesh, opt_state, field.capacity)
        stats = shard_state(gauss_mesh, stats, field.capacity)
        logger.log(f"gauss-sharded (TP) over {gs_ndev} devices: params/Adam/"
                   f"stats 1/{gs_ndev} per device, tile-banded blend, "
                   f"shard-local densification")

    def gs_step_for(settings, capacity, field, opt_state):
        key = (settings, capacity)
        if key not in gs_steps:
            from langsplat_tpu.parallel.gauss_sharded import (
                make_gauss_sharded_train_step)
            gs_steps[key] = make_gauss_sharded_train_step(
                gauss_mesh, settings, optimizer,
                include_feature=include_feature, capacity=capacity,
                field_template=field, opt_state_template=opt_state,
                lambda_dssim=ocfg.lambda_dssim)
        return gs_steps[key]

    def gs_densify_for(capacity, use_size, field):
        key = (capacity, use_size)
        if key not in gs_densify:
            from langsplat_tpu.parallel.gauss_densify import (
                make_sharded_densify)
            gs_densify[key] = make_sharded_densify(
                gauss_mesh, field, capacity, extent=scene.cameras_extent,
                grad_threshold=ocfg.densify_grad_threshold,
                percent_dense=ocfg.percent_dense, min_opacity=0.005,
                use_size_threshold=use_size, size_threshold=20.0)
        return gs_densify[key]

    trace_active = False
    for iteration in range(first_iter + 1, ocfg.iterations + 1):
        if cfg.profile_dir:
            # SURVEY.md §5 tracing: capture a post-warmup trace window for the
            # profiler UI instead of relying on ad-hoc timing scripts
            if iteration == cfg.profile_from:
                jax.profiler.start_trace(cfg.profile_dir)
                trace_active = True
            elif trace_active and iteration == cfg.profile_from + cfg.profile_steps:
                jax.profiler.stop_trace()
                trace_active = False
                logger.log(f"profiler trace ({cfg.profile_steps} steps) written "
                           f"to {cfg.profile_dir}")
        if gui is not None:
            def gui_render(minicam, scale_mod):
                s = RenderSettings(
                    image_height=minicam.height, image_width=minicam.width,
                    tanfovx=minicam.tanfovx, tanfovy=minicam.tanfovy,
                    sh_degree=active_sh_degree, include_feature=False,
                    scale_modifier=float(scale_mod), tile_size=pipe.tile_size,
                    chunk=pipe.chunk, budget=pipe.budget_factor * field.capacity,
                    backend="tiled" if pipe.interpret else "pallas",
                    interpret=pipe.interpret)
                cam_center = jnp.asarray(minicam.camera_center)
                return render(field, s, jnp.asarray(minicam.world_view_transform),
                              jnp.asarray(minicam.full_proj_transform),
                              cam_center, bg)["render"]

            gui.poll(gui_render, mcfg.source_path, iteration, ocfg.iterations)

        if iteration % 1000 == 0 and active_sh_degree < mcfg.sh_degree:
            active_sh_degree += 1

        if data_mesh is not None:
            dp_cams = [schedule_cam((iteration - 1) * dp_batch + j)[0]
                       for j in range(dp_batch)]
            cam = dp_cams[0]
            for c in dp_cams[1:]:
                if (c.height, c.width) != (cam.height, cam.width):
                    raise ValueError(
                        "data-parallel phase A requires uniform image sizes "
                        f"across the view batch, got {c.height}x{c.width} vs "
                        f"{cam.height}x{cam.width}")
            dp_views = jnp.stack([jnp.asarray(c.world_view_transform)
                                  for c in dp_cams])
            dp_projs = jnp.stack([jnp.asarray(c.full_proj_transform)
                                  for c in dp_cams])
            dp_cpos = jnp.stack([jnp.asarray(c.camera_center)
                                 for c in dp_cams])
            if include_feature:
                # schedule the whole batch first so the pool decodes the
                # views concurrently, then gather; lookahead-schedule the
                # next iteration's batch while this step computes
                for c in dp_cams:
                    prefetcher.schedule(c)
                for j in range(dp_batch):
                    prefetcher.schedule(
                        schedule_cam(iteration * dp_batch + j)[0])
                fm = [prefetcher.get(c) for c in dp_cams]
                dp_gts = jnp.stack([f for f, _ in fm])
                dp_masks = jnp.stack([m for _, m in fm])
            else:
                dp_gts = jnp.stack([_device_image(c) for c in dp_cams])
                dp_masks = jnp.ones((dp_batch, 1, 1, 1))
        else:
            cam, epoch_pos = cam_at(iteration)
            if prefetcher is not None and epoch_pos + 1 < len(train_cams):
                prefetcher.schedule(train_cams[epoch_order[epoch_pos + 1]])
            view = jnp.asarray(cam.world_view_transform)
            proj = jnp.asarray(cam.full_proj_transform)
            campos = jnp.asarray(cam.camera_center)

        timer.start()
        while True:
            settings = make_settings(cam, pipe, active_sh_degree, include_feature,
                                     field.capacity, budget=budget_policy.budget,
                                     max_tiles=tmax_policy.tmax)
            if data_mesh is not None:
                dpo = dp_step_for(settings, field.capacity, opt_state)(
                    field, opt_state, stats, dp_views, dp_projs, dp_cpos,
                    dp_gts, dp_masks, bg)
                out = tr.StepOutput(dpo.field, dpo.opt_state, dpo.stats,
                                    dpo.loss, dpo.loss, jnp.zeros(()),
                                    dpo.dropped, dpo.rect_dropped)
            elif gauss_mesh is not None:
                if include_feature:
                    gt_feat, gt_mask = prefetcher.get(cam)
                    gts_b, masks_b = gt_feat[None], gt_mask[None]
                else:
                    gts_b = _device_image(cam)[None]
                    masks_b = jnp.ones((1, 1, 1, 1))
                gso = gs_step_for(settings, field.capacity, field, opt_state)(
                    field, opt_state, stats, view[None], proj[None],
                    campos[None], gts_b, masks_b, bg)
                out = tr.StepOutput(gso.field, gso.opt_state, gso.stats,
                                    gso.loss, gso.loss, jnp.zeros(()),
                                    gso.dropped, gso.rect_dropped)
            elif include_feature:
                gt_feat, gt_mask = prefetcher.get(cam)
                if depth_mesh is not None:
                    nf, no, dloss, ddropped, drect = depth_step_for(settings)(
                        field, opt_state, view, proj, campos,
                        gt_feat, gt_mask, bg)
                    out = tr.StepOutput(nf, no, stats, dloss, dloss,
                                        jnp.zeros(()), ddropped, drect)
                else:
                    out = tr.train_step_feature(
                        field, opt_state, stats, view, proj, campos,
                        gt_feat, gt_mask, bg,
                        settings=settings, optimizer=optimizer)
            else:
                out = tr.train_step_rgb(
                    field, opt_state, stats, view, proj, campos,
                    _device_image(cam), bg,
                    settings=settings, optimizer=optimizer,
                    lambda_dssim=ocfg.lambda_dssim)
            # ONE host fetch for the step's scalars: separate int()/float()
            # calls each pay the full tunnel RPC round-trip (~35 ms)
            _sc = np.asarray(jnp.stack([
                out.dropped.astype(jnp.float32),
                out.rect_dropped.astype(jnp.float32), out.loss, out.l1]))
            dropped, rect = int(_sc[0]), int(_sc[1])
            if dropped == 0 and rect == 0:
                break
            # discard the truncated step's updates and re-run with the failing
            # cap(s) grown (the reference's CUDA buffers reallocate instead,
            # resizeFunctional semantics); field/opt_state/stats are still the
            # pre-step values. rect drops need a larger tmax — no budget can
            # recover tile positions the binning never examined.
            grew = False
            if rect > 0 and tmax_policy.grow():
                logger.log(f"[iter {iteration}] max_tiles_per_gaussian -> "
                           f"{tmax_policy.tmax} ({rect} rect positions dropped)")
                grew = True
            if dropped > 0 and budget_policy.grow(field.capacity):
                logger.log(f"[iter {iteration}] instance budget -> "
                           f"{budget_policy.budget} ({dropped} dropped)")
                grew = True
            if not grew:
                msg = (f"[iter {iteration}] {dropped} instances dropped at the "
                       f"budget cap {budget_policy.cap(field.capacity)} and "
                       f"{rect} rect positions dropped at max_tiles="
                       f"{tmax_policy.tmax} (capacity {field.capacity}, "
                       f"budget_factor {pipe.budget_factor}). The reference "
                       f"rasterizer reallocates and never truncates; raise "
                       f"pipeline.budget_factor, or opt into truncation with "
                       f"pipeline.allow_budget_truncation.")
                if not pipe.allow_budget_truncation:
                    raise RuntimeError(msg)
                logger.log("WARNING (truncated step): " + msg)
                break
        field, opt_state, stats = out.field, out.opt_state, out.stats
        elapsed = timer.stop(out.loss)

        loss_val = float(_sc[2])
        if pipe.debug:
            # the reference's pipe.debug dumps rasterizer state on error; the
            # TPU analog surfaces the budget/drop accounting every step
            logger.log(f"[iter {iteration}] debug: budget={budget_policy.budget} "
                       f"cap={budget_policy.cap(field.capacity)} "
                       f"dropped={int(out.dropped)} "
                       f"alive={int(field.num_alive)}/{field.capacity}")
        history.append(loss_val)
        logger.progress(iteration, loss_val,
                        extra=f" n={int(field.num_alive)} {elapsed:.0f}ms")
        logger.scalar("train_loss_patches/l1_loss", float(_sc[3]), iteration)
        logger.scalar("train_loss_patches/total_loss", loss_val, iteration)
        logger.scalar("iter_time", elapsed, iteration)

        # Densification (phase A only, train.py:121-133)
        if not include_feature and iteration < ocfg.densify_until_iter:
            if (iteration > ocfg.densify_from_iter
                    and iteration % ocfg.densification_interval == 0):
                # key is a pure function of (seed, iteration) so a resumed run
                # draws the same split samples an uninterrupted run would
                sub = jax.random.fold_in(key, iteration)
                use_size = iteration > ocfg.opacity_reset_interval
                if gauss_mesh is not None:
                    # shard-local slot allocation with serial-equal decisions
                    res = gs_densify_for(field.capacity, use_size, field)(
                        field, stats, sub)
                else:
                    res = dn.densify_and_prune(
                        field, stats, sub, extent=scene.cameras_extent,
                        grad_threshold=ocfg.densify_grad_threshold,
                        percent_dense=ocfg.percent_dense, min_opacity=0.005,
                        use_size_threshold=use_size, size_threshold=20.0)
                field, stats = res.field, res.stats
                opt_state = tr.zero_moment_rows(opt_state, res.reset_mask,
                                                field.capacity)
                if int(res.overflow) > 0:
                    old_cap = field.capacity
                    new_cap = int(old_cap * ocfg.capacity_growth_factor)
                    if data_mesh is not None and pipe.zero2:
                        new_cap = -(-new_cap // dp_ndev) * dp_ndev
                    if gauss_mesh is not None:
                        new_cap = -(-new_cap // gs_ndev) * gs_ndev
                    logger.log(f"[iter {iteration}] capacity {old_cap} -> {new_cap} "
                               f"(overflow {int(res.overflow)})")
                    field = grow_capacity(field, new_cap)
                    opt_state = pad_opt_state(opt_state, old_cap, new_cap)
                    if data_mesh is not None and pipe.zero2:
                        # re-lay the padded moment rows out over the data axis
                        # (pad_opt_state produced an unsharded-tail layout)
                        from langsplat_tpu.parallel.data_parallel import (
                            shard_opt_state)
                        opt_state = shard_opt_state(data_mesh, opt_state,
                                                    new_cap)
                    if gauss_mesh is not None:
                        # re-spread + re-chunk the grown rows over the gauss
                        # axis (the padding tail would otherwise land entirely
                        # in the last shard)
                        from langsplat_tpu.parallel.gauss_sharded import (
                            shard_state, spread_rows)
                        field = spread_rows(field, new_cap, gs_ndev)
                        opt_state = spread_rows(opt_state, new_cap, gs_ndev)
                        field = shard_state(gauss_mesh, field, new_cap)
                        opt_state = shard_state(gauss_mesh, opt_state, new_cap)
                    stats = dn.DensifyStats.zeros(new_cap)
                    if gauss_mesh is not None:
                        stats = shard_state(gauss_mesh, stats, new_cap)
                logger.scalar("total_points", int(res.num_alive), iteration)

            if iteration % ocfg.opacity_reset_interval == 0 or (
                    mcfg.white_background and iteration == ocfg.densify_from_iter):
                field = dn.reset_opacity(field)
                opt_state = tr.zero_moment_rows(
                    opt_state, jnp.ones(field.capacity, bool), field.capacity,
                    only_label="opacity")

        if iteration in cfg.test_iterations:
            report = evaluate_psnr(field, scene, pipe, active_sh_degree,
                                   include_feature, bg,
                                   budget=budget_policy.budget,
                                   max_tiles=tmax_policy.tmax,
                                   lf_path=mcfg.lf_path if include_feature else None,
                                   feature_level=mcfg.feature_level)
            for name, rep in report.items():
                l1v, psnrv = rep["l1"], rep["psnr"]
                logger.log(f"[ITER {iteration}] Evaluating {name}: "
                           f"L1 {l1v:.5f} PSNR {psnrv:.3f}")
                logger.scalar(f"{name}/loss_viewpoint - l1_loss", l1v, iteration)
                logger.scalar(f"{name}/loss_viewpoint - psnr", psnrv, iteration)
                if rep.get("feature_l1") is not None:
                    logger.log(f"[ITER {iteration}] Evaluating {name}: "
                               f"feature-L1 {rep['feature_l1']:.5f}")
                    logger.scalar(f"{name}/loss_viewpoint - feature_l1",
                                  rep["feature_l1"], iteration)

        if iteration in cfg.save_iterations and mcfg.model_path:
            logger.log(f"[ITER {iteration}] Saving Gaussians")
            scene.save(iteration, field)

        if iteration in cfg.checkpoint_iterations and mcfg.model_path:
            logger.log(f"[ITER {iteration}] Saving Checkpoint")
            field_io.save_checkpoint(
                os.path.join(mcfg.model_path, f"chkpnt{iteration}.npz"),
                field, opt_state, stats, iteration, spatial_lr_scale,
                active_sh_degree)

    if trace_active:
        jax.profiler.stop_trace()
    if prefetcher is not None:
        prefetcher.close()
    logger.close()
    return {"field": field, "opt_state": opt_state, "stats": stats,
            "scene": scene, "history": history,
            "active_sh_degree": active_sh_degree}


#: absolute instance ceiling for eval renders: ~16.7M instances x 12 rows f32
#: ~= 800 MB — far past any real view, cheap insurance against a runaway loop
RENDER_BUDGET_CEILING = 1 << 24


def render_full(field, cam, pipe, active_sh_degree, include_feature, bg,
                budget: int = 0, max_tiles: int = 0):
    """Render one view, retrying at a doubled instance budget / max_tiles cap
    until nothing is dropped — eval/test views can touch more tiles than the
    training views the adaptive budget was sized for, and the reference never
    truncates (resizeFunctional semantics).

    The budget_factor * capacity cap bounds TRAINING-step memory; it is not a
    correct bound for eval renders — a 30k-iter model pruned to a small
    capacity can carry huge splats (tmax in the thousands) whose per-view
    instance count exceeds any per-capacity factor (seen at the r04 quality
    run's render stage: 250k instances on 14.8k Gaussians). Eval renders
    therefore grow past the policy cap, up to an absolute ceiling."""
    policy_cap = BudgetPolicy(pipe, field.capacity).cap(field.capacity)
    cap = min(max(policy_cap, 64 * field.capacity), RENDER_BUDGET_CEILING)
    budget = min(budget or policy_cap, cap)
    tmax_policy = TmaxPolicy(pipe, [cam])
    if max_tiles:
        tmax_policy.tmax = min(max_tiles, tmax_policy.grid_cap)
    while True:
        settings = make_settings(cam, pipe, active_sh_degree, include_feature,
                                 field.capacity, budget=budget,
                                 max_tiles=tmax_policy.tmax)
        r = render(field, settings, jnp.asarray(cam.world_view_transform),
                   jnp.asarray(cam.full_proj_transform),
                   jnp.asarray(cam.camera_center), bg)
        dropped = int(r["instances_dropped"])
        rect = int(r["rect_dropped"])
        if dropped == 0 and rect == 0:
            return r
        grew = False
        if rect > 0 and tmax_policy.grow():
            grew = True
        if dropped > 0 and budget < cap:
            budget = min(budget * 2, cap)
            grew = True
        if not grew:
            if pipe.allow_budget_truncation:
                return r
            raise RuntimeError(
                f"render dropped {dropped} instances at the budget cap {cap} "
                f"+ {rect} rect positions at max_tiles={tmax_policy.tmax} "
                f"(capacity {field.capacity}); raise pipeline.budget_factor or "
                f"opt into truncation with pipeline.allow_budget_truncation")


def evaluate_psnr(field, scene: Scene, pipe, active_sh_degree, include_feature, bg,
                  max_train_views: int = 5, budget: int = 0,
                  max_tiles: int = 0, lf_path: str | None = None,
                  feature_level: int = 0) -> dict:
    """Test-time PSNR/L1 report (reference training_report, train.py:166-202).

    RGB L1/PSNR always (reference parity); in the feature phase, when `lf_path`
    is given, additionally the masked feature-channel L1 — the number that
    actually tracks phase-B progress (the RGB report is constant there because
    geometry is frozen). GT comes from `Camera.get_language_feature`, the same
    contract the train step optimizes against (reference train.py:96-99).
    """
    out = {}
    configs = [("test", scene.get_test_cameras()),
               ("train", scene.get_train_cameras()[:max_train_views])]
    for name, cams in configs:
        if not cams:
            continue
        l1s, psnrs, feat_l1s = [], [], []
        for cam in cams:
            r = render_full(field, cam, pipe, active_sh_degree, include_feature,
                            bg, budget=budget, max_tiles=max_tiles)
            img = jnp.clip(r["render"], 0, 1)
            gt = jnp.clip(_device_image(cam), 0, 1)
            l1s.append(float(loss_lib.l1_loss(img, gt)))
            psnrs.append(float(loss_lib.psnr(img, gt)))
            if include_feature and lf_path:
                gt_feat, gt_mask = cam.get_language_feature(lf_path, feature_level)
                feat_l1s.append(float(loss_lib.masked_l1_loss(
                    r["language_feature_image"], jnp.asarray(gt_feat),
                    jnp.asarray(gt_mask))))
        out[name] = {"l1": float(np.mean(l1s)), "psnr": float(np.mean(psnrs)),
                     "feature_l1": float(np.mean(feat_l1s)) if feat_l1s else None}
    return out
