"""Data-parallel training on the 8-device virtual CPU mesh: runs, improves, and matches
the single-device batched computation exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from langsplat_tpu.config import OptimizationConfig
from langsplat_tpu.ops.render import RenderSettings, render
from langsplat_tpu.parallel.data_parallel import make_dp_train_step
from langsplat_tpu.parallel.mesh import make_mesh
from langsplat_tpu.train import densify as dn
from langsplat_tpu.train import trainer as tr
from langsplat_tpu.core import transforms

from tests.test_model_train import make_field


def batched_cameras(v=8, w=32, h=32, fov=0.8, radius=0.3):
    views, projs, cpos = [], [], []
    P = transforms.projection_matrix(0.01, 100.0, fov, fov).T
    for i in range(v):
        ang = 2 * np.pi * i / v
        t = np.array([radius * np.cos(ang), radius * np.sin(ang), 0.0])
        V = transforms.world_to_view(np.eye(3), t).T
        views.append(V)
        projs.append(V @ P)
        cpos.append(np.linalg.inv(V)[3, :3])
    tanf = float(np.tan(fov / 2))
    return (jnp.asarray(np.stack(views)), jnp.asarray(np.stack(projs)),
            jnp.asarray(np.stack(cpos)), tanf)


def test_dp_step_runs_and_matches_serial():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    h = w = 32
    views, projs, cpos, tanf = batched_cameras(v=8, w=w, h=h)
    settings = RenderSettings(image_height=h, image_width=w, tanfovx=tanf,
                              tanfovy=tanf, sh_degree=0, include_feature=False,
                              tile_size=16, backend="tiled", max_per_tile=128,
                              budget=1024)
    bg = jnp.zeros(3)
    gt_field = make_field(n=12, cap=32, seed=3)
    gts = jnp.stack([
        render(gt_field, settings, views[i], projs[i], cpos[i], bg)["render"]
        for i in range(8)])
    masks = jnp.ones((8, 1, 1, 1))

    from dataclasses import replace
    rng = np.random.default_rng(0)
    field = replace(gt_field, xyz=gt_field.xyz + jnp.asarray(
        rng.normal(0, 0.08, (32, 3)).astype(np.float32)))

    cfg = OptimizationConfig()
    opt = tr.make_optimizer(cfg, spatial_lr_scale=1.0, include_feature=False)
    params = tr.extract_params(field, include_feature=False)
    opt_state = opt.init(params)
    stats = dn.DensifyStats.zeros(32)

    step = make_dp_train_step(mesh, settings, opt, include_feature=False)
    out = step(field, opt_state, stats, views, projs, cpos, gts, masks, bg)
    loss0 = float(out.loss)
    assert np.isfinite(loss0) and loss0 > 0

    # serial oracle: same math with vmap on one device
    def serial_loss(p, ss):
        f = tr.merge_params(field, p)

        def one(view, proj, cp, gt):
            o = render(f, settings, view, proj, cp, bg, screenspace_offset=ss)
            from langsplat_tpu.core import losses
            l1 = losses.l1_loss(o["render"], gt)
            return (0.8 * l1 + 0.2 * (1 - losses.ssim(o["render"], gt)))

        return jnp.mean(jax.vmap(one)(views, projs, cpos, gts))

    zeros2d = jnp.zeros((32, 2))
    sgrads = jax.grad(serial_loss)(params, zeros2d)
    supd, _ = opt.update(sgrads, opt_state, params)
    sparams = {k: params[k] + supd[k] for k in params}
    np.testing.assert_allclose(np.asarray(out.field.xyz), np.asarray(sparams["xyz"]),
                               atol=1e-6)

    # iterate: loss decreases
    field2, opt_state2, stats2 = out.field, out.opt_state, out.stats
    last = loss0
    for _ in range(10):
        o = step(field2, opt_state2, stats2, views, projs, cpos, gts, masks, bg)
        field2, opt_state2, stats2, last = o.field, o.opt_state, o.stats, float(o.loss)
    assert last < loss0
    # stats accumulated across devices
    assert float(jnp.sum(stats2.denom)) > 0


def test_dp_feature_step_matches_serial():
    """Feature-phase DP step == the serial batched masked-L1 oracle: same
    loss, same updated language features after one Adam step (the batch loss
    is a mean over views — reference train.py:96-99 per-view semantics)."""
    mesh = make_mesh(8)
    h = w = 32
    views, projs, cpos, tanf = batched_cameras(v=8, w=w, h=h)
    settings = RenderSettings(image_height=h, image_width=w, tanfovx=tanf,
                              tanfovy=tanf, sh_degree=0, include_feature=True,
                              tile_size=16, backend="tiled", max_per_tile=128,
                              budget=1024)
    bg = jnp.zeros(3)
    field = make_field(n=12, cap=32, seed=5).with_language_feature(3)
    rng = np.random.default_rng(7)
    gts = jnp.asarray(rng.normal(size=(8, 3, h, w)).astype(np.float32))
    # non-trivial masks: some views mostly masked out (SAM no-feature pixels)
    masks = jnp.asarray((rng.uniform(size=(8, 1, h, w)) > 0.3)
                        .astype(np.float32))
    cfg = OptimizationConfig()
    opt = tr.make_optimizer(cfg, spatial_lr_scale=1.0, include_feature=True)
    params = tr.extract_params(field, True)
    opt_state = opt.init(params)
    stats = dn.DensifyStats.zeros(32)
    step = make_dp_train_step(mesh, settings, opt, include_feature=True)
    out = step(field, opt_state, stats, views, projs, cpos, gts, masks, bg)
    assert np.isfinite(float(out.loss))
    # geometry untouched
    np.testing.assert_array_equal(np.asarray(out.field.xyz), np.asarray(field.xyz))

    # serial oracle: vmap over the whole view batch on one device
    from langsplat_tpu.core import losses

    def serial_loss(p):
        f = tr.merge_params(field, p)

        def one(view, proj, cp, gt, mask):
            o = render(f, settings, view, proj, cp, bg)
            return losses.masked_l1_loss(o["language_feature_image"], gt, mask)

        return jnp.mean(jax.vmap(one)(views, projs, cpos, gts, masks))

    sloss, sgrads = jax.value_and_grad(serial_loss)(params)
    np.testing.assert_allclose(float(out.loss), float(sloss), atol=1e-6)
    supd, _ = opt.update(sgrads, opt_state, params)
    sfeat = params["language_feature"] + supd["language_feature"]
    np.testing.assert_allclose(np.asarray(out.field.get_language_feature),
                               np.asarray(sfeat), atol=1e-6)


def test_dp_spatial_2d_mesh_matches_dp():
    """2D ('data','tiles') step == plain DP step when lambda_dssim=0 (band-exact L1)."""
    from langsplat_tpu.parallel.dp_spatial import make_dp_spatial_train_step

    mesh2d = make_mesh(8, axis_names=("data", "tiles"))
    assert dict(zip(mesh2d.axis_names, mesh2d.devices.shape)) == {
        "data": 2, "tiles": 4}
    mesh1d = make_mesh(8)
    h, w = 32, 32
    v = 2
    views, projs, cpos, tanf = batched_cameras(v=8, w=w, h=h)
    views, projs, cpos = views[:v], projs[:v], cpos[:v]
    settings = RenderSettings(image_height=h, image_width=w, tanfovx=tanf,
                              tanfovy=tanf, sh_degree=0, include_feature=False,
                              tile_size=16, backend="tiled", max_per_tile=128,
                              budget=1024)
    bg = jnp.zeros(3)
    gt_field = make_field(n=12, cap=32, seed=3)
    gts = jnp.stack([
        render(gt_field, settings, views[i], projs[i], cpos[i], bg)["render"]
        for i in range(v)])
    masks = jnp.ones((v, 1, 1, 1))

    from dataclasses import replace
    rng = np.random.default_rng(0)
    field = replace(gt_field, xyz=gt_field.xyz + jnp.asarray(
        rng.normal(0, 0.08, (32, 3)).astype(np.float32)))

    cfg = OptimizationConfig()
    opt = tr.make_optimizer(cfg, spatial_lr_scale=1.0, include_feature=False)
    opt_state = opt.init(tr.extract_params(field, include_feature=False))
    stats = dn.DensifyStats.zeros(32)

    step2d = make_dp_spatial_train_step(mesh2d, settings, opt,
                                        include_feature=False, lambda_dssim=0.0)
    out2d = step2d(field, opt_state, stats, views, projs, cpos, gts, masks, bg)
    assert np.isfinite(float(out2d.loss))

    # oracle: plain DP over 2 devices with the same batch and lambda_dssim=0
    mesh_small = make_mesh(2)
    step1d = make_dp_train_step(mesh_small, settings, opt, include_feature=False,
                                lambda_dssim=0.0)
    out1d = step1d(field, opt_state, stats, views, projs, cpos, gts, masks, bg)
    np.testing.assert_allclose(float(out2d.loss), float(out1d.loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out2d.field.xyz),
                               np.asarray(out1d.field.xyz), atol=2e-6)
    # densify stats identical (band psums reassemble the full-view tap)
    np.testing.assert_allclose(np.asarray(out2d.stats.grad_accum),
                               np.asarray(out1d.stats.grad_accum), atol=1e-6)


def test_dp_spatial_feature_phase_runs():
    from langsplat_tpu.parallel.dp_spatial import make_dp_spatial_train_step

    mesh2d = make_mesh(8, axis_names=("data", "tiles"))
    h, w = 48, 32  # 3 tile rows over 4 bands: exercises the padded-band path
    views, projs, cpos, tanf = batched_cameras(v=2, w=w, h=h)
    settings = RenderSettings(image_height=h, image_width=w, tanfovx=tanf,
                              tanfovy=tanf, sh_degree=0, include_feature=True,
                              tile_size=16, backend="tiled", max_per_tile=128,
                              budget=1024)
    bg = jnp.zeros(3)
    field = make_field(n=12, cap=32, seed=5).with_language_feature(3)
    gts = jnp.ones((2, 3, h, w)) * 0.2
    masks = jnp.ones((2, 1, h, w))
    cfg = OptimizationConfig()
    opt = tr.make_optimizer(cfg, spatial_lr_scale=1.0, include_feature=True)
    opt_state = opt.init(tr.extract_params(field, True))
    stats = dn.DensifyStats.zeros(32)
    step = make_dp_spatial_train_step(mesh2d, settings, opt, include_feature=True)
    out = step(field, opt_state, stats, views, projs, cpos, gts, masks, bg)
    assert np.isfinite(float(out.loss))
    np.testing.assert_array_equal(np.asarray(out.field.xyz), np.asarray(field.xyz))


def test_dp_zero2_matches_replicated():
    """ZeRO-2 DP (reduce-scatter grads + sharded Adam + all_gather params)
    matches the replicated DP step on every output (VERDICT r01 #5;
    docs/SCALING.md >1.5M-Gaussian plan)."""
    from langsplat_tpu.parallel.data_parallel import shard_opt_state

    mesh = make_mesh(8)
    h = w = 32
    views, projs, cpos, tanf = batched_cameras(v=8, w=w, h=h)
    settings = RenderSettings(image_height=h, image_width=w, tanfovx=tanf,
                              tanfovy=tanf, sh_degree=0, include_feature=False,
                              tile_size=16, backend="tiled", max_per_tile=128,
                              budget=1024)
    bg = jnp.zeros(3)
    gt_field = make_field(n=12, cap=32, seed=3)
    gts = jnp.stack([
        render(gt_field, settings, views[i], projs[i], cpos[i], bg)["render"]
        for i in range(8)])
    masks = jnp.ones((8, 1, 1, 1))

    from dataclasses import replace
    rng = np.random.default_rng(1)
    field = replace(gt_field, xyz=gt_field.xyz + jnp.asarray(
        rng.normal(0, 0.08, (32, 3)).astype(np.float32)))

    cfg = OptimizationConfig()
    opt = tr.make_optimizer(cfg, spatial_lr_scale=1.0, include_feature=False)
    params = tr.extract_params(field, include_feature=False)
    opt_state = opt.init(params)
    stats = dn.DensifyStats.zeros(32)

    step_rep = make_dp_train_step(mesh, settings, opt, include_feature=False)
    step_z2 = make_dp_train_step(mesh, settings, opt, include_feature=False,
                                 zero2=True, capacity=32,
                                 opt_state_template=opt_state)
    opt_state_sharded = shard_opt_state(mesh, opt_state, 32)

    out_rep = step_rep(field, opt_state, stats, views, projs, cpos, gts, masks,
                       bg)
    out_z2 = step_z2(field, opt_state_sharded, stats, views, projs, cpos, gts,
                     masks, bg)

    np.testing.assert_allclose(float(out_z2.loss), float(out_rep.loss),
                               rtol=1e-6)
    for name in ("xyz", "features_dc", "features_rest", "scaling", "rotation",
                 "opacity"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_z2.field, name)),
            np.asarray(getattr(out_rep.field, name)), atol=1e-6,
            err_msg=f"zero2 diverged from replicated DP in {name}")
    # moment rows agree too (gather the sharded state back)
    mo_rep = jax.tree.leaves(out_rep.opt_state)
    mo_z2 = jax.tree.leaves(jax.device_get(out_z2.opt_state))
    for a, b in zip(mo_z2, mo_rep):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # a second step keeps working on the sharded state
    o2 = step_z2(out_z2.field, out_z2.opt_state, out_z2.stats, views, projs,
                 cpos, gts, masks, bg)
    assert np.isfinite(float(o2.loss))
