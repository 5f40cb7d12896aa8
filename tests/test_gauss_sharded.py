"""Gaussian-axis sharded training (TP x tile-band SP) on the 8-device virtual CPU
mesh: parameters/Adam moments/stats sharded over 'gauss', blend tile-banded over the
same axis, gradients arriving shard-local through the all_gather's psum_scatter VJP.
Must match the replicated data-parallel computation exactly (lambda_dssim=0)."""

import numpy as np
import jax
import jax.numpy as jnp

from langsplat_tpu.config import OptimizationConfig
from langsplat_tpu.ops.render import RenderSettings, render
from langsplat_tpu.parallel.data_parallel import make_dp_train_step
from langsplat_tpu.parallel.gauss_sharded import (
    make_gauss_sharded_train_step, shard_state)
from langsplat_tpu.parallel.mesh import make_mesh
from langsplat_tpu.train import densify as dn
from langsplat_tpu.train import trainer as tr

from tests.test_model_train import make_field
from tests.test_parallel import batched_cameras


def _setup(include_feature=False, cap=32, v=2, h=32, w=32):
    views, projs, cpos, tanf = batched_cameras(v=8, w=w, h=h)
    views, projs, cpos = views[:v], projs[:v], cpos[:v]
    settings = RenderSettings(image_height=h, image_width=w, tanfovx=tanf,
                              tanfovy=tanf, sh_degree=0,
                              include_feature=include_feature,
                              tile_size=16, backend="tiled", max_per_tile=128,
                              budget=2048)
    bg = jnp.zeros(3)
    gt_field = make_field(n=12, cap=cap, seed=3)
    if include_feature:
        gt_field = gt_field.with_language_feature(3)
    gts_key = "language_feature_image" if include_feature else "render"
    gts = jnp.stack([
        render(gt_field, settings, views[i], projs[i], cpos[i], bg)[gts_key]
        for i in range(v)])
    masks = jnp.ones((v, 1, h, w)) if include_feature else jnp.ones((v, 1, 1, 1))

    from dataclasses import replace
    rng = np.random.default_rng(0)
    if include_feature:
        field = replace(gt_field, language_feature=gt_field.language_feature +
                        jnp.asarray(rng.normal(0, 0.05, (cap, 3)).astype(np.float32)))
    else:
        field = replace(gt_field, xyz=gt_field.xyz + jnp.asarray(
            rng.normal(0, 0.08, (cap, 3)).astype(np.float32)))

    cfg = OptimizationConfig()
    opt = tr.make_optimizer(cfg, spatial_lr_scale=1.0,
                            include_feature=include_feature)
    opt_state = opt.init(tr.extract_params(field, include_feature))
    stats = dn.DensifyStats.zeros(cap)
    return (settings, opt, field, opt_state, stats, views, projs, cpos, gts,
            masks, bg)


def test_gauss_sharded_matches_dp():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, axis_names=("gauss",))
    cap = 32
    (settings, opt, field, opt_state, stats, views, projs, cpos, gts, masks,
     bg) = _setup(cap=cap)

    step = make_gauss_sharded_train_step(
        mesh, settings, opt, include_feature=False, capacity=cap,
        field_template=field, opt_state_template=opt_state, lambda_dssim=0.0)
    field_s = shard_state(mesh, field, cap)
    opt_s = shard_state(mesh, opt_state, cap)
    stats_s = shard_state(mesh, stats, cap)
    out = step(field_s, opt_s, stats_s, views, projs, cpos, gts, masks, bg)
    assert np.isfinite(float(out.loss))

    # parameters stay sharded on the gauss axis (memory scales 1/D)
    xyz_spec = out.field.xyz.sharding.spec
    assert "gauss" in jax.tree.leaves(tuple(xyz_spec))

    # oracle: replicated DP over 2 devices, identical batch, lambda_dssim=0
    mesh_small = make_mesh(2)
    step1d = make_dp_train_step(mesh_small, settings, opt, include_feature=False,
                                lambda_dssim=0.0)
    ref = step1d(field, opt_state, stats, views, projs, cpos, gts, masks, bg)
    np.testing.assert_allclose(float(out.loss), float(ref.loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.field.xyz),
                               np.asarray(ref.field.xyz), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.field.scaling),
                               np.asarray(ref.field.scaling), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.stats.grad_accum),
                               np.asarray(ref.stats.grad_accum), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.stats.max_radii2d),
                               np.asarray(ref.stats.max_radii2d), atol=0)

    # iterate sharded: loss decreases
    f2, o2, s2, first = out.field, out.opt_state, out.stats, float(out.loss)
    last = first
    for _ in range(10):
        o = step(f2, o2, s2, views, projs, cpos, gts, masks, bg)
        f2, o2, s2, last = o.field, o.opt_state, o.stats, float(o.loss)
    assert last < first


def test_gauss_sharded_2d_data_mesh():
    mesh = make_mesh(8, axis_names=("data", "gauss"))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 2, "gauss": 4}
    cap = 32
    (settings, opt, field, opt_state, stats, views, projs, cpos, gts, masks,
     bg) = _setup(cap=cap, v=2)

    step = make_gauss_sharded_train_step(
        mesh, settings, opt, include_feature=False, capacity=cap,
        field_template=field, opt_state_template=opt_state, lambda_dssim=0.0,
        data_axis="data")
    field_s = shard_state(mesh, field, cap)
    opt_s = shard_state(mesh, opt_state, cap)
    stats_s = shard_state(mesh, stats, cap)
    out = step(field_s, opt_s, stats_s, views, projs, cpos, gts, masks, bg)

    mesh_small = make_mesh(2)
    step1d = make_dp_train_step(mesh_small, settings, opt, include_feature=False,
                                lambda_dssim=0.0)
    ref = step1d(field, opt_state, stats, views, projs, cpos, gts, masks, bg)
    np.testing.assert_allclose(float(out.loss), float(ref.loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.field.xyz),
                               np.asarray(ref.field.xyz), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.stats.grad_accum),
                               np.asarray(ref.stats.grad_accum), atol=1e-6)


def test_gauss_sharded_feature_phase():
    mesh = make_mesh(8, axis_names=("gauss",))
    cap = 32
    (settings, opt, field, opt_state, stats, views, projs, cpos, gts, masks,
     bg) = _setup(include_feature=True, cap=cap)

    step = make_gauss_sharded_train_step(
        mesh, settings, opt, include_feature=True, capacity=cap,
        field_template=field, opt_state_template=opt_state)
    field_s = shard_state(mesh, field, cap)
    opt_s = shard_state(mesh, opt_state, cap)
    stats_s = shard_state(mesh, stats, cap)
    out = step(field_s, opt_s, stats_s, views, projs, cpos, gts, masks, bg)
    assert np.isfinite(float(out.loss))
    # geometry untouched in the feature phase
    np.testing.assert_array_equal(np.asarray(out.field.xyz), np.asarray(field.xyz))
    assert not np.allclose(np.asarray(out.field.language_feature),
                           np.asarray(field.language_feature))
