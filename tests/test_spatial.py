"""Spatial (tile-row) sharding: full-image parity with the single-device render, values
and gradients, on the virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from langsplat_tpu.ops.render import RenderSettings, render
from langsplat_tpu.parallel.spatial import make_spatial_render, render_band

from tests.test_model_train import make_field
from tests.test_projection_and_dense import make_camera


def settings_for(cam, h, w, include_feature):
    return RenderSettings(
        image_height=h, image_width=w, tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
        sh_degree=1, include_feature=include_feature, tile_size=16,
        backend="tiled", max_per_tile=128, budget=2048)


def test_spatial_render_matches_single_device():
    h, w = 64, 48
    cam = make_camera(w=w, h=h)
    field = make_field(n=24, cap=32, seed=11).with_language_feature(3)
    settings = settings_for(cam, h, w, include_feature=True)
    bg = jnp.asarray([0.2, 0.4, 0.9])

    ref = render(field, settings, cam["viewmatrix"], cam["projmatrix"],
                 cam["campos"], bg)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("tiles",))
    sp_render = make_spatial_render(mesh, settings, axis="tiles")
    out = sp_render(field, cam["viewmatrix"], cam["projmatrix"], cam["campos"], bg)

    # truncation counters must leave shard_map (psum'd over bands) so callers
    # can run the render_full grow-and-retry policy (ADVICE r02)
    assert int(out["instances_dropped"]) == 0
    assert int(out["rect_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["language_feature_image"]),
                               np.asarray(ref["language_feature_image"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["final_transmittance"]),
                               np.asarray(ref["final_transmittance"]), atol=2e-5)


def test_spatial_render_gradients_match():
    h = w = 32
    cam = make_camera(w=w, h=h)
    field = make_field(n=16, cap=32, seed=12)
    settings = settings_for(cam, h, w, include_feature=False)
    bg = jnp.zeros(3)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("tiles",))
    sp_render = make_spatial_render(mesh, settings, axis="tiles")

    from dataclasses import replace

    def loss_ref(xyz):
        f = replace(field, xyz=xyz)
        return jnp.mean(render(f, settings, cam["viewmatrix"], cam["projmatrix"],
                               cam["campos"], bg)["render"] ** 2)

    def loss_sp(xyz):
        f = replace(field, xyz=xyz)
        return jnp.mean(sp_render(f, cam["viewmatrix"], cam["projmatrix"],
                                  cam["campos"], bg)["render"] ** 2)

    g_ref = jax.grad(loss_ref)(field.xyz)
    g_sp = jax.grad(loss_sp)(field.xyz)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref), atol=3e-6)


def test_band_render_nonuniform_rows():
    # 48 rows of pixels = 3 tile rows over 2 bands: band 1 is half padding
    h, w = 48, 32
    cam = make_camera(w=w, h=h)
    field = make_field(n=16, cap=32, seed=13)
    settings = settings_for(cam, h, w, include_feature=False)
    bg = jnp.asarray([1.0, 0.0, 0.0])
    ref = render(field, settings, cam["viewmatrix"], cam["projmatrix"],
                 cam["campos"], bg)["render"]
    bands = []
    for b in range(2):
        out = render_band(field, settings, jnp.int32(b), 2, cam["viewmatrix"],
                          cam["projmatrix"], cam["campos"], bg)
        bands.append(np.asarray(out["render"]))
    stitched = np.concatenate(bands, axis=1)[:, :h]
    np.testing.assert_allclose(stitched, np.asarray(ref), atol=2e-5)


def test_depth_sharded_matches_single_device():
    """Depth-rank-interval sharded blending composes to the single-device render
    (the ring/blockwise analog, SURVEY §5; VERDICT r01 missing #5)."""
    import jax.numpy as jnp
    from langsplat_tpu.parallel.depth_sharded import make_depth_sharded_render
    from langsplat_tpu.parallel.mesh import make_mesh
    from langsplat_tpu.ops.render import RenderSettings, render
    from tests.test_model_train import make_field
    from tests.test_projection_and_dense import make_camera

    mesh = make_mesh(8, axis_names=("depth",))
    h = w = 32
    cam = make_camera(w=w, h=h)
    settings = RenderSettings(
        image_height=h, image_width=w, tanfovx=cam["tanfovx"],
        tanfovy=cam["tanfovy"], sh_degree=1, include_feature=True,
        tile_size=16, backend="tiled", max_per_tile=128, budget=2048)
    field = make_field(n=40, cap=64, seed=9).with_language_feature(3, seed=1)
    bg = jnp.asarray([0.1, 0.2, 0.3])

    ref = render(field, settings, cam["viewmatrix"], cam["projmatrix"],
                 cam["campos"], bg)
    fn = make_depth_sharded_render(mesh, settings)
    out = fn(field, cam["viewmatrix"], cam["projmatrix"], cam["campos"], bg)

    assert int(out["instances_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["language_feature_image"]),
                               np.asarray(ref["language_feature_image"]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["final_transmittance"]),
                               np.asarray(ref["final_transmittance"]),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out["radii"]),
                                  np.asarray(ref["radii"]))


def test_depth_sharded_gradients_match_single_device():
    """Backward through the depth-sharded composition (all_gather + scan) must
    match the single-device render gradients for every parameter class — the
    ring analog as a TRAINING path (VERDICT r02 missing #2)."""
    from dataclasses import replace
    from langsplat_tpu.parallel.depth_sharded import make_depth_sharded_render
    from langsplat_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, axis_names=("depth",))
    h = w = 32
    cam = make_camera(w=w, h=h)
    settings = RenderSettings(
        image_height=h, image_width=w, tanfovx=cam["tanfovx"],
        tanfovy=cam["tanfovy"], sh_degree=1, include_feature=True,
        tile_size=16, backend="tiled", max_per_tile=128, budget=2048)
    field = make_field(n=40, cap=64, seed=9).with_language_feature(3, seed=1)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    target = jnp.asarray(
        np.random.default_rng(0).uniform(size=(3, h, w)).astype(np.float32))
    ftarget = jnp.asarray(
        np.random.default_rng(1).uniform(size=(3, h, w)).astype(np.float32))
    ds_render = make_depth_sharded_render(mesh, settings)

    def make_loss(render_fn):
        def loss(xyz, opacity, lf):
            f = replace(field, xyz=xyz, opacity=opacity, language_feature=lf)
            out = render_fn(f, cam["viewmatrix"], cam["projmatrix"],
                            cam["campos"], bg)
            return (jnp.mean((out["render"] - target) ** 2)
                    + jnp.mean((out["language_feature_image"] - ftarget) ** 2))
        return loss

    args = (field.xyz, field.opacity, field.language_feature)
    g_ref = jax.grad(make_loss(
        lambda f, v, p, c, b: render(f, settings, v, p, c, b)),
        argnums=(0, 1, 2))(*args)
    g_ds = jax.grad(make_loss(ds_render), argnums=(0, 1, 2))(*args)
    for a, b, name in zip(g_ds, g_ref, ("xyz", "opacity", "language_feature")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg=f"grad mismatch for {name}")


def test_depth_sharded_feature_step_matches_single_device():
    """One depth-sharded phase-B train step == the single-device
    trainer.train_step_feature (loss and updated language features)."""
    from langsplat_tpu.config import OptimizationConfig
    from langsplat_tpu.parallel.depth_sharded import (
        make_depth_sharded_feature_step)
    from langsplat_tpu.parallel.mesh import make_mesh
    from langsplat_tpu.train import densify as dn
    from langsplat_tpu.train import trainer as tr

    mesh = make_mesh(8, axis_names=("depth",))
    h = w = 32
    cam = make_camera(w=w, h=h)
    settings = RenderSettings(
        image_height=h, image_width=w, tanfovx=cam["tanfovx"],
        tanfovy=cam["tanfovy"], sh_degree=1, include_feature=True,
        tile_size=16, backend="tiled", max_per_tile=128, budget=2048)
    field = make_field(n=40, cap=64, seed=9).with_language_feature(3, seed=1)
    bg = jnp.zeros(3)
    rng = np.random.default_rng(5)
    gt_feat = jnp.asarray(rng.uniform(size=(3, h, w)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(1, h, w)) > 0.2).astype(np.float32))

    optimizer = tr.make_optimizer(OptimizationConfig(), 1.0,
                                  include_feature=True)
    params = tr.extract_params(field, include_feature=True)
    opt_state = optimizer.init(params)
    stats = dn.DensifyStats.zeros(field.capacity)

    ref = tr.train_step_feature(field, opt_state, stats,
                                cam["viewmatrix"], cam["projmatrix"],
                                cam["campos"], gt_feat, mask, bg,
                                settings=settings, optimizer=optimizer)

    step = make_depth_sharded_feature_step(mesh, settings, optimizer)
    new_field, new_opt, loss, dropped, rect = step(
        field, opt_state, cam["viewmatrix"], cam["projmatrix"], cam["campos"],
        gt_feat, mask, bg)

    assert int(dropped) == 0 and int(rect) == 0
    np.testing.assert_allclose(float(loss), float(ref.loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_field.language_feature),
                               np.asarray(ref.field.language_feature),
                               atol=5e-6)


def test_depth_sharded_render_full_grows_budget():
    """depth_sharded_render_full retries with a grown per-shard budget until
    nothing is dropped (render_full-analog policy, VERDICT r02 weak #5)."""
    from langsplat_tpu.parallel.depth_sharded import (
        depth_sharded_render_full, make_depth_sharded_render)
    from langsplat_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, axis_names=("depth",))
    h = w = 32
    cam = make_camera(w=w, h=h)
    tiny = RenderSettings(
        image_height=h, image_width=w, tanfovx=cam["tanfovx"],
        tanfovy=cam["tanfovy"], sh_degree=1, include_feature=False,
        tile_size=16, backend="tiled", max_per_tile=128, budget=16)
    field = make_field(n=40, cap=64, seed=9)
    bg = jnp.zeros(3)

    tiny_out = make_depth_sharded_render(mesh, tiny)(
        field, cam["viewmatrix"], cam["projmatrix"], cam["campos"], bg)
    assert int(tiny_out["instances_dropped"]) > 0  # the premise: 16 truncates

    out = depth_sharded_render_full(mesh, tiny, field, cam["viewmatrix"],
                                    cam["projmatrix"], cam["campos"], bg)
    assert int(out["instances_dropped"]) == 0
    full = RenderSettings(
        image_height=h, image_width=w, tanfovx=cam["tanfovx"],
        tanfovy=cam["tanfovy"], sh_degree=1, include_feature=False,
        tile_size=16, backend="tiled", max_per_tile=128, budget=2048)
    ref = render(field, full, cam["viewmatrix"], cam["projmatrix"],
                 cam["campos"], bg)
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=2e-5)


def test_depth_sharded_render_full_grows_tmax():
    """rect overflow (max_tiles cap) grows tmax, not the budget."""
    from dataclasses import replace as dc_replace
    from langsplat_tpu.parallel.depth_sharded import depth_sharded_render_full
    from langsplat_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, axis_names=("depth",))
    h = w = 64
    cam = make_camera(w=w, h=h)
    field = make_field(n=24, cap=32, seed=4)
    # blow up one splat so its tile rect exceeds max_tiles=2
    scaling = np.array(field.scaling)
    scaling[0] = np.log(3.0)
    field = dc_replace(field, scaling=jnp.asarray(scaling))
    tiny_tmax = RenderSettings(
        image_height=h, image_width=w, tanfovx=cam["tanfovx"],
        tanfovy=cam["tanfovy"], sh_degree=1, include_feature=False,
        tile_size=16, backend="tiled", max_per_tile=256, budget=4096,
        max_tiles_per_gaussian=2)
    bg = jnp.zeros(3)
    out = depth_sharded_render_full(mesh, tiny_tmax, field, cam["viewmatrix"],
                                    cam["projmatrix"], cam["campos"], bg)
    assert int(out["rect_dropped"]) == 0
    full = dc_replace(tiny_tmax, max_tiles_per_gaussian=16)
    ref = render(field, full, cam["viewmatrix"], cam["projmatrix"],
                 cam["campos"], bg)
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=2e-5)
