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
