"""Tests for the preprocess stage and the dense oracle rasterizer against closed forms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplat_tpu.core import transforms
from langsplat_tpu.ops import projection
from langsplat_tpu.ops.rasterize_reference import rasterize_dense, blend_weights


def make_camera(w=64, h=64, fov=0.8, z_offset=0.0):
    """Camera at origin (optionally shifted along -z) looking down +z."""
    R = np.eye(3)
    t = np.array([0.0, 0.0, z_offset])
    view = transforms.world_to_view(R, t).T  # row-vector convention
    proj = transforms.projection_matrix(0.01, 100.0, fov, fov).T
    full = view @ proj
    campos = np.linalg.inv(view)[3, :3]
    return dict(
        viewmatrix=jnp.asarray(view), projmatrix=jnp.asarray(full),
        campos=jnp.asarray(campos), image_width=w, image_height=h,
        tanfovx=float(np.tan(fov / 2)), tanfovy=float(np.tan(fov / 2)),
    )


def run_preprocess(means, scales, quats, colors, cam, tile_size=16, alive=None):
    return projection.preprocess(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), None,
        cam["viewmatrix"], cam["projmatrix"], cam["campos"],
        image_height=cam["image_height"], image_width=cam["image_width"],
        tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
        sh_degree=0, tile_size=tile_size,
        colors_precomp=jnp.asarray(colors), alive=alive,
    )


def test_center_gaussian_projection():
    cam = make_camera()
    w = cam["image_width"]
    prep = run_preprocess(np.array([[0.0, 0.0, 5.0]], np.float32),
                          np.full((1, 3), 0.1, np.float32),
                          np.array([[1.0, 0, 0, 0]], np.float32),
                          np.array([[1.0, 0, 0]], np.float32), cam)
    assert bool(prep.visible[0])
    # center of a WxW image in this convention is (W-1)/2
    np.testing.assert_allclose(prep.means2d[0], [(w - 1) / 2, (w - 1) / 2], atol=1e-3)
    np.testing.assert_allclose(prep.depths[0], 5.0, rtol=1e-5)
    # isotropic gaussian: cov2d = (f*s/z)^2 I + 0.3 I -> conic diagonal
    f = w / (2 * cam["tanfovx"])
    expected_var = (f * 0.1 / 5.0) ** 2 + 0.3
    np.testing.assert_allclose(prep.conics[0, 0], 1.0 / expected_var, rtol=1e-4)
    np.testing.assert_allclose(prep.conics[0, 2], 1.0 / expected_var, rtol=1e-4)
    np.testing.assert_allclose(prep.conics[0, 1], 0.0, atol=1e-6)
    # radius uses lambda_max = mid + sqrt(max(0.1, mid^2 - det)); isotropic -> +sqrt(0.1)
    expected_radius = np.ceil(3.0 * np.sqrt(expected_var + np.sqrt(0.1)))
    assert int(prep.radii[0]) == int(expected_radius)


def test_behind_camera_culled():
    cam = make_camera()
    prep = run_preprocess(np.array([[0.0, 0.0, -5.0]], np.float32),
                          np.full((1, 3), 0.1, np.float32),
                          np.array([[1.0, 0, 0, 0]], np.float32),
                          np.array([[1.0, 0, 0]], np.float32), cam)
    assert not bool(prep.visible[0])
    assert int(prep.radii[0]) == 0


def test_alive_mask_kills_slot():
    cam = make_camera()
    means = np.array([[0.0, 0.0, 5.0], [0.1, 0.0, 5.0]], np.float32)
    prep = run_preprocess(means, np.full((2, 3), 0.1, np.float32),
                          np.tile([1.0, 0, 0, 0], (2, 1)).astype(np.float32),
                          np.ones((2, 3), np.float32), cam,
                          alive=jnp.array([True, False]))
    assert bool(prep.visible[0]) and not bool(prep.visible[1])


def test_dense_render_single_gaussian_center_color():
    cam = make_camera()
    opacity = 0.8
    color = np.array([[0.2, 0.5, 0.9]], np.float32)
    prep = run_preprocess(np.array([[0.0, 0.0, 5.0]], np.float32),
                          np.full((1, 3), 0.3, np.float32),
                          np.array([[1.0, 0, 0, 0]], np.float32), color, cam)
    bg = jnp.array([1.0, 1.0, 1.0])
    out = rasterize_dense(prep, jnp.array([opacity]), None, bg,
                          image_height=64, image_width=64)
    img = np.asarray(out["render"])
    assert img.shape == (3, 64, 64)
    # center pixel isn't exactly at the mean ((w-1)/2 is fractional distance 0.5px)
    f = 64 / (2 * cam["tanfovx"])
    var = (f * 0.3 / 5.0) ** 2 + 0.3
    d2 = 0.5 ** 2 + 0.5 ** 2
    alpha = opacity * np.exp(-0.5 * d2 / var)
    expected = alpha * color[0] + (1 - alpha) * 1.0
    np.testing.assert_allclose(img[:, 32, 32], expected, rtol=1e-4)
    # far corner: gaussian contributes ~nothing -> background
    np.testing.assert_allclose(img[:, 0, 0], 1.0, atol=2e-2)


def test_dense_render_depth_order_blending():
    cam = make_camera()
    means = np.array([[0.0, 0.0, 3.0], [0.0, 0.0, 6.0]], np.float32)
    colors = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    prep = run_preprocess(means, np.full((2, 3), 0.5, np.float32),
                          np.tile([1.0, 0, 0, 0], (2, 1)).astype(np.float32), colors, cam)
    opac = jnp.array([0.5, 0.5])
    out = rasterize_dense(prep, opac, None, jnp.zeros(3),
                          image_height=64, image_width=64)
    img = np.asarray(out["render"])
    center = img[:, 32, 32]
    # red (near) should dominate green (far): w_red ~ a, w_green ~ (1-a)*a
    assert center[0] > center[1] > 0.0
    # reversing the input order must not change the result (sorting inside)
    prep_rev = run_preprocess(means[::-1], np.full((2, 3), 0.5, np.float32),
                              np.tile([1.0, 0, 0, 0], (2, 1)).astype(np.float32),
                              colors[::-1], cam)
    out_rev = rasterize_dense(prep_rev, opac, None, jnp.zeros(3),
                              image_height=64, image_width=64)
    np.testing.assert_allclose(img, np.asarray(out_rev["render"]), atol=1e-6)


def test_dense_render_language_features():
    cam = make_camera()
    feats = np.array([[0.6, -0.8, 0.0]], np.float32)
    prep = run_preprocess(np.array([[0.0, 0.0, 5.0]], np.float32),
                          np.full((1, 3), 0.3, np.float32),
                          np.array([[1.0, 0, 0, 0]], np.float32),
                          np.ones((1, 3), np.float32), cam)
    out = rasterize_dense(prep, jnp.array([0.9]), jnp.asarray(feats), jnp.ones(3),
                          image_height=64, image_width=64)
    fimg = np.asarray(out["language_feature_image"])
    assert fimg.shape == (3, 64, 64)
    # feature channel gets NO background: ratio of channels preserved at center
    c = fimg[:, 32, 32]
    np.testing.assert_allclose(c[0] / -c[1], 0.6 / 0.8, rtol=1e-4)
    np.testing.assert_allclose(c[2], 0.0, atol=1e-7)


def test_blend_weights_termination():
    # 100 opaque gaussians: transmittance terminates; weights sum < 1, tail zero
    alphas = jnp.full((100, 1), 0.9)
    w, t = blend_weights(alphas)
    w = np.asarray(w)[:, 0]
    assert np.all(w[50:] == 0.0)  # terminated long before 50
    assert float(t[0]) >= 1e-4 / (1 - 0.9) * 0.09  # T stays above last included level
    # weight recurrence: w_i = 0.9 * 0.1^i while included
    for i in range(3):
        np.testing.assert_allclose(w[i], 0.9 * 0.1 ** i, rtol=1e-5)


def test_dense_gradients_finite_difference():
    cam = make_camera(w=32, h=32)
    rng = np.random.default_rng(0)
    n = 6
    means = np.concatenate([rng.uniform(-1, 1, (n, 2)), rng.uniform(4, 8, (n, 1))],
                           axis=1).astype(np.float32)
    scales = np.full((n, 3), 0.4, np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    target = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))

    def loss_fn(means3d, scales_, opac_, colors_):
        prep = projection.preprocess(
            means3d, scales_, jnp.asarray(quats), None,
            cam["viewmatrix"], cam["projmatrix"], cam["campos"],
            image_height=32, image_width=32,
            tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
            sh_degree=0, tile_size=16, colors_precomp=colors_)
        out = rasterize_dense(prep, opac_, None, jnp.zeros(3),
                              image_height=32, image_width=32)
        return jnp.mean((out["render"] - target) ** 2)

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(opac),
            jnp.asarray(colors))
    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(*args)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    # central finite differences on a few coordinates of means3d and opacity
    f0 = float(loss_fn(*args))
    assert f0 > 0
    eps = 1e-3
    for (argi, idx) in [(0, (0, 0)), (0, (2, 2)), (2, (1,)), (3, (0, 1))]:
        a = [np.array(x, np.float64) for x in args]
        a[argi][idx] += eps
        fp = float(loss_fn(*[jnp.asarray(x, jnp.float32) for x in a]))
        a[argi][idx] -= 2 * eps
        fm = float(loss_fn(*[jnp.asarray(x, jnp.float32) for x in a]))
        fd = (fp - fm) / (2 * eps)
        an = float(np.asarray(grads[argi])[idx])
        assert an == pytest.approx(fd, rel=0.05, abs=2e-4), (argi, idx, an, fd)
