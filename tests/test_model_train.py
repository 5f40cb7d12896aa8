"""GaussianField, KNN init, densify/prune under static capacity, and an end-to-end tiny
RGB training loop (loss decreases, PSNR rises)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplat_tpu.config import OptimizationConfig
from langsplat_tpu.models import gaussian_field as gf
from langsplat_tpu.ops.knn import mean_knn_sq_dist
from langsplat_tpu.ops.render import RenderSettings, render
from langsplat_tpu.train import densify as dn
from langsplat_tpu.train import trainer as tr

from tests.test_projection_and_dense import make_camera


def test_knn_matches_scipy():
    from scipy.spatial import cKDTree
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    ours = np.asarray(mean_knn_sq_dist(jnp.asarray(pts), chunk=128))
    d, _ = cKDTree(pts).query(pts, k=4)
    expected = np.mean(d[:, 1:] ** 2, axis=1)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_create_from_pcd_matches_reference_init():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(40, 3)).astype(np.float32)
    cols = rng.uniform(size=(40, 3)).astype(np.float32)
    field = gf.create_from_pcd(pts, cols, sh_degree=3, capacity=64)
    assert field.capacity == 64
    assert int(field.num_alive) == 40
    assert field.max_sh_degree == 3
    np.testing.assert_allclose(np.asarray(field.get_opacity[:40]), 0.1, rtol=1e-5)
    # DC init: RGB2SH
    np.testing.assert_allclose(np.asarray(field.features_dc[:40, 0]),
                               (cols - 0.5) / 0.28209479177387814, rtol=1e-5)
    # scale init: log(sqrt(mean 3-NN sq dist))
    from scipy.spatial import cKDTree
    d, _ = cKDTree(pts).query(pts, k=4)
    expected = np.log(np.sqrt(np.maximum(np.mean(d[:, 1:] ** 2, axis=1), 1e-7)))
    np.testing.assert_allclose(np.asarray(field.scaling[:40, 0]), expected, rtol=1e-4)
    # rotations identity, dead slots dead
    np.testing.assert_allclose(np.asarray(field.rotation[:40]),
                               np.tile([1, 0, 0, 0], (40, 1)), atol=1e-7)
    assert not np.any(np.asarray(field.alive[40:]))


def make_field(n=20, cap=64, seed=2, spread=1.5):
    rng = np.random.default_rng(seed)
    pts = np.concatenate([rng.uniform(-spread, spread, (n, 2)),
                          rng.uniform(4, 7, (n, 1))], axis=1).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    return gf.create_from_pcd(pts, cols, sh_degree=1, capacity=cap)


def test_densify_clone_and_split():
    field = make_field()
    cap = field.capacity
    stats = dn.DensifyStats.zeros(cap)
    # force: gaussian 0 hot+small (clone), gaussian 1 hot+large (split), 2 cold
    from dataclasses import replace
    scaling = np.array(field.scaling)
    scaling[0] = np.log(0.001)
    scaling[1] = np.log(1.0)
    field = replace(field, scaling=jnp.asarray(scaling))
    accum = np.zeros(cap, np.float32)
    accum[[0, 1]] = 1.0
    denom = np.zeros(cap, np.float32)
    denom[:20] = 1.0
    stats = dn.DensifyStats(jnp.asarray(accum), jnp.asarray(denom),
                            jnp.zeros(cap, jnp.float32))
    before = int(field.num_alive)
    res = dn.densify_and_prune(field, stats, jax.random.key(0), extent=1.0,
                               grad_threshold=0.5, percent_dense=0.01)
    # clone adds 1; split adds 2 and removes original -> net +2
    assert int(res.num_alive) == before + 2
    assert int(res.overflow) == 0
    # deterministic placement: the freed split slot (1) is reused first by the clone of
    # gaussian 0; the two split children land in the first dead slots (20, 21)
    np.testing.assert_array_equal(np.asarray(res.field.xyz[1]), np.asarray(field.xyz[0]))
    assert bool(res.field.alive[20]) and bool(res.field.alive[21])
    np.testing.assert_allclose(np.asarray(res.field.scaling[20]),
                               np.log(1.0 / 1.6), rtol=1e-5)
    # split children sample around the parent
    assert np.linalg.norm(np.asarray(res.field.xyz[20]) - np.asarray(field.xyz[1])) < 6.0
    # reset mask covers freed + newly occupied slots
    for slot in (1, 20, 21):
        assert bool(res.reset_mask[slot])


def test_densify_prune_low_opacity():
    from dataclasses import replace
    field = make_field()
    cap = field.capacity
    opa = np.array(field.opacity)
    opa[3] = -20.0  # sigmoid ~ 0 < min_opacity
    field = replace(field, opacity=jnp.asarray(opa))
    stats = dn.DensifyStats.zeros(cap)
    res = dn.densify_and_prune(field, stats, jax.random.key(0), extent=1.0)
    assert not bool(res.field.alive[3])
    assert int(res.num_alive) == int(field.num_alive) - 1


def test_densify_capacity_overflow_reported():
    field = make_field(n=20, cap=21)
    cap = field.capacity
    stats = dn.DensifyStats(jnp.ones(cap), jnp.ones(cap), jnp.zeros(cap))
    res = dn.densify_and_prune(field, stats, jax.random.key(0), extent=1e9,
                               grad_threshold=0.0)
    # all 20 hot+small want to clone but only 1 free slot (+0 freed)
    assert int(res.overflow) == 19
    assert int(res.num_alive) == 21


def test_reset_opacity():
    field = make_field()
    out = dn.reset_opacity(field)
    assert float(jnp.max(out.get_opacity[np.asarray(field.alive)])) <= 0.01 + 1e-6


def test_grow_capacity_preserves():
    field = make_field(n=20, cap=32)
    grown = gf.grow_capacity(field, 64)
    assert grown.capacity == 64
    assert int(grown.num_alive) == 20
    np.testing.assert_array_equal(np.asarray(grown.xyz[:32]), np.asarray(field.xyz))


@pytest.mark.slow
def test_end_to_end_rgb_training_improves():
    # target: render of a "ground truth" field; start: perturbed field
    h = w = 32
    cam = make_camera(w=w, h=h)
    settings = RenderSettings(
        image_height=h, image_width=w, tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
        sh_degree=0, include_feature=False, tile_size=16, backend="tiled",
        max_per_tile=128, budget=1024)
    bg = jnp.zeros(3)

    gt_field = make_field(n=12, cap=32, seed=3)
    gt = render(gt_field, settings, cam["viewmatrix"], cam["projmatrix"],
                cam["campos"], bg)["render"]

    from dataclasses import replace
    rng = np.random.default_rng(4)
    field = replace(
        gt_field,
        xyz=gt_field.xyz + jnp.asarray(rng.normal(0, 0.1, (32, 3)).astype(np.float32)),
        features_dc=gt_field.features_dc
        + jnp.asarray(rng.normal(0, 0.3, (32, 1, 3)).astype(np.float32)),
    )

    cfg = OptimizationConfig()
    opt = tr.make_optimizer(cfg, spatial_lr_scale=3.0, include_feature=False)
    params = tr.extract_params(field, include_feature=False)
    opt_state = opt.init(params)
    stats = dn.DensifyStats.zeros(32)

    losses_seen = []
    for step in range(60):
        out = tr.train_step_rgb(field, opt_state, stats,
                                cam["viewmatrix"], cam["projmatrix"], cam["campos"],
                                gt, bg, settings=settings, optimizer=opt,
                                lambda_dssim=0.2)
        field, opt_state, stats = out.field, out.opt_state, out.stats
        losses_seen.append(float(out.loss))
    assert losses_seen[-1] < losses_seen[0] * 0.7, losses_seen[::10]
    # densify stats accumulated
    assert float(jnp.sum(stats.denom)) > 0


@pytest.mark.slow
def test_end_to_end_feature_training_improves():
    h = w = 32
    cam = make_camera(w=w, h=h)
    settings = RenderSettings(
        image_height=h, image_width=w, tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
        sh_degree=0, include_feature=True, tile_size=16, backend="tiled",
        max_per_tile=128, budget=1024)
    bg = jnp.zeros(3)

    gt_field = make_field(n=12, cap=32, seed=5).with_language_feature(3)
    from dataclasses import replace
    rng = np.random.default_rng(6)
    gt_lf = rng.normal(size=(32, 3)).astype(np.float32)
    gt_field = replace(gt_field, language_feature=jnp.asarray(gt_lf))
    gt = render(gt_field, settings, cam["viewmatrix"], cam["projmatrix"],
                cam["campos"], bg)["language_feature_image"]
    mask = jnp.ones((1, h, w))

    field = replace(gt_field, language_feature=None).with_language_feature(3)

    cfg = OptimizationConfig(language_feature_lr=0.05)
    opt = tr.make_optimizer(cfg, spatial_lr_scale=1.0, include_feature=True)
    params = tr.extract_params(field, include_feature=True)
    opt_state = opt.init(params)
    stats = dn.DensifyStats.zeros(32)

    first = last = None
    for step in range(80):
        out = tr.train_step_feature(field, opt_state, stats,
                                    cam["viewmatrix"], cam["projmatrix"],
                                    cam["campos"], gt, mask, bg,
                                    settings=settings, optimizer=opt)
        field, opt_state = out.field, out.opt_state
        if first is None:
            first = float(out.loss)
        last = float(out.loss)
    assert last < first * 0.5, (first, last)
    # geometry untouched
    np.testing.assert_array_equal(np.asarray(field.xyz), np.asarray(gt_field.xyz))


def test_python_escape_hatches_bitwise():
    """convert_shs_python / compute_cov3D_python produce bitwise-identical
    renders to the kernel-internal paths (the reference's cross-check contract,
    gaussian_renderer/__init__.py:59-84)."""
    from dataclasses import replace as dc_replace
    h = w = 32
    cam = make_camera(w=w, h=h)
    base = RenderSettings(
        image_height=h, image_width=w, tanfovx=cam["tanfovx"],
        tanfovy=cam["tanfovy"], sh_degree=1, include_feature=False,
        tile_size=16, backend="tiled", max_per_tile=128, budget=1024)
    field = make_field(n=12, cap=32, seed=5)
    # non-trivial SH rest coefficients so the SH path actually matters
    rng = np.random.default_rng(6)
    field = dc_replace(field, features_rest=jnp.asarray(
        rng.normal(0, 0.2, field.features_rest.shape).astype(np.float32)))
    bg = jnp.zeros(3)

    ref = render(field, base, cam["viewmatrix"], cam["projmatrix"],
                 cam["campos"], bg)["render"]
    for kw in ({"convert_shs_python": True}, {"compute_cov3d_python": True},
               {"convert_shs_python": True, "compute_cov3d_python": True}):
        alt = render(field, dc_replace(base, **kw), cam["viewmatrix"],
                     cam["projmatrix"], cam["campos"], bg)["render"]
        np.testing.assert_array_equal(np.asarray(alt), np.asarray(ref),
                                      err_msg=str(kw))


def test_update_stats_reference_half_image_units():
    """Densify stats accumulate mean2D grad norms in the reference's
    HALF-IMAGE units (CUDA backward scales pixel grads by 0.5*W / 0.5*H;
    the 2e-4 threshold is calibrated to those). Raw pixel-space norms
    under-fire densification by ~0.5*max(W,H) — the round-3 death spiral."""
    cap = 3
    stats = dn.DensifyStats.zeros(cap)
    g = jnp.asarray([[1e-3, 2e-3], [0.0, -4e-3], [5e-3, 0.0]])
    vis = jnp.asarray([True, True, False])
    radii = jnp.asarray([3, 7, 9], jnp.int32)
    out = dn.update_stats(stats, g, vis, radii, 640, 480)
    expect = np.linalg.norm(np.asarray(g) * np.array([320.0, 240.0]), axis=-1)
    expect = expect * np.asarray(vis, np.float32)
    np.testing.assert_allclose(np.asarray(out.grad_accum), expect, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.denom), [1.0, 1.0, 0.0])
    np.testing.assert_array_equal(np.asarray(out.max_radii2d), [3.0, 7.0, 0.0])
