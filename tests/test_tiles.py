"""Binning correctness vs brute force, and tiled-vs-dense renderer parity."""

import numpy as np
import jax.numpy as jnp

from langsplat_tpu.ops import projection
from langsplat_tpu.ops.rasterize_reference import rasterize_dense
from langsplat_tpu.ops.rasterize_tiled import rasterize_tiled
from langsplat_tpu.ops.tiles import bin_gaussians

from tests.test_projection_and_dense import make_camera, run_preprocess


def random_scene(n, seed=0, spread=2.0):
    rng = np.random.default_rng(seed)
    means = np.concatenate([rng.uniform(-spread, spread, (n, 2)),
                            rng.uniform(3, 9, (n, 1))], axis=1).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.05), np.log(0.5), (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    feats = rng.normal(size=(n, 3)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    return means, scales, quats, colors, opac, feats


def test_binning_matches_bruteforce():
    cam = make_camera(w=64, h=48)
    means, scales, quats, colors, opac, feats = random_scene(50, seed=1)
    ts = 16
    prep = run_preprocess(means, scales, quats, colors, cam, tile_size=ts)
    gx, gy = (64 + ts - 1) // ts, (48 + ts - 1) // ts
    inst = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=4096,
                         max_tiles_per_gaussian=64)
    assert int(inst.dropped) == 0

    tmin = np.asarray(prep.tiles_min)
    tmax = np.asarray(prep.tiles_max)
    vis = np.asarray(prep.visible)
    depths = np.asarray(prep.depths)
    start = np.asarray(inst.tile_start)
    gid = np.asarray(inst.gauss_id)

    for t in range(gx * gy):
        ty, tx = divmod(t, gx)
        expected = [i for i in range(50) if vis[i]
                    and tmin[i, 0] <= tx < tmax[i, 0] and tmin[i, 1] <= ty < tmax[i, 1]]
        expected.sort(key=lambda i: depths[i])
        got = list(gid[start[t]:start[t + 1]])
        assert got == expected, f"tile {t}: {got} != {expected}"


def test_binning_budget_overflow_reported():
    cam = make_camera(w=64, h=64)
    means, scales, quats, colors, opac, feats = random_scene(80, seed=2)
    prep = run_preprocess(means, scales, quats, colors, cam, tile_size=16)
    small = bin_gaussians(prep, grid_x=4, grid_y=4, budget=8, max_tiles_per_gaussian=64)
    assert int(small.dropped) > 0
    assert int(small.num_instances) == 8


def test_tiled_matches_dense():
    for seed, (w, h) in [(3, (64, 64)), (4, (80, 48))]:
        cam = make_camera(w=w, h=h)
        means, scales, quats, colors, opac, feats = random_scene(120, seed=seed)
        ts = 16
        prep = run_preprocess(means, scales, quats, colors, cam, tile_size=ts)
        gx, gy = (w + ts - 1) // ts, (h + ts - 1) // ts
        inst = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=8192,
                             max_tiles_per_gaussian=64)
        assert int(inst.dropped) == 0
        bg = jnp.array([0.0, 0.3, 1.0])
        dense = rasterize_dense(prep, jnp.asarray(opac), jnp.asarray(feats), bg,
                                image_height=h, image_width=w, tile_size=ts)
        tiled = rasterize_tiled(prep, inst, jnp.asarray(opac), jnp.asarray(feats), bg,
                                image_height=h, image_width=w,
                                tile_size=ts, max_per_tile=128)
        np.testing.assert_allclose(np.asarray(tiled["render"]),
                                   np.asarray(dense["render"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(tiled["language_feature_image"]),
                                   np.asarray(dense["language_feature_image"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(tiled["final_transmittance"]),
                                   np.asarray(dense["final_transmittance"]), atol=2e-5)


def test_tiled_gradients_match_dense():
    import jax

    cam = make_camera(w=32, h=32)
    means, scales, quats, colors, opac, feats = random_scene(30, seed=5, spread=1.0)
    ts = 16
    gx = gy = 2

    def common(prep_args):
        means3d, scales_, opac_, colors_ = prep_args
        return projection.preprocess(
            means3d, scales_, jnp.asarray(quats), None,
            cam["viewmatrix"], cam["projmatrix"], cam["campos"],
            image_height=32, image_width=32, tanfovx=cam["tanfovx"],
            tanfovy=cam["tanfovy"], sh_degree=0, tile_size=ts,
            colors_precomp=colors_)

    def loss_dense(*args):
        prep = common(args)
        out = rasterize_dense(prep, args[2], None, jnp.zeros(3),
                              image_height=32, image_width=32, tile_size=ts)
        return jnp.mean(out["render"] ** 2)

    def loss_tiled(*args):
        prep = common(args)
        inst = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=2048,
                             max_tiles_per_gaussian=16)
        out = rasterize_tiled(prep, inst, args[2], None, jnp.zeros(3),
                              image_height=32, image_width=32,
                              tile_size=ts, max_per_tile=64)
        return jnp.mean(out["render"] ** 2)

    args = tuple(jnp.asarray(x) for x in (means, scales, opac, colors))
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(*args)
    gt = jax.grad(loss_tiled, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(gd, gt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_culled_binning_exact():
    """tile_size-aware culling: per tile, the instance list is a depth-ordered SUBSET
    of the rect list that still contains EVERY Gaussian able to reach alpha >= 1/255
    at some pixel of the tile — so blending is bitwise identical while the instance
    stream shrinks."""
    cam = make_camera(w=64, h=48)
    means, scales, quats, colors, opac, feats = random_scene(60, seed=6)
    ts = 16
    prep = run_preprocess(means, scales, quats, colors, cam, tile_size=ts)
    gx, gy = 4, 3
    rect = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=4096,
                         max_tiles_per_gaussian=32)
    geo = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=4096,
                        max_tiles_per_gaussian=32, tile_size=ts)
    culled = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=4096,
                           max_tiles_per_gaussian=32, tile_size=ts,
                           opacities=jnp.asarray(opac))
    assert int(culled.dropped) == 0
    assert int(geo.num_instances) < int(rect.num_instances)  # geometric culling works
    # opacity-aware culling is at least as tight as geometric
    assert int(culled.num_instances) <= int(geo.num_instances)

    conics = np.asarray(prep.conics)
    m2d = np.asarray(prep.means2d)
    vis = np.asarray(prep.visible)
    op = np.asarray(opac)
    cs = np.asarray(culled.tile_start)
    rs = np.asarray(rect.tile_start)
    cgid = np.asarray(culled.gauss_id)
    rgid = np.asarray(rect.gauss_id)
    for t in range(gx * gy):
        got = list(cgid[cs[t]:cs[t + 1]])
        ref = list(rgid[rs[t]:rs[t + 1]])
        # subset, same relative (depth) order
        assert [i for i in ref if i in set(got)] == got
        # completeness: any gaussian reaching alpha >= 1/255 in this tile is present
        ty, tx = divmod(t, gx)
        px, py = np.meshgrid(np.arange(tx * ts, tx * ts + ts),
                             np.arange(ty * ts, ty * ts + ts))
        for i in ref:
            if i in set(got) or not vis[i]:
                continue
            dx = px - m2d[i, 0]
            dy = py - m2d[i, 1]
            power = (-0.5 * (conics[i, 0] * dx * dx + conics[i, 2] * dy * dy)
                     - conics[i, 1] * dx * dy)
            alpha = np.minimum(0.99, op[i] * np.exp(np.minimum(power, 0.0)))
            assert (alpha * (power <= 0)).max() < 1.0 / 255.0, \
                f"tile {t}: culled gaussian {i} still contributes"

    # pixel parity: culled instances blend to the same image as the dense oracle
    bg = jnp.array([0.2, 0.4, 0.9])
    dense = rasterize_dense(prep, jnp.asarray(opac), jnp.asarray(feats), bg,
                            image_height=48, image_width=64, tile_size=ts)
    tiled = rasterize_tiled(prep, culled, jnp.asarray(opac), jnp.asarray(feats), bg,
                            image_height=48, image_width=64, tile_size=ts,
                            max_per_tile=128)
    np.testing.assert_allclose(np.asarray(tiled["render"]),
                               np.asarray(dense["render"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tiled["final_transmittance"]),
                               np.asarray(dense["final_transmittance"]), atol=2e-5)


def test_multiword_cull_exact():
    """tmax > 32 culling (multi-word uint32 masks): per-tile lists are subsets of
    the rect binning with every contributing Gaussian kept, and the blended image
    matches the dense oracle bitwise-closely."""
    from langsplat_tpu.ops.tiles import instance_counts

    cam = make_camera(w=160, h=128)  # 10x8 grid: rects can exceed 32 tiles
    means, scales, quats, colors, opac, feats = random_scene(40, seed=7, spread=1.2)
    scales = scales * 3.0  # big splats -> rects wider than one mask word
    ts = 16
    prep = run_preprocess(means, scales, quats, colors, cam, tile_size=ts)
    gx, gy = 10, 8
    rects = np.asarray((prep.tiles_max - prep.tiles_min).prod(axis=1)
                       * prep.visible)
    assert rects.max() > 32  # the second mask word is actually exercised

    rect = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=16384,
                         max_tiles_per_gaussian=96)
    culled = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=16384,
                           max_tiles_per_gaussian=96, tile_size=ts,
                           opacities=jnp.asarray(opac))
    assert int(culled.dropped) == 0 and int(culled.rect_dropped) == 0
    assert int(culled.num_instances) < int(rect.num_instances)
    # the count probe matches the binning's production exactly
    cnt = instance_counts(prep, tile_size=ts, tmax=96,
                          opacities=jnp.asarray(opac))
    assert int(jnp.sum(cnt)) == int(culled.num_instances)

    cs, rs = np.asarray(culled.tile_start), np.asarray(rect.tile_start)
    cgid, rgid = np.asarray(culled.gauss_id), np.asarray(rect.gauss_id)
    for t in range(gx * gy):
        got = list(cgid[cs[t]:cs[t + 1]])
        ref = list(rgid[rs[t]:rs[t + 1]])
        assert [i for i in ref if i in set(got)] == got  # subset, same order

    bg = jnp.array([0.1, 0.5, 0.8])
    dense = rasterize_dense(prep, jnp.asarray(opac), jnp.asarray(feats), bg,
                            image_height=128, image_width=160, tile_size=ts)
    tiled = rasterize_tiled(prep, culled, jnp.asarray(opac), jnp.asarray(feats),
                            bg, image_height=128, image_width=160, tile_size=ts,
                            max_per_tile=64)
    np.testing.assert_allclose(np.asarray(tiled["render"]),
                               np.asarray(dense["render"]), atol=2e-5)


def test_drop_split_budget_vs_rect():
    """`dropped` counts only budget overflow; `rect_dropped` only max_tiles
    overflow — the training loop grows different caps for each."""
    cam = make_camera(w=64, h=64)
    means, scales, quats, colors, opac, feats = random_scene(80, seed=2)
    prep = run_preprocess(means, scales, quats, colors, cam, tile_size=16)
    # tiny budget, huge tmax: pure budget overflow
    b = bin_gaussians(prep, grid_x=4, grid_y=4, budget=8,
                      max_tiles_per_gaussian=64)
    assert int(b.dropped) > 0 and int(b.rect_dropped) == 0
    # huge budget, tiny tmax: pure rect overflow
    r = bin_gaussians(prep, grid_x=4, grid_y=4, budget=8192,
                      max_tiles_per_gaussian=2)
    assert int(r.dropped) == 0 and int(r.rect_dropped) > 0


def test_cull_huge_rect_fallback_and_zero_opacity():
    """Rects larger than tmax candidate positions fall back to no-culling (first
    tmax tiles bin, tail reported dropped); near-zero opacities cull everything."""
    import jax.numpy as jnp
    from langsplat_tpu.ops.tiles import instance_counts, tile_pass_mask

    cam = make_camera(w=64, h=64)
    # one huge gaussian covering the whole 4x4 grid
    means = np.array([[0.0, 0.0, 4.0]], np.float32)
    scales = np.full((1, 3), 3.0, np.float32)
    quats = np.array([[1.0, 0, 0, 0]], np.float32)
    colors = np.ones((1, 3), np.float32)
    prep = run_preprocess(means, scales, quats, colors, cam, tile_size=16)
    w = int(prep.tiles_max[0, 0] - prep.tiles_min[0, 0])
    h = int(prep.tiles_max[0, 1] - prep.tiles_min[0, 1])
    assert w * h > 8  # rect bigger than the tmax below
    cnt = instance_counts(prep, tile_size=16, tmax=8)
    assert int(cnt[0]) == 8  # fallback: first tmax positions, no culling

    # opacity ~0 culls every tile
    cnt0 = instance_counts(prep, tile_size=16, tmax=8,
                           opacities=jnp.asarray(np.array([1e-9], np.float32)))
    assert int(cnt0[0]) == 0
    mask0 = tile_pass_mask(prep, tile_size=16, tmax=8,
                           opacities=jnp.asarray(np.array([1e-9], np.float32)))
    assert int(mask0.sum()) == 0


def test_rect_dropped_gated_on_dead_opacity():
    """A huge-rect Gaussian whose opacity is below ALPHA_EPS contributes
    provably zero alpha everywhere (any_alpha false, mask all-zero), so its
    unexamined tail must NOT count as rect_dropped — otherwise one near-dead
    splat ratchets TmaxPolicy toward the grid cap through discarded
    steps/recompiles (ADVICE r02)."""
    from langsplat_tpu.ops.rasterize_reference import ALPHA_EPS

    cam = make_camera(w=64, h=64)
    means, scales, quats, colors, opac, feats = random_scene(12, seed=5)
    scales = scales.copy()
    scales[0] = 5.0                      # huge splat: rect far beyond tmax
    prep = run_preprocess(means, scales, quats, colors, cam, tile_size=16)
    w = prep.tiles_max[0, 0] - prep.tiles_min[0, 0]
    h = prep.tiles_max[0, 1] - prep.tiles_min[0, 1]
    tmax = 2
    assert int(w * h) > tmax             # premise: rect overflows the cap

    live = opac.copy()
    live[0] = 0.5                        # alive huge splat -> tail counted
    r_live = bin_gaussians(prep, grid_x=4, grid_y=4, budget=8192,
                           max_tiles_per_gaussian=tmax, tile_size=16,
                           opacities=jnp.asarray(live))
    assert int(r_live.rect_dropped) > 0

    dead = opac.copy()
    dead[0] = ALPHA_EPS / 4              # below eps -> provably zero contribution
    r_dead = bin_gaussians(prep, grid_x=4, grid_y=4, budget=8192,
                           max_tiles_per_gaussian=tmax, tile_size=16,
                           opacities=jnp.asarray(dead))
    # only gaussian 0's tail should disappear from the count
    others = [i for i in range(12) if i != 0]
    wl = prep.tiles_max[others, 0] - prep.tiles_min[others, 0]
    hl = prep.tiles_max[others, 1] - prep.tiles_min[others, 1]
    expected_others = int(np.sum(np.where(
        (np.asarray(wl * hl) > tmax) & np.asarray(prep.visible)[others],
        np.asarray(wl * hl) - tmax, 0)))
    assert int(r_dead.rect_dropped) <= expected_others
    assert int(r_dead.rect_dropped) < int(r_live.rect_dropped)
