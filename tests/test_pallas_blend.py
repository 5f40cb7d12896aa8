"""Pallas blend kernel (interpret mode on CPU) vs the tiled/dense JAX oracle: forward
values and custom-VJP gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from langsplat_tpu.ops import projection
from langsplat_tpu.ops.rasterize_pallas import rasterize_pallas
from langsplat_tpu.ops.rasterize_reference import rasterize_dense
from langsplat_tpu.ops.tiles import bin_gaussians

from tests.test_projection_and_dense import make_camera, run_preprocess
from tests.test_tiles import random_scene


def setup(n=120, seed=3, w=64, h=48, ts=16):
    cam = make_camera(w=w, h=h)
    means, scales, quats, colors, opac, feats = random_scene(n, seed=seed)
    prep = run_preprocess(means, scales, quats, colors, cam, tile_size=ts)
    gx, gy = -(-w // ts), -(-h // ts)
    inst = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=8192,
                         max_tiles_per_gaussian=64)
    return cam, prep, inst, (means, scales, quats, colors, opac, feats)


def test_pallas_forward_matches_dense():
    cam, prep, inst, (means, scales, quats, colors, opac, feats) = setup()
    bg = jnp.array([0.1, 0.3, 1.0])
    w, h, ts = 64, 48, 16
    dense = rasterize_dense(prep, jnp.asarray(opac), jnp.asarray(feats), bg,
                            image_height=h, image_width=w, tile_size=ts)
    pall = rasterize_pallas(prep, inst, jnp.asarray(opac), jnp.asarray(feats), bg,
                            image_height=h, image_width=w, tile_size=ts,
                            chunk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(pall["render"]),
                               np.asarray(dense["render"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(pall["language_feature_image"]),
                               np.asarray(dense["language_feature_image"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(pall["final_transmittance"]),
                               np.asarray(dense["final_transmittance"]), atol=3e-5)


def test_pallas_gradients_match_dense():
    w = h = 32
    ts = 16
    cam = make_camera(w=w, h=h)
    means, scales, quats, colors, opac, feats = random_scene(40, seed=7, spread=1.0)
    target = np.random.default_rng(0).uniform(size=(3, h, w)).astype(np.float32)
    ftarget = np.random.default_rng(1).uniform(size=(3, h, w)).astype(np.float32)

    def common(means3d, scales_, opac_, colors_, feats_):
        return projection.preprocess(
            means3d, scales_, jnp.asarray(quats), None,
            cam["viewmatrix"], cam["projmatrix"], cam["campos"],
            image_height=h, image_width=w, tanfovx=cam["tanfovx"],
            tanfovy=cam["tanfovy"], sh_degree=0, tile_size=ts,
            colors_precomp=colors_)

    def loss_from(out):
        return (jnp.mean((out["render"] - target) ** 2)
                + jnp.mean((out["language_feature_image"] - ftarget) ** 2)
                + 0.1 * jnp.mean(out["final_transmittance"]))

    bg = jnp.array([0.2, 0.5, 0.8])

    def loss_dense(*args):
        prep = common(*args)
        out = rasterize_dense(prep, args[2], args[4], bg,
                              image_height=h, image_width=w, tile_size=ts)
        return loss_from(out)

    def loss_pallas(*args):
        prep = common(*args)
        inst = bin_gaussians(prep, grid_x=2, grid_y=2, budget=2048,
                             max_tiles_per_gaussian=16)
        out = rasterize_pallas(prep, inst, args[2], args[4], bg,
                               image_height=h, image_width=w, tile_size=ts,
                               chunk=32, interpret=True)
        return loss_from(out)

    args = tuple(jnp.asarray(x) for x in (means, scales, opac, colors, feats))
    ld, gd = jax.value_and_grad(loss_dense, argnums=(0, 1, 2, 3, 4))(*args)
    lp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(float(lp), float(ld), rtol=1e-5)
    names = ["means", "scales", "opac", "colors", "feats"]
    for nm, a, b in zip(names, gd, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5,
                                   err_msg=f"grad mismatch: {nm}")


def test_pallas_rgb_only_no_features():
    cam, prep, inst, (means, scales, quats, colors, opac, feats) = setup(seed=9)
    bg = jnp.zeros(3)
    w, h, ts = 64, 48, 16
    dense = rasterize_dense(prep, jnp.asarray(opac), None, bg,
                            image_height=h, image_width=w, tile_size=ts)
    pall = rasterize_pallas(prep, inst, jnp.asarray(opac), None, bg,
                            image_height=h, image_width=w, tile_size=ts,
                            chunk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(pall["render"]),
                               np.asarray(dense["render"]), atol=3e-5)
    assert "language_feature_image" not in pall


def test_pallas_align_finer_than_chunk():
    """align < chunk: partial final chunks read (fwd) and write (bwd) past their
    tile's range; in-kernel lane masking plus sequential-grid overwrite ordering
    must keep values AND gradients exact."""
    w = h = 32
    ts = 16
    cam = make_camera(w=w, h=h)
    means, scales, quats, colors, opac, feats = random_scene(40, seed=11, spread=1.0)
    target = np.random.default_rng(2).uniform(size=(3, h, w)).astype(np.float32)
    bg = jnp.array([0.3, 0.1, 0.6])

    def common(means3d, scales_, opac_, colors_, feats_):
        return projection.preprocess(
            means3d, scales_, jnp.asarray(quats), None,
            cam["viewmatrix"], cam["projmatrix"], cam["campos"],
            image_height=h, image_width=w, tanfovx=cam["tanfovx"],
            tanfovy=cam["tanfovy"], sh_degree=0, tile_size=ts,
            colors_precomp=colors_)

    def loss(raster):
        def f(*args):
            prep = common(*args)
            inst = bin_gaussians(prep, grid_x=2, grid_y=2, budget=2048,
                                 max_tiles_per_gaussian=16)
            out = raster(prep, inst, args)
            return (jnp.mean((out["render"] - target) ** 2)
                    + jnp.mean(out["language_feature_image"] ** 2)
                    + 0.1 * jnp.mean(out["final_transmittance"]))
        return f

    def r_fine(prep, inst, args):
        # align=8 with bwd chunk 32 / fwd chunk 64: every tile whose count is not a
        # multiple of 32 exercises masked lanes and bwd spill-overwrite
        return rasterize_pallas(prep, inst, args[2], args[4], bg, image_height=h,
                                image_width=w, tile_size=ts, chunk=32,
                                interpret=True, align=8)

    def r_ref(prep, inst, args):
        return rasterize_pallas(prep, inst, args[2], args[4], bg, image_height=h,
                                image_width=w, tile_size=ts, chunk=8,
                                interpret=True)

    def r_blocked(prep, inst, args):
        # chunk 512 exercises the two-level blocked _cumsum_lanes (>=512 lanes)
        return rasterize_pallas(prep, inst, args[2], args[4], bg, image_height=h,
                                image_width=w, tile_size=ts, chunk=512,
                                interpret=True, align=8, fwd_mult=1)

    args = tuple(jnp.asarray(x) for x in (means, scales, opac, colors, feats))
    la, ga = jax.value_and_grad(loss(r_ref), argnums=(0, 1, 2, 3, 4))(*args)
    for variant, raster in [("fine-align", r_fine), ("blocked-cumsum", r_blocked)]:
        lb, gb = jax.value_and_grad(loss(raster), argnums=(0, 1, 2, 3, 4))(*args)
        np.testing.assert_allclose(float(lb), float(la), rtol=1e-5, err_msg=variant)
        for nm, a, b in zip(["means", "scales", "opac", "colors", "feats"], ga, gb):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5,
                                       err_msg=f"grad mismatch: {variant}/{nm}")


def test_pallas_odd_tile_count():
    """3x1 tile grid: the paired-tile kernels pad the grid with a zero-count tile."""
    w, h, ts = 48, 16, 16
    cam = make_camera(w=w, h=h)
    means, scales, quats, colors, opac, feats = random_scene(60, seed=13)
    prep = run_preprocess(means, scales, quats, colors, cam, tile_size=ts)
    inst = bin_gaussians(prep, grid_x=3, grid_y=1, budget=2048,
                         max_tiles_per_gaussian=16)
    bg = jnp.array([0.5, 0.1, 0.2])
    dense = rasterize_dense(prep, jnp.asarray(opac), jnp.asarray(feats), bg,
                            image_height=h, image_width=w, tile_size=ts)
    pall = rasterize_pallas(prep, inst, jnp.asarray(opac), jnp.asarray(feats), bg,
                            image_height=h, image_width=w, tile_size=ts,
                            chunk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(pall["render"]),
                               np.asarray(dense["render"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(pall["final_transmittance"]),
                               np.asarray(dense["final_transmittance"]), atol=3e-5)


def test_feature_grad_mode_matches_full():
    """grad_mode='feature' skips the geometric gradient chain; for a loss that only
    touches the language-feature image, d(features) must match the full backward
    and the geometric gradients are exactly zero by construction."""
    w = h = 32
    ts = 16
    cam = make_camera(w=w, h=h)
    means, scales, quats, colors, opac, feats = random_scene(40, seed=17, spread=1.0)
    ftarget = np.random.default_rng(3).uniform(size=(3, h, w)).astype(np.float32)
    bg = jnp.zeros(3)

    def loss(mode):
        def f(feats_):
            prep = projection.preprocess(
                jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), None,
                cam["viewmatrix"], cam["projmatrix"], cam["campos"],
                image_height=h, image_width=w, tanfovx=cam["tanfovx"],
                tanfovy=cam["tanfovy"], sh_degree=0, tile_size=ts,
                colors_precomp=jnp.asarray(colors))
            inst = bin_gaussians(prep, grid_x=2, grid_y=2, budget=2048,
                                 max_tiles_per_gaussian=16)
            out = rasterize_pallas(prep, inst, jnp.asarray(opac), feats_, bg,
                                   image_height=h, image_width=w, tile_size=ts,
                                   chunk=32, interpret=True, grad_mode=mode)
            return jnp.mean((out["language_feature_image"] - ftarget) ** 2)
        return f

    fa = jnp.asarray(feats)
    lf, gf = jax.value_and_grad(loss("full"))(fa)
    lm, gm = jax.value_and_grad(loss("feature"))(fa)
    np.testing.assert_allclose(float(lm), float(lf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gf), atol=1e-6)


def test_grad_precision_bf16_plumbing():
    """grad_precision='bf16' must change nothing on the CPU interpret path (CPU
    ignores matmul precision) — validates the plumbing; the actual numeric trade
    is measured on-device in scripts/micro_precision.py."""
    w = h = 32
    ts = 16
    cam = make_camera(w=w, h=h)
    means, scales, quats, colors, opac, feats = random_scene(30, seed=19, spread=1.0)
    bg = jnp.zeros(3)

    def loss(gp):
        def f(o):
            prep = projection.preprocess(
                jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), None,
                cam["viewmatrix"], cam["projmatrix"], cam["campos"],
                image_height=h, image_width=w, tanfovx=cam["tanfovx"],
                tanfovy=cam["tanfovy"], sh_degree=0, tile_size=ts,
                colors_precomp=jnp.asarray(colors))
            inst = bin_gaussians(prep, grid_x=2, grid_y=2, budget=2048,
                                 max_tiles_per_gaussian=16)
            out = rasterize_pallas(prep, inst, o, jnp.asarray(feats), bg,
                                   image_height=h, image_width=w, tile_size=ts,
                                   chunk=32, interpret=True, grad_precision=gp)
            return jnp.mean(out["render"] ** 2)
        return f

    oa = jnp.asarray(opac)
    le, ge = jax.value_and_grad(loss("exact"))(oa)
    lb, gb = jax.value_and_grad(loss("bf16"))(oa)
    np.testing.assert_allclose(float(lb), float(le), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ge), atol=1e-7)


def test_segment_sum_bounded_matches_numpy():
    """segment_sum_bounded (interpret) vs np.add.reduceat on random bounded
    segments, including empty segments, a zero-width tail, and n_out not a
    multiple of the output block."""
    from langsplat_tpu.ops.segsum_pallas import segment_sum_bounded

    rng = np.random.default_rng(11)
    for n_out, max_len, rows in ((700, 7, 12), (513, 1, 3), (64, 32, 8)):
        lens = rng.integers(0, max_len + 1, n_out)
        lens[rng.uniform(size=n_out) < 0.3] = 0          # empty segments
        ends = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        width = int(ends[-1])
        d = rng.normal(size=(rows, max(width, 1))).astype(np.float32)[:, :width]
        out = segment_sum_bounded(jnp.asarray(d if width else
                                              np.zeros((rows, 0), np.float32)),
                                  jnp.asarray(ends), n_out, interpret=True,
                                  block_in=128, block_out=256)
        expect = np.zeros((rows, n_out), np.float32)
        for g in range(n_out):
            expect[:, g] = d[:, ends[g]:ends[g + 1]].sum(axis=1)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_segsum_backward_matches_gather():
    """The wired-in segsum reduction must produce the same packing-gather
    backward as the cumsum + boundary-gather formulation, through the full
    pallas blend VJP (both grad modes)."""
    w = h = 32
    ts = 16
    cam = make_camera(w=w, h=h)
    means, scales, quats, colors, opac, feats = random_scene(60, seed=23, spread=1.0)
    bg = jnp.array([0.2, 0.4, 0.6])

    def loss(reduce_mode, grad_mode):
        def f(o, c, ft):
            prep = projection.preprocess(
                jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), None,
                cam["viewmatrix"], cam["projmatrix"], cam["campos"],
                image_height=h, image_width=w, tanfovx=cam["tanfovx"],
                tanfovy=cam["tanfovy"], sh_degree=0, tile_size=ts,
                colors_precomp=c)
            inst = bin_gaussians(prep, grid_x=2, grid_y=2, budget=2048,
                                 max_tiles_per_gaussian=16)
            out = rasterize_pallas(prep, inst, o, ft, bg,
                                   image_height=h, image_width=w, tile_size=ts,
                                   chunk=32, interpret=True,
                                   grad_mode=grad_mode, bwd_reduce=reduce_mode)
            return (jnp.mean(out["render"] ** 2)
                    + jnp.mean(out["language_feature_image"] ** 2))
        return f

    args = (jnp.asarray(opac), jnp.asarray(colors), jnp.asarray(feats))
    for grad_mode, argnums in (("full", (0, 1, 2)), ("feature", (2,))):
        gs = jax.grad(loss("segsum", grad_mode), argnums=argnums)(*args)
        gg = jax.grad(loss("gather", grad_mode), argnums=argnums)(*args)
        for a, b in zip(gs, gg):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5)




def test_sort_cut_fallback_when_tail_live():
    """The pack-backward presort sorts only the leading power-of-two columns when
    a runtime check proves every tail column is padding (rasterize_pallas.
    _gather_attrs_bwd); when per-tile alignment padding pushes live columns past
    the cut, the cond's fallback must sort the full width. This scene is tuned so
    p_off[-1] > cut >= budget (fallback branch), and gradients must still match
    the dense oracle exactly."""
    from langsplat_tpu.ops.rasterize_pallas import make_blend_spec, pack_instances

    w = h = 48
    ts = 16
    cam = make_camera(w=w, h=h)
    # spread gaussians so all 9 tiles get instances; small budget + align=32
    # padding inflates p_off[-1] past the pow2 cut
    means, scales, quats, colors, opac, feats = random_scene(40, seed=11, spread=2.6)
    budget = 128

    def common(means3d, scales_, opac_, colors_, feats_):
        return projection.preprocess(
            means3d, scales_, jnp.asarray(quats), None,
            cam["viewmatrix"], cam["projmatrix"], cam["campos"],
            image_height=h, image_width=w, tanfovx=cam["tanfovx"],
            tanfovy=cam["tanfovy"], sh_degree=0, tile_size=ts,
            colors_precomp=colors_)

    args = tuple(jnp.asarray(x) for x in (means, scales, opac, colors, feats))
    prep0 = common(*args)
    inst0 = bin_gaussians(prep0, grid_x=3, grid_y=3, budget=budget,
                          max_tiles_per_gaussian=16)
    assert int(inst0.dropped) == 0
    spec = make_blend_spec(image_height=h, image_width=w, tile_size=ts, chunk=32,
                           num_feat=3, budget=budget, interpret=True)
    _, p_off = pack_instances(prep0, args[2], args[4], inst0, spec, interpret=True)
    cut = 1 << ((spec.aligned_budget - 1).bit_length() - 1)
    assert cut >= budget, "scene must make the split path statically eligible"
    assert int(p_off[-1]) > cut, (
        f"scene must push live columns past the cut to hit the fallback "
        f"(p_off[-1]={int(p_off[-1])}, cut={cut})")

    target = np.random.default_rng(0).uniform(size=(3, h, w)).astype(np.float32)
    bg = jnp.array([0.2, 0.5, 0.8])

    def loss_from(out):
        return (jnp.mean((out["render"] - target) ** 2)
                + jnp.mean(out["language_feature_image"] ** 2))

    def loss_dense(*a):
        prep = common(*a)
        out = rasterize_dense(prep, a[2], a[4], bg,
                              image_height=h, image_width=w, tile_size=ts)
        return loss_from(out)

    def loss_pallas(*a):
        prep = common(*a)
        inst = bin_gaussians(prep, grid_x=3, grid_y=3, budget=budget,
                             max_tiles_per_gaussian=16)
        out = rasterize_pallas(prep, inst, a[2], a[4], bg,
                               image_height=h, image_width=w, tile_size=ts,
                               chunk=32, interpret=True)
        return loss_from(out)

    ld, gd = jax.value_and_grad(loss_dense, argnums=(0, 1, 2, 3, 4))(*args)
    lp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(float(lp), float(ld), rtol=1e-5)
    for nm, a, b in zip(["means", "scales", "opac", "colors", "feats"], gd, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5,
                                   err_msg=f"grad mismatch: {nm}")
