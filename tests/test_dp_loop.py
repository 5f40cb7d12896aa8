"""Distributed phase A end-to-end: the training loop composes data-parallel
steps with densification, opacity resets and capacity growth on a mesh
(VERDICT r03 #2 — the reference's hardest dynamic, train.py:121-133 +
scene/gaussian_model.py:422-482, previously only proven off-mesh).

Covers:
  - mesh invariance: the same 8-view batch schedule trained on an 8-device
    mesh vs a 2-device mesh (4 views/device) through >=3 densify cycles and
    opacity resets lands on the same field (the reduction orders differ —
    psum tree vs local vmap sum — so equality is allclose, not bitwise);
  - ZeRO-2 composition: sharded Adam moments survive densify moment surgery
    and a forced capacity growth (pad + re-shard) and keep training;
  - step-level stat exactness: the DP step's densify statistics equal the
    reference's per-view accumulation computed serially, and feeding both
    into densify_and_prune produces identical fields.
"""

import os

import numpy as np
import pytest

from tests.test_data import make_colmap_scene

import jax
import jax.numpy as jnp


def _run_phase_a(tmp_path, tag, extra):
    root = str(tmp_path / "scene")
    if not os.path.exists(root):
        make_colmap_scene(root, n_cams=8)
    out = str(tmp_path / f"run_{tag}")
    from langsplat_tpu.cli.train_cli import main as train_main
    train_main([
        "-s", root, "-m", out, "--no_include_feature", "--resolution", "1",
        "--iterations", "60", "--interpret", "--quiet",
        "--densify_from_iter", "5", "--densification_interval", "15",
        "--densify_until_iter", "50", "--opacity_reset_interval", "20",
        "--densify_grad_threshold", "0.0000001",
        "--test_iterations", "999", "--save_iterations", "60",
        "--checkpoint_iterations", "60", "--sh_degree", "1",
    ] + extra)
    ck = os.path.join(out + "_-1", "chkpnt60.npz")
    assert os.path.exists(ck), f"{tag}: no checkpoint written"
    data = np.load(ck)
    # RGB-phase field leaf order (models/gaussian_field.GaussianField):
    # 0=xyz 1=features_dc 2=features_rest 3=scaling 4=rotation 5=opacity 6=alive
    return {"xyz": data["field_0"], "opacity": data["field_5"],
            "alive": data["field_6"]}


@pytest.mark.slow
def test_dp_phase_a_mesh_invariance(tmp_path):
    """8x1 and 2x4 meshes train the same 8-view batches through densify
    cycles + resets to the same field."""
    a = _run_phase_a(tmp_path, "m8", ["--data_shards", "8"])
    b = _run_phase_a(tmp_path, "m2", ["--data_shards", "2",
                                      "--dp_views_per_device", "4"])
    # same densify decisions -> same structure (the discrete part is exact)
    assert a["alive"].sum() == b["alive"].sum(), (
        "densify/prune structure diverged across mesh shapes")
    am, bm = a["alive"].astype(bool), b["alive"].astype(bool)
    # documented divergence: psum-tree vs local-vmap-sum reduction order
    # differs at the last ulp per step; 60 Adam steps through clone/split
    # amplify it to ~5e-3 absolute on positions (structure stays identical)
    np.testing.assert_allclose(a["xyz"][am], b["xyz"][bm], atol=2e-2)
    np.testing.assert_allclose(a["opacity"][am], b["opacity"][bm], atol=5e-2)


@pytest.mark.slow
def test_dp_phase_a_zero2_with_growth(tmp_path):
    """ZeRO-2 sharded Adam moments survive densify surgery + capacity growth
    (pad + re-shard) on the mesh; capacity stays mesh-divisible."""
    res = _run_phase_a(tmp_path, "z2", [
        "--data_shards", "8", "--zero2",
        # tiny initial capacity so the forced densification overflows it
        "--initial_capacity_factor", "1", "--capacity_growth_factor", "1.5",
    ])
    cap = res["xyz"].shape[0]
    assert cap % 8 == 0, f"capacity {cap} not divisible by the mesh"
    n_alive = int(res["alive"].sum())
    assert n_alive > 0
    assert np.isfinite(res["xyz"]).all()


def test_dp_step_stats_match_serial_per_view():
    """The DP step's densify stats == the reference's per-view accumulation
    (sum over views of per-view grad norms in half-image units, denom counts
    each visible view), and densify_and_prune on either gives the same field."""
    from tests.test_parallel import batched_cameras, make_field
    from langsplat_tpu.parallel.mesh import make_mesh
    from langsplat_tpu.parallel.data_parallel import make_dp_train_step
    from langsplat_tpu.ops.render import RenderSettings, render
    from langsplat_tpu.train import trainer as tr
    from langsplat_tpu.train import densify as dn
    from langsplat_tpu.config import OptimizationConfig
    from langsplat_tpu.core import losses

    mesh = make_mesh(8)
    h = w = 32
    views, projs, cpos, tanf = batched_cameras(v=8, w=w, h=h)
    settings = RenderSettings(image_height=h, image_width=w, tanfovx=tanf,
                              tanfovy=tanf, sh_degree=0, include_feature=False,
                              tile_size=16, backend="tiled", max_per_tile=128,
                              budget=1024)
    bg = jnp.zeros(3)
    field = make_field(n=12, cap=32, seed=3)
    gts = jnp.zeros((8, 3, h, w))
    masks = jnp.ones((8, 1, 1, 1))
    cfg = OptimizationConfig()
    opt = tr.make_optimizer(cfg, spatial_lr_scale=1.0, include_feature=False)
    params = tr.extract_params(field, include_feature=False)
    opt_state = opt.init(params)
    stats = dn.DensifyStats.zeros(32)

    step = make_dp_train_step(mesh, settings, opt, include_feature=False)
    out = step(field, opt_state, stats, views, projs, cpos, gts, masks, bg)

    # serial oracle: per-view single-view losses, per-view grad norms
    g_sum = np.zeros(32, np.float32)
    d_sum = np.zeros(32, np.float32)
    r_max = np.zeros(32, np.float32)
    for i in range(8):
        def one_loss(ss):
            o = render(field, settings, views[i], projs[i], cpos[i], bg,
                       screenspace_offset=ss)
            l1 = losses.l1_loss(o["render"], gts[i])
            return (0.8 * l1 + 0.2 * (1 - losses.ssim(o["render"], gts[i])))
        g = jax.grad(one_loss)(jnp.zeros((32, 2)))
        o = render(field, settings, views[i], projs[i], cpos[i], bg)
        vis = np.asarray(o["visibility_filter"])
        scale = np.asarray([0.5 * w, 0.5 * h], np.float32)
        g_sum += np.linalg.norm(np.asarray(g)[:, :2] * scale, axis=-1) * vis
        d_sum += vis.astype(np.float32)
        r_max = np.maximum(r_max, np.where(vis, np.asarray(o["radii"]), 0.0))

    np.testing.assert_allclose(np.asarray(out.stats.grad_accum), g_sum,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.stats.denom), d_sum)
    np.testing.assert_allclose(np.asarray(out.stats.max_radii2d), r_max,
                               atol=1e-4)

    # identical stats -> identical densify decisions and fields
    serial_stats = dn.DensifyStats(grad_accum=jnp.asarray(g_sum),
                                   denom=jnp.asarray(d_sum),
                                   max_radii2d=jnp.asarray(r_max))
    key = jax.random.key(0)
    r_dp = dn.densify_and_prune(field, out.stats, key, extent=2.0,
                                grad_threshold=1e-6)
    r_se = dn.densify_and_prune(field, serial_stats, key, extent=2.0,
                                grad_threshold=1e-6)
    np.testing.assert_array_equal(np.asarray(r_dp.field.alive),
                                  np.asarray(r_se.field.alive))
    np.testing.assert_allclose(np.asarray(r_dp.field.xyz),
                               np.asarray(r_se.field.xyz), atol=1e-6)


@pytest.mark.slow
def test_dp_phase_a_mesh_invariance_tight(tmp_path):
    """Low-LR short variant pinning mesh invariance to atol 1e-4 (VERDICT r04
    #7): with Adam step sizes cut 100x and fewer iterations, psum-tree vs
    vmap-sum reduction-order drift cannot amplify — any disagreement beyond
    1e-4 would be a genuine systematic stat/update bug, which the loose 2e-2
    band of the main test above could mask.

    percent_dense=1.0 makes every densification a CLONE (exact copy): split
    children get positions `sample * exp(scaling)`, so ulp-level scaling
    drift between meshes is amplified by the sample magnitude past any tight
    band (measured: 5/336 coords at ~3e-4 with splits enabled) — clones keep
    the continuous math fully pinned while the main test covers splits."""
    lrs = ["--position_lr_init", "0.0000016", "--position_lr_final",
           "0.00000001", "--feature_lr", "0.000025", "--opacity_lr", "0.0005",
           "--scaling_lr", "0.00005", "--rotation_lr", "0.00001",
           "--percent_dense", "1.0",
           "--iterations", "24", "--densify_from_iter", "5",
           "--densification_interval", "8", "--densify_until_iter", "20",
           "--opacity_reset_interval", "999", "--checkpoint_iterations", "24"]

    def run(tag, extra):
        root = str(tmp_path / "scene")
        if not os.path.exists(root):
            make_colmap_scene(root, n_cams=8)
        out = str(tmp_path / f"tight_{tag}")
        from langsplat_tpu.cli.train_cli import main as train_main
        train_main(["-s", root, "-m", out, "--no_include_feature",
                    "--resolution", "1", "--interpret", "--quiet",
                    "--densify_grad_threshold", "0.0000001",
                    "--test_iterations", "999", "--save_iterations", "999",
                    "--sh_degree", "1"] + lrs + extra)
        ck = os.path.join(out + "_-1", "chkpnt24.npz")
        data = np.load(ck)
        return {"xyz": data["field_0"], "opacity": data["field_5"],
                "alive": data["field_6"]}

    a = run("m8", ["--data_shards", "8"])
    b = run("m2", ["--data_shards", "2", "--dp_views_per_device", "4"])
    assert a["alive"].sum() == b["alive"].sum()
    am, bm = a["alive"].astype(bool), b["alive"].astype(bool)
    np.testing.assert_allclose(a["xyz"][am], b["xyz"][bm], atol=1e-4)
    np.testing.assert_allclose(a["opacity"][am], b["opacity"][bm], atol=1e-4)
