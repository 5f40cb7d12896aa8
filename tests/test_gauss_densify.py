"""Densification under the Gaussian-axis (TP) sharded layout
(parallel/gauss_densify.py): shard-local slot allocation with serial-equal
decisions, composed with the gauss-sharded train step, Adam-moment surgery
and capacity growth on the 8-device virtual CPU mesh.

Reference dynamic being distributed: /root/reference/scene/
gaussian_model.py:422-482 (densify_and_prune + optimizer surgery)."""

import numpy as np
import jax
import jax.numpy as jnp

from langsplat_tpu.config import OptimizationConfig
from langsplat_tpu.models.gaussian_field import grow_capacity
from langsplat_tpu.parallel.gauss_densify import make_sharded_densify
from langsplat_tpu.parallel.gauss_sharded import (
    make_gauss_sharded_train_step, shard_state)
from langsplat_tpu.parallel.mesh import make_mesh
from langsplat_tpu.train import densify as dn
from langsplat_tpu.train import trainer as tr
from langsplat_tpu.train.loop import pad_opt_state

from tests.test_model_train import make_field


def _hot_stats(field, hot_idx, cap):
    """Stats that push `hot_idx` rows over any tiny densify threshold."""
    ga = np.zeros(cap, np.float32)
    ga[hot_idx] = 1.0
    dn_ = np.ones(cap, np.float32)
    return dn.DensifyStats(grad_accum=jnp.asarray(ga), denom=jnp.asarray(dn_),
                           max_radii2d=jnp.zeros(cap))


def _alive_multiset(field):
    """Alive rows as a lexicographically sorted [n, 3] xyz array (slot ids are
    allocation details; the FIELD a layout represents is the multiset)."""
    xyz = np.asarray(field.xyz)[np.asarray(field.alive)]
    return xyz[np.lexsort(xyz.T)]


def _spread_rows(field, cap, stride=13):
    """Permute rows so alive Gaussians spread across shards (make_field packs
    them into the first slots, which would starve shard 0 of free rows)."""
    from dataclasses import replace
    perm = (np.arange(cap) * stride) % cap  # bijection while gcd(stride,cap)=1

    def p(x):
        return None if x is None else x[perm]

    return replace(field, xyz=p(field.xyz), features_dc=p(field.features_dc),
                   features_rest=p(field.features_rest),
                   scaling=p(field.scaling), rotation=p(field.rotation),
                   opacity=p(field.opacity),
                   language_feature=p(field.language_feature),
                   alive=p(field.alive))


def test_sharded_densify_matches_serial_decisions():
    assert len(jax.devices()) == 8
    cap = 64
    field = _spread_rows(make_field(n=20, cap=cap, seed=4), cap)
    alive_idx = np.where(np.asarray(field.alive))[0]
    stats = _hot_stats(field, alive_idx[::2], cap)
    key = jax.random.key(7)

    serial = dn.densify_and_prune(field, stats, key, extent=2.0,
                                  grad_threshold=1e-6)

    for ndev in (8, 2):
        mesh = make_mesh(ndev, axis_names=("gauss",))
        fn = make_sharded_densify(mesh, field, cap, extent=2.0,
                                  grad_threshold=1e-6)
        sh = fn(shard_state(mesh, field, cap),
                shard_state(mesh, stats, cap), key)
        assert int(sh.num_alive) == int(serial.num_alive), ndev
        assert int(sh.overflow) == int(serial.overflow) == 0, ndev
        # identical decisions + globally-generated split noise -> the same
        # multiset of Gaussians, only slot placement differs
        np.testing.assert_allclose(_alive_multiset(sh.field),
                                   _alive_multiset(serial.field), atol=1e-6,
                                   err_msg=f"mesh {ndev}")
        # freed set identical (same prune decisions), placed-children count
        # identical -> same reset popcount
        assert (int(np.asarray(sh.reset_mask).sum())
                == int(np.asarray(serial.reset_mask).sum())), ndev
        assert float(jnp.sum(sh.stats.grad_accum)) == 0.0


def test_sharded_densify_overflow_is_conservative():
    """A shard without free rows overflows even when another shard has spares
    (no cross-shard rebalancing): growth fires at least as early as serial."""
    cap = 16
    field = make_field(n=8, cap=cap, seed=1)  # shard 0 rows 0..7 all alive
    stats = _hot_stats(field, list(range(8)), cap)
    key = jax.random.key(0)
    serial = dn.densify_and_prune(field, stats, key, extent=2.0,
                                  grad_threshold=1e-6)
    mesh = make_mesh(2, axis_names=("gauss",))
    fn = make_sharded_densify(mesh, field, cap, extent=2.0, grad_threshold=1e-6)
    sh = fn(shard_state(mesh, field, cap), shard_state(mesh, stats, cap), key)
    assert int(serial.overflow) == 0  # 8 free rows globally
    assert int(sh.overflow) >= 1      # shard 0 has none of them
    assert int(sh.num_alive) <= int(serial.num_alive)


def test_tp_train_densify_grow_composition():
    """The full TP phase-A dynamic on the mesh: sharded train steps accumulate
    stats -> sharded densify -> sharded Adam-moment surgery -> capacity growth
    (pad + re-shard) -> training continues at the new capacity."""
    from tests.test_gauss_sharded import _setup

    (settings, opt, field, opt_state, stats, views, projs, cpos, gts,
     masks, bg) = _setup(cap=32, v=2)
    cap = 32
    mesh = make_mesh(8, axis_names=("gauss",))
    step = make_gauss_sharded_train_step(
        mesh, settings, opt, include_feature=False, capacity=cap,
        field_template=field, opt_state_template=opt_state)
    f = shard_state(mesh, field, cap)
    o = shard_state(mesh, opt_state, cap)
    s = shard_state(mesh, stats, cap)
    for _ in range(3):
        out = step(f, o, s, views, projs, cpos, gts, masks, bg)
        f, o, s = out.field, out.opt_state, out.stats
    assert float(jnp.sum(s.denom)) > 0  # stats accumulated on the mesh

    dfn = make_sharded_densify(mesh, f, cap, extent=2.0, grad_threshold=1e-7)
    res = dfn(f, s, jax.random.key(3))
    assert int(res.num_alive) > 0
    # moment surgery on the sharded opt state (elementwise -> sharding
    # propagates through plain jit)
    o = tr.zero_moment_rows(o, res.reset_mask, cap)
    f, s = res.field, res.stats

    # capacity growth: pad rows, re-lay out over the mesh, rebuild the step
    new_cap = 64
    f = shard_state(mesh, grow_capacity(f, new_cap), new_cap)
    o = shard_state(mesh, pad_opt_state(o, cap, new_cap), new_cap)
    s = shard_state(mesh, dn.DensifyStats.zeros(new_cap), new_cap)
    step2 = make_gauss_sharded_train_step(
        mesh, settings, opt, include_feature=False, capacity=new_cap,
        field_template=f, opt_state_template=o)
    out2 = step2(f, o, s, views, projs, cpos, gts, masks, bg)
    assert np.isfinite(float(out2.loss))
    assert int(jnp.sum(out2.field.alive)) == int(res.num_alive)


def test_cli_phase_a_gauss_sharded(tmp_path):
    """--gauss_shards N trains phase A tensor-parallel from the CLI through
    densify cycles + opacity resets; decisions are mesh-shape-invariant
    (8-shard vs 2-shard runs agree on the alive structure)."""
    import os
    from tests.test_data import make_colmap_scene

    root = str(tmp_path / "scene")
    make_colmap_scene(root, n_cams=8)

    def run(tag, shards):
        out = str(tmp_path / f"tp_{tag}")
        from langsplat_tpu.cli.train_cli import main as train_main
        train_main([
            "-s", root, "-m", out, "--no_include_feature", "--resolution", "1",
            "--iterations", "40", "--interpret", "--quiet",
            # opacity reset disabled HERE: it clamps opacities to 0.01, two
            # Adam steps from the 0.005 prune boundary — cross-mesh ulp drift
            # (band partial-sum order) then flips borderline prunes and the
            # exact-structure assert below can't hold. Reset+densify cycles
            # are covered by tests/test_dp_loop.py; this test pins the TP
            # WIRING (sharded step + shard-local densify + surgery from the
            # CLI) with decisions saturated away from every boundary.
            # ... and a small opacity LR: at the default 0.05, 40 Adam steps
            # can walk an opacity from init 0.1 to the 0.005 prune boundary,
            # where the same ulp drift flips a single prune (observed 198 vs
            # 199 alive).
            "--densify_from_iter", "5", "--densification_interval", "12",
            "--densify_until_iter", "36", "--opacity_reset_interval", "999",
            "--opacity_lr", "0.001",
            "--densify_grad_threshold", "0.0000001",
            "--test_iterations", "999", "--save_iterations", "999",
            "--checkpoint_iterations", "40", "--sh_degree", "1",
            "--lambda_dssim", "0",  # banded L1 is exact; banded SSIM is not
            # ample capacity: shard-local overflow is conservative (mesh-
            # dependent), so exact mesh invariance is only promised while no
            # shard overflows; with the threshold saturated the population
            # ~doubles per cycle (3 cycles ~= 8x init), hence factor 12
            "--initial_capacity_factor", "12",
            "--gauss_shards", str(shards),
        ])
        ck = os.path.join(out + "_-1", "chkpnt40.npz")
        assert os.path.exists(ck), f"{tag}: no checkpoint written"
        data = np.load(ck)
        return {"xyz": data["field_0"], "alive": data["field_6"]}

    a = run("m8", 8)
    b = run("m2", 2)
    assert a["alive"].sum() > 0
    # identical DECISIONS -> identical structure counts. Positions are NOT
    # compared across mesh shapes: the split-sample noise is slot-keyed and
    # spread_rows' slot layout is mesh-dependent, so children draw different
    # (identically distributed) samples once layouts diverge — the same way
    # the reference's RNG stream is layout-dependent. Slot-matched noise
    # parity is pinned by test_sharded_densify_matches_serial_decisions.
    assert a["alive"].sum() == b["alive"].sum(), (
        "TP densify structure diverged across mesh shapes")
    am = a["xyz"][a["alive"].astype(bool)]
    assert np.isfinite(am).all()
