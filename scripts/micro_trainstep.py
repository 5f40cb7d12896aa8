"""Time the full jitted RGB training step (render + SSIM/L1 + Adam + densify stats)
at bench scale, vs the raster-only fwd+bwd — exposes loss/optimizer overheads.

Chained-slope timing (see bench.py).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from langsplat_tpu.config import OptimizationConfig
    from langsplat_tpu.core import transforms
    from langsplat_tpu.core import sh as sh_lib
    from langsplat_tpu.models.gaussian_field import GaussianField
    from langsplat_tpu.ops.render import RenderSettings
    from langsplat_tpu.train import trainer
    from langsplat_tpu.train.densify import DensifyStats

    n = int(os.environ.get("MT_N", 1_000_000))
    h, w = 768, 1024
    fov = 0.9
    rng = np.random.default_rng(0)
    xyz = np.concatenate([rng.uniform(-3, 3, (n, 2)), rng.uniform(2.5, 12, (n, 1))],
                         axis=1).astype(np.float32)
    k = (3 + 1) ** 2
    dc = sh_lib.rgb_to_sh(jnp.asarray(
        rng.uniform(size=(n, 3)).astype(np.float32)))[:, None, :]
    field = GaussianField(
        xyz=jnp.asarray(xyz),
        features_dc=dc,
        features_rest=jnp.zeros((n, k - 1, 3), jnp.float32),
        scaling=jnp.asarray(rng.uniform(np.log(0.002), np.log(0.02),
                                        (n, 3)).astype(np.float32)),
        rotation=jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=transforms.inverse_sigmoid(
            jnp.full((n, 1), 0.5, jnp.float32)),
        language_feature=None,
        alive=jnp.ones((n,), bool),
    )

    view = jnp.asarray(transforms.world_to_view(np.eye(3), np.zeros(3)).T)
    proj = view @ jnp.asarray(transforms.projection_matrix(0.01, 100.0, fov, fov).T)
    campos = jnp.zeros(3)
    tanf = float(np.tan(fov / 2))
    gt = jnp.asarray(rng.uniform(size=(3, h, w)).astype(np.float32))
    bg = jnp.zeros(3)

    settings = RenderSettings(image_height=h, image_width=w, tanfovx=tanf,
                              tanfovy=tanf, sh_degree=3, include_feature=False,
                              tile_size=16, chunk=128, budget=1_900_544,
                              grad_precision=os.environ.get("MT_GPREC", "exact"))
    cfg = OptimizationConfig()
    opt = trainer.make_optimizer(cfg, spatial_lr_scale=3.0, include_feature=False)
    params = trainer.extract_params(field, include_feature=False)
    opt_state = opt.init(params)
    stats = DensifyStats.zeros(n)

    def chain(k, field, opt_state, stats):
        out = None
        for _ in range(k):
            out = trainer.train_step_rgb(
                field, opt_state, stats, view, proj, campos, gt, bg,
                settings=settings, optimizer=opt, lambda_dssim=cfg.lambda_dssim)
            field, opt_state, stats = out.field, out.opt_state, out.stats
        return float(out.loss)

    chain(1, field, opt_state, stats)
    t0 = time.time(); chain(1, field, opt_state, stats); t1 = time.time() - t0
    steps = 6
    t0 = time.time(); chain(1 + steps, field, opt_state, stats)
    t2 = time.time() - t0
    dt = max(t2 - t1, 1e-9) / steps
    print(f"train_step_rgb (sh_degree=3, SSIM, Adam, stats): {dt * 1e3:.2f} ms "
          f"({1.0 / dt:.2f} steps/s, {h * w / dt:.3e} pixels/s)")


if __name__ == "__main__" and not os.environ.get("MT_FEATURE"):
    main()


def feature_phase():
    """Time the phase-B step (language features train, geometry frozen)."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from dataclasses import replace
    from langsplat_tpu.config import OptimizationConfig
    from langsplat_tpu.core import transforms
    from langsplat_tpu.core import sh as sh_lib
    from langsplat_tpu.models.gaussian_field import GaussianField
    from langsplat_tpu.ops.render import RenderSettings
    from langsplat_tpu.train import trainer
    from langsplat_tpu.train.densify import DensifyStats

    n = int(os.environ.get("MT_N", 1_000_000))
    h, w = 768, 1024
    fov = 0.9
    rng = np.random.default_rng(0)
    xyz = np.concatenate([rng.uniform(-3, 3, (n, 2)), rng.uniform(2.5, 12, (n, 1))],
                         axis=1).astype(np.float32)
    k = 16
    dc = sh_lib.rgb_to_sh(jnp.asarray(
        rng.uniform(size=(n, 3)).astype(np.float32)))[:, None, :]
    field = GaussianField(
        xyz=jnp.asarray(xyz), features_dc=dc,
        features_rest=jnp.zeros((n, k - 1, 3), jnp.float32),
        scaling=jnp.asarray(rng.uniform(np.log(0.002), np.log(0.02),
                                        (n, 3)).astype(np.float32)),
        rotation=jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=transforms.inverse_sigmoid(jnp.full((n, 1), 0.5, jnp.float32)),
        language_feature=jnp.asarray(
            rng.normal(size=(n, 3)).astype(np.float32) * 1e-4),
        alive=jnp.ones((n,), bool),
    )
    view = jnp.asarray(transforms.world_to_view(np.eye(3), np.zeros(3)).T)
    proj = view @ jnp.asarray(transforms.projection_matrix(0.01, 100.0, fov, fov).T)
    campos = jnp.zeros(3)
    tanf = float(np.tan(fov / 2))
    gtf = jnp.asarray(rng.uniform(size=(3, h, w)).astype(np.float32))
    maskf = jnp.ones((1, h, w), jnp.float32)
    bg = jnp.zeros(3)
    settings = RenderSettings(image_height=h, image_width=w, tanfovx=tanf,
                              tanfovy=tanf, sh_degree=3, include_feature=True,
                              tile_size=16, chunk=128, budget=1_900_544,
                              grad_mode=os.environ.get("MT_GRAD_MODE", "feature"))
    cfg = OptimizationConfig()
    opt = trainer.make_optimizer(cfg, spatial_lr_scale=3.0, include_feature=True)
    params = trainer.extract_params(field, include_feature=True)
    opt_state = opt.init(params)
    stats = DensifyStats.zeros(n)

    def chain(kk):
        f, s_, st = field, opt_state, stats
        out = None
        for _ in range(kk):
            out = trainer.train_step_feature(
                f, s_, st, view, proj, campos, gtf, maskf, bg,
                settings=settings, optimizer=opt)
            f, s_, st = out.field, out.opt_state, out.stats
        return float(out.loss)

    chain(1)
    t0 = time.time(); chain(1); t1 = time.time() - t0
    steps = 6
    t0 = time.time(); chain(1 + steps); t2 = time.time() - t0
    dt = max(t2 - t1, 1e-9) / steps
    print(f"train_step_feature: {dt * 1e3:.2f} ms ({1.0 / dt:.2f} steps/s)")


if __name__ == "__main__" and os.environ.get("MT_FEATURE"):
    feature_phase()
