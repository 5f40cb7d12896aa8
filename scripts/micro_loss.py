"""Time SSIM/L1 fwd+bwd and SH eval fwd+bwd in isolation (chained-slope)."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(step_fn, seed0, steps=8):
    def chain(k):
        s = seed0
        for _ in range(k):
            s = step_fn(s)
        return float(s)
    chain(1)
    t0 = time.time(); chain(1); t1 = time.time() - t0
    t0 = time.time(); chain(1 + steps); t2 = time.time() - t0
    return max(t2 - t1, 0.0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from langsplat_tpu.core import losses
    from langsplat_tpu.core import sh as sh_lib

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(3, 768, 1024)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(size=(3, 768, 1024)).astype(np.float32))

    @jax.jit
    def ssim_fb(seed, a):
        def loss(a):
            return losses.ssim(a, gt)
        v, g = jax.value_and_grad(loss)(a + seed * 1e-30)
        return jnp.sum(g) * 1e-30 + v * 1e-30

    @jax.jit
    def l1_fb(seed, a):
        v, g = jax.value_and_grad(lambda a: losses.l1_loss(a, gt))(a + seed * 1e-30)
        return jnp.sum(g) * 1e-30 + v * 1e-30

    n = 1_000_000
    shs = jnp.asarray(rng.normal(size=(n, 16, 3)).astype(np.float32) * 0.1)
    dirs = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

    @jax.jit
    def sh_fb(seed, s):
        def loss(s):
            return jnp.sum(sh_lib.eval_sh(3, s, dirs) ** 2) * 1e-6
        v, g = jax.value_and_grad(loss)(s + seed * 1e-30)
        return jnp.sum(g) * 1e-30 + v * 1e-30

    z = jnp.zeros(())
    print(f"ssim fwd+bwd [3,768,1024]:  {chain_time(lambda s: ssim_fb(s, img), z):8.2f} ms")
    print(f"l1 fwd+bwd   [3,768,1024]:  {chain_time(lambda s: l1_fb(s, img), z):8.2f} ms")
    print(f"sh3 eval fwd+bwd (1M):      {chain_time(lambda s: sh_fb(s, shs), z):8.2f} ms")


if __name__ == "__main__":
    main()
