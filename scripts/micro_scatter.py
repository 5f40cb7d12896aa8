"""Micro-benchmark: scatter-set vs gather for the budget-sized permutations.

Verifies the claim driving the packing/binning design: a [rows, budget] column
scatter-set by a random permutation is far cheaper than the equivalent column gather.
Chained-slope timing (see bench.py): each step's reduced output perturbs the next
step's float input by 1e-30 so nothing is DCE'd or overlapped away.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(step_fn, steps=8):
    import jax.numpy as jnp

    def chain(k):
        s = jnp.zeros((), jnp.float32)
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

    budget = int(os.environ.get("MB_BUDGET", 1_500_000))
    rows = int(os.environ.get("MB_ROWS", 16))
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(budget).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(rows, budget)).astype(np.float32))

    @jax.jit
    def gather_cols(s, v):
        out = (v + s * 1e-30)[:, perm]
        return jnp.sum(out) * 1e-30

    @jax.jit
    def scatter_set_cols(s, v):
        out = jnp.zeros((rows, budget), jnp.float32).at[:, perm].set(v + s * 1e-30)
        return jnp.sum(out) * 1e-30

    @jax.jit
    def scatter_set_rows(s, v):
        vt = (v + s * 1e-30).T
        out = jnp.zeros((budget, rows), jnp.float32).at[perm, :].set(vt)
        return jnp.sum(out) * 1e-30

    @jax.jit
    def cummax_packed(s, v):
        m = (perm.astype(jnp.uint32) << 9) | jnp.uint32(3)
        mm = jnp.stack([m, m, m, m])
        out = jax.lax.cummax(mm, axis=1)
        return jnp.sum((out & 511).astype(jnp.float32)) * 1e-30 + jnp.sum(v) * 0.0 + s * 0.0

    print(f"budget={budget} rows={rows}")
    print(f"gather cols [rows,B][:, perm]:        {chain_time(lambda s: gather_cols(s, vals)):8.2f} ms")
    print(f"scatter-set cols zeros.at[:,perm]:    {chain_time(lambda s: scatter_set_cols(s, vals)):8.2f} ms")
    print(f"scatter-set rows zeros.at[perm,:]:    {chain_time(lambda s: scatter_set_rows(s, vals)):8.2f} ms")
    print(f"cummax [4, budget] u32:               {chain_time(lambda s: cummax_packed(s, vals)):8.2f} ms")


if __name__ == "__main__":
    main()
