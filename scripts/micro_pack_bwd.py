"""Micro-benchmark: components of the packing-gather BACKWARD at real sizes.

The stage profiler shows ~90-110 ms of non-kernel backward per step at 1M Gaussians
(budget ~2.4M instances). First measurement round showed the two RANDOM GATHERS
dominate (~21 ns per gathered column-index on v5e), not the cumsum (~3.5 ms):

    permute gather  gz[:, inv]      (2.39M indices)  ~53 ms
    ends gather     csum[:, ends]   (2x 1M indices)  ~42 ms

This round compares gather vs scatter-SET formulations of the same dataflow (tiles.py
measured set-scatters as ~bandwidth-bound while gathers pay ~10-20 ns per index):

  - d_pre via scatter: d_pre.at[:, presort_of_aligned].set(gz)  (one 3.18M scatter)
  - seg sums via scatter: boundary csum columns scattered to their Gaussian slot
  - row-major (transposed) gathers for both, for the layout comparison

Every variant reduces with a FULL jnp.sum so XLA cannot slice away work (the first
round's strided sampling let fusion distort some numbers).

Chained-slope timing (see bench.py).
"""

import os
import sys
import time

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

    n = int(os.environ.get("MPB_N", 1_000_000))
    budget = int(os.environ.get("MPB_BUDGET", 2_392_064))
    aligned = int(os.environ.get("MPB_ALIGNED", budget + 256 * 3072))
    rows = int(os.environ.get("MPB_ROWS", 12))
    rng = np.random.default_rng(0)

    counts = rng.integers(1, 5, n).astype(np.int64)
    scale = budget / counts.sum()
    counts = np.maximum((counts * scale).astype(np.int64), 0)
    offs = np.concatenate([[0], np.cumsum(counts)]).clip(0, budget).astype(np.int32)
    g = jnp.asarray(rng.normal(size=(rows, aligned)).astype(np.float32))
    g_t = jnp.asarray(np.asarray(g).T.copy())
    perm = rng.permutation(aligned)
    inv = jnp.asarray(perm[:budget].astype(np.int32))      # presort -> aligned
    # aligned -> presort (inverse of inv; padding columns -> budget => dropped)
    poa_np = np.full(aligned, budget, np.int32)
    poa_np[perm[:budget]] = np.arange(budget, dtype=np.int32)
    poa = jnp.asarray(poa_np)
    ends = jnp.asarray(offs)
    # boundary scatter index: presort position offs[g] writes to slot g, others drop
    btgt_np = np.full(budget + 1, n + 1, np.int32)
    btgt_np[offs] = np.arange(n + 1, dtype=np.int32)
    btgt = jnp.asarray(btgt_np)

    z = jnp.zeros(())
    mk = lambda f: (lambda s: f(s, g))
    mk_t = lambda f: (lambda s: f(s, g_t))

    @jax.jit
    def s_permute(seed, g):
        g = g + seed * 1e-30
        return jnp.sum(g[:, inv]) * 1e-30

    @jax.jit
    def s_permute_rows(seed, gt):
        gt = gt + seed * 1e-30
        return jnp.sum(jnp.take(gt, inv, axis=0)) * 1e-30

    @jax.jit
    def s_scatter_pre(seed, g):
        g = g + seed * 1e-30
        d_pre = jnp.zeros((rows, budget + 1), g.dtype).at[:, poa].set(g, mode="drop")
        return jnp.sum(d_pre) * 1e-30

    @jax.jit
    def s_scatter_pre_rows(seed, gt):
        gt = gt + seed * 1e-30
        d_pre = jnp.zeros((budget + 1, rows), gt.dtype).at[poa, :].set(gt, mode="drop")
        return jnp.sum(d_pre) * 1e-30

    @jax.jit
    def s_ends_gather(seed, g):
        g = g + seed * 1e-30
        c = g[:, :budget + 1]
        return jnp.sum(c[:, ends[1:]] - c[:, ends[:-1]]) * 1e-30

    @jax.jit
    def s_ends_scatter(seed, g):
        g = g + seed * 1e-30
        c = g[:, :budget + 1]
        bvals = jnp.zeros((rows, n + 2), g.dtype).at[:, btgt].set(c, mode="drop")
        return jnp.sum(bvals[:, 1:n + 1] - bvals[:, :n]) * 1e-30

    @jax.jit
    def s_full_scatter(seed, g):
        """whole bwd, scatter formulation: scatter + cumsum + boundary scatter + diff"""
        g = g + seed * 1e-30
        d_pre = jnp.zeros((rows, budget + 1), g.dtype).at[:, poa].set(g, mode="drop")
        csum = jnp.cumsum(d_pre[:, :budget], axis=1)
        csum = jnp.concatenate([jnp.zeros((rows, 1), g.dtype), csum], axis=1)
        bvals = jnp.zeros((rows, n + 2), g.dtype).at[:, btgt].set(csum, mode="drop")
        seg = bvals[:, 1:n + 1] - bvals[:, :n]
        return jnp.sum(seg) * 1e-30

    print(f"n={n} budget={budget} aligned={aligned} rows={rows}")
    print(f"permute gather cols  [12,A][:,inv]:          "
          f"{chain_time(mk(s_permute), z):8.2f} ms")
    print(f"permute gather rows  [A,12][inv,:]:          "
          f"{chain_time(mk_t(s_permute_rows), z):8.2f} ms")
    print(f"scatter-set cols     .at[:,poa].set(g):      "
          f"{chain_time(mk(s_scatter_pre), z):8.2f} ms")
    print(f"scatter-set rows     .at[poa,:].set(gt):     "
          f"{chain_time(mk_t(s_scatter_pre_rows), z):8.2f} ms")
    print(f"ends gather          csum[:, ends] 2x:       "
          f"{chain_time(mk(s_ends_gather), z):8.2f} ms")
    print(f"ends scatter-set     .at[:,btgt].set(csum):  "
          f"{chain_time(mk(s_ends_scatter), z):8.2f} ms")
    print(f"FULL bwd, all-scatter formulation:           "
          f"{chain_time(mk(s_full_scatter), z):8.2f} ms")


if __name__ == "__main__":
    main()
