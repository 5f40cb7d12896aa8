"""Micro-benchmark: variants of the per-Gaussian gradient reduction
d_attr[:, g] = sum over instances of d_packed[:, slot]."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, *args, steps=5):
    import jax
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = 1_000_000
    a = 3_000_000       # instances (aligned)
    rows = 16
    tmax = 16
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(rows, a)).astype(np.float32))
    d_rows = jnp.asarray(np.asarray(d).T)
    gid = np.sort(rng.integers(0, n, a)).astype(np.int32)  # tile-sorted ~ somewhat local
    gid_j = jnp.asarray(gid)
    # strided ids: assign j within gaussian
    j_within = np.zeros(a, np.int32)
    # random-ish unique j per (g): approximate with arange%tmax (close enough for perf)
    j_within = (np.arange(a) % tmax).astype(np.int32)
    strided = jnp.asarray(gid * tmax + j_within)
    inv = jnp.full((n * tmax,), a, jnp.int32).at[strided].set(
        jnp.arange(a, dtype=jnp.int32), mode="drop")
    perm = jnp.asarray(rng.permutation(a).astype(np.int32))

    @jax.jit
    def v_scatter_add(dd, g):
        return jnp.zeros((rows, n + 1)).at[:, g].add(dd)

    @jax.jit
    def v_scatter_add_sorted(dd, g):
        return jnp.zeros((rows, n + 1)).at[:, g].add(dd, indices_are_sorted=True)

    @jax.jit
    def v_scatter_add_rows_sorted(dd, g):
        return jnp.zeros((n + 1, rows)).at[g].add(dd, indices_are_sorted=True)

    @jax.jit
    def v_inv_gather_cols(dd, iv):
        gz = jnp.concatenate([dd, jnp.zeros((rows, 1))], axis=1)
        return gz[:, iv].reshape(rows, n, tmax).sum(axis=2)

    @jax.jit
    def v_inv_gather_rows(dd, iv):
        gz = jnp.concatenate([dd, jnp.zeros((1, rows))], axis=0)
        return gz[iv].reshape(n, tmax, rows).sum(axis=1)

    @jax.jit
    def v_sortless_cumsum(dd, g):
        # instances sorted by gid assumed: cumsum + diff at boundaries
        c = jnp.cumsum(dd, axis=1)
        ends = jnp.searchsorted(g, jnp.arange(n + 1, dtype=jnp.int32),
                                method="scan_unrolled")
        cz = jnp.concatenate([jnp.zeros((rows, 1)), c], axis=1)
        return cz[:, ends[1:]] - cz[:, ends[:-1]]

    @jax.jit
    def v_bf16_scatter(dd, g):
        return jnp.zeros((rows, n + 1), jnp.bfloat16).at[:, g].add(
            dd.astype(jnp.bfloat16))

    print(f"A={a} N={n} rows={rows} tmax={tmax}")
    print(f"scatter-add cols:            {t(v_scatter_add, d, gid_j):8.2f} ms")
    print(f"scatter-add cols (sorted):   {t(v_scatter_add_sorted, d, gid_j):8.2f} ms")
    print(f"scatter-add rows (sorted):   {t(v_scatter_add_rows_sorted, d_rows, gid_j):8.2f} ms")
    print(f"inv-map gather cols:         {t(v_inv_gather_cols, d, inv):8.2f} ms")
    print(f"inv-map gather rows:         {t(v_inv_gather_rows, d_rows, inv):8.2f} ms")
    print(f"bf16 scatter-add:            {t(v_bf16_scatter, d, gid_j):8.2f} ms")

    @jax.jit
    def v_permute_gather(dd, p):
        return dd[:, p]

    print(f"(ref) permute gather [16,A]: {t(v_permute_gather, d, perm):8.2f} ms")
    @jax.jit
    def v_cumsum_only(dd):
        return jnp.cumsum(dd, axis=1)
    print(f"(ref) cumsum [16,A]:         {t(v_cumsum_only, d):8.2f} ms")


if __name__ == "__main__":
    main()
