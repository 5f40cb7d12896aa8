"""Micro-benchmark: does lax.gather(indices_are_sorted=True) beat the default
gather for the two monotone-index gathers in the hot path?

  1. pack-bwd boundary gather   csum[:, ends]   (ends [N+1] monotone, stride<=32)
  2. binning propagate gather   values[:, seg]  (seg [B] monotone, steps of 0/1)

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
    from jax import lax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    n = int(os.environ.get("MSG_N", 1_000_000))
    budget = int(os.environ.get("MSG_BUDGET", 2_392_064))
    rows = int(os.environ.get("MSG_ROWS", 12))
    rng = np.random.default_rng(0)

    counts = rng.integers(1, 5, n).astype(np.int64)
    counts = np.minimum((counts * (budget / counts.sum())).astype(np.int64), 32)
    offs = np.concatenate([[0], np.cumsum(counts)]).clip(0, budget).astype(np.int32)
    g = jnp.asarray(rng.normal(size=(rows, budget + 1)).astype(np.float32))
    ends = jnp.asarray(offs)                      # [n+1] monotone
    seg_np = np.searchsorted(offs[1:], np.arange(budget), side="right")
    seg = jnp.asarray(seg_np.astype(np.int32))    # [budget] monotone
    vals = jnp.asarray(rng.normal(size=(6, n)).astype(np.float32))

    def gather_cols(operand, idx, sorted_flag):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(1,),
            start_index_map=(1,))
        return lax.gather(operand, idx[:, None], dn,
                          slice_sizes=(operand.shape[0], 1),
                          indices_are_sorted=sorted_flag,
                          unique_indices=False,
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    z = jnp.zeros(())

    def mk(f, *a):
        jf = jax.jit(f)
        return lambda s: jf(s, *a)

    def ends_default(seed, g):
        c = g + seed * 1e-30
        return jnp.sum(c[:, ends]) * 1e-30

    def ends_sorted(seed, g):
        c = g + seed * 1e-30
        return jnp.sum(gather_cols(c, ends, True)) * 1e-30

    def ends_unsorted_flagged(seed, g):
        c = g + seed * 1e-30
        return jnp.sum(gather_cols(c, ends, False)) * 1e-30

    def prop_default(seed, v):
        v = v + seed * 1e-30
        return jnp.sum(v[:, seg]) * 1e-30

    def prop_sorted(seed, v):
        v = v + seed * 1e-30
        return jnp.sum(gather_cols(v, seg, True)) * 1e-30

    print(f"n={n} budget={budget} rows={rows}")
    print(f"ends gather default [:, ends]:      {chain_time(mk(ends_default, g), z):8.2f} ms")
    print(f"ends gather lax sorted=True:        {chain_time(mk(ends_sorted, g), z):8.2f} ms")
    print(f"ends gather lax sorted=False:       {chain_time(mk(ends_unsorted_flagged, g), z):8.2f} ms")
    print(f"prop gather default [:, seg]:       {chain_time(mk(prop_default, vals), z):8.2f} ms")
    print(f"prop gather lax sorted=True:        {chain_time(mk(prop_sorted, vals), z):8.2f} ms")


if __name__ == "__main__":
    main()
