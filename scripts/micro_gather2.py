"""Gather orientation study: columns of [C, N] vs rows of [N, C], widths 1-16,
int vs float, at pipeline scale (B indices into N sources).

If XLA's row gather (contiguous [C]-wide rows) is much faster than the column
gather the pipeline uses today, propagate_to_segments and pack_instances can
simply transpose their tables. Env: PROF_N, PROF_BUDGET, PROF_STEPS.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from profile_stages import timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(os.environ.get("PROF_N", 1_000_000))
    budget = int(os.environ.get("PROF_BUDGET", 1_798_144))
    steps = int(os.environ.get("PROF_STEPS", 3))

    idx = jax.random.randint(jax.random.key(0), (budget,), 0, n, jnp.int32)
    idx_f = idx.astype(jnp.float32)
    tables = {
        "f32": jax.random.normal(jax.random.key(1), (n, 16), jnp.float32),
        "i32": jax.random.randint(jax.random.key(2), (n, 16), 0, 1 << 30,
                                  jnp.int32),
    }

    def run(name, fn):
        print(f"{name:32s} {timeit(fn, idx_f, steps=steps):8.2f} ms")

    for dt, tab in tables.items():
        tabT = tab.T  # [16, n]
        for c in (1, 4, 8, 16):
            sub = tab[:, :c]
            run(f"row   [N,{c:2d}] {dt} take axis0",
                lambda x, s=sub: jnp.take(s, jnp.clip(
                    x.astype(jnp.int32), 0, n - 1), axis=0))
        for c in (1, 4, 8, 16):
            subT = tabT[:c]
            run(f"col   [{c:2d},N] {dt} index",
                lambda x, s=subT: s[:, jnp.clip(x.astype(jnp.int32), 0, n - 1)])
    # one-hot matmul alternative at small source width? (not applicable, skip)
    # sorted-index variants: does index order matter?
    idx_sorted = jnp.sort(idx)

    def run2(name, fn):
        print(f"{name:32s} {timeit(fn, idx_sorted.astype(jnp.float32), steps=steps):8.2f} ms")

    run2("row   [N, 8] f32 SORTED idx",
         lambda x: jnp.take(tables["f32"][:, :8],
                            jnp.clip(x.astype(jnp.int32), 0, n - 1), axis=0))


if __name__ == "__main__":
    main()
