"""Benchmark: forward+backward rasterization throughput at 1M Gaussians (BASELINE.md).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
The reference publishes no throughput number (BASELINE.json `published: {}`), so
vs_baseline is reported against the first recorded value of this framework (1.0 when no
prior record exists).

Timing methodology (tunneled-TPU-safe): on the remote/tunneled device platform,
dispatch is asynchronous and `block_until_ready` does not actually wait for device
completion, so a naive same-args timing loop measures RPC latency, not compute
(measured: ~35 ms fixed round-trip; a 30-pass elementwise chain "completed" in 0.03 ms,
10x faster than HBM bandwidth allows). Instead each benchmark step APPLIES its
gradients (tiny-lr SGD) and feeds the updated parameters to the next step, forcing a
true on-device dependency chain, and the reported time is the SLOPE between a short and
a long chain (each ending in a scalar fetch), which cancels the fixed RPC/fetch cost.

Env knobs: BENCH_N (gaussians), BENCH_H/BENCH_W (image), BENCH_STEPS, BENCH_BACKEND.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from langsplat_tpu.core import transforms
    from langsplat_tpu.ops import projection
    from langsplat_tpu.ops.rasterize_pallas import rasterize_pallas
    from langsplat_tpu.ops.tiles import bin_gaussians

    n = int(os.environ.get("BENCH_N", 1_000_000))
    h = int(os.environ.get("BENCH_H", 768))
    w = int(os.environ.get("BENCH_W", 1024))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    ts = int(os.environ.get("BENCH_TS", 16))
    chunk = 128
    # fwd chunk = fwd_mult*chunk
    fwd_mult = int(os.environ.get("BENCH_FWD_MULT", 1))
    fov = 0.9

    rng = np.random.default_rng(0)
    means = np.concatenate([rng.uniform(-3, 3, (n, 2)), rng.uniform(2.5, 12, (n, 1))],
                           axis=1).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.002), np.log(0.02), (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    feats = rng.normal(size=(n, 3)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)

    view = transforms.world_to_view(np.eye(3), np.zeros(3)).T
    proj = view @ transforms.projection_matrix(0.01, 100.0, fov, fov).T
    campos = np.linalg.inv(view)[3, :3]
    tanf = float(np.tan(fov / 2))
    bg = jnp.zeros(3)
    gx, gy = -(-w // ts), -(-h // ts)

    @jax.jit
    def train_like_step(m, s, q, o, c, f):
        def loss_fn(m, s, q, o, c, f):
            prep = projection.preprocess(
                m, s, q, None, jnp.asarray(view), jnp.asarray(proj),
                jnp.asarray(campos), image_height=h, image_width=w,
                tanfovx=tanf, tanfovy=tanf, sh_degree=0, tile_size=ts,
                colors_precomp=c)
            inst = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=budget,
                                 max_tiles_per_gaussian=32, tile_size=ts,
                                 opacities=jax.lax.stop_gradient(o))
            out = rasterize_pallas(prep, inst, o, f, bg, image_height=h,
                                   image_width=w, tile_size=ts, chunk=chunk,
                                   fwd_mult=fwd_mult)
            return jnp.mean(out["render"] ** 2) + jnp.mean(
                out["language_feature_image"] ** 2)

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(
            m, s, q, o, c, f)
        # apply the gradients (tiny lr): the next chained step depends on this one
        lr = 1e-9
        new_params = tuple(p - lr * g for p, g in zip((m, s, q, o, c, f), grads))
        return (loss,) + new_params

    args = tuple(map(jnp.asarray, (means, scales, quats, opac, colors, feats)))

    # size the budget from the measured instance count (the trainer's adaptive-budget
    # policy, BudgetPolicy in train/loop.py), then validate nothing is dropped —
    # no silent truncation in the bench
    env_budget = os.environ.get("BENCH_BUDGET")

    @jax.jit
    def probe_count(m, s, q, o, c):
        from langsplat_tpu.ops.tiles import instance_counts
        prep = projection.preprocess(
            m, s, q, None, jnp.asarray(view), jnp.asarray(proj), jnp.asarray(campos),
            image_height=h, image_width=w, tanfovx=tanf, tanfovy=tanf,
            sh_degree=0, tile_size=ts, colors_precomp=c)
        return jnp.sum(instance_counts(prep, tile_size=ts, tmax=32, opacities=o))

    measured = int(probe_count(args[0], args[1], args[2], args[3], args[4]))
    budget = int(env_budget) if env_budget else -(-int(measured * 1.1) // 4096) * 4096

    @jax.jit
    def count_dropped(m, s, q, o, c):
        prep = projection.preprocess(
            m, s, q, None, jnp.asarray(view), jnp.asarray(proj), jnp.asarray(campos),
            image_height=h, image_width=w, tanfovx=tanf, tanfovy=tanf,
            sh_degree=0, tile_size=ts, colors_precomp=c)
        return bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=budget,
                             max_tiles_per_gaussian=32, tile_size=ts,
                             opacities=o).dropped

    dropped = int(count_dropped(args[0], args[1], args[2], args[3], args[4]))
    if dropped > 0:
        raise RuntimeError(f"bench budget too small: {dropped} instances dropped "
                           f"at budget {budget}; set BENCH_BUDGET")

    def run_chain(k):
        cur = args
        loss = None
        for _ in range(k):
            out = train_like_step(*cur)
            loss, cur = out[0], out[1:]
        return float(loss)  # scalar fetch forces the whole chain

    # Repeated slope measurement (round-3 lesson: BENCH_r03 was captured while a
    # quality run shared the chip and nothing flagged the 38% contamination).
    # Take the MEDIAN of >=3 short/long slope pairs and surface the spread —
    # a contended or thermally-throttled chip shows up as high spread.
    k_short = 2
    repeats = max(int(os.environ.get("BENCH_REPEATS", 3)), 1)
    run_chain(k_short)  # warm up compile + transfers
    # a contended chip can interleave foreign work into the SHORT chain only,
    # making t_long - t_short <= 0 and the px/s figure physically impossible;
    # keep only plausible positive slopes and re-measure (bounded) while the
    # spread stays high, rather than publishing a fantastical number
    min_slope = 1e-4  # 0.1 ms/step: far below any real full step at any size
    slopes = []
    max_tries = repeats * 3
    tries = 0
    while tries < max_tries:
        tries += 1
        t0 = time.time()
        run_chain(k_short)
        t_short = time.time() - t0
        t0 = time.time()
        run_chain(k_short + steps)
        t_long = time.time() - t0
        s = (t_long - t_short) / steps
        if s >= min_slope:
            slopes.append(s)
        if len(slopes) >= repeats:
            # convergence over the most recent `repeats` slopes only: an early
            # contended outlier must not force the loop to exhaust max_tries
            # after the chip has gone quiet (ADVICE r4)
            ss = sorted(slopes[-repeats:])
            if (ss[-1] - ss[0]) / ss[len(ss) // 2] <= 0.10:
                slopes = slopes[-repeats:]
                break
    if not slopes:
        print(json.dumps({
            "metric": f"pixels/s/chip fwd+bwd @ {n} gaussians {w}x{h}",
            "value": 0.0, "unit": "pixels/s", "vs_baseline": 0.0,
            "invalid": True,
            "reason": f"no plausible slope in {max_tries} tries (all "
                      f"<= {min_slope}s/step) — chip contended or clock broken",
        }))
        return
    slopes.sort()
    dt = slopes[len(slopes) // 2] if len(slopes) % 2 else (
        slopes[len(slopes) // 2 - 1] + slopes[len(slopes) // 2]) / 2
    spread = (slopes[-1] - slopes[0]) / dt
    if spread > 0.10:
        print(f"WARNING: bench slope spread {spread:.1%} across {repeats} "
              f"repeats (min {slopes[0] * 1e3:.1f} ms, max "
              f"{slopes[-1] * 1e3:.1f} ms) — chip likely contended; "
              f"treat this number with suspicion", file=sys.stderr)
    pixels_per_s = h * w / dt

    record_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".bench_baseline.json")
    key = f"{n}_{w}x{h}"
    records = {}
    try:
        with open(record_path) as fh:
            records = json.load(fh)
    except Exception:
        pass
    baseline = records.get(key)
    if baseline is None:
        records[key] = pixels_per_s
        try:
            with open(record_path, "w") as fh:
                json.dump(records, fh)
        except Exception:
            pass
    vs = pixels_per_s / baseline if baseline else 1.0

    # A concurrent quality run on the same chip silently contaminated the
    # round-3 driver bench; quality_run.py now drops a RUNNING lock per
    # workspace, and the bench declares the contention in its own artifact.
    # Stale locks (dead pid / ancient mtime, e.g. a SIGKILLed run) are ignored
    # and cleaned so a crashed run can't poison every future number (ADVICE r4).
    from langsplat_tpu.utils.chiplock import active_quality_locks
    locks = active_quality_locks(os.path.dirname(os.path.abspath(__file__)))
    if locks:
        print(f"WARNING: chip contended — quality run in flight ({locks}); "
              f"this number is not a clean measurement", file=sys.stderr)

    print(json.dumps({
        "metric": f"pixels/s/chip fwd+bwd @ {n} gaussians {w}x{h}",
        "value": round(pixels_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(vs, 3),
        "slope_spread": round(spread, 3),
        "slope_repeats": len(slopes),
        "slope_tries": tries,
        # the reference publishes no throughput number (BASELINE.json
        # `published: {}`): the ratio is against this framework's own first
        # recorded value, not a reference-derived baseline
        "baseline_kind": "first_recorded_self_baseline",
        **({"contended": True, "contended_by": locks} if locks else {}),
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
