"""Densification under the Gaussian-axis (TP) sharded layout.

The reference's adaptive density control (`/root/reference/scene/
gaussian_model.py:422-482`) is a global operation: prune frees arbitrary
rows, clone/split children land in freshly concatenated rows, and the
optimizer state is rebuilt around them. Under a `gauss`-sharded layout that
global view does not exist — each device owns a contiguous 1/D row range of
parameters, Adam moments and densify stats, and moving a child into another
shard's range would mean cross-device row traffic plus moment surgery on a
foreign shard.

TPU-native design: **shard-local slot allocation**. The clone/split/prune
DECISIONS are purely per-row (grad-norm, scale and opacity tests — no
cross-row interaction), so each shard can run the exact serial decision rule
on its own rows via `densify_core` inside `shard_map`, placing children in
ITS OWN free slots. Decisions are then bitwise-identical to the serial rule
on any mesh shape; only child placement (which row a child lands in —
semantically arbitrary) is mesh-dependent.

The split-sample noise is generated globally per SLOT, so while slot
layouts agree (no spread_rows re-layout, same capacity) children are
bitwise mesh-shape-invariant; after a mesh-dependent re-layout the draws
differ per mesh (identical distribution — the reference's RNG stream is
equally layout-dependent). The clone/split/prune DECISIONS are invariant
regardless.

Overflow is conservative: a shard with no free rows reports overflow even if
another shard has spares (no cross-shard rebalancing), so capacity growth
fires at least as early as the serial rule — never later. Growth itself is
the same pad + re-shard the ZeRO-2 DP path uses (grow_capacity +
pad_opt_state + shard_state re-layout).

Moment surgery composes for free: `trainer.zero_moment_rows` is elementwise
over [cap, ...] rows and the returned reset_mask is sharded like the rows it
masks, so plain jit propagates the sharding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from langsplat_tpu.train.densify import DensifyResult, DensifyStats, densify_core


def make_sharded_densify(mesh: Mesh, field_template, capacity: int,
                         axis: str = "gauss", *, extent: float,
                         grad_threshold: float = 0.0002,
                         percent_dense: float = 0.01,
                         min_opacity: float = 0.005,
                         use_size_threshold: bool = False,
                         size_threshold: float = 20.0):
    """Build a jitted sharded densify: (field, stats, key) -> DensifyResult.

    `field_template` fixes the field pytree structure for the sharding specs
    (language_feature present or not). field/stats/reset_mask shard over
    `axis`; overflow and num_alive are psum'd scalars."""
    from langsplat_tpu.parallel.gauss_sharded import capacity_specs

    ndev = mesh.shape[axis]
    if capacity % ndev:
        raise ValueError(f"capacity {capacity} must divide by the {axis} axis "
                         f"size {ndev}")
    core = functools.partial(
        densify_core, extent=extent, grad_threshold=grad_threshold,
        percent_dense=percent_dense, min_opacity=min_opacity,
        use_size_threshold=use_size_threshold, size_threshold=size_threshold)

    def shard_fn(field, stats, noise):
        res = core(field, stats, noise)
        return DensifyResult(
            field=res.field, stats=res.stats, reset_mask=res.reset_mask,
            overflow=jax.lax.psum(res.overflow, axis),
            num_alive=jax.lax.psum(res.num_alive, axis))

    field_specs = capacity_specs(field_template, capacity, axis)
    stats_specs = capacity_specs(DensifyStats.zeros(capacity), capacity, axis)
    mapped = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(field_specs, stats_specs, P(axis)),
        out_specs=DensifyResult(field=field_specs, stats=stats_specs,
                                reset_mask=P(axis), overflow=P(),
                                num_alive=P()),
        check_vma=False))

    def call(field, stats, key) -> DensifyResult:
        noise = jax.random.normal(key, (capacity, 2, 3), field.xyz.dtype)
        return mapped(field, stats, noise)

    return call
