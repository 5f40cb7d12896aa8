"""Tile binning: duplicate visible Gaussians per touched tile, order by (tile, depth),
compute per-tile contiguous ranges.

TPU-native replacement for the reference's `duplicateWithKeys` + cub radix sort +
`identifyTileRanges` stage (component N3 in SURVEY.md §2.1). Differences by design:

  - static shapes: instances live in a fixed `budget`-sized array (padded capacity), each
    Gaussian contributing at most `max_tiles_per_gaussian` instances; overflow is counted
    and reported (`InstanceBuffer.dropped`) instead of reallocating like the CUDA path;
  - the 64-bit [tileID|depth] radix key becomes a stable two-key `lax.sort`
    (tile_id int32 primary, view depth f32 secondary) carrying the Gaussian index;
  - tile ranges come from `searchsorted` on the sorted tile ids.

Everything here is index bookkeeping: wrap calls in `stop_gradient` territory (no useful
gradients flow through binning; gradients flow through the gathered values downstream).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from langsplat_tpu.ops.projection import PreprocessOut


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("gauss_id", "tile_id", "tile_start", "num_instances",
                                "dropped", "presort_slot", "gauss_offsets"),
                   meta_fields=("max_tiles",))
@dataclasses.dataclass(frozen=True)
class InstanceBuffer:
    """Depth-and-tile-sorted Gaussian instances (all static `budget`-sized)."""
    gauss_id: jnp.ndarray    # [budget] int32 index into the Gaussian axis (N for padding)
    tile_id: jnp.ndarray     # [budget] int32 sorted tile ids (num_tiles for padding)
    tile_start: jnp.ndarray  # [num_tiles + 1] int32 range starts into the sorted arrays
    num_instances: jnp.ndarray  # [] int32 valid instance count
    dropped: jnp.ndarray     # [] int32 instances lost to budget/max-tiles overflow
    presort_slot: jnp.ndarray   # [budget] int32 compacted pre-sort slot (gaussian-major)
    gauss_offsets: jnp.ndarray  # [N + 1] int32 pre-sort slot range per Gaussian
    max_tiles: int = 32      # static: the stride of presort_slot


def segment_ids_from_offsets(offsets: jnp.ndarray, size: int) -> jnp.ndarray:
    """For monotone `offsets` [S] (segment starts into [0, size)), return per-position
    segment ids: out[p] = largest s with offsets[s] <= p (clipped to 0 below offsets[0]).

    Scatter-SET the segment index at each segment start + an inclusive cummax —
    O(size) with no combining scatter: XLA scatter-add/mul combiners measured
    ~8 ns/element on TPU while scatter-set runs at ~0.1 (and searchsorted's binary
    search ~100x worse still). Duplicate offsets (empty segments) are resolved on
    the small S axis first — only the LAST segment at a given start writes — so the
    set never sees duplicate indices (whose XLA ordering is unspecified).
    """
    s = offsets.shape[0]
    is_last = jnp.concatenate([offsets[1:] != offsets[:-1],
                               jnp.ones((1,), bool)])
    dst = jnp.where(is_last, offsets, size)  # non-last duplicates dropped
    marks = jnp.full((size,), -1, jnp.int32).at[dst].set(
        jnp.arange(s, dtype=jnp.int32), mode="drop")
    return jnp.clip(jax.lax.cummax(marks), 0, s - 1)


def propagate_to_segments(offsets: jnp.ndarray, values: jnp.ndarray,
                          size: int) -> jnp.ndarray:
    """Broadcast per-segment int values to every position of the segment.

    `offsets` [S] are monotone segment starts into [0, size); `values` [C, S] int32.
    Returns [C, size] where out[c, p] = values[c, s(p)] with s(p) the covering segment.
    One batched scatter of first-order deltas + one batched cumsum. The scatter is a
    SET, not an ADD: TPU combining scatters cost ~50 ns per index while set-scatters
    and cumsum passes are bandwidth-bound (~10 ms vs ~1.5 ms at S=200k, B=1.2M, C=6
    on v5e) — so duplicate offsets (empty segments), which the add-combiner used to
    telescope implicitly, are pre-resolved on the small S axis: only the LAST segment
    at a given start writes, and its delta is taken against the previous WRITTEN
    segment's value. Positions before offsets[0] get 0, and every covered position
    gets the covering (last-duplicate) segment's value — gather semantics.
    """
    c, s = values.shape
    if s <= 16384:
        # small S: combining-scatter cost (~50 ns per INDEX on v5e) is negligible;
        # the delta formulation avoids the big-axis gather entirely (~0.4 ms vs
        # ~7.5 ms for the gather path at S=3k, B=1.2M — single-sublane gather
        # outputs tile badly)
        deltas = values - jnp.concatenate(
            [jnp.zeros((c, 1), values.dtype), values[:, :-1]], axis=1)
        grid = jnp.zeros((c, size), values.dtype).at[:, offsets].add(
            deltas, mode="drop")
        return jnp.cumsum(grid, axis=1)
    # large S: one set-scatter + cummax for segment ids, then row gathers
    # (~2.3 ms vs ~11 ms for the delta-add at S=200k, B=1.2M, C=6 on v5e)
    seg = segment_ids_from_offsets(offsets, size)
    return values[:, seg]


def bin_gaussians(prep: PreprocessOut, *, grid_x: int, grid_y: int, budget: int,
                  max_tiles_per_gaussian: int = 32) -> InstanceBuffer:
    """Build the sorted instance buffer from preprocess output. All shapes static.

    Instance construction is propagation-based: every per-Gaussian quantity a slot
    needs (segment id, segment start, rect width/corner, depth rank) is broadcast to
    the budget axis with ONE batched scatter+cumsum (`propagate_to_segments`) instead
    of budget-sized random gathers — gathers measured ~10 ns/element on v5e, making
    4-5 of them ~60 ms at 1.2M slots, vs ~10 ms for the whole propagated construction.
    """
    n = prep.means2d.shape[0]
    num_tiles = grid_x * grid_y
    tmax = max_tiles_per_gaussian

    w = prep.tiles_max[:, 0] - prep.tiles_min[:, 0]
    h = prep.tiles_max[:, 1] - prep.tiles_min[:, 1]
    full_count = jnp.where(prep.visible, w * h, 0)
    count = jnp.minimum(full_count, tmax)
    offsets = (jnp.cumsum(count) - count).astype(jnp.int32)  # exclusive
    total = offsets[-1] + count[-1]

    rank_bits = max(1, (n - 1).bit_length())
    tile_bits = (num_tiles).bit_length()  # must hold the num_tiles padding sentinel
    fused_path = rank_bits + tile_bits <= 32
    if fused_path:
        # depth order is encoded by ranking the per-Gaussian depths once (N-sort,
        # much smaller than the instance sort), so the instance sort needs just one
        # 32-bit [tile | rank] key
        # stable: equal depths tie-break by Gaussian index, matching the dense oracle
        # (and the CUDA radix sort) so blend order is deterministic under ties
        depth_keys = jnp.where(prep.visible, prep.depths, jnp.inf)
        _, by_depth = jax.lax.sort((depth_keys, jnp.arange(n, dtype=jnp.int32)),
                                   num_keys=1, is_stable=True)
        rank = jnp.zeros((n,), jnp.int32).at[by_depth].set(
            jnp.arange(n, dtype=jnp.int32))
    else:
        rank = jnp.zeros((n,), jnp.int32)

    seg = jnp.arange(1, n + 1, dtype=jnp.int32)
    vals = jnp.stack([seg, offsets, jnp.maximum(w, 1),
                      prep.tiles_min[:, 0], prep.tiles_min[:, 1], rank], axis=0)
    acc = propagate_to_segments(offsets, vals, budget)

    slot = jnp.arange(budget, dtype=jnp.int32)
    in_range = slot < total
    g = jnp.clip(acc[0] - 1, 0, n - 1)
    j = slot - acc[1]
    tx = acc[3] + j % acc[2]
    ty = acc[4] + j // acc[2]
    tile_of_slot = jnp.where(in_range, ty * grid_x + tx, num_tiles)
    vals_gid = jnp.where(in_range, g, n)

    # pre-sort slot (gaussian-major compacted id): instances of one Gaussian are
    # contiguous in this order, which the packing-gather VJP exploits to reduce
    # gradients with a permute + cumsum + offset-diff instead of a scatter-add
    presort = jnp.where(in_range, slot, budget)

    if fused_path:
        # one fused u32 key; the two payloads ride the sort — carrying values through
        # lax.sort is cheap on TPU, while recomputing them from the sorted key would
        # need budget-sized random gathers. Keys are unique (one rank per Gaussian,
        # one tile per instance) so the sort may be unstable.
        fused = (tile_of_slot.astype(jnp.uint32) << rank_bits) | acc[5].astype(
            jnp.uint32)
        pad_key = jnp.uint32(num_tiles) << rank_bits
        fused = jnp.where(in_range, fused, pad_key)
        sorted_fused, sorted_gid, sorted_presort = jax.lax.sort(
            (fused, vals_gid, presort), num_keys=1, is_stable=False)
        sorted_tile = (sorted_fused >> rank_bits).astype(jnp.int32)
    else:
        keys_depth = jnp.where(in_range, prep.depths[g], jnp.inf)
        sorted_tile, _, sorted_gid, sorted_presort = jax.lax.sort(
            (tile_of_slot, keys_depth, vals_gid, presort), num_keys=2)

    tile_start = jnp.searchsorted(sorted_tile,
                                  jnp.arange(num_tiles + 1, dtype=jnp.int32),
                                  method="scan_unrolled").astype(jnp.int32)

    num_valid = jnp.minimum(total, budget)
    dropped = (jnp.sum(full_count - count)
               + jnp.maximum(total - budget, 0)).astype(jnp.int32)
    gauss_offsets = jnp.concatenate([offsets, total[None].astype(jnp.int32)])
    return InstanceBuffer(
        gauss_id=sorted_gid,
        tile_id=sorted_tile,
        tile_start=tile_start,
        num_instances=num_valid.astype(jnp.int32),
        dropped=dropped,
        presort_slot=sorted_presort,
        gauss_offsets=gauss_offsets,
        max_tiles=tmax,
    )
