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

from typing import NamedTuple

import jax
import jax.numpy as jnp

from langsplat_tpu.ops.projection import PreprocessOut


class InstanceBuffer(NamedTuple):
    """Depth-and-tile-sorted Gaussian instances (all static `budget`-sized)."""
    gauss_id: jnp.ndarray    # [budget] int32 index into the Gaussian axis (N for padding)
    tile_id: jnp.ndarray     # [budget] int32 sorted tile ids (num_tiles for padding)
    tile_start: jnp.ndarray  # [num_tiles + 1] int32 range starts into the sorted arrays
    num_instances: jnp.ndarray  # [] int32 valid instance count
    dropped: jnp.ndarray     # [] int32 instances lost to budget/max-tiles overflow


def bin_gaussians(prep: PreprocessOut, *, grid_x: int, grid_y: int, budget: int,
                  max_tiles_per_gaussian: int = 32) -> InstanceBuffer:
    """Build the sorted instance buffer from preprocess output. All shapes static."""
    n = prep.means2d.shape[0]
    num_tiles = grid_x * grid_y
    tmax = max_tiles_per_gaussian

    w = prep.tiles_max[:, 0] - prep.tiles_min[:, 0]
    h = prep.tiles_max[:, 1] - prep.tiles_min[:, 1]
    full_count = jnp.where(prep.visible, w * h, 0)
    count = jnp.minimum(full_count, tmax)
    offsets = jnp.cumsum(count) - count  # exclusive
    total = offsets[-1] + count[-1]

    j = jnp.arange(tmax, dtype=jnp.int32)[None, :]           # [1, tmax]
    w_safe = jnp.maximum(w, 1)[:, None]
    tx = prep.tiles_min[:, 0:1] + j % w_safe
    ty = prep.tiles_min[:, 1:2] + j // w_safe
    valid = j < count[:, None]
    tile_id = jnp.where(valid, ty * grid_x + tx, num_tiles)
    slot = jnp.where(valid, offsets[:, None] + j, budget)     # OOB -> dropped

    depth = jnp.broadcast_to(prep.depths[:, None], (n, tmax))
    gid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, tmax))

    flat_slot = slot.reshape(-1)
    keys_tile = jnp.full((budget,), num_tiles, jnp.int32).at[flat_slot].set(
        tile_id.reshape(-1), mode="drop")
    keys_depth = jnp.full((budget,), jnp.inf, depth.dtype).at[flat_slot].set(
        depth.reshape(-1), mode="drop")
    vals_gid = jnp.full((budget,), n, jnp.int32).at[flat_slot].set(
        gid.reshape(-1), mode="drop")

    sorted_tile, _, sorted_gid = jax.lax.sort(
        (keys_tile, keys_depth, vals_gid), num_keys=2)

    tile_start = jnp.searchsorted(sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
                                  method="scan_unrolled").astype(jnp.int32)

    num_valid = jnp.minimum(total, budget)
    dropped = (jnp.sum(full_count - count) + jnp.maximum(total - budget, 0)).astype(jnp.int32)
    return InstanceBuffer(
        gauss_id=sorted_gid,
        tile_id=sorted_tile,
        tile_start=tile_start,
        num_instances=num_valid.astype(jnp.int32),
        dropped=dropped,
    )
