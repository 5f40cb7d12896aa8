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


#: widest per-Gaussian tile cap the bitmask cull supports (uint32 words x 4);
#: beyond this bin_gaussians falls back to uncculled rect binning
MAX_CULL_TMAX = 128


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("gauss_id", "tile_id", "tile_start", "num_instances",
                                "dropped", "rect_dropped", "presort_slot",
                                "gauss_offsets"),
                   meta_fields=("max_tiles",))
@dataclasses.dataclass(frozen=True)
class InstanceBuffer:
    """Depth-and-tile-sorted Gaussian instances (all static `budget`-sized)."""
    gauss_id: jnp.ndarray    # [budget] int32 index into the Gaussian axis (N for padding)
    tile_id: jnp.ndarray     # [budget] int32 sorted tile ids (num_tiles for padding)
    tile_start: jnp.ndarray  # [num_tiles + 1] int32 range starts into the sorted arrays
    num_instances: jnp.ndarray  # [] int32 valid instance count
    dropped: jnp.ndarray     # [] int32 instances lost to the BUDGET cap (fix: larger
                             # budget)
    rect_dropped: jnp.ndarray  # [] int32 tile positions lost to the max_tiles cap on
                             # huge rects (fix: larger max_tiles_per_gaussian — a
                             # bigger budget can never recover these)
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


def _low_bits(count: jnp.ndarray) -> jnp.ndarray:
    """uint32 mask with the low `count` bits set, count in [0, 32]."""
    c = count.astype(jnp.uint32)
    full = jnp.uint32(0xFFFFFFFF)
    return jnp.where(count >= 32, full,
                     (jnp.uint32(1) << jnp.minimum(c, jnp.uint32(31)))
                     - jnp.uint32(1))


def tile_pass_mask(prep: PreprocessOut, *, tile_size: int, tmax: int,
                   opacities: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-Gaussian uint32 bitmask [N, ceil(tmax/32)] over its (clipped) tile rect,
    row-major: bit j of word j//32 set iff tile j can receive alpha >= ALPHA_EPS
    from this Gaussian somewhere in the tile.

    Conservative ellipse-vs-tile test: the blend kernel's keep mask already zeroes
    instances whose alpha falls below ALPHA_EPS (1/255) at every pixel
    (rasterize_pallas._chunk_alpha), so culling a tile where the MINIMUM of the conic
    quadratic Q(d) = 0.5(a dx^2 + c dy^2) + b dx dy over the tile's pixel box exceeds
    -log(ALPHA_EPS) (with opacity bounded by 1: alpha <= exp(-Q)) leaves the rendered
    image and every gradient BITWISE identical while shrinking the instance stream —
    the CUDA reference bins the full radius bbox (getRect [inferred, N3]), which keeps
    every corner tile the ellipse never touches. Rects larger than `tmax` positions
    fall back to all-ones (no culling) — only their first tmax tiles bin anyway.
    """
    from langsplat_tpu.ops.rasterize_reference import ALPHA_EPS
    import math

    # alpha <= opa * exp(-Q): with opacities given the threshold tightens
    # per-Gaussian to Q > log(opa/ALPHA_EPS) — low-opacity Gaussians (fresh
    # inits, post-opacity-reset phases) cull far more tiles, still exactly
    lam = -math.log(ALPHA_EPS)
    if opacities is not None:
        # exact for any opa > 0: alpha = opa*exp(-Q) < ALPHA_EPS iff
        # Q > log(opa / ALPHA_EPS); no clamp — unactivated opacities > 1
        # simply widen the threshold instead of silently over-culling
        lam = lam + jnp.log(jnp.maximum(opacities, 1e-12))[:, None]
    ts = float(tile_size)
    minx = prep.tiles_min[:, 0:1].astype(jnp.float32)        # [N, 1]
    miny = prep.tiles_min[:, 1:2].astype(jnp.float32)
    w = jnp.maximum(prep.tiles_max[:, 0:1] - prep.tiles_min[:, 0:1], 1)
    h = jnp.maximum(prep.tiles_max[:, 1:2] - prep.tiles_min[:, 1:2], 1)
    rect = w * h                                             # [N, 1]
    j = jnp.arange(tmax, dtype=jnp.int32)[None, :]           # [1, tmax]
    tx = minx + (j % w).astype(jnp.float32)
    ty = miny + (j // w).astype(jnp.float32)
    mx = prep.means2d[:, 0:1]
    my = prep.means2d[:, 1:2]
    ca = prep.conics[:, 0:1]
    cb = prep.conics[:, 1:2]
    cc = prep.conics[:, 2:3]
    # pixel-center box of tile (tx, ty), relative to the mean
    x0 = tx * ts - mx
    x1 = x0 + (ts - 1.0)
    y0 = ty * ts - my
    y1 = y0 + (ts - 1.0)
    inside = (x0 <= 0.0) & (0.0 <= x1) & (y0 <= 0.0) & (0.0 <= y1)

    def q(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    ca_s = jnp.maximum(ca, 1e-12)
    cc_s = jnp.maximum(cc, 1e-12)

    def edge_x(dxf):   # dx fixed, dy free in [y0, y1]
        return q(dxf, jnp.clip(-cb * dxf / cc_s, y0, y1))

    def edge_y(dyf):   # dy fixed, dx free in [x0, x1]
        return q(jnp.clip(-cb * dyf / ca_s, x0, x1), dyf)

    qmin = jnp.minimum(jnp.minimum(edge_x(x0), edge_x(x1)),
                       jnp.minimum(edge_y(y0), edge_y(y1)))
    qmin = jnp.where(inside, 0.0, qmin)
    passing = (j < rect) & (qmin <= lam) & prep.visible[:, None]
    words = (tmax + 31) // 32
    bit = jnp.uint32(1) << (j % 32).astype(jnp.uint32)
    bits = jnp.stack(
        [jnp.sum(jnp.where(passing[:, 32 * w:32 * (w + 1)],
                           bit[:, 32 * w:32 * (w + 1)], jnp.uint32(0)),
                 axis=1, dtype=jnp.uint32) for w in range(words)], axis=1)
    # huge rects (> tmax candidate positions): no per-tile culling, first tmax tiles
    # bin — unless lam < 0 (opacity below ALPHA_EPS: alpha <= opa < eps EVERYWHERE,
    # since Q >= 0), which culls the Gaussian outright
    any_alpha = (jnp.asarray(lam) >= 0.0)
    if any_alpha.ndim:
        any_alpha = any_alpha[:, 0]
    capped = jnp.minimum(rect[:, 0], tmax)
    full = jnp.stack(
        [jnp.where(prep.visible & any_alpha,
                   _low_bits(jnp.clip(capped - 32 * w, 0, 32)), jnp.uint32(0))
         for w in range(words)], axis=1)
    return jnp.where(rect[:, 0:1] > tmax, full, bits)


def instance_counts(prep: PreprocessOut, *, tile_size: int | None, tmax: int,
                    cull: bool = True,
                    opacities: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-Gaussian instance count a bin_gaussians call would produce (same policy)."""
    w = prep.tiles_max[:, 0] - prep.tiles_min[:, 0]
    h = prep.tiles_max[:, 1] - prep.tiles_min[:, 1]
    full_count = jnp.where(prep.visible, w * h, 0)
    # mirror bin_gaussians' gate exactly: the bitmask cull only runs for
    # tmax <= MAX_CULL_TMAX (the uint32-word budget) — a wider tmax falls back
    # to the min(full_count, tmax) policy in both places, keeping this probe a
    # faithful predictor of the binning's instance production
    if cull and tile_size is not None and tmax <= MAX_CULL_TMAX:
        mask = tile_pass_mask(prep, tile_size=tile_size, tmax=tmax,
                              opacities=opacities)
        return jnp.sum(jax.lax.population_count(mask), axis=1).astype(jnp.int32)
    return jnp.minimum(full_count, tmax)


def _select_bit(mask: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Index of the (k+1)-th set bit of uint32 `mask` (undefined if popcount <= k)."""
    m = mask
    r = jnp.zeros_like(k)
    for b in (16, 8, 4, 2, 1):
        low = m & ((jnp.uint32(1) << b) - jnp.uint32(1))
        c = jax.lax.population_count(low).astype(k.dtype)
        go = k >= c
        k = jnp.where(go, k - c, k)
        m = jnp.where(go, m >> b, low)
        r = r + jnp.where(go, b, 0)
    return r


def _select_bit_words(words: list[jnp.ndarray], k: jnp.ndarray) -> jnp.ndarray:
    """Index of the (k+1)-th set bit across a little-endian uint32 word list
    (undefined if the total popcount <= k). Static loop over the few words."""
    if len(words) == 1:
        return _select_bit(words[0], k)
    r = jnp.zeros_like(k)
    done = jnp.zeros(k.shape, bool)
    for w, m in enumerate(words):
        c = jax.lax.population_count(m).astype(k.dtype)
        here = (~done) & (k < c)
        r = jnp.where(here, 32 * w + _select_bit(m, jnp.maximum(k, 0)), r)
        done = done | here
        k = k - c
    return r


def bin_gaussians(prep: PreprocessOut, *, grid_x: int, grid_y: int, budget: int,
                  max_tiles_per_gaussian: int = 32, tile_size: int | None = None,
                  cull: bool = True,
                  opacities: jnp.ndarray | None = None) -> InstanceBuffer:
    """Build the sorted instance buffer from preprocess output. All shapes static.

    Instance construction is propagation-based: every per-Gaussian quantity a slot
    needs (segment id, segment start, rect width/corner, depth rank, tile pass mask)
    is broadcast to the budget axis with ONE batched scatter+cumsum
    (`propagate_to_segments`) instead of budget-sized random gathers — gathers
    measured ~10 ns/element on v5e, making 4-5 of them ~60 ms at 1.2M slots, vs
    ~10 ms for the whole propagated construction.

    With `tile_size` given (and cull=True), tiles the Gaussian's ellipse provably
    cannot touch at alpha >= 1/255 are culled per `tile_pass_mask` — bitwise
    identical output, 25-40% fewer instances than the reference's radius bbox.
    """
    n = prep.means2d.shape[0]
    num_tiles = grid_x * grid_y
    tmax = max_tiles_per_gaussian

    w = prep.tiles_max[:, 0] - prep.tiles_min[:, 0]
    h = prep.tiles_max[:, 1] - prep.tiles_min[:, 1]
    full_count = jnp.where(prep.visible, w * h, 0)
    culling = cull and tile_size is not None and tmax <= MAX_CULL_TMAX
    mask_words = (tmax + 31) // 32
    if culling:
        mask = tile_pass_mask(prep, tile_size=tile_size, tmax=tmax,
                              opacities=opacities)
        count = jnp.sum(jax.lax.population_count(mask), axis=1).astype(jnp.int32)
        # tiles culled inside the rect are provably zero-contribution, NOT dropped;
        # the unexamined tail of huge rects stays conservatively counted as dropped
        # — EXCEPT for Gaussians whose opacity is below ALPHA_EPS (any_alpha false
        # in tile_pass_mask: alpha <= opa < eps everywhere since Q >= 0, mask is
        # all-zero, contribution provably zero). Counting their tail would let one
        # near-dead huge splat ratchet TmaxPolicy toward the grid cap through
        # discarded steps/recompiles for nothing.
        if opacities is not None:
            from langsplat_tpu.ops.rasterize_reference import ALPHA_EPS
            import math
            # identical predicate to tile_pass_mask's any_alpha (same formula, so
            # the two stay bitwise consistent at the threshold)
            lam0 = -math.log(ALPHA_EPS) + jnp.log(
                jnp.maximum(opacities.reshape(-1), 1e-12))
            any_alpha = lam0 >= 0.0
        else:
            any_alpha = jnp.ones((n,), bool)
        rect_dropped = jnp.sum(
            jnp.where((full_count > tmax) & any_alpha, full_count - tmax, 0))
    else:
        count = jnp.minimum(full_count, tmax)
        rect_dropped = jnp.sum(full_count - count)
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
        # (and the CUDA radix sort) so blend order is deterministic under ties.
        # rank = inverse permutation of by_depth, via a SECOND 2-row sort rather
        # than rank.at[by_depth].set(iota): a 1M random scatter-set costs ~6.5 ns
        # per index on v5e while the equivalent sort runs ~2x faster
        # (scripts/micro_binning.py: rank_scatter 7.3 ms vs rank_sort 3.25 ms)
        iota = jnp.arange(n, dtype=jnp.int32)
        depth_keys = jnp.where(prep.visible, prep.depths, jnp.inf)
        _, by_depth = jax.lax.sort((depth_keys, iota), num_keys=1, is_stable=True)
        _, rank = jax.lax.sort((by_depth, iota), num_keys=1, is_stable=False)
    else:
        rank = jnp.zeros((n,), jnp.int32)

    seg = jnp.arange(1, n + 1, dtype=jnp.int32)
    # the propagate's cost is dominated by its budget-sized random gather, which
    # pays per gathered ELEMENT (rows x indices), so the three small geometry
    # fields (rect corner + width) ride in ONE bit-packed row when they fit i32
    bx = grid_x.bit_length()   # tiles_min clips to [0, grid] INCLUSIVE
    by = grid_y.bit_length()
    bw = grid_x.bit_length()   # w = max(tiles_max - tiles_min, 1) <= grid_x
    geom_packed = bx + by + bw <= 31
    wclip = jnp.maximum(w, 1)
    if geom_packed:
        geom = (prep.tiles_min[:, 0] | (prep.tiles_min[:, 1] << bx)
                | (wclip << (bx + by)))
        rows = [seg, offsets, geom, rank]
    else:
        rows = [seg, offsets, wclip,
                prep.tiles_min[:, 0], prep.tiles_min[:, 1], rank]
    nbase = len(rows)
    if culling:
        rows.extend(jax.lax.bitcast_convert_type(mask[:, wd], jnp.int32)
                    for wd in range(mask_words))
    acc = propagate_to_segments(offsets, jnp.stack(rows, axis=0), budget)

    slot = jnp.arange(budget, dtype=jnp.int32)
    in_range = slot < total
    g = jnp.clip(acc[0] - 1, 0, n - 1)
    if culling:
        # j-th set bit of the pass mask = this slot's rect position
        j = _select_bit_words(
            [jax.lax.bitcast_convert_type(acc[nbase + wd], jnp.uint32)
             for wd in range(mask_words)],
            jnp.maximum(slot - acc[1], 0))
    else:
        j = slot - acc[1]
    if geom_packed:
        a_minx = acc[2] & ((1 << bx) - 1)
        a_miny = (acc[2] >> bx) & ((1 << by) - 1)
        a_w = acc[2] >> (bx + by)
        rank_prop = acc[3]
    else:
        a_w, a_minx, a_miny, rank_prop = acc[2], acc[3], acc[4], acc[5]
    tx = a_minx + j % a_w
    ty = a_miny + j // a_w
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
        fused = (tile_of_slot.astype(jnp.uint32) << rank_bits) | rank_prop.astype(
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
    gauss_offsets = jnp.concatenate([offsets, total[None].astype(jnp.int32)])
    return InstanceBuffer(
        gauss_id=sorted_gid,
        tile_id=sorted_tile,
        tile_start=tile_start,
        num_instances=num_valid.astype(jnp.int32),
        dropped=jnp.maximum(total - budget, 0).astype(jnp.int32),
        rect_dropped=rect_dropped.astype(jnp.int32),
        presort_slot=sorted_presort,
        gauss_offsets=gauss_offsets,
        max_tiles=tmax,
    )
