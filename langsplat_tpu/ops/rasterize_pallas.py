"""Pallas TPU blend kernels (forward + backward) with a custom VJP.

TPU-native replacement for the reference's `renderCUDA` forward/backward blend (component
N4 in SURVEY.md §2.1; contract `/root/reference/gaussian_renderer/__init__.py:96-105`),
re-designed for the TPU memory/compute model rather than translated:

  - one grid program per image tile; the tile's (depth-sorted) instance list streams from
    HBM in fixed `chunk`-sized pieces over an async-DMA loop;
  - instances are packed OUTSIDE the kernel into a lane-aligned layout
    (`pack_instances`): every tile range starts at a multiple of the lane tiling
    (`align`, 128) and pads to it with zero-opacity slots, so every DMA offset is
    aligned; the fwd/bwd chunk sizes are larger multiples of 128 chosen for latency
    amortization (each chunk body costs ~2us of serial scalar/MXU latency on v5e),
    and the final partial chunk of a tile masks out-of-range lanes in-kernel;
  - per-chunk alpha evaluation is vectorized [pixels, chunk] VPU work; the front-to-back
    transmittance is a lane-wise log-shift cumulative product (7 roll-multiply steps for
    chunk=128), NOT a sequential per-Gaussian loop;
  - the color/feature accumulation contracts the chunk axis on the MXU; image blocks are
    [pixels, channels] so no in-kernel transposes are needed anywhere;
  - early exit: per-pixel `done` latches once transmittance would fall below 1e-4 (the
    CUDA termination rule), and the chunk loop stops when every pixel is done;
  - backward is a single second forward-direction pass (no back-to-front traversal, no
    atomics): with Total[p] = sum_ch g_ch*out_ch[p] precomputed from the forward
    residuals, the suffix sums the CUDA kernel accumulates backwards become
    S_i = Total - Prefix_i, where Prefix is a lane-wise cumulative sum. Per-instance
    gradients are written to disjoint slices (each instance belongs to exactly one tile)
    — bitwise deterministic, unlike the CUDA atomic adds (SURVEY.md §5 race detection).

Gradients for Gaussian parameters then flow through the (autodiff'd) packing gather as a
deterministic scatter-add, and further through the jnp preprocess stage.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from langsplat_tpu.ops.projection import PreprocessOut
from langsplat_tpu.ops.rasterize_reference import ALPHA_EPS, ALPHA_MAX, TERM_EPS
from langsplat_tpu.ops.tiles import InstanceBuffer

# Packed per-instance row layout (D_BASE rows + F feature rows, padded to sublane multiple)
ROW_MX, ROW_MY, ROW_CA, ROW_CB, ROW_CC, ROW_OPA, ROW_R, ROW_G, ROW_B = range(9)
D_BASE = 9

# MXU precision for every in-kernel matmul. Mosaic supports only DEFAULT and
# HIGHEST inside Pallas kernels; HIGHEST keeps the blend image and gradients
# f32-faithful (the accumulation/gradient matmuls previously ran at DEFAULT —
# single-pass bf16 on real TPU, ~1e-3 relative; CPU interpret tests never saw
# that error because CPU ignores precision). Measured cost of HIGHEST vs the
# old mixed setting: see scripts/micro_precision.py.
MM_PRECISION = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class BlendSpec(NamedTuple):
    """Static geometry of one blend call."""
    grid_x: int
    grid_y: int
    tile_size: int
    chunk: int             # bwd DMA/compute granularity
    num_feat: int          # F language channels (0 => RGB only)
    aligned_budget: int    # padded instance capacity (multiple of align)
    fwd_mult: int = 1      # fwd chunk = fwd_mult * chunk. With lane-fused members
                           # (NMEMB) amortizing per-issue costs, fwd_mult=1 wins:
                           # the triangular cumsum's FLOPs scale with the chunk
                           # width, so the smallest chunk minimizes MXU work
                           # (measured v5e: fwd 11.2 ms @ mult 1 vs 12.7 @ 2)
    align: int = 128       # per-tile ranges are padded to multiples of this ONLY
                           # (decoupled from the chunk sizes: each tile's final
                           # partial chunk masks out-of-range lanes in-kernel, so
                           # alignment padding stays at one lane-tile per tile
                           # instead of one full fwd chunk)
    grad_mode: str = "full"  # "full" | "feature": the feature training phase
                           # (3 of the reference's 4 phases) only needs
                           # d(language_feature) — the backward then skips the
                           # dalpha/moment machinery and reduces only the
                           # feature rows
    # (Removed r05: fwd_super/bwd_super read-DMA batching. Measured on the
    # uncontended chip at bench scale they LOSE at the fwd_mult=1 default
    # (mult1 6.04 M px/s vs mult1+bsup2 5.99, mult1+fsup2 5.97) and are a
    # wash at mult2 — the round-4 "mult1 5.78 M" that motivated them was a
    # contaminated measurement. Bitwise parity WAS proven interpret+compiled
    # before deletion (verify_super_compiled.py at 7776f7a); see
    # docs/ROOFLINE.md round-5 notes.)
    grad_precision: str = "exact"  # "exact" | "bf16": bf16 runs every backward-
                           # kernel matmul at DEFAULT (single-pass bf16) — the
                           # rendered image stays exact, gradients pick up
                           # ~3-6e-3 relative error (micro_precision.py).
                           # "exact" keeps f32-faithful gradients; its cumsums
                           # already use the 2-pass bf16 hi/lo split (bitwise
                           # equal to the HIGHEST decomposition), so bf16 only
                           # buys the small per-member contraction matmuls
                           # (~3 ms of the bwd kernel at bench scale).

    @property
    def fwd_chunk(self) -> int:
        return self.chunk * self.fwd_mult

    @property
    def num_tiles(self) -> int:
        return self.grid_x * self.grid_y

    def padded_tiles(self, nmemb: int) -> int:
        """Tile count padded to a multiple of the per-grid-step member count."""
        return _round_up(self.num_tiles, nmemb)

    @property
    def pixels(self) -> int:
        return self.tile_size * self.tile_size

    @property
    def rows(self) -> int:  # packed rows, sublane-aligned
        return _round_up(D_BASE + self.num_feat, 8)

    @property
    def blend_channels(self) -> int:  # rgb + language features
        return 3 + self.num_feat

    @property
    def out_channels(self) -> int:  # blend channels + transmittance, lane-friendly pad
        return _round_up(self.blend_channels + 1, 8)


def make_blend_spec(*, image_height: int, image_width: int, tile_size: int, chunk: int,
                    num_feat: int, budget: int, interpret: bool = False,
                    fwd_mult: int = 1, align: int | None = None,
                    grad_mode: str = "full",
                    grad_precision: str = "exact") -> BlendSpec:
    if chunk <= 0:
        raise ValueError(f"chunk must be positive, got {chunk}")
    if chunk % 128 != 0 and not interpret:
        # On real TPU every instance DMA slices the packed buffer on the lane axis at a
        # multiple of `align`; lane tiling is 128, so compiled mode requires alignment.
        # Interpret mode (CPU tests) has no lane tiling and may use small chunks.
        raise ValueError(f"chunk must be a multiple of 128 (lane tiling of the aligned "
                         f"instance DMA), got {chunk}")
    if fwd_mult < 1:
        raise ValueError(f"fwd_mult must be >= 1, got {fwd_mult}")
    gx = -(-image_width // tile_size)
    gy = -(-image_height // tile_size)
    if align is None:
        align = min(chunk, 128) if not interpret else chunk
    if chunk % align != 0 or (chunk * fwd_mult) % align != 0:
        raise ValueError(f"chunk sizes must be multiples of align={align}")
    if align % 128 != 0 and not interpret:
        raise ValueError(f"align must be a multiple of 128 on TPU, got {align}")
    # worst case every tile has a partial align-quantum of padding; the global
    # tail gets one extra fwd window so a final partial-chunk DMA never reads
    # out of bounds
    aligned = (_round_up(budget + gx * gy * (align - 1), align)
               + chunk * fwd_mult - align)
    aligned = _round_up(aligned, align)
    if grad_mode not in ("full", "feature"):
        raise ValueError(f"grad_mode must be 'full' or 'feature', got {grad_mode}")
    if grad_precision not in ("exact", "bf16"):
        raise ValueError(f"grad_precision must be 'exact' or 'bf16', "
                         f"got {grad_precision}")
    if grad_mode == "feature" and num_feat == 0:
        raise ValueError("grad_mode='feature' requires language feature channels")
    return BlendSpec(grid_x=gx, grid_y=gy, tile_size=tile_size, chunk=chunk,
                     num_feat=num_feat, aligned_budget=aligned, fwd_mult=fwd_mult,
                     align=align, grad_mode=grad_mode,
                     grad_precision=grad_precision)


#: default reduction for the packing-gather backward: "segsum" (Pallas
#: double-buffered masked-matmul segment sum, ~4x the gather formulation at
#: bench sizes — scripts/micro_segsum.py) or "gather" (lane cumsum + one
#: boundary gather). Overridable per-process for A/B comparison.
BWD_REDUCE = __import__("os").environ.get("LANGSPLAT_BWD_REDUCE", "segsum")
if BWD_REDUCE not in ("segsum", "gather"):
    raise ValueError(
        f"LANGSPLAT_BWD_REDUCE must be 'segsum' or 'gather', got "
        f"{BWD_REDUCE!r} — a typo here would silently defeat an A/B comparison")

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gather_attrs(budget: int, grad_rows: tuple, reduce_cfg: tuple,
                  attrs, gid, poa, gauss_offsets):
    """attrs [rows, N+1] -> packed [rows, aligned_budget] by column gather.

    `poa` [aligned] maps each aligned slot to its pre-sort (gaussian-major) slot
    (budget for zero-opacity padding instances, aligned for alignment holes), built
    by the caller with one cheap 1-D scatter. Custom VJP: XLA's default backward for
    this gather is a scatter-ADD over every instance (~370 ms at 3M instances on
    v5e). A permute GATHER into pre-sort order through the statically-known inverse
    permutation was measured SLOWER than sorting (~47 ms vs ~22 ms at bench scale —
    a 12-row column gather does not amortize indices the way the forward pack
    gather does), so the backward sorts the cotangent columns by `poa` into
    pre-sort order, where each Gaussian's instances are contiguous, then reduces
    segments either with the Pallas `segment_sum_bounded` kernel
    (reduce_cfg=("segsum", interpret), the default — streams each block's
    contiguous short-segment span by DMA and contracts a one-hot membership mask
    on the MXU, ~4x the cumsum formulation at bench sizes) or with one cumsum +
    one boundary gather + adjacent diff (reduce_cfg=("gather", ...)). All paths
    are deterministic and exactly equal
    (tests/test_pallas_blend.py::test_segsum_backward_matches_gather).
    """
    del budget, grad_rows, reduce_cfg, poa, gauss_offsets
    return attrs[:, gid]


def _gather_attrs_fwd(budget, grad_rows, reduce_cfg, attrs, gid, poa,
                      gauss_offsets):
    return attrs[:, gid], (poa, gauss_offsets, attrs.shape)


def _gather_attrs_bwd(budget, grad_rows, reduce_cfg, res, g):
    import numpy as _np
    poa, gauss_offsets, attrs_shape = res
    rows, n1 = attrs_shape
    r0, rn = grad_rows            # static: only these cotangent rows are nonzero
    reduce_mode, interpret = reduce_cfg

    # permute-by-sort: real instances carry keys 0..total-1; zero-opacity padding
    # instances carry key=budget and alignment holes key=aligned, so positions
    # [total, budget) of the sorted result hold only all-zero gradient columns
    # (padding gradients vanish identically in the blend backward)
    def _presort(width):
        so = jax.lax.sort(
            (poa[:width],) + tuple(g[i][:width] for i in range(r0, r0 + rn)),
            num_keys=1, is_stable=False)
        return jnp.stack(so[1:], axis=0)[:, :budget]   # [rn, budget] presort

    a_len = poa.shape[0]
    cut = (1 << ((a_len - 1).bit_length() - 1)) if a_len > 1 else 0
    if cut >= budget:              # largest power of two < a_len
        # TPU sort cost jumps past each power-of-two column count (v5e, 13 rows:
        # 2^21 cols 9.9 ms vs aligned ~2.19M cols 15.2 ms — micro_sort_scaling).
        # The aligned capacity exceeds 2^21 only through WORST-CASE per-tile
        # alignment padding; the real live extent p_off[-1] almost always fits
        # below `cut`, in which case every tail column is a hole/padding
        # (key >= budget, identically-zero gradients) and sorting only the first
        # `cut` columns yields the bitwise-identical multiset of live columns.
        # The O(tail) min-reduction proves it; the rare overflow case falls back
        # to the full-width sort inside the cond.
        tail_dead = jnp.min(poa[cut:]) >= budget
        d_pre = jax.lax.cond(tail_dead,
                             lambda _: _presort(cut),
                             lambda _: _presort(a_len), None)
    else:
        d_pre = _presort(a_len)
    ends = jnp.clip(gauss_offsets, 0, budget)
    if reduce_mode == "segsum":
        from langsplat_tpu.ops.segsum_pallas import segment_sum_bounded
        seg = segment_sum_bounded(d_pre.astype(jnp.float32), ends, n1 - 1,
                                  interpret=interpret).astype(g.dtype)
    else:
        csum = jnp.concatenate([jnp.zeros((rn, 1), g.dtype),
                                jnp.cumsum(d_pre, axis=1)], axis=1)
        # ONE boundary gather (N+1 indices), then adjacent-column diff: gathers
        # cost ~20 ns per index on v5e regardless of layout, so gathering
        # ends[1:] and ends[:-1] separately (2N indices) doubles the dominant
        # cost for no reason
        c_at = csum[:, ends]                               # [rn, N + 1]
        seg = c_at[:, 1:] - c_at[:, :-1]                   # [rn, N]
    seg = jnp.concatenate([seg, jnp.zeros((rn, 1), g.dtype)], axis=1)
    if (r0, rn) == (0, rows):
        d_attrs = seg
    else:
        d_attrs = jnp.concatenate(
            [jnp.zeros((r0, n1), g.dtype), seg,
             jnp.zeros((rows - r0 - rn, n1), g.dtype)], axis=0)
    f0 = jax.dtypes.float0
    zero_gid = _np.zeros((g.shape[1],), f0)
    zero_poa = _np.zeros((poa.shape[0],), f0)
    zero_off = _np.zeros((n1,), f0)
    return d_attrs, zero_gid, zero_poa, zero_off


_gather_attrs.defvjp(_gather_attrs_fwd, _gather_attrs_bwd)


def pack_instances(prep: PreprocessOut, opacities: jnp.ndarray,
                   features: jnp.ndarray | None, inst: InstanceBuffer,
                   spec: BlendSpec,
                   means2d_override: jnp.ndarray | None = None,
                   interpret: bool = False,
                   bwd_reduce: str | None = None
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather per-Gaussian attributes into the chunk-aligned per-instance matrix.

    Returns (packed [rows, aligned_budget], aligned_start [num_tiles+1] int32).
    Differentiable in the attribute arguments (custom scatter-set backward).

    Layout construction is scatter-based: each sorted instance's aligned destination
    is `slot + (p_off[T] - tile_start[T])` with the per-tile base broadcast over the
    budget axis by one scatter+cumsum (`propagate_to_segments`); the gaussian-id map
    and the aligned->presort key map are then each ONE budget-sized 1-D scatter —
    cheaper than the gather formulation (segment ids + 3 aligned-size random gathers)
    by ~2x on v5e honest chained timing.
    """
    from langsplat_tpu.ops.tiles import propagate_to_segments

    n = prep.means2d.shape[0]
    chunk = spec.align
    budget = inst.gauss_id.shape[0]
    aligned = spec.aligned_budget
    counts = inst.tile_start[1:] - inst.tile_start[:-1]
    padded_counts = (counts + chunk - 1) // chunk * chunk
    p_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(padded_counts)]).astype(jnp.int32)

    # aligned destination of every sorted instance; the tail (sorted slots past the
    # last tile range, all padding) lands past p_off[-1], inside aligned capacity
    slot = jnp.arange(budget, dtype=jnp.int32)
    base = propagate_to_segments(inst.tile_start,
                                 (p_off - inst.tile_start)[None, :], budget)[0]
    dst = slot + base
    gid = jnp.full((aligned,), n, jnp.int32).at[dst].set(inst.gauss_id, mode="drop")
    # aligned slot -> pre-sort slot (sort key for the gradient reduction in
    # _gather_attrs_bwd): padding instances write their sentinel presort_slot ==
    # budget, untouched alignment holes keep `aligned` — both sort past the live
    # prefix and both carry identically-zero gradient columns
    poa = jnp.full((aligned,), aligned, jnp.int32).at[dst].set(
        inst.presort_slot, mode="drop")

    means2d = prep.means2d if means2d_override is None else means2d_override
    rows = [means2d[:, 0], means2d[:, 1],
            prep.conics[:, 0], prep.conics[:, 1], prep.conics[:, 2],
            jnp.where(prep.visible, opacities, 0.0),
            prep.colors[:, 0], prep.colors[:, 1], prep.colors[:, 2]]
    if features is not None:
        rows.extend(features[:, i] for i in range(spec.num_feat))
    attrs = jnp.stack(rows, axis=0)  # [d, n]
    d = attrs.shape[0]
    attrs = jnp.concatenate([attrs, jnp.zeros((d, 1), attrs.dtype)], axis=1)
    grad_rows = ((D_BASE, spec.num_feat) if spec.grad_mode == "feature"
                 else (0, d))
    reduce_cfg = (bwd_reduce or BWD_REDUCE, interpret)
    packed = _gather_attrs(budget, grad_rows, reduce_cfg, attrs,
                           jax.lax.stop_gradient(gid),
                           jax.lax.stop_gradient(poa),
                           jax.lax.stop_gradient(inst.gauss_offsets))
    if d < spec.rows:
        # sublane padding rows are constant zero: append AFTER the gather so the
        # budget-sized gather (fwd) and permute+cumsum reduction (bwd) only touch
        # live rows; concatenate's VJP slices the pad rows' cotangent off for free
        packed = jnp.concatenate(
            [packed, jnp.zeros((spec.rows - d, packed.shape[1]), packed.dtype)],
            axis=0)
    return packed, p_off


# ---------------------------------------------------------------------------
# In-kernel helpers. Convention: [pixels, chunk] arrays (lanes = instance axis),
# image blocks [pixels, channels], carries [pixels, 1].
# ---------------------------------------------------------------------------

def _shifted(x: jnp.ndarray, s: int, fill: float) -> jnp.ndarray:
    """x[:, i] <- x[:, i - s] with `fill` for i < s (lane axis shift)."""
    rolled = pltpu.roll(x, shift=s, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= s, rolled, fill)


def _triu_ones(c: int) -> jnp.ndarray:
    """[c, c] f32 upper-triangular ones (incl. diagonal): x @ _triu_ones = cumsum."""
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return jnp.where(row <= col, 1.0, 0.0).astype(jnp.float32)


def _mm(a: jnp.ndarray, b: jnp.ndarray, precision=None) -> jnp.ndarray:
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=MM_PRECISION if precision is None else precision,
        preferred_element_type=jnp.float32)


def _cumsum_lanes(x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Inclusive cumulative sum along the lane axis on the MXU.

    A dense [P, C] x [C, C] triangular contraction costs FLOPs linear in C per
    element (total kernel cost grows with the chunk size), so for C > 128 the scan
    is blocked: one 128-wide triangular matmul per diagonal block plus three tiny
    contractions for the inter-block offsets — total cumulative-op FLOPs then stay
    INDEPENDENT of the chunk size, letting large chunks amortize per-chunk latency
    for free. HIGHEST precision keeps the f32 accuracy the suffix-sum gradient
    math needs. (The log-shift alternative is ~21 VPU passes over [P, C].)
    """
    c = x.shape[1]
    blk = 128
    if precision is None or precision == MM_PRECISION:
        # f32-faithful at ~1/3 the MXU passes of HIGHEST: the triangular matrix
        # is exactly representable in bf16 (zeros/ones), so only x needs the
        # hi/lo split — x == hi + lo with both parts bf16-lossless, each pass
        # runs single-pass bf16 with f32 accumulation, and the sum reproduces
        # the HIGHEST decomposition (whose y_lo terms vanish identically)
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        lo = x - hi
        dflt = jax.lax.Precision.DEFAULT
        if c < 512 or c % blk != 0:
            tri = _triu_ones(c)
            return _mm(hi, tri, dflt) + _mm(lo, tri, dflt)
        return _cumsum_blocked(hi, dflt) + _cumsum_blocked(lo, dflt)
    if c < 512 or c % blk != 0:
        return _mm(x, _triu_ones(c), precision)
    return _cumsum_blocked(x, precision)


def _cumsum_blocked(x: jnp.ndarray, precision) -> jnp.ndarray:
    c = x.shape[1]
    blk = 128
    nb = c // blk
    tri = _triu_ones(blk)
    y = jnp.concatenate([_mm(x[:, i * blk:(i + 1) * blk], tri, precision)
                         for i in range(nb)], axis=1)
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (c, nb), 0) // blk
    blk_id = jax.lax.broadcasted_iota(jnp.int32, (c, nb), 1)
    ind = jnp.where(col_blk == blk_id, 1.0, 0.0).astype(jnp.float32)   # [c, nb]
    tot = _mm(x, ind, precision)                                       # [P, nb]
    row_b = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    col_b = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    strict = jnp.where(row_b < col_b, 1.0, 0.0).astype(jnp.float32)
    tot_ex = _mm(tot, strict, precision)                               # exclusive
    blk_row = jax.lax.broadcasted_iota(jnp.int32, (nb, c), 0)
    col_blk2 = jax.lax.broadcasted_iota(jnp.int32, (nb, c), 1) // blk
    expand = jnp.where(blk_row == col_blk2, 1.0, 0.0).astype(jnp.float32)  # [nb, c]
    return y + _mm(tot_ex, expand, precision)


_FAKE_TRANS = bool(__import__("os").environ.get("LANGSPLAT_FAKE_TRANS"))

#: batch every lane-half's (hi, lo) split-cumsum pass into ONE triangular
#: matmul by stacking on the sublane axis — MXU issue/weight-load cost
#: dominates these small matmuls (A/B knob; see docs/ROOFLINE.md round-4 notes)
CUMSUM_STACK = __import__("os").environ.get("LANGSPLAT_CUMSUM_STACK", "0") != "0"


def _cumsum_lanes_stacked(x: jnp.ndarray, width: int, nmemb: int,
                          precision=None) -> jnp.ndarray:
    """Per-lane-half inclusive cumsum of joint [P, nmemb*width] x.

    All halves (and, on the f32-faithful path, their hi/lo split parts) stack
    on the sublane axis into a single [k*P, width] triangular matmul — same
    FLOPs as the separate calls, one MXU issue instead of up to 2*nmemb."""
    pp = x.shape[0]
    exact = precision is None or precision == MM_PRECISION
    if exact:
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        lo = x - hi
        parts = []
        for u in range(nmemb):
            sl = slice(u * width, (u + 1) * width)
            parts.append(hi[:, sl])
            parts.append(lo[:, sl])
        y = _mm(jnp.concatenate(parts, axis=0), _triu_ones(width),
                jax.lax.Precision.DEFAULT)
        outs = [y[(2 * u) * pp:(2 * u + 1) * pp]
                + y[(2 * u + 1) * pp:(2 * u + 2) * pp] for u in range(nmemb)]
    else:
        parts = [x[:, u * width:(u + 1) * width] for u in range(nmemb)]
        y = _mm(jnp.concatenate(parts, axis=0), _triu_ones(width), precision)
        outs = [y[u * pp:(u + 1) * pp] for u in range(nmemb)]
    return outs[0] if nmemb == 1 else jnp.concatenate(outs, axis=1)


def _exp(x):
    return (1.0 + 0.5 * x) if _FAKE_TRANS else jnp.exp(x)


def _log(x):
    return (x - 1.0) if _FAKE_TRANS else jnp.log(x)


def _cumprod_lanes(x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Inclusive cumulative product along the lane axis via exp(cumsum(log)).

    x here is 1-alpha in [1 - ALPHA_MAX, 1], so log is well-conditioned; masked
    lanes carry exactly 1.0 -> log 0 (neutral). Deep tails underflow exp to 0,
    which the TERM_EPS termination masks anyway. Two transcendental passes + one
    MXU matmul instead of ~28 VPU passes (7 steps x roll+iota+select+multiply).
    """
    return _exp(_cumsum_lanes(_log(x), precision))


def _chunk_alpha(data: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                 lane: jnp.ndarray, limit):
    """Alphas for one chunk. data [rows, chunk]; px/py [pixels, 1]; `lane` a
    precomputed [pixels, chunk] lane iota; `limit` the number of in-tile lanes
    (the final partial chunk of a tile holds the NEXT tile's instances past it).

    Returns (alpha, gexp, keep) — all [pixels, chunk]; alpha is post-threshold
    and zero outside `keep` (incl. out-of-tile lanes).
    """
    mx = data[ROW_MX:ROW_MX + 1, :]
    my = data[ROW_MY:ROW_MY + 1, :]
    ca = data[ROW_CA:ROW_CA + 1, :]
    cb = data[ROW_CB:ROW_CB + 1, :]
    cc = data[ROW_CC:ROW_CC + 1, :]
    opa = data[ROW_OPA:ROW_OPA + 1, :]
    dx = px - mx
    dy = py - my
    power = -0.5 * ((ca * dx + cb * dy) * dx + (cc * dy) * dy
                    + (cb * dx) * dy)
    keep_p = (power <= 0.0) & (lane < limit)
    gexp = _exp(jnp.where(keep_p, power, -1.0))
    alpha = jnp.minimum(ALPHA_MAX, opa * gexp)
    keep = keep_p & (alpha >= ALPHA_EPS)
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, gexp, keep


def _blend_core(alpha, t_carry, lane, precision=None, want_floor=False):
    """Shared blend bookkeeping for one chunk; `t_carry` [pixels, 1] carries 0 for
    pixels that already terminated (the zero-carry done encoding: t_incl is then
    identically 0 < TERM_EPS, so `included` masks every lane with no separate done
    flag or ~done broadcast anywhere).

    Returns (w, t_excl, included, min_incl, floor): blend weights, per-instance
    exclusive transmittance, the inclusion mask (CUDA termination rule), the carried
    transmittance candidate, and (when want_floor) the transmittance after the last
    included instance — the pixel's FINAL T if it terminates in this chunk.

    t_excl is the RAW shifted t_incl: past the termination lane it is not the
    "effective" exclusive transmittance, but every consumer multiplies it by a
    quantity gated on `included` (w here, `live` in the backward), so the
    floor/cummax repair the previous formulation did is unnecessary.
    """
    t_incl = t_carry * _cumprod_lanes(1.0 - alpha, precision)
    included = t_incl >= TERM_EPS
    rolled = pltpu.roll(t_incl, shift=1, axis=1)
    t_excl = jnp.where(lane >= 1, rolled, t_carry)
    w = jnp.where(included, alpha, 0.0) * t_excl
    # Carries via full-lane reductions: lane-slice extracts ([:, -1:]) would give the
    # loop carries a lane-offset layout Mosaic can't reconcile with the offset-0
    # initial values. min(t_incl) is the last lane (t_incl is non-increasing).
    min_incl = jnp.min(t_incl, axis=1, keepdims=True)
    floor = (jnp.min(jnp.where(included, t_incl, t_carry), axis=1, keepdims=True)
             if want_floor else None)
    return w, t_excl, included, min_incl, floor


# ---------------------------------------------------------------------------
# Lane-fused kernels: `nmemb` tiles process per grid step, their instance chunks
# CONCATENATED ON THE LANE AXIS into joint [pixels, nmemb*chunk] arrays. Measured
# motivation (v5e, bench scale): each chunk body is one serial dependency chain
# (alpha -> cumsum -> w -> contrib -> cumsum -> dalpha -> moments) of VPU issues,
# MXU weight-loads and DMA waits; separate per-tile bodies do NOT overlap (nmemb
# 1/2/4 as python-level interleaving measured within 2% of each other), so fixed
# per-issue costs dominate. Fusing tiles on lanes halves/quarters the issue count
# per instance for every joint op while keeping total element work identical.
# Per-member quantities enter joint ops as lane-half selects ([pixels,1] carries)
# or [1, J] rows (scalars); cumulative ops run per lane-half (the cumsum matmul's
# FLOPs scale with its width, so halves keep FLOPs constant); reductions slice
# halves. The packed row layout concatenates members' data for free: each DMA
# lands its tile's chunk in its own lane block of the shared buffer.
# ---------------------------------------------------------------------------


def _pixel_coords(tile_idx, spec: BlendSpec, dtype):
    ts = spec.tile_size
    ty = tile_idx // spec.grid_x
    tx = tile_idx % spec.grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (spec.pixels, 1), 0)
    px = (tx * ts + p % ts).astype(dtype)
    py = (ty * ts + p // ts).astype(dtype)
    return px, py


def _joint_cols(vals, lane, width):
    """Per-member [pixels, 1] values -> joint [pixels, J] by lane-half select.

    For one member this is the plain broadcast (no materialized select)."""
    out = vals[-1]
    for u in range(len(vals) - 2, -1, -1):
        out = jnp.where(lane < (u + 1) * width, vals[u], out)
    return out


def _joint_row(scalars, row_io, width, dtype):
    """Per-member scalars -> [1, J] row by lane-half select."""
    out = jnp.full(row_io.shape, scalars[-1], dtype)
    for u in range(len(scalars) - 2, -1, -1):
        out = jnp.where(row_io < (u + 1) * width,
                        jnp.full(row_io.shape, scalars[u], dtype), out)
    return out


def _alive_any(t_ref, nmemb):
    """True while any pixel of any member still carries transmittance > 0."""
    al = jnp.max(t_ref[0, :, :])
    for u in range(1, nmemb):
        al = jnp.maximum(al, jnp.max(t_ref[u, :, :]))
    return al > 0.0


def _fwd_kernel(spec: BlendSpec,
                start_ref,            # scalar prefetch: [starts | counts] padded
                inst_ref,             # HBM [rows, aligned_budget]
                out_ref,              # VMEM block [nmemb, pixels, out_channels]
                chunk_buf,            # VMEM [2, rows, nmemb*fwd_chunk]
                t_ref, tfin_ref, flag_ref, dma_sems):
    # Loop state lives in VMEM scratch refs (t_ref/tfin_ref [nmemb, pixels, 1], the
    # accumulator directly in out_ref): fori_loop with predicated bodies — value
    # carries would force Mosaic to unify vector layouts across iterations.
    # t_ref carries 0 for terminated pixels (zero-carry done encoding); tfin_ref
    # latches their final transmittance for the T output. The instance stream is
    # double-buffered: chunk k+1's DMAs are issued before chunk k's compute.
    fchunk = spec.fwd_chunk
    f32 = jnp.float32
    ncol = spec.blend_channels
    pid = pl.program_id(0)
    nmemb = t_ref.shape[0]
    jw = nmemb * fchunk

    lane = jax.lax.broadcasted_iota(jnp.int32, (spec.pixels, jw), 1)
    lane_loc = jax.lax.rem(lane, fchunk)
    row_io = jax.lax.broadcasted_iota(jnp.int32, (1, jw), 1)

    starts, counts, nchunk_l, px_l, py_l = [], [], [], [], []
    for u in range(nmemb):
        s = pid * nmemb + u
        # start_ref holds [aligned starts (NT'+1) | true counts (NT') | tile ids
        # (NT')]: slot s may be a count-sorted permutation of the tile order (see
        # _build_sched) so that members of one grid step have similar chunk
        # counts — the group iterates to its MAX member count, so straggler
        # members otherwise waste whole masked chunks. Iterating
        # ceil(count/chunk) skips alignment padding entirely; the final partial
        # chunk may read past this tile's range (alignment is finer than the
        # chunk), so out-of-range lanes are alpha-masked via the limit row.
        t = start_ref[2 * spec.padded_tiles(nmemb) + 1 + s]
        starts.append(start_ref[s])
        counts.append(start_ref[spec.padded_tiles(nmemb) + 1 + s])
        nchunk_l.append((counts[u] + fchunk - 1) // fchunk)
        px, py = _pixel_coords(t, spec, f32)
        px_l.append(px)
        py_l.append(py)
        out_ref[u, :, :] = jnp.zeros((spec.pixels, spec.out_channels), f32)
        t_ref[u, :, :] = jnp.ones((spec.pixels, 1), f32)
        tfin_ref[u, :, :] = jnp.ones((spec.pixels, 1), f32)
    px_j = _joint_cols(px_l, lane, fchunk)
    py_j = _joint_cols(py_l, lane, fchunk)
    nmax = nchunk_l[0]
    for u in range(1, nmemb):
        nmax = jnp.maximum(nmax, nchunk_l[u])
    # members iterate to the PAIR's max chunk count; a shorter member's excess
    # reads are clamped into the sacrificial aligned tail (contents masked by the
    # limit row anyway — the clamp only keeps the DMA in bounds)
    read_cap = spec.aligned_budget - fchunk

    def copies(k, slot):
        out = []
        for u in range(nmemb):
            off = jnp.minimum(starts[u] + k * fchunk, read_cap)
            off = pl.multiple_of(off, spec.align)
            out.append(pltpu.make_async_copy(
                inst_ref.at[:, pl.ds(off, fchunk)],
                chunk_buf.at[slot, :, pl.ds(u * fchunk, fchunk)],
                dma_sems.at[slot, u]))
        return out

    @pl.when(nmax > 0)
    def _():
        for c in copies(0, 0):
            c.start()

    flag_ref[0] = jnp.where(nmax > 0, 1, 0)

    def _fwd_chunk(k, data):
        limv = _joint_row([counts[u] - k * fchunk for u in range(nmemb)],
                          row_io, fchunk, jnp.int32)
        alpha, _, _ = _chunk_alpha(data, px_j, py_j, lane_loc, limv)
        tc = [t_ref[u, :, :] for u in range(nmemb)]
        t_carry_j = _joint_cols(tc, lane, fchunk)
        w, _, included, t_incl = _blend_core_joint(
            alpha, t_carry_j, lane_loc, fchunk, nmemb)
        incl_fill = jnp.where(included, t_incl, t_carry_j)
        for u in range(nmemb):
            sl = slice(u * fchunk, (u + 1) * fchunk)
            # acc[p, ch] += sum_i w[p, i] * attrs[ch, i] (MXU over chunk)
            out_ref[u, :, 0:ncol] += jax.lax.dot_general(
                w[:, sl], data[ROW_R:ROW_R + ncol, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=MM_PRECISION,
                preferred_element_type=jnp.float32)
            m_incl = jnp.min(t_incl[:, sl], axis=1, keepdims=True)
            floor = jnp.min(incl_fill[:, sl], axis=1, keepdims=True)
            term = m_incl < TERM_EPS
            # latch final T once, at the chunk a pixel terminates in
            # (floor == T after its last included instance)
            tfin_ref[u, :, :] = jnp.where(term & (tc[u] > 0.0), floor,
                                          tfin_ref[u, :, :])
            t_ref[u, :, :] = jnp.where(term, 0.0, m_incl)

    def body(k, _):
        @pl.when(flag_ref[0] == 1)
        def _():
            alive = _alive_any(t_ref, nmemb)
            slot = jax.lax.rem(k, 2)
            for c in copies(k, slot):
                c.wait()
            do_issue = alive & (k + 1 < nmax)

            @pl.when(do_issue)
            def _():
                for c in copies(k + 1, jax.lax.rem(k + 1, 2)):
                    c.start()

            flag_ref[0] = jnp.where(do_issue, 1, 0)

            @pl.when(alive)
            def _():
                _fwd_chunk(k, chunk_buf[slot])

        return ()

    jax.lax.fori_loop(0, nmax, body, ())
    for u in range(nmemb):
        tv = t_ref[u, :, :]
        out_ref[u, :, ncol:ncol + 1] = jnp.where(tv > 0.0, tv, tfin_ref[u, :, :])


def _blend_core_joint(alpha, t_carry_j, lane_loc, width, nmemb, precision=None):
    """_blend_core over lane-fused members: the cumulative product runs per
    lane-half (constant FLOPs/element; a joint triangular matmul would scale
    with the fused width), everything else is joint. Returns
    (w, t_excl, included, t_incl)."""
    la = _log(1.0 - alpha)
    if CUMSUM_STACK:
        cs = _cumsum_lanes_stacked(la, width, nmemb, precision)
    elif nmemb == 1:
        cs = _cumsum_lanes(la, precision)
    else:
        cs = jnp.concatenate(
            [_cumsum_lanes(la[:, u * width:(u + 1) * width], precision)
             for u in range(nmemb)], axis=1)
    t_incl = t_carry_j * _exp(cs)
    included = t_incl >= TERM_EPS
    rolled = pltpu.roll(t_incl, shift=1, axis=1)
    # lane_loc == 0 also repairs the roll wrap-around between lane halves
    t_excl = jnp.where(lane_loc >= 1, rolled, t_carry_j)
    w = jnp.where(included, alpha, 0.0) * t_excl
    return w, t_excl, included, t_incl


def _bwd_kernel(spec: BlendSpec,
                start_ref,            # scalar prefetch
                inst_ref,             # HBM [rows, aligned_budget]
                gout_ref,             # VMEM block [nmemb, pixels, out_channels]
                res_ref,              # VMEM block [nmemb, pixels, 2]: (Total, T_final)
                zeros_ref,            # HBM [rows, aligned_budget] (aliased -> grad out)
                dinst_ref,            # HBM output [rows, aligned_budget]
                chunk_buf, dchunk_buf, prefix_ref, t_ref,
                flag_ref, wcount_ref, in_sems, out_sems):
    # Same double-buffered lane-fused stream as the forward kernel, plus
    # double-buffered gradient WRITES: chunk k's dchunk DMAs are issued without
    # waiting; their buffer slot is only reclaimed when chunk k+2 computes.
    # Members fuse only when chunk == align (checked by _bwd_call): every tile's
    # chunks then cover exactly its aligned range, so no member's legitimate
    # write can spill into another member's slots; a shorter member's excess
    # chunks (the pair iterates to the max) write their all-zero gradients into
    # the sacrificial aligned tail instead of successor tiles' ranges.
    del zeros_ref
    f32 = jnp.float32
    ncol = spec.blend_channels
    nf = spec.num_feat
    ts = spec.tile_size
    cw = spec.chunk
    pid = pl.program_id(0)
    nmemb = t_ref.shape[0]
    jw = nmemb * cw

    lane = jax.lax.broadcasted_iota(jnp.int32, (spec.pixels, jw), 1)
    lane_loc = jax.lax.rem(lane, cw)
    row_io = jax.lax.broadcasted_iota(jnp.int32, (1, jw), 1)

    starts, counts, nchunk_l, px_l, py_l = [], [], [], [], []
    gb_l, gf_l, tail_l, total_l, pb_l, cx_l, cy_l = [], [], [], [], [], [], []
    for u in range(nmemb):
        s = pid * nmemb + u
        # slot -> tile id indirection (count-sorted grouping; see _fwd_kernel)
        t = start_ref[2 * spec.padded_tiles(nmemb) + 1 + s]
        starts.append(start_ref[s])
        counts.append(start_ref[spec.padded_tiles(nmemb) + 1 + s])
        nchunk_l.append((counts[u] + cw - 1) // cw)
        px, py = _pixel_coords(t, spec, f32)
        px_l.append(px)
        py_l.append(py)
        gb_l.append(gout_ref[u, :, 0:ncol])                    # [P, ncol]
        if spec.grad_mode == "feature":
            gf_l.append(gout_ref[u, :, 3:3 + nf])
        g_t = gout_ref[u, :, ncol:ncol + 1]                    # [P, 1] dL/dT_final
        total_l.append(res_ref[u, :, 0:1])                     # [P, 1]
        t_final = res_ref[u, :, 1:2]                           # [P, 1]
        tail_l.append(g_t * t_final)
        prefix_ref[u, :, :] = jnp.zeros((spec.pixels, 1), f32)
        t_ref[u, :, :] = jnp.ones((spec.pixels, 1), f32)
        # Loop-invariant pixel polynomial basis for the moment contraction (see
        # _bwd_chunk): tile-centered coordinates keep the quadratic columns
        # well-conditioned in f32.
        cx = (t % spec.grid_x) * ts + ts * 0.5
        cy = (t // spec.grid_x) * ts + ts * 0.5
        cx_l.append(cx)
        cy_l.append(cy)
        pxc = px - cx
        pyc = py - cy
        ones_col = jnp.ones((spec.pixels, 1), f32)
        pb_l.append(jnp.concatenate(
            [ones_col, pxc, pyc, pxc * pxc, pxc * pyc, pyc * pyc], axis=1))
    px_j = _joint_cols(px_l, lane, cw)
    py_j = _joint_cols(py_l, lane, cw)
    cx_j = _joint_row(cx_l, row_io, cw, f32)
    cy_j = _joint_row(cy_l, row_io, cw, f32)
    # member-blocked contraction bases: ONE MXU issue per joint reduction
    # (out rows u*8..u*8+d x member u's lane block are the valid slices; member
    # blocks pad to sublane stride 8 — Mosaic handles 8-aligned sublane concats)
    zpad = jnp.zeros((spec.pixels, 8 - ncol), f32)
    xg = jnp.concatenate(
        [jnp.concatenate([gb_l[u], zpad], axis=1) for u in range(nmemb)]
        if nmemb > 1 else gb_l, axis=1)            # [P, 8*m] (or [P, ncol])
    xf = jnp.concatenate(gf_l, axis=1) if gf_l else None
    # per-member lane-block masks for building block-diagonal right operands
    hm_l = [(row_io // cw == u).astype(f32) for u in range(nmemb)]
    nmax = nchunk_l[0]
    for u in range(1, nmemb):
        nmax = jnp.maximum(nmax, nchunk_l[u])
    # read cap: the aligned tail is sized so this clamp can only engage for
    # fully-dead chunks — a clamped LIVE read would shift columns under the
    # count mask and corrupt grads
    read_cap = spec.aligned_budget - cw

    def in_copies(k, slot):
        out = []
        for u in range(nmemb):
            off = jnp.minimum(starts[u] + k * cw, read_cap)
            off = pl.multiple_of(off, spec.align)
            out.append(pltpu.make_async_copy(
                inst_ref.at[:, pl.ds(off, cw)],
                chunk_buf.at[slot, :, pl.ds(u * cw, cw)],
                in_sems.at[slot, u]))
        return out

    def out_copies(k, slot):
        out = []
        for u in range(nmemb):
            if nmemb == 1:
                # single-member mode (chunk > align possible): the final partial
                # chunk's write may spill past this tile's range into the NEXT
                # tile's slots with zero gradients; the grid runs tiles in order
                # and the epilogue drains all writes, so the owning tile's later
                # write always lands last — the spill is overwritten
                off = pl.multiple_of(starts[u] + k * cw, spec.align)
            else:
                # fused mode (chunk == align): overrun chunks of a shorter
                # member land in the sacrificial tail, never in live slots
                off = jnp.where(k < nchunk_l[u], starts[u] + k * cw, read_cap)
                off = pl.multiple_of(off, spec.align)
            out.append(pltpu.make_async_copy(
                dchunk_buf.at[slot, :, pl.ds(u * cw, cw)],
                dinst_ref.at[:, pl.ds(off, cw)],
                out_sems.at[slot, u]))
        return out

    @pl.when(nmax > 0)
    def _():
        for c in in_copies(0, 0):
            c.start()

    flag_ref[0] = jnp.where(nmax > 0, 1, 0)
    wcount_ref[0] = 0

    gprec = (jax.lax.Precision.DEFAULT if spec.grad_precision == "bf16"
             else MM_PRECISION)

    def _bwd_chunk(k, wslot, data):
        # `data` [rows, jw] is the compute chunk (sliced out of the super read
        # buffer by the caller); `wslot` alternates per compute chunk — the
        # gradient WRITE path keeps chunk granularity and its slot parity
        limv = _joint_row([counts[u] - k * cw for u in range(nmemb)],
                          row_io, cw, jnp.int32)
        alpha, gexp, keep = _chunk_alpha(data, px_j, py_j, lane_loc, limv)
        tc = [t_ref[u, :, :] for u in range(nmemb)]
        t_carry_j = _joint_cols(tc, lane, cw)
        w, t_excl, included, t_incl = _blend_core_joint(
            alpha, t_carry_j, lane_loc, cw, nmemb, precision=gprec)

        if spec.grad_mode == "feature":
            # feature phase: only d(language_feature) is needed — the geometric
            # chain (gdot/suffix/dalpha/moments) is skipped entirely; w is the
            # only residual the feature gradient uses
            dfj = jax.lax.dot_general(
                xf, w, dimension_numbers=(((0,), (0,)), ((), ())),
                precision=gprec, preferred_element_type=jnp.float32)  # [nf*m, J]

            @pl.when(k >= 2)
            def _():
                for c in out_copies(k - 2, wslot):
                    c.wait()

            dchunk_buf[wslot, 0:D_BASE, :] = jnp.zeros((D_BASE, jw), f32)
            if nmemb == 1:
                dchunk_buf[wslot, D_BASE:D_BASE + nf, :] = dfj
            else:
                for u in range(nmemb):
                    dchunk_buf[wslot, D_BASE:D_BASE + nf,
                               u * cw:(u + 1) * cw] = (
                        dfj[u * nf:(u + 1) * nf, u * cw:(u + 1) * cw])
            if spec.rows > D_BASE + nf:
                dchunk_buf[wslot, D_BASE + nf:, :] = jnp.zeros(
                    (spec.rows - D_BASE - nf, jw), f32)
            for c in out_copies(k, wslot):
                c.start()
            wcount_ref[0] = k + 1
            for u in range(nmemb):
                m_incl = jnp.min(t_incl[:, u * cw:(u + 1) * cw], axis=1,
                                 keepdims=True)
                t_ref[u, :, :] = jnp.where(m_incl < TERM_EPS, 0.0, m_incl)
            return

        # gdot[p, i] = sum_ch g_ch[p] * attr_ch[i], via the member-blocked basis
        # against a block-diagonal stack of the members' color/feature rows
        if nmemb == 1:
            yg = data[ROW_R:ROW_R + ncol, :]
        else:
            zrow = jnp.zeros((8 - ncol, jw), f32)
            yg = jnp.concatenate(
                [jnp.concatenate([data[ROW_R:ROW_R + ncol, :] * hm_l[u], zrow],
                                 axis=0) for u in range(nmemb)],
                axis=0)                                        # [8*m, J]
        gdot = jax.lax.dot_general(
            xg, yg, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=gprec, preferred_element_type=jnp.float32)   # [P, J]
        contrib = w * gdot
        # per-half prefix/suffix (the cumsum and the [P,1] member carries live
        # per lane-half); (suffix + tail) joins for the joint dalpha row
        st_l, pnew_l = [], []
        pcs = (_cumsum_lanes_stacked(contrib, cw, nmemb, gprec)
               if CUMSUM_STACK else None)
        for u in range(nmemb):
            sl = slice(u * cw, (u + 1) * cw)
            half_cs = (pcs[:, sl] if pcs is not None
                       else _cumsum_lanes(contrib[:, sl], precision=gprec))
            pi = prefix_ref[u, :, :] + half_cs
            st_l.append((total_l[u] - pi) + tail_l[u])
            pnew_l.append(jnp.sum(contrib[:, sl], axis=1, keepdims=True))
        st_j = st_l[0] if nmemb == 1 else jnp.concatenate(st_l, axis=1)
        # live == (eff > 0) & keep in the old formulation: alpha > 0 iff keep,
        # and eff = alpha gated on `included`; on live lanes 1 - eff == 1 - alpha,
        # which the ALPHA_MAX clamp bounds away from 0 (>= 0.01), so no guard
        live = keep & included
        dalpha = jnp.where(live, t_excl * gdot - st_j / (1.0 - alpha), 0.0)

        # chain: alpha = min(0.99, opa * gexp); clamped -> zero grad (jnp semantics)
        opa = data[ROW_OPA:ROW_OPA + 1, :]
        dag = jnp.where((opa * gexp) < ALPHA_MAX, dalpha, 0.0)
        dpower = dag * alpha
        # All six per-instance reductions are sums over pixels of dpower times a
        # polynomial of degree <=2 in (dx, dy), so they factor through the moments
        # of dpower against the loop-invariant pixel basis — ONE MXU contraction
        # (per fused group) instead of ~25 VPU passes + 6 sublane reductions.
        # d_opa uses dag*gexp == dpower/opa (exact where unclamped; both 0 else).
        # per-member moment/d_attr contractions: their [d, chunk] results are
        # consumed at sublane offset 0 (offset row-block slices of one big
        # [8m, J] result triggered a Mosaic relayout fault at runtime)
        mom_l, da_l = [], []
        for u in range(nmemb):
            sl = slice(u * cw, (u + 1) * cw)
            mom_l.append(jax.lax.dot_general(
                pb_l[u], dpower[:, sl] if nmemb > 1 else dpower,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=gprec, preferred_element_type=jnp.float32))  # [6, C]
            da_l.append(jax.lax.dot_general(
                gb_l[u], w[:, sl] if nmemb > 1 else w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=gprec, preferred_element_type=jnp.float32))  # [ncol, C]

        ca = data[ROW_CA:ROW_CA + 1, :]
        cb = data[ROW_CB:ROW_CB + 1, :]
        cc = data[ROW_CC:ROW_CC + 1, :]
        mxq = data[ROW_MX:ROW_MX + 1, :] - cx_j                # [1, J] tile-centered
        myq = data[ROW_MY:ROW_MY + 1, :] - cy_j

        # reclaim dchunk_buf[wslot]: the writes issued for chunk k-2 used this slot
        @pl.when(k >= 2)
        def _():
            for c in out_copies(k - 2, wslot):
                c.wait()

        # per-lane-half reconstruction: the (cheap [1, chunk]) row algebra runs
        # per half and stores straight into the member's lane block
        for u in range(nmemb):
            sl = slice(u * cw, (u + 1) * cw)
            mb = mom_l[u]
            m0 = mb[0:1, :]
            m_x = mb[1:2, :]
            m_y = mb[2:3, :]
            m_xx = mb[3:4, :]
            m_xy = mb[4:5, :]
            m_yy = mb[5:6, :]
            mxq_u = mxq[:, sl]
            myq_u = myq[:, sl]
            opa_u = opa[:, sl]
            sdx = m_x - mxq_u * m0                             # sum dpower*dx
            sdy = m_y - myq_u * m0
            d_opa = jnp.where(opa_u > 0.0,
                              m0 / jnp.where(opa_u > 0.0, opa_u, 1.0), 0.0)
            d_ca = -0.5 * (m_xx - 2.0 * mxq_u * m_x + mxq_u * mxq_u * m0)
            d_cb = -(m_xy - mxq_u * m_y - myq_u * m_x + mxq_u * myq_u * m0)
            d_cc = -0.5 * (m_yy - 2.0 * myq_u * m_y + myq_u * myq_u * m0)
            d_mx = ca[:, sl] * sdx + cb[:, sl] * sdy
            d_my = cc[:, sl] * sdy + cb[:, sl] * sdx
            da_u = da_l[u]
            dchunk_buf[wslot, ROW_MX:ROW_MX + 1, sl] = d_mx
            dchunk_buf[wslot, ROW_MY:ROW_MY + 1, sl] = d_my
            dchunk_buf[wslot, ROW_CA:ROW_CA + 1, sl] = d_ca
            dchunk_buf[wslot, ROW_CB:ROW_CB + 1, sl] = d_cb
            dchunk_buf[wslot, ROW_CC:ROW_CC + 1, sl] = d_cc
            dchunk_buf[wslot, ROW_OPA:ROW_OPA + 1, sl] = d_opa
            dchunk_buf[wslot, ROW_R:ROW_R + ncol, sl] = da_u
        if spec.rows > D_BASE + nf:
            dchunk_buf[wslot, D_BASE + nf:, :] = jnp.zeros(
                (spec.rows - D_BASE - nf, jw), f32)
        for c in out_copies(k, wslot):
            c.start()
        wcount_ref[0] = k + 1
        for u in range(nmemb):
            m_incl = jnp.min(t_incl[:, u * cw:(u + 1) * cw], axis=1, keepdims=True)
            t_ref[u, :, :] = jnp.where(m_incl < TERM_EPS, 0.0, m_incl)
            prefix_ref[u, :, :] = prefix_ref[u, :, :] + pnew_l[u]

    def body(k, _):
        @pl.when(flag_ref[0] == 1)
        def _():
            alive = _alive_any(t_ref, nmemb)
            slot = jax.lax.rem(k, 2)
            for c in in_copies(k, slot):
                c.wait()
            do_issue = alive & (k + 1 < nmax)

            @pl.when(do_issue)
            def _():
                for c in in_copies(k + 1, jax.lax.rem(k + 1, 2)):
                    c.start()

            flag_ref[0] = jnp.where(do_issue, 1, 0)

            @pl.when(alive)
            def _():
                _bwd_chunk(k, jax.lax.rem(k, 2), chunk_buf[slot])

        return ()

    jax.lax.fori_loop(0, nmax, body, ())

    # drain the last <=2 outstanding gradient write groups
    wn = wcount_ref[0]

    @pl.when(wn >= 1)
    def _():
        for c in out_copies(wn - 1, jax.lax.rem(wn - 1, 2)):
            c.wait()

    @pl.when(wn >= 2)
    def _():
        for c in out_copies(wn - 2, jax.lax.rem(wn - 2, 2)):
            c.wait()


#: group tiles of similar instance count into each lane-fused grid step (the
#: group iterates to its MAX member chunk count, so unsorted grouping wastes
#: whole masked chunks on straggler members). Exact: masked excess chunks are
#: arithmetic no-ops, so the permutation leaves outputs bitwise identical.
#: Default OFF: on the spatially-uniform bench scene the waste is only 5.5% of
#: chunk iterations and the tile-axis permute gathers (output un-permute +
#: g_out/residual permutes, ~31 MB) cost MORE than they save (fwd 11.0 ->
#: 13.1 ms, bwd ~flat, measured v5e r05). Worth enabling for real trained
#: scenes where center tiles are ~10x denser than edge tiles.
GROUP_SORT = __import__("os").environ.get("LANGSPLAT_GROUP_SORT", "0") != "0"


def _build_sched(aligned_start, spec: BlendSpec, nmemb: int):
    """[starts (NT+1) | counts (NT)] -> kernel schedule
    [starts (NT') | total | counts (NT') | tile ids (NT')].

    Returns (sched, order, inv): ``order[s]`` is the tile processed at kernel
    slot ``s`` and ``inv[t]`` the slot of tile ``t`` (both identity when no
    permutation applies). With lane fusion (nmemb > 1) tiles are sorted by
    instance count so each grid step's members have near-equal chunk counts;
    virtual padding tiles (count 0) sort to the end. The tiny NT'-sized sort
    runs identically in the fwd and bwd wrappers (same inputs, stable sort)."""
    nt = spec.num_tiles
    ntp = spec.padded_tiles(nmemb)
    starts = aligned_start[:nt + 1]
    counts = aligned_start[nt + 1:]
    pad = ntp - nt
    starts_t = starts[:nt]
    total = starts[nt:nt + 1]
    if pad:
        starts_t = jnp.concatenate([starts_t, jnp.zeros((pad,), starts.dtype)])
        counts = jnp.concatenate([counts, jnp.zeros((pad,), counts.dtype)])
    iota = jnp.arange(ntp, dtype=jnp.int32)
    if nmemb > 1 and GROUP_SORT:
        _, order = jax.lax.sort((-counts, iota), num_keys=1, is_stable=True)
        starts_t = starts_t[order]
        counts = counts[order]
        inv = jnp.zeros((ntp,), jnp.int32).at[order].set(iota)
    else:
        order = iota
        inv = iota
    return jnp.concatenate([starts_t, total, counts, order]), order, inv


# Tiles lane-fused per grid step (see the kernel section header): joint vector
# ops amortize per-issue fixed costs across members. Env-tunable for on-chip A/B
# (scripts/profile_stages.py).
try:
    NMEMB = int(__import__("os").environ.get("LANGSPLAT_NMEMB", 4))
except ValueError as _e:
    raise ValueError(
        f"LANGSPLAT_NMEMB must be an integer (lane-fused tiles per grid step), "
        f"got {__import__('os').environ.get('LANGSPLAT_NMEMB')!r}") from _e


def _fwd_call(packed, aligned_start, spec: BlendSpec, interpret: bool):
    nmemb = NMEMB if spec.num_tiles >= NMEMB else 1
    ntp = spec.padded_tiles(nmemb)
    sched, _, inv = _build_sched(aligned_start, spec, nmemb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntp // nmemb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((nmemb, spec.pixels, spec.out_channels),
                               lambda t, s: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, spec.rows, nmemb * spec.fwd_chunk),
                       jnp.float32),
            pltpu.VMEM((nmemb, spec.pixels, 1), jnp.float32),   # t_carry (0 = done)
            pltpu.VMEM((nmemb, spec.pixels, 1), jnp.float32),   # final-T latch
            pltpu.SMEM((1,), jnp.int32),                 # copy-in-flight flag
            pltpu.SemaphoreType.DMA((2, nmemb)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((ntp, spec.pixels, spec.out_channels),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(sched, packed)
    if nmemb > 1 and GROUP_SORT:
        out = jnp.take(out, inv[:spec.num_tiles], axis=0)  # undo count grouping
        return out
    return out[:spec.num_tiles]


def _bwd_call(packed, aligned_start, g_out, residuals, spec: BlendSpec, interpret: bool):
    # pairing is only write-safe when chunk == align: then every tile's chunks
    # cover exactly its padded range (no spill writes), so concurrent members
    # cannot touch each other's slots
    nmemb = NMEMB if (spec.chunk == spec.align and spec.num_tiles >= NMEMB) else 1
    ntp = spec.padded_tiles(nmemb)
    sched, order, _ = _build_sched(aligned_start, spec, nmemb)
    if ntp != spec.num_tiles:
        pad = ntp - spec.num_tiles
        g_out = jnp.concatenate(
            [g_out, jnp.zeros((pad,) + g_out.shape[1:], g_out.dtype)])
        residuals = jnp.concatenate(
            [residuals, jnp.zeros((pad,) + residuals.shape[1:], residuals.dtype)])
    if nmemb > 1 and GROUP_SORT:
        # per-tile inputs follow the count-grouped slot order of the schedule
        g_out = jnp.take(g_out, order, axis=0)
        residuals = jnp.take(residuals, order, axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntp // nmemb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # packed
            pl.BlockSpec((nmemb, spec.pixels, spec.out_channels),
                         lambda t, s: (t, 0, 0)),   # g_out
            pl.BlockSpec((nmemb, spec.pixels, 2),
                         lambda t, s: (t, 0, 0)),   # (Total, T_final)
            pl.BlockSpec(memory_space=pl.ANY),   # zero-init grads (aliased to output)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, spec.rows, nmemb * spec.chunk),
                       jnp.float32),                                      # in bufs
            pltpu.VMEM((2, spec.rows, nmemb * spec.chunk), jnp.float32),  # out bufs
            pltpu.VMEM((nmemb, spec.pixels, 1), jnp.float32),   # prefix carry
            pltpu.VMEM((nmemb, spec.pixels, 1), jnp.float32),   # t_carry (0 = done)
            pltpu.SMEM((1,), jnp.int32),                 # copy-in-flight flag
            pltpu.SMEM((1,), jnp.int32),                 # issued-write count
            pltpu.SemaphoreType.DMA((2, nmemb)),
            pltpu.SemaphoreType.DMA((2, nmemb)),
        ],
    )
    zeros = jnp.zeros_like(packed)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, spec),
        out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},  # zeros input (incl. scalar prefetch) -> grad output
        interpret=interpret,
    )(sched, packed, g_out, residuals, zeros)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def blend_tiles(packed: jnp.ndarray, aligned_start: jnp.ndarray,
                spec: BlendSpec, interpret: bool = False) -> jnp.ndarray:
    """Blend packed instances into per-tile images [num_tiles, pixels, out_channels].

    `aligned_start` is the kernel schedule: [aligned range starts (num_tiles+1) |
    true unpadded per-tile counts (num_tiles)] concatenated (see rasterize_pallas).
    Channels 0..2+F hold blended RGB+feature values; channel 3+F is final transmittance.
    """
    return _fwd_call(packed, aligned_start, spec, interpret)


def _blend_fwd(packed, aligned_start, spec, interpret):
    out = _fwd_call(packed, aligned_start, spec, interpret)
    return out, (packed, aligned_start, out)


def _blend_bwd(spec, interpret, res, g_out):
    packed, aligned_start, out = res
    ncol = spec.blend_channels
    total = jnp.sum(g_out[:, :, 0:ncol] * out[:, :, 0:ncol], axis=-1, keepdims=True)
    t_final = out[:, :, ncol:ncol + 1]
    residuals = jnp.concatenate([total, t_final], axis=-1)
    d_packed = _bwd_call(packed, aligned_start, g_out, residuals, spec, interpret)
    return d_packed, None


blend_tiles.defvjp(_blend_fwd, _blend_bwd)


def tiles_to_image(tiles: jnp.ndarray, spec: BlendSpec, image_height: int,
                   image_width: int) -> jnp.ndarray:
    """[num_tiles, pixels, C] -> [C, H, W] crop."""
    c = tiles.shape[2]
    ts = spec.tile_size
    img = tiles.reshape(spec.grid_y, spec.grid_x, ts, ts, c)
    img = img.transpose(4, 0, 2, 1, 3).reshape(c, spec.grid_y * ts, spec.grid_x * ts)
    return img[:, :image_height, :image_width]


def rasterize_pallas(
    prep: PreprocessOut,
    inst: InstanceBuffer,
    opacities: jnp.ndarray,
    features: jnp.ndarray | None,
    bg: jnp.ndarray,
    *,
    image_height: int,
    image_width: int,
    tile_size: int,
    chunk: int = 128,
    interpret: bool = False,
    means2d_override: jnp.ndarray | None = None,
    fwd_mult: int = 1,
    align: int | None = None,
    grad_mode: str = "full",
    grad_precision: str = "exact",
    bwd_reduce: str | None = None,
) -> dict:
    """Full Pallas rasterization: pack -> blend -> assemble. Differentiable."""
    num_feat = 0 if features is None else features.shape[1]
    spec = make_blend_spec(image_height=image_height, image_width=image_width,
                           tile_size=tile_size, chunk=chunk, num_feat=num_feat,
                           budget=inst.gauss_id.shape[0], interpret=interpret,
                           fwd_mult=fwd_mult, align=align, grad_mode=grad_mode,
                           grad_precision=grad_precision)
    packed, p_off = pack_instances(prep, opacities, features, inst, spec,
                                   means2d_override=means2d_override,
                                   interpret=interpret, bwd_reduce=bwd_reduce)
    counts = inst.tile_start[1:] - inst.tile_start[:-1]
    sched = jnp.concatenate([p_off, counts])
    tiles = blend_tiles(packed, jax.lax.stop_gradient(sched), spec, interpret)
    ncol = 3 + num_feat
    img = tiles_to_image(tiles[:, :, :ncol + 1], spec, image_height, image_width)
    t_final = img[ncol]
    out = {
        "render": img[0:3] + t_final[None] * bg[:, None, None],
        "final_transmittance": t_final,
    }
    if features is not None:
        out["language_feature_image"] = img[3:3 + num_feat]
    return out
