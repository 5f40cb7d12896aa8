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
    fwd_mult: int = 1      # fwd chunk = fwd_mult * chunk (both kernels are LATENCY
                           # bound per chunk body, ~2us each on v5e, so big chunks
                           # amortize; bwd prefers finer early-exit granularity)
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
    grad_precision: str = "exact"  # "exact" | "bf16": bf16 runs every backward-
                           # kernel matmul at DEFAULT (single-pass bf16) — the
                           # rendered image stays exact, gradients pick up
                           # ~3-6e-3 relative error (micro_precision.py).
                           # Measured NO speedup on v5e (the bwd kernel is
                           # latency-bound, not MXU-throughput-bound) — kept as
                           # an opt-in for other TPU generations.

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
                    fwd_mult: int = 2, align: int | None = None,
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
    # worst case every tile has a partial align-quantum of padding; the global tail
    # gets one extra fwd chunk so a final partial-chunk DMA never reads out of bounds
    aligned = (_round_up(budget + gx * gy * (align - 1), align)
               + max(chunk, chunk * fwd_mult) - align)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gather_attrs(budget: int, grad_rows: tuple, reduce_cfg: tuple,
                  attrs, gid, poa, gauss_offsets):
    """attrs [rows, N+1] -> packed [rows, aligned_budget] by column gather.

    `poa` [aligned] maps each aligned slot to its pre-sort (gaussian-major) slot
    (budget for zero-opacity padding instances, aligned for alignment holes), built
    by the caller with one cheap 1-D scatter. Custom VJP: XLA's default backward for
    this gather is a scatter-ADD over every instance (~370 ms at 3M instances on
    v5e). A permute GATHER into pre-sort order costs ~22 ns per index (~53 ms,
    locality-independent — scripts/micro_gather_locality.py), while a single-key
    u32 sort carrying all 12 gradient rows as payloads costs ~22 ms. So the
    backward sorts the cotangent columns by `poa` into pre-sort order, where each
    Gaussian's instances are contiguous, then reduces segments either with the
    Pallas `segment_sum_bounded` kernel (reduce_cfg=("segsum", interpret), the
    default — streams each block's contiguous short-segment span by DMA and
    contracts a one-hot membership mask on the MXU, ~4x the gather formulation
    at bench sizes) or with one cumsum + one boundary gather + adjacent diff
    (reduce_cfg=("gather", ...)). Both are deterministic and exactly equal
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
    sorted_out = jax.lax.sort(
        (poa,) + tuple(g[i] for i in range(r0, r0 + rn)),
        num_keys=1, is_stable=False)
    d_pre = jnp.stack(sorted_out[1:], axis=0)[:, :budget]  # [rn, budget] presort
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
    zero_poa = _np.zeros((g.shape[1],), f0)
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
    # blocking only pays past C=512: each extra tiny matmul pads its small dim to
    # the 128 MXU tile and adds issue latency, which swamps the FLOP savings at
    # C=256 (measured on v5e: bwd chunk bodies are latency-sensitive)
    if c < 512 or c % blk != 0:
        return _mm(x, _triu_ones(c), precision)
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


def _cumprod_lanes(x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Inclusive cumulative product along the lane axis via exp(cumsum(log)).

    x here is 1-alpha in [1 - ALPHA_MAX, 1], so log is well-conditioned; masked
    lanes carry exactly 1.0 -> log 0 (neutral). Deep tails underflow exp to 0,
    which the TERM_EPS termination masks anyway. Two transcendental passes + one
    MXU matmul instead of ~28 VPU passes (7 steps x roll+iota+select+multiply).
    """
    return jnp.exp(_cumsum_lanes(jnp.log(x), precision))


def _chunk_alpha(data: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """Alphas for one chunk. data [rows, chunk]; px/py [pixels, 1].

    Returns (alpha, gexp, dx, dy, keep) — all [pixels, chunk]; alpha is post-threshold.
    """
    mx = data[ROW_MX:ROW_MX + 1, :]
    my = data[ROW_MY:ROW_MY + 1, :]
    ca = data[ROW_CA:ROW_CA + 1, :]
    cb = data[ROW_CB:ROW_CB + 1, :]
    cc = data[ROW_CC:ROW_CC + 1, :]
    opa = data[ROW_OPA:ROW_OPA + 1, :]
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    keep_p = power <= 0.0
    gexp = jnp.exp(jnp.where(keep_p, power, -1.0))
    alpha = jnp.minimum(ALPHA_MAX, opa * gexp)
    keep = keep_p & (alpha >= ALPHA_EPS)
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, gexp, dx, dy, keep


def _blend_state(alpha, t_carry, done, precision=None):
    """Shared forward blend bookkeeping for one chunk.

    Returns (eff, w, t_excl, t_new, done_new): effective alphas after the CUDA
    termination rule, blend weights, per-instance exclusive transmittance, and the
    carried transmittance / done latch for the next chunk.

    Inclusion is a PREFIX property along lanes (t_incl is non-increasing, so once it
    crosses TERM_EPS it never recovers), which collapses the second cumulative product
    over effective alphas: t_carry * cumprod(1 - eff)[i] == max(t_incl[i], floor)
    where floor is t_incl at the last included lane (t_carry when none is included —
    t_incl <= t_carry always, so filling the min with t_carry handles that case).
    One cumprod + a min-reduce + a shift instead of two cumprods (saves ~7
    roll-multiply [pixels, chunk] passes per chunk in both fwd and bwd kernels).
    """
    t_incl = t_carry * _cumprod_lanes(1.0 - alpha, precision)
    included = (t_incl >= TERM_EPS) & jnp.logical_not(done)
    eff = jnp.where(included, alpha, 0.0)
    floor = jnp.min(jnp.where(included, t_incl, t_carry), axis=1, keepdims=True)
    cum_incl = jnp.maximum(t_incl, floor)     # == t_carry * cumprod(1 - eff)
    rolled = pltpu.roll(cum_incl, shift=1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, cum_incl.shape, 1)
    t_excl = jnp.where(lane >= 1, rolled, t_carry)
    w = eff * t_excl
    # Carries via full-lane reductions: lane-slice extracts ([:, -1:]) would give the
    # while-loop carries a lane-offset layout Mosaic can't reconcile with the offset-0
    # initial values. min(t_incl) is the last lane (monotone); t_new == floor exactly
    # (min over lanes of max(t_incl, floor), and floor >= t_incl[last]).
    done_new = done | (jnp.min(t_incl, axis=1, keepdims=True) < TERM_EPS)
    return eff, w, t_excl, floor, done_new


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(spec: BlendSpec,
                start_ref,            # scalar prefetch: [num_tiles+1] aligned starts
                inst_ref,             # HBM [rows, aligned_budget]
                out_ref,              # VMEM block [1, pixels, out_channels]
                chunk_buf, t_ref, done_ref, flag_ref, dma_sems):
    # Loop state lives in VMEM scratch refs (t_ref/done_ref [nmemb, pixels, 1], the
    # accumulator directly in out_ref): fori_loop with predicated bodies — value
    # carries would force Mosaic to unify vector layouts across iterations
    # (lane-slices/reductions yield offset/replicated layouts that clash with the
    # offset-0 initials).
    #
    # The instance stream is double-buffered per member: chunk k+1's DMA is issued
    # before chunk k's compute, so HBM reads overlap VPU/MXU work. flag_ref (SMEM)
    # tracks whether a copy is in flight — needed because the early-exit prefix
    # leaves exactly one issued-but-unconsumed DMA that must be drained.
    #
    # `nmemb` INDEPENDENT tiles process per grid step, their chunk bodies emitted
    # interleaved: each body is a serial scalar/DMA/VPU/MXU latency chain (~1.5-2us
    # on v5e), so independent chains let the units overlap and the per-grid-step
    # pipeline overhead amortizes.
    fchunk = spec.fwd_chunk
    f32 = jnp.float32
    ncol = spec.blend_channels
    pid = pl.program_id(0)
    nmemb = t_ref.shape[0]

    starts, counts, nchunk_l, px_l, py_l = [], [], [], [], []
    for u in range(nmemb):
        t = pid * nmemb + u
        starts.append(start_ref[t])
        # start_ref holds [aligned starts (NT'+1) | true counts (NT')]: iterating
        # ceil(count/chunk) skips alignment padding entirely; the final partial
        # chunk may read past this tile's range (alignment is finer than the
        # chunk), so out-of-range lanes are alpha-masked.
        counts.append(start_ref[spec.padded_tiles(nmemb) + 1 + t])
        nchunk_l.append((counts[u] + fchunk - 1) // fchunk)
        px, py = _pixel_coords(t, spec, f32)
        px_l.append(px)
        py_l.append(py)
        out_ref[u, :, :] = jnp.zeros((spec.pixels, spec.out_channels), f32)
        t_ref[u, :, :] = jnp.ones((spec.pixels, 1), f32)
        done_ref[u, :, :] = jnp.zeros((spec.pixels, 1), f32)

    def copy_for(u, k, slot):
        offset = pl.multiple_of(starts[u] + k * fchunk, spec.align)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(offset, fchunk)],
            chunk_buf.at[u, slot], dma_sems.at[u, slot])

    for u in range(nmemb):
        @pl.when(nchunk_l[u] > 0)
        def _(u=u):
            copy_for(u, 0, 0).start()
        flag_ref[u] = jnp.where(nchunk_l[u] > 0, 1, 0)

    def body(k, _):
        for u in range(nmemb):
            inflight = flag_ref[u] == 1

            @pl.when(inflight)
            def _(u=u):
                alive = jnp.max(1.0 - done_ref[u, :, :]) > 0.0
                slot = jax.lax.rem(k, 2)
                copy_for(u, k, slot).wait()
                do_issue = alive & (k + 1 < nchunk_l[u])

                @pl.when(do_issue)
                def _():
                    copy_for(u, k + 1, jax.lax.rem(k + 1, 2)).start()

                flag_ref[u] = jnp.where(do_issue, 1, 0)

                @pl.when(alive)
                def _():
                    data = chunk_buf[u, slot]
                    alpha, _, _, _, _ = _chunk_alpha(data, px_l[u], py_l[u])
                    # final partial chunk: lanes at or past this tile's true count
                    # hold the NEXT tile's instances — mask them out of the blend
                    lane = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 1)
                    alpha = jnp.where(lane < counts[u] - k * fchunk, alpha, 0.0)
                    t_carry = t_ref[u, :, :]
                    done = done_ref[u, :, :] > 0.0
                    _, w, _, t_new, done_new = _blend_state(alpha, t_carry, done)
                    # acc[p, ch] += sum_i w[p, i] * attrs[ch, i] (MXU over chunk)
                    out_ref[u, :, 0:ncol] += jax.lax.dot_general(
                        w, data[ROW_R:ROW_R + ncol, :],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        precision=MM_PRECISION,
                        preferred_element_type=jnp.float32)
                    t_ref[u, :, :] = t_new
                    done_ref[u, :, :] = jnp.where(done_new, 1.0, 0.0)

        return ()

    nmax = nchunk_l[0]
    for u in range(1, nmemb):
        nmax = jnp.maximum(nmax, nchunk_l[u])
    jax.lax.fori_loop(0, nmax, body, ())
    for u in range(nmemb):
        out_ref[u, :, ncol:ncol + 1] = t_ref[u, :, :]


def _pixel_coords(tile_idx, spec: BlendSpec, dtype):
    ts = spec.tile_size
    ty = tile_idx // spec.grid_x
    tx = tile_idx % spec.grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (spec.pixels, 1), 0)
    px = (tx * ts + p % ts).astype(dtype)
    py = (ty * ts + p // ts).astype(dtype)
    return px, py


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(spec: BlendSpec,
                start_ref,            # scalar prefetch
                inst_ref,             # HBM [rows, aligned_budget]
                gout_ref,             # VMEM block [1, pixels, out_channels] cotangents
                res_ref,              # VMEM block [1, pixels, 2]: (Total, T_final)
                zeros_ref,            # HBM [rows, aligned_budget] (aliased -> grad out)
                dinst_ref,            # HBM output [rows, aligned_budget]
                chunk_buf, dchunk_buf, prefix_ref, t_ref, done_ref,
                flag_ref, wcount_ref, in_sems, out_sems):
    # Same double-buffered stream as the forward kernel, plus double-buffered gradient
    # WRITES: chunk k's dchunk DMA-out is issued without waiting; its buffer slot is
    # only reclaimed when chunk k+2 computes (writes are issued on the alive prefix of
    # chunks, so the write for k-2 is always in flight when compute k runs). wcount_ref
    # records issued writes so the epilogue can drain the last <=2.
    #
    # Like the forward kernel, `nmemb` independent tiles interleave per grid step.
    # Gradient-write safety: members are only paired when chunk == align (no spill
    # writes exist then — every tile's chunks cover exactly its padded range), so
    # no write of one member can overlap another member's slots.
    del zeros_ref
    f32 = jnp.float32
    ncol = spec.blend_channels
    ts = spec.tile_size
    pid = pl.program_id(0)
    nmemb = t_ref.shape[0]

    starts, counts, nchunk_l, px_l, py_l = [], [], [], [], []
    g_blend_l, tail_l, total_l, pbasis_l, cx_l, cy_l = [], [], [], [], [], []
    for u in range(nmemb):
        t = pid * nmemb + u
        starts.append(start_ref[t])
        counts.append(start_ref[spec.padded_tiles(nmemb) + 1 + t])
        nchunk_l.append((counts[u] + spec.chunk - 1) // spec.chunk)
        px, py = _pixel_coords(t, spec, f32)
        px_l.append(px)
        py_l.append(py)
        g_blend_l.append(gout_ref[u, :, 0:ncol])               # [P, ncol]
        g_t = gout_ref[u, :, ncol:ncol + 1]                    # [P, 1] dL/dT_final
        total_l.append(res_ref[u, :, 0:1])                     # [P, 1]
        t_final = res_ref[u, :, 1:2]                           # [P, 1]
        tail_l.append(g_t * t_final)
        prefix_ref[u, :, :] = jnp.zeros((spec.pixels, 1), f32)
        t_ref[u, :, :] = jnp.ones((spec.pixels, 1), f32)
        done_ref[u, :, :] = jnp.zeros((spec.pixels, 1), f32)
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
        zeros_col = jnp.zeros((spec.pixels, 1), f32)
        pbasis_l.append(jnp.concatenate(
            [ones_col, pxc, pyc, pxc * pxc, pxc * pyc, pyc * pyc, zeros_col,
             zeros_col], axis=1))                              # [P, 8]

    def in_copy(u, k, slot):
        offset = pl.multiple_of(starts[u] + k * spec.chunk, spec.align)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(offset, spec.chunk)],
            chunk_buf.at[u, slot], in_sems.at[u, slot])

    def out_copy(u, k, slot):
        # single-member mode only: the final partial chunk's write may spill past
        # this tile's range into the NEXT tile's slots with zero gradients
        # (out-of-range lanes are alpha-masked below); the grid runs tiles in order
        # and the epilogue drains all writes, so the owning tile's later write
        # always lands last — the spill is overwritten, never the other way round
        offset = pl.multiple_of(starts[u] + k * spec.chunk, spec.align)
        return pltpu.make_async_copy(
            dchunk_buf.at[u, slot],
            dinst_ref.at[:, pl.ds(offset, spec.chunk)],
            out_sems.at[u, slot])

    for u in range(nmemb):
        @pl.when(nchunk_l[u] > 0)
        def _(u=u):
            in_copy(u, 0, 0).start()
        flag_ref[u] = jnp.where(nchunk_l[u] > 0, 1, 0)
        wcount_ref[u] = 0

    gprec = (jax.lax.Precision.DEFAULT if spec.grad_precision == "bf16"
             else MM_PRECISION)

    def _bwd_chunk(u, k, slot):
        data = chunk_buf[u, slot]
        alpha, gexp, dx, dy, keep = _chunk_alpha(data, px_l[u], py_l[u])
        # mask lanes past this tile's true count (they hold the next tile's
        # instances); every gradient they produce then vanishes identically
        lane_m = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 1)
        in_tile = lane_m < counts[u] - k * spec.chunk
        alpha = jnp.where(in_tile, alpha, 0.0)
        keep = keep & in_tile
        prefix = prefix_ref[u, :, :]
        t_carry = t_ref[u, :, :]
        done = done_ref[u, :, :] > 0.0
        eff, w, t_excl, t_new, done_new = _blend_state(alpha, t_carry, done,
                                                        precision=gprec)

        if spec.grad_mode == "feature":
            # feature phase: only d(language_feature) is needed — the geometric
            # chain (gdot/suffix/dalpha/moments) is skipped entirely; w is the
            # only residual the feature gradient uses
            nf = spec.num_feat
            d_feat = jax.lax.dot_general(
                gout_ref[u, :, 3:3 + nf], w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=gprec,
                preferred_element_type=jnp.float32)            # [nf, C]

            @pl.when(k >= 2)
            def _():
                out_copy(u, k - 2, slot).wait()

            dchunk_buf[u, slot, 0:D_BASE, :] = jnp.zeros(
                (D_BASE, spec.chunk), f32)
            dchunk_buf[u, slot, D_BASE:D_BASE + nf, :] = d_feat
            if spec.rows > D_BASE + nf:
                dchunk_buf[u, slot, D_BASE + nf:, :] = jnp.zeros(
                    (spec.rows - D_BASE - nf, spec.chunk), f32)
            out_copy(u, k, slot).start()
            wcount_ref[u] = k + 1
            t_ref[u, :, :] = t_new
            done_ref[u, :, :] = jnp.where(done_new, 1.0, 0.0)
            return

        # gdot[p, i] = sum_ch g_ch[p] * attr_ch[i]
        gdot = jax.lax.dot_general(
            g_blend_l[u], data[ROW_R:ROW_R + ncol, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=gprec,
            preferred_element_type=jnp.float32)                # [P, C]
        contrib = w * gdot
        prefix_incl = prefix + _cumsum_lanes(contrib, precision=gprec)
        suffix = total_l[u] - prefix_incl
        live = (eff > 0.0) & keep
        dalpha = jnp.where(
            live,
            t_excl * gdot - (suffix + tail_l[u]) / (1.0 - eff + 1e-20),
            0.0)

        # chain: alpha = min(0.99, opa * gexp); clamped -> zero grad (jnp semantics)
        opa = data[ROW_OPA:ROW_OPA + 1, :]
        dag = jnp.where((opa * gexp) < ALPHA_MAX, dalpha, 0.0)
        dpower = dag * alpha
        # All six per-instance reductions are sums over pixels of dpower times a
        # polynomial of degree <=2 in (dx, dy) = ((px'-mx'), (py'-my')), so they factor
        # through the moments of dpower against the loop-invariant pixel basis — ONE
        # MXU contraction instead of ~25 VPU passes + 6 sublane reductions. d_opa uses
        # dag*gexp == dpower/opa (exact where unclamped; both sides 0 elsewhere).
        mom = jax.lax.dot_general(
            pbasis_l[u], dpower,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=gprec,
            preferred_element_type=jnp.float32)                # [8, C]
        m0 = mom[0:1, :]
        m_x = mom[1:2, :]
        m_y = mom[2:3, :]
        m_xx = mom[3:4, :]
        m_xy = mom[4:5, :]
        m_yy = mom[5:6, :]
        ca = data[ROW_CA:ROW_CA + 1, :]
        cb = data[ROW_CB:ROW_CB + 1, :]
        cc = data[ROW_CC:ROW_CC + 1, :]
        mxq = data[ROW_MX:ROW_MX + 1, :] - cx_l[u]             # [1, C] tile-centered
        myq = data[ROW_MY:ROW_MY + 1, :] - cy_l[u]
        sdx = m_x - mxq * m0                                   # sum dpower*dx
        sdy = m_y - myq * m0
        d_opa = jnp.where(opa > 0.0, m0 / jnp.where(opa > 0.0, opa, 1.0), 0.0)
        d_ca = -0.5 * (m_xx - 2.0 * mxq * m_x + mxq * mxq * m0)
        d_cb = -(m_xy - mxq * m_y - myq * m_x + mxq * myq * m0)
        d_cc = -0.5 * (m_yy - 2.0 * myq * m_y + myq * myq * m0)
        d_mx = ca * sdx + cb * sdy
        d_my = cc * sdy + cb * sdx
        # d attrs[ch, i] = sum_p g_blend[p, ch] * w[p, i]
        d_attr = jax.lax.dot_general(
            g_blend_l[u], w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=gprec,
            preferred_element_type=jnp.float32)                # [ncol, C]

        # reclaim dchunk_buf[u, slot]: the write issued for chunk k-2 used this slot
        @pl.when(k >= 2)
        def _():
            out_copy(u, k - 2, slot).wait()

        dchunk_buf[u, slot, ROW_MX:ROW_MX + 1, :] = d_mx
        dchunk_buf[u, slot, ROW_MY:ROW_MY + 1, :] = d_my
        dchunk_buf[u, slot, ROW_CA:ROW_CA + 1, :] = d_ca
        dchunk_buf[u, slot, ROW_CB:ROW_CB + 1, :] = d_cb
        dchunk_buf[u, slot, ROW_CC:ROW_CC + 1, :] = d_cc
        dchunk_buf[u, slot, ROW_OPA:ROW_OPA + 1, :] = d_opa
        dchunk_buf[u, slot, ROW_R:ROW_R + ncol, :] = d_attr
        if spec.rows > D_BASE + spec.num_feat:
            dchunk_buf[u, slot, D_BASE + spec.num_feat:, :] = jnp.zeros(
                (spec.rows - D_BASE - spec.num_feat, spec.chunk), f32)
        out_copy(u, k, slot).start()
        wcount_ref[u] = k + 1
        prefix_ref[u, :, :] = prefix + jnp.sum(contrib, axis=1, keepdims=True)
        t_ref[u, :, :] = t_new
        done_ref[u, :, :] = jnp.where(done_new, 1.0, 0.0)

    def body(k, _):
        for u in range(nmemb):
            inflight = flag_ref[u] == 1

            @pl.when(inflight)
            def _(u=u):
                alive = jnp.max(1.0 - done_ref[u, :, :]) > 0.0
                slot = jax.lax.rem(k, 2)
                in_copy(u, k, slot).wait()
                do_issue = alive & (k + 1 < nchunk_l[u])

                @pl.when(do_issue)
                def _():
                    in_copy(u, k + 1, jax.lax.rem(k + 1, 2)).start()

                flag_ref[u] = jnp.where(do_issue, 1, 0)

                @pl.when(alive)
                def _():
                    _bwd_chunk(u, k, slot)

        return ()

    nmax = nchunk_l[0]
    for u in range(1, nmemb):
        nmax = jnp.maximum(nmax, nchunk_l[u])
    jax.lax.fori_loop(0, nmax, body, ())

    # drain the last <=2 outstanding gradient writes per member
    for u in range(nmemb):
        wn = wcount_ref[u]

        @pl.when(wn >= 1)
        def _(u=u, wn=wn):
            out_copy(u, wn - 1, jax.lax.rem(wn - 1, 2)).wait()

        @pl.when(wn >= 2)
        def _(u=u, wn=wn):
            out_copy(u, wn - 2, jax.lax.rem(wn - 2, 2)).wait()


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

def _pad_sched(aligned_start, spec: BlendSpec, nmemb: int):
    """[starts (NT+1) | counts (NT)] -> padded [starts (NT'+1) | counts (NT')]."""
    nt = spec.num_tiles
    ntp = spec.padded_tiles(nmemb)
    if ntp == nt:
        return aligned_start
    starts = aligned_start[:nt + 1]
    counts = aligned_start[nt + 1:]
    pad = ntp - nt
    starts = jnp.concatenate([starts, jnp.repeat(starts[-1:], pad)])
    counts = jnp.concatenate([counts, jnp.zeros((pad,), counts.dtype)])
    return jnp.concatenate([starts, counts])


# Independent tiles processed per grid step: their serial per-chunk latency chains
# (DMA waits + ~6 MXU issues each, ~2-5us) interleave, and the per-grid-step
# pipeline overhead amortizes (the bwd kernel's empty-work floor measured ~5.4us
# per step on v5e). Env-tunable for on-chip A/B (scripts/profile_stages.py).
NMEMB = int(__import__("os").environ.get("LANGSPLAT_NMEMB", 2))


def _fwd_call(packed, aligned_start, spec: BlendSpec, interpret: bool):
    nmemb = NMEMB if spec.num_tiles >= NMEMB else 1
    ntp = spec.padded_tiles(nmemb)
    sched = _pad_sched(aligned_start, spec, nmemb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntp // nmemb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((nmemb, spec.pixels, spec.out_channels),
                               lambda t, s: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nmemb, 2, spec.rows, spec.fwd_chunk), jnp.float32),
            pltpu.VMEM((nmemb, spec.pixels, 1), jnp.float32),   # t_carry
            pltpu.VMEM((nmemb, spec.pixels, 1), jnp.float32),   # done latch
            pltpu.SMEM((nmemb,), jnp.int32),             # copy-in-flight flags
            pltpu.SemaphoreType.DMA((nmemb, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((ntp, spec.pixels, spec.out_channels),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(sched, packed)
    return out[:spec.num_tiles]


def _bwd_call(packed, aligned_start, g_out, residuals, spec: BlendSpec, interpret: bool):
    # pairing is only write-safe when chunk == align: then every tile's chunks
    # cover exactly its padded range (no spill writes), so concurrent members
    # cannot touch each other's slots
    nmemb = NMEMB if (spec.chunk == spec.align and spec.num_tiles >= NMEMB) else 1
    ntp = spec.padded_tiles(nmemb)
    sched = _pad_sched(aligned_start, spec, nmemb)
    if ntp != spec.num_tiles:
        pad = ntp - spec.num_tiles
        g_out = jnp.concatenate(
            [g_out, jnp.zeros((pad,) + g_out.shape[1:], g_out.dtype)])
        residuals = jnp.concatenate(
            [residuals, jnp.zeros((pad,) + residuals.shape[1:], residuals.dtype)])
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
            pltpu.VMEM((nmemb, 2, spec.rows, spec.chunk), jnp.float32),  # in bufs
            pltpu.VMEM((nmemb, 2, spec.rows, spec.chunk), jnp.float32),  # out bufs
            pltpu.VMEM((nmemb, spec.pixels, 1), jnp.float32),   # prefix carry
            pltpu.VMEM((nmemb, spec.pixels, 1), jnp.float32),   # t_carry
            pltpu.VMEM((nmemb, spec.pixels, 1), jnp.float32),   # done latch
            pltpu.SMEM((nmemb,), jnp.int32),             # copy-in-flight flags
            pltpu.SMEM((nmemb,), jnp.int32),             # issued-write counts
            pltpu.SemaphoreType.DMA((nmemb, 2)),
            pltpu.SemaphoreType.DMA((nmemb, 2)),
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
    fwd_mult: int = 2,
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
