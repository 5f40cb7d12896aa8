"""Pallas TPU kernel: segment sums over contiguous, boundedly-short segments.

The packing-gather backward (rasterize_pallas._gather_attrs_bwd) must reduce
per-instance gradient columns [rows, budget] (pre-sorted into gaussian-major
order) to per-Gaussian sums [rows, N]. The XLA formulation — lane cumsum + ONE
boundary gather `csum[:, ends]` — pays the TPU's per-index gather tax (~21 ns
per column index, locality- and sortedness-independent: measured in
scripts/micro_sorted_gather.py, `indices_are_sorted=True` changes nothing), i.e.
~21 ms at N=1M. This kernel exploits the two structural facts XLA's gather
cannot:

  * segments are CONTIGUOUS (`ends` is monotone), so an output block of O
    Gaussians consumes one contiguous input span, streamable by sequential DMA;
  * segments are SHORT (max_tiles_per_gaussian caps counts at <=32, mean ~2-3),
    so that span is at most 32*O columns and ~2.5*O on average.

Per grid step (one block of O Gaussians): double-buffered DMA of the span's
[rows, BJ] column blocks from HBM, then for each block one comparison mask
m[j, i] = (lo_i <= j_global < hi_i) — exactly one-hot per column j since the
segments partition the span — contracted on the MXU: acc += d_blk @ m. The
mask matmul is exact in f32 (m is 0/1) and the accumulation order is fixed, so
the result is deterministic. Measured ~4x the boundary-gather formulation at
bench sizes (scripts/micro_segsum.py).

No reference counterpart: the CUDA path accumulates per-Gaussian gradients with
atomics inside renderCUDA's backward [inferred, SURVEY N4]; this is the
deterministic TPU replacement's reduction stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MM_PRECISION = jax.lax.Precision.HIGHEST


def _kernel(block_in: int, block_out: int,
            scal_ref,            # SMEM prefetch: [grid] blk_lo ++ [grid] nb
            lo_ref, hi_ref,      # VMEM blocks [1, O] int32 segment bounds
            dpre_ref,            # HBM/ANY [rows, width_padded] f32
            out_ref,             # VMEM block [rows, O] f32
            buf, sems):          # scratch: [2, rows, BJ] f32, DMA sems [2]
    k = pl.program_id(0)
    grid = pl.num_programs(0)
    base0 = pl.multiple_of(scal_ref[k] * block_in, block_in)
    nb = scal_ref[grid + k]
    rows = out_ref.shape[0]

    def copy_for(b, slot):
        return pltpu.make_async_copy(
            dpre_ref.at[:, pl.ds(base0 + b * block_in, block_in)],
            buf.at[slot], sems.at[slot])

    @pl.when(nb > 0)
    def _():
        copy_for(0, 0).start()

    out_ref[:, :] = jnp.zeros((rows, block_out), jnp.float32)
    lo = lo_ref[0, :, :]         # [1, O]
    hi = hi_ref[0, :, :]

    def body(b, _):
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < nb)
        def _():
            copy_for(b + 1, 1 - slot).start()

        copy_for(b, slot).wait()
        jg = (base0 + b * block_in
              + jax.lax.broadcasted_iota(jnp.int32, (block_in, block_out), 0))
        m = ((jg >= lo) & (jg < hi)).astype(jnp.float32)  # one-hot per column j
        out_ref[:, :] += jax.lax.dot_general(
            buf[slot], m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=MM_PRECISION)
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("n_out", "interpret", "block_in",
                                    "block_out"))
def segment_sum_bounded(d_pre: jnp.ndarray, ends: jnp.ndarray, n_out: int, *,
                        interpret: bool = False, block_in: int = 512,
                        block_out: int = 512) -> jnp.ndarray:
    """out[:, g] = d_pre[:, ends[g]:ends[g+1]].sum(axis=1) for g in [0, n_out).

    `ends` [n_out + 1] int32 must be monotone non-decreasing with values in
    [0, d_pre.shape[1]]. Designed for short segments (the per-grid-step input
    span is (ends[(k+1)*O] - ends[k*O]) columns; with the binning's
    max_tiles_per_gaussian cap it is bounded by tmax * block_out).
    """
    rows, width = d_pre.shape
    # sublane-align the row axis: Mosaic cannot DMA-slice a non-8-multiple
    # sublane extent at a dynamic lane offset (phase A's RGB-only backward has
    # 9 gradient rows); the MXU pads M to a tile anyway, so the pad is free
    rpad = -(-rows // 8) * 8
    if rpad > rows:
        d_pre = jnp.pad(d_pre, ((0, rpad - rows), (0, 0)))
    o, bj = block_out, block_in
    grid = max(-(-n_out // o), 1)
    npad = grid * o
    ends = ends.astype(jnp.int32)
    lo, hi = ends[:-1], ends[1:]
    if npad > n_out:
        pad = jnp.full((npad - n_out,), width, jnp.int32)
        # padding outputs get empty segments at the far end; they never extend
        # a real block's span past ceil(width/bj)*bj
        lo = jnp.concatenate([lo, pad])
        hi = jnp.concatenate([hi, pad])
    lo2d = lo.reshape(grid, 1, o)   # unit middle dim: TPU block-shape rule wants
    hi2d = hi.reshape(grid, 1, o)   # the trailing dims (1, o) to equal the array's
    blk_lo = lo2d[:, 0, 0] // bj
    nb = (hi2d[:, 0, -1] - blk_lo * bj + bj - 1) // bj
    wpad = -(-max(width, 1) // bj) * bj
    if wpad > width:
        d_pre = jnp.pad(d_pre, ((0, 0), (0, wpad - width)))
    scalars = jnp.concatenate([blk_lo, nb]).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1, o), lambda k, s: (k, 0, 0)),
            pl.BlockSpec((1, 1, o), lambda k, s: (k, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((rpad, o), lambda k, s: (0, k)),
        scratch_shapes=[
            pltpu.VMEM((2, rpad, bj), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, bj, o),
        out_shape=jax.ShapeDtypeStruct((rpad, npad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, lo2d, hi2d, d_pre)
    return out[:rows, :n_out]
