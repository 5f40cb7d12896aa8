"""K-nearest-neighbor mean squared distance for scale initialization.

TPU-native replacement for the `simple-knn` CUDA extension (component N5, SURVEY.md §2.1;
sole call site `/root/reference/scene/gaussian_model.py:180-181`): returns, per point, the
mean of squared distances to its 3 nearest neighbors.

Design: chunked brute force — each chunk of queries computes distances to ALL points as one
[chunk, N] matrix via the |a-b|^2 = |a|^2 - 2ab + |b|^2 expansion (the -2ab term is an MXU
matmul), then takes the 3 smallest with `lax.top_k` on negated distances. One-shot at scene
init, O(N^2) FLOPs on the MXU: ~1 TFLOP at N=400k, comfortably a few seconds on one chip —
no spatial grid needed (the reference's Morton-grid exists only because brute force is slow
on per-thread CUDA; on the MXU it is the fast path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3, chunk: int = 1024) -> jnp.ndarray:
    """points [N, 3] -> [N] mean squared distance to each point's k nearest neighbors."""
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    sq = jnp.sum(pts * pts, axis=-1)  # [Np]
    num_chunks = pts.shape[0] // chunk

    def one_chunk(c):
        q = jax.lax.dynamic_slice_in_dim(pts, c * chunk, chunk)       # [chunk, 3]
        qsq = jax.lax.dynamic_slice_in_dim(sq, c * chunk, chunk)      # [chunk]
        d2 = qsq[:, None] - 2.0 * (q @ pts.T) + sq[None, :]           # [chunk, Np]
        # mask padding columns and self-distance (self-distance is exactly the diagonal;
        # use a large sentinel, padding rows handled by caller slicing)
        col = jnp.arange(pts.shape[0])
        d2 = jnp.where(col[None, :] >= n, jnp.inf, d2)
        row_global = c * chunk + jnp.arange(chunk)
        d2 = jnp.where(col[None, :] == row_global[:, None], jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(jnp.maximum(-neg_top, 0.0), axis=-1)

    out = jax.lax.map(one_chunk, jnp.arange(num_chunks))
    return out.reshape(-1)[:n]
