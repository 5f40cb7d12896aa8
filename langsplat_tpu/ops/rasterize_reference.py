"""Dense pure-JAX rasterizer: the correctness oracle for the tiled/Pallas paths.

Evaluates every Gaussian at every pixel (O(N*H*W)) in depth-sorted front-to-back order with
the exact alpha-blending semantics of the reference's `renderCUDA` blend kernel (component
N4 in SURVEY.md §2.1, contract pinned at `/root/reference/gaussian_renderer/__init__.py:
96-105`): alpha = min(0.99, opacity * exp(power)), skip when power > 0 or alpha < 1/255,
per-pixel termination once transmittance would drop below 1e-4, background composited as
C += T_final * bg on the RGB channels only (the language channels get no background).

Differentiable end-to-end (the termination mask is stop-gradient, matching the CUDA
backward which only visits contributing Gaussians). Slow by construction — use for tests
and tiny scenes (BASELINE config 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from langsplat_tpu.ops.projection import PreprocessOut

ALPHA_EPS = 1.0 / 255.0
TERM_EPS = 1e-4
ALPHA_MAX = 0.99


def blend_weights(alphas: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Front-to-back blending weights with CUDA-parity termination.

    Args:
      alphas: [N, ...] per-(gaussian, pixel) alphas in depth order (invalid entries 0).

    Returns:
      (weights [N, ...], final_transmittance [...]) with
      weights_i = alpha_i * prod_{j<i, included}(1 - alpha_j), zeroed after termination.
    """
    # Inclusion is a prefix property: gaussian i contributes iff the transmittance AFTER
    # blending it stays >= TERM_EPS (the CUDA `test_T < 0.0001 -> done` rule) and no earlier
    # gaussian terminated the pixel. Because skipped gaussians leave T unchanged, T only
    # evolves through included ones; the first candidate that would push T below the
    # threshold is excluded and ends the pixel.
    one_minus = 1.0 - alphas
    t_incl = jnp.cumprod(one_minus, axis=0)          # T after blending 0..i (if all included)
    included = t_incl >= TERM_EPS
    # prefix-and along the gaussian axis
    included = jnp.cumprod(included.astype(alphas.dtype), axis=0)
    included = jax.lax.stop_gradient(included)
    eff_alpha = alphas * included
    t_excl = jnp.cumprod(1.0 - eff_alpha, axis=0) / (1.0 - eff_alpha + 1e-20)
    weights = eff_alpha * t_excl
    t_final = jnp.prod(1.0 - eff_alpha, axis=0)
    return weights, t_final


def compute_alphas(means2d: jnp.ndarray, conics: jnp.ndarray, opacities: jnp.ndarray,
                   pix_x: jnp.ndarray, pix_y: jnp.ndarray,
                   valid: jnp.ndarray) -> jnp.ndarray:
    """Per-(gaussian, pixel) alpha. means2d [N,2], conics [N,3], opacities [N],
    pix_x/pix_y [...pix], valid [N] -> [N, ...pix]."""
    dx = pix_x[None] - means2d[:, 0].reshape((-1,) + (1,) * pix_x.ndim)
    dy = pix_y[None] - means2d[:, 1].reshape((-1,) + (1,) * pix_y.ndim)
    a = conics[:, 0].reshape((-1,) + (1,) * pix_x.ndim)
    b = conics[:, 1].reshape((-1,) + (1,) * pix_x.ndim)
    c = conics[:, 2].reshape((-1,) + (1,) * pix_x.ndim)
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    opa = opacities.reshape((-1,) + (1,) * pix_x.ndim)
    # Double-where: exp only ever sees non-positive, non-NaN powers so cotangents through
    # the discarded branch stay finite (culled slots can carry NaN/inf screen coords).
    keep_p = (power <= 0.0) & valid.reshape((-1,) + (1,) * pix_x.ndim)
    power_safe = jnp.where(keep_p, power, -1.0)
    alpha = jnp.minimum(ALPHA_MAX, opa * jnp.exp(power_safe))
    keep = keep_p & (alpha >= ALPHA_EPS)
    return jnp.where(keep, alpha, 0.0)


def rasterize_dense(
    prep: PreprocessOut,
    opacities: jnp.ndarray,
    features: jnp.ndarray | None,
    bg: jnp.ndarray,
    *,
    image_height: int,
    image_width: int,
    tile_size: int | None = None,
) -> dict:
    """Render RGB [3,H,W] (+ language feature image [F,H,W]) from preprocessed Gaussians.

    Args:
      prep: PreprocessOut (any order; depth-sorted internally).
      opacities: [N] activated opacities.
      features: optional [N, F] L2-normalized language features.
      bg: [3] background color (RGB only).
      tile_size: when given, reproduce the tile-binned contribution footprint exactly — a
        Gaussian contributes at a pixel iff its tile rect covers the pixel's tile (the CUDA
        semantics; alpha tails beyond the rect are cut). When None, evaluate everywhere.
    """
    n = prep.means2d.shape[0]
    order = jnp.argsort(jnp.where(prep.visible, prep.depths, jnp.inf))
    means2d = prep.means2d[order]
    conics = prep.conics[order]
    colors = prep.colors[order]
    opac = opacities[order]
    valid = prep.visible[order]

    ys = jnp.arange(image_height, dtype=means2d.dtype)
    xs = jnp.arange(image_width, dtype=means2d.dtype)
    pix_y, pix_x = jnp.meshgrid(ys, xs, indexing="ij")

    alphas = compute_alphas(means2d, conics, opac, pix_x, pix_y, valid)  # [N, H, W]
    if tile_size is not None:
        ptx = (pix_x / tile_size).astype(jnp.int32)[None]
        pty = (pix_y / tile_size).astype(jnp.int32)[None]
        tmin = prep.tiles_min[order]
        tmax = prep.tiles_max[order]
        in_rect = ((ptx >= tmin[:, 0, None, None]) & (ptx < tmax[:, 0, None, None])
                   & (pty >= tmin[:, 1, None, None]) & (pty < tmax[:, 1, None, None]))
        alphas = jnp.where(in_rect, alphas, 0.0)
    weights, t_final = blend_weights(alphas)

    image = jnp.einsum("nhw,nc->chw", weights, colors) + t_final[None] * bg[:, None, None]
    out = {"render": image, "final_transmittance": t_final}
    if features is not None:
        feats = features[order]
        out["language_feature_image"] = jnp.einsum("nhw,nf->fhw", weights, feats)
    del n
    return out
