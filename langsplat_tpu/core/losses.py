"""Training losses and image metrics: L1, L2, SSIM, PSNR.

Parity oracles: `/root/reference/utils/loss_utils.py:17-63` (L1/L2/SSIM with an 11x11
sigma-1.5 Gaussian window, per-channel depthwise convolution, SAME padding) and
`/root/reference/utils/image_utils.py` (PSNR over flattened per-image MSE).

TPU notes: the SSIM window convolutions are expressed as `lax.conv_general_dilated` with
feature_group_count=C (depthwise) in NCHW — XLA lowers these to MXU-friendly convs and
fuses the elementwise SSIM map arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR; inputs [..., C, H, W] in [0,1]. Returns [...] (batch dims kept)."""
    mse = jnp.mean((pred - target) ** 2, axis=(-3, -2, -1))
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse + 1e-20))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return g.astype(np.float32)


def _depthwise_conv(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """img [C, H, W] (or [B, C, H, W]) depthwise SAME blur with a separable window.

    The 2-D Gaussian window factors as outer(g, g), so two 1-D k-tap passes do the
    work of one k*k-tap conv (5.5x fewer MACs at k=11) — identical result up to f32
    rounding (matches the reference's conv2d of the outer-product window).
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    c = img.shape[1]
    k = window.shape[0]
    kh = jnp.broadcast_to(window[None, None, :, None], (c, 1, k, 1))
    kw = jnp.broadcast_to(window[None, None, None, :], (c, 1, 1, k))
    # HIGHEST: TPU convs default to single-pass bf16 inputs; the SSIM map
    # divides by (sigma1_sq + sigma2_sq + c2) with c2 = 9e-4, so a ~4e-3
    # absolute bf16 error in E[x^2] - mu^2 on flat bright regions blows the
    # map far outside [-1, 1] (observed on-chip as NEGATIVE total RGB losses);
    # CPU tests never see it because CPU convs ignore precision
    out = jax.lax.conv_general_dilated(
        img, kh, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    out = jax.lax.conv_general_dilated(
        out, kw, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return out[0] if squeeze else out


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over the image; inputs [C, H, W] (or batched [B, C, H, W]) in [0,1]."""
    window = jnp.asarray(_gaussian_window(window_size, sigma))
    mu1 = _depthwise_conv(img1, window)
    mu2 = _depthwise_conv(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


def rgb_loss(pred: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float = 0.2) -> jnp.ndarray:
    """Phase-A photometric loss: (1-l)*L1 + l*(1-SSIM) (/root/reference/train.py:101-103)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, gt) + lambda_dssim * (1.0 - ssim(pred, gt))


def masked_l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Phase-B feature loss: L1 over mask-multiplied maps (/root/reference/train.py:96-99).

    Note the reference divides by the FULL pixel count (plain mean of masked tensors),
    not by the mask population — preserved here for loss-scale parity.
    """
    return jnp.mean(jnp.abs(pred * mask - gt * mask))
