"""Colormap helpers for relevancy/feature visualization.

API mirror of the reference's nerfstudio-derived `/root/reference/eval/colormaps.py`:
`ColormapOptions`, `apply_colormap`, `apply_float_colormap`, `apply_pca_colormap` —
implemented over matplotlib's colormap tables (turbo/viridis/...) in numpy/jnp.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ColormapOptions:
    colormap: str = "default"
    normalize: bool = False
    colormap_min: float = 0.0
    colormap_max: float = 1.0
    invert: bool = False


def _lut(name: str, n: int = 256) -> np.ndarray:
    import matplotlib
    cmap = matplotlib.colormaps[name]
    return cmap(np.linspace(0, 1, n))[:, :3].astype(np.float32)


def apply_float_colormap(image: np.ndarray, colormap: str = "viridis") -> np.ndarray:
    """[..., 1] floats in [0,1] -> [..., 3] colors."""
    image = np.asarray(image)
    if colormap == "gray":
        return np.repeat(image, 3, axis=-1)
    lut = _lut("turbo" if colormap == "default" else colormap)
    idx = np.clip(np.nan_to_num(image[..., 0]) * (len(lut) - 1), 0,
                  len(lut) - 1).astype(np.int64)
    return lut[idx]


def apply_colormap(image: np.ndarray,
                   colormap_options: ColormapOptions = ColormapOptions(),
                   eps: float = 1e-9) -> np.ndarray:
    """Dispatch on channel count like the reference apply_colormap: 1 -> float colormap,
    3 -> passthrough, D -> PCA projection."""
    image = np.asarray(image)
    if image.shape[-1] == 3:
        return image
    if image.dtype == bool:
        image = image.astype(np.float32)
    if image.shape[-1] == 1 and np.issubdtype(image.dtype, np.floating):
        output = image
        if colormap_options.normalize:
            output = output - np.min(output)
            output = output / (np.max(output) + eps)
        output = (output * (colormap_options.colormap_max
                            - colormap_options.colormap_min)
                  + colormap_options.colormap_min)
        output = np.clip(output, 0, 1)
        if colormap_options.invert:
            output = 1 - output
        return apply_float_colormap(output, colormap_options.colormap)
    return apply_pca_colormap(image)


def apply_pca_colormap(image: np.ndarray,
                       pca_mat: np.ndarray | None = None,
                       ignore_zeros: bool = True) -> np.ndarray:
    """[..., D] high-dim features -> [..., 3] via PCA with per-channel outlier
    normalization (reference apply_pca_colormap behavior)."""
    image = np.asarray(image)
    flat = image.reshape(-1, image.shape[-1])
    valid = np.ones(len(flat), bool)
    if ignore_zeros:
        valid = np.abs(flat).sum(axis=-1) > 0
    base = flat[valid] if valid.any() else flat
    if pca_mat is None:
        centered = base - base.mean(axis=0, keepdims=True)
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        pca_mat = vt[:3].T                                  # [D, 3]
    proj = flat @ pca_mat                                    # [N, 3]
    # robust per-channel scaling by median absolute deviation
    d = np.abs(proj - np.median(proj, axis=0, keepdims=True))
    mdev = np.median(d, axis=0, keepdims=True) + 1e-9
    s = d / mdev
    rins = proj[(s < 3.0).all(axis=-1)] if (s < 3.0).any() else proj
    mins, maxs = rins.min(axis=0), rins.max(axis=0)
    proj = np.clip((proj - mins) / (maxs - mins + 1e-9), 0, 1)
    return proj.reshape(*image.shape[:-1], 3)


NAMED_COLORS = {
    "red": (1.0, 0.0, 0.0), "green": (0.0, 1.0, 0.0), "blue": (0.0, 0.0, 1.0),
    "white": (1.0, 1.0, 1.0), "black": (0.0, 0.0, 0.0),
    "yellow": (1.0, 1.0, 0.0), "cyan": (0.0, 1.0, 1.0), "magenta": (1.0, 0.0, 1.0),
    "orange": (1.0, 0.647, 0.0), "purple": (0.502, 0.0, 0.502),
}
