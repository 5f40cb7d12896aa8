"""Per-Gaussian forward preprocess: frustum cull, projection, EWA 2D covariance, conic,
screen radius, tile rect, SH->RGB.

This is the TPU-native equivalent of the reference's `preprocessCUDA` stage (component N2 in
SURVEY.md §2.1, whose behavior is pinned by the pure-Python escape hatches at
`/root/reference/gaussian_renderer/__init__.py:64-82`). It is pure vmapped jnp over the
padded Gaussian axis — embarrassingly parallel VPU work that XLA fuses into one pass; under
a device mesh it shards on the Gaussian axis (SURVEY.md §2.3 "TP" row).

Numeric conventions preserved for parity with the CUDA rasterizer family:
  - matrices are row-vector convention (`p_hom = [p,1] @ M`), as built by the reference's
    camera (`/root/reference/scene/cameras.py:54-57`);
  - near-cull at view z <= 0.2; projective divide by (w + 1e-7);
  - EWA Jacobian clamps x/z and y/z to +-1.3*tanfov; +0.3 low-pass dilation on the 2D
    covariance diagonal;
  - radius = ceil(3 * sqrt(max eigenvalue)); ndc->pix v -> ((v+1)*S - 1)/2.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from langsplat_tpu.core import sh as sh_lib
from langsplat_tpu.core import transforms


class PreprocessOut(NamedTuple):
    """Per-Gaussian screen-space quantities (all [N, ...]; padded slots are invalid)."""
    means2d: jnp.ndarray    # [N, 2] pixel coords
    depths: jnp.ndarray     # [N] view-space z
    conics: jnp.ndarray     # [N, 3] inverse 2D covariance (a, b, c): ax^2 + 2bxy + cy^2
    radii: jnp.ndarray      # [N] int32 screen radius in pixels (0 => invisible)
    colors: jnp.ndarray     # [N, 3] RGB from SH (or passthrough of colors_precomp)
    tiles_min: jnp.ndarray  # [N, 2] int32 inclusive (tx0, ty0)
    tiles_max: jnp.ndarray  # [N, 2] int32 exclusive (tx1, ty1)
    visible: jnp.ndarray    # [N] bool — survives cull and has nonzero radius


def _affine4(points: jnp.ndarray, matrix: jnp.ndarray, cols: int) -> jnp.ndarray:
    """Row-vector transform [x y z 1] @ matrix[:, :cols] as exact-f32 elementwise ops.

    TPU matmuls default to bf16 MXU inputs, which quantizes projected positions to
    ~2px at 1024-wide images and collapses nearby depths into ties (observed 37-way
    f32-equal depth groups); a K=4 contraction is VPU work anyway, so expand it.
    """
    x, y, z = points[:, 0:1], points[:, 1:2], points[:, 2:3]
    m = matrix
    return x * m[0, :cols] + y * m[1, :cols] + z * m[2, :cols] + m[3, :cols]


def project_points(means3d: jnp.ndarray, viewmatrix: jnp.ndarray,
                   projmatrix: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (p_view [N,3], p_ndc [N,3]). Row-vector convention."""
    p_view = _affine4(means3d, viewmatrix, 3)
    p_hom = _affine4(means3d, projmatrix, 4)
    p_ndc = p_hom[:, :3] / (p_hom[:, 3:4] + 1e-7)
    return p_view, p_ndc


def compute_cov2d(means3d: jnp.ndarray, cov3d: jnp.ndarray, viewmatrix: jnp.ndarray,
                  tanfovx: float, tanfovy: float, focal_x: float,
                  focal_y: float) -> jnp.ndarray:
    """EWA splat of the 3D covariance to screen space; returns [N, 3] (xx, xy, yy).

    cov2d = J W Sigma W^T J^T + diag(0.3, 0.3), where W is the world->view rotation and J
    the perspective Jacobian evaluated at the (fov-clamped) view-space mean.
    """
    t = _affine4(means3d, viewmatrix, 3)
    tz = t[:, 2]
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    txtz = jnp.clip(t[:, 0] / tz, -limx, limx)
    tytz = jnp.clip(t[:, 1] / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    # J rows: d(pix)/d(view). Third row unused (zeros) — fold directly into a 2x3.
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(tz)
    J = jnp.stack([
        jnp.stack([focal_x * inv_z, zeros, -focal_x * tx * inv_z2], axis=-1),
        jnp.stack([zeros, focal_y * inv_z, -focal_y * ty * inv_z2], axis=-1),
    ], axis=-2)  # [N, 2, 3]

    W = viewmatrix[:3, :3].T  # world->view rotation acting on column vectors
    # hand-expanded [N,2,3] x [3,3] x [N,3,3] contraction: exact f32 on the VPU (TPU
    # matmuls default to bf16 MXU inputs, and K=3 is too small to earn MXU passes)
    T = [[sum(J[:, i, j] * W[j, k] for j in range(3)) for k in range(3)]
         for i in range(2)]  # [2][3] of [N]
    TS = [[sum(T[i][j] * cov3d[:, j, k] for j in range(3)) for k in range(3)]
          for i in range(2)]  # T @ Sigma
    xx = sum(TS[0][k] * T[0][k] for k in range(3)) + 0.3
    xy = sum(TS[0][k] * T[1][k] for k in range(3))
    yy = sum(TS[1][k] * T[1][k] for k in range(3)) + 0.3
    return jnp.stack([xx, xy, yy], axis=-1)


def preprocess(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    shs: jnp.ndarray | None,
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    *,
    image_height: int,
    image_width: int,
    tanfovx: float,
    tanfovy: float,
    sh_degree: int,
    tile_size: int,
    scale_modifier: float = 1.0,
    cov3d_precomp: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
) -> PreprocessOut:
    """Vectorized preprocess over the (padded) Gaussian axis.

    `alive` masks padded capacity slots (SURVEY.md §7 hard part 1); dead slots come out
    invisible with radius 0 so they never enter binning or blending.
    """
    n = means3d.shape[0]
    focal_x = image_width / (2.0 * tanfovx)
    focal_y = image_height / (2.0 * tanfovy)

    p_view, p_ndc = project_points(means3d, viewmatrix, projmatrix)
    depths = p_view[:, 2]
    in_front = depths > 0.2

    if cov3d_precomp is not None:
        cov3d = transforms.unstrip_symmetric(cov3d_precomp)
    else:
        cov3d = transforms.build_covariance_3d(scales, quats, scale_modifier)
    cov2d = compute_cov2d(means3d, cov3d, viewmatrix, tanfovx, tanfovy, focal_x, focal_y)

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conics = jnp.stack([cov2d[:, 2] * inv_det, -cov2d[:, 1] * inv_det,
                        cov2d[:, 0] * inv_det], axis=-1)

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, mid - disc)))

    means2d = jnp.stack([
        ((p_ndc[:, 0] + 1.0) * image_width - 1.0) * 0.5,
        ((p_ndc[:, 1] + 1.0) * image_height - 1.0) * 0.5,
    ], axis=-1)

    grid_x = (image_width + tile_size - 1) // tile_size
    grid_y = (image_height + tile_size - 1) // tile_size
    tmin_x = jnp.clip(((means2d[:, 0] - radius_f) / tile_size).astype(jnp.int32), 0, grid_x)
    tmin_y = jnp.clip(((means2d[:, 1] - radius_f) / tile_size).astype(jnp.int32), 0, grid_y)
    tmax_x = jnp.clip(((means2d[:, 0] + radius_f + tile_size - 1) // tile_size)
                      .astype(jnp.int32), 0, grid_x)
    tmax_y = jnp.clip(((means2d[:, 1] + radius_f + tile_size - 1) // tile_size)
                      .astype(jnp.int32), 0, grid_y)
    touches = (tmax_x - tmin_x) * (tmax_y - tmin_y) > 0

    visible = in_front & det_ok & touches
    if alive is not None:
        visible = visible & alive
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    if colors_precomp is not None:
        colors = colors_precomp
    else:
        if shs is None:
            raise ValueError("either shs or colors_precomp must be given")
        dirs = means3d - campos[None, :]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
        colors = sh_lib.sh_to_color(sh_degree, jnp.swapaxes(shs, -1, -2), dirs)

    del n
    return PreprocessOut(
        means2d=means2d,
        depths=depths,
        conics=conics,
        radii=radii,
        colors=colors,
        tiles_min=jnp.stack([tmin_x, tmin_y], axis=-1),
        tiles_max=jnp.stack([tmax_x, tmax_y], axis=-1),
        visible=visible,
    )
