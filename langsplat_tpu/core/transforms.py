"""Camera/geometry transforms and Gaussian covariance construction.

Parity oracles in the reference:
  - quaternion -> rotation: `/root/reference/utils/general_utils.py:78-99` (`build_rotation`,
    w-first quaternion, normalized).
  - covariance from scale+rotation: `/root/reference/scene/gaussian_model.py:27-31`
    (Sigma = R S S^T R^T, stored as the 6 upper-triangular elements).
  - world->view / projection matrices: `/root/reference/utils/graphics_utils.py:31-71`.

Conventions (same as the reference so COLMAP scenes and checkpoints interop):
  - matrices are stored ROW-VECTOR convention: points transform as `p_hom @ M` where
    M = getWorld2View(...).T, as built at `/root/reference/scene/cameras.py:54-57`.
  - quaternions are (w, x, y, z).

All functions are pure jnp over batched leading axes; they fuse into the preprocess stage.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z) quaternions -> [..., 3, 3] rotation matrices (normalizes input)."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


def build_covariance_3d(scales: jnp.ndarray, quats: jnp.ndarray,
                        scale_modifier: float = 1.0) -> jnp.ndarray:
    """Per-Gaussian 3D covariance Sigma = R S S^T R^T.

    Args:
      scales: [..., 3] positive scales (already exp-activated).
      quats:  [..., 4] (w,x,y,z), normalized inside.

    Returns:
      [..., 3, 3] full symmetric covariance.
    """
    R = quat_to_rotmat(quats)
    s = scale_modifier * scales
    # R @ diag(s) then L L^T, hand-expanded: exact f32 on the VPU (TPU matmuls default
    # to bf16 MXU inputs, which would quantize the covariance and the blended conics)
    L = R * s[..., None, :]
    rows = [[sum(L[..., i, k] * L[..., j, k] for k in range(3)) for j in range(3)]
            for i in range(3)]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 6] upper-triangular (xx, xy, xz, yy, yz, zz).

    Same packing as `strip_lowerdiag` (/root/reference/utils/general_utils.py:64-76).
    """
    return jnp.stack([cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
                      cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=-1)


def unstrip_symmetric(c6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3] symmetric matrix (inverse of `strip_symmetric`)."""
    xx, xy, xz, yy, yz, zz = (c6[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ], axis=-2)


# ---------------------------------------------------------------------------
# Camera matrices (numpy: built once on the host per camera, static per view)
# ---------------------------------------------------------------------------

def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None,
                  scale: float = 1.0) -> np.ndarray:
    """World->view 4x4 (column-vector convention), optionally recentring the camera.

    Mirrors `getWorld2View2` (/root/reference/utils/graphics_utils.py:38-49): R is the
    COLMAP cam-to-world rotation (so it is transposed here), t the world-to-cam translation.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else translate
        c2w = np.linalg.inv(Rt)
        c2w[:3, 3] = (c2w[:3, 3] + translate) * scale
        Rt = np.linalg.inv(c2w)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fov_x: float, fov_y: float) -> np.ndarray:
    """OpenGL-style perspective projection 4x4 (column-vector convention).

    Mirrors `getProjectionMatrix` (/root/reference/utils/graphics_utils.py:51-71): note the
    z row maps view-depth z to z*zfar/(zfar-znear) - zfar*znear/(zfar-znear), with w = z.
    """
    tan_y = np.tan(fov_y * 0.5)
    tan_x = np.tan(fov_x * 0.5)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def fov_to_focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * np.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: int) -> float:
    return 2.0 * np.arctan(pixels / (2.0 * focal))


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))
