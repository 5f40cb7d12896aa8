"""Unit tests for core math against independent oracles (closed forms / scipy / torch-free
reimplementations of the reference formulas in numpy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplat_tpu.core import sh, transforms, losses


def test_sh_degree0_is_constant():
    rng = np.random.default_rng(0)
    coeffs = rng.normal(size=(10, 3, 1)).astype(np.float32)
    dirs = rng.normal(size=(10, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sh.eval_sh(0, jnp.asarray(coeffs), jnp.asarray(dirs))
    np.testing.assert_allclose(out, 0.28209479177387814 * coeffs[..., 0], rtol=1e-6)


def test_sh_roundtrip_rgb():
    rgb = jnp.asarray(np.random.default_rng(1).uniform(size=(5, 3)).astype(np.float32))
    np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, rtol=1e-6)


def test_sh_orthonormality_via_integration():
    # Monte-Carlo check that the degree<=2 basis functions are orthonormal on the sphere.
    rng = np.random.default_rng(2)
    n = 50_000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    basis = []
    for k in range(9):
        c = np.zeros((1, 9), dtype=np.float32)
        c[0, k] = 1.0
        coeffs = np.broadcast_to(c[:, None, :], (n, 1, 9))
        basis.append(np.asarray(sh.eval_sh(2, jnp.asarray(coeffs), jnp.asarray(v)))[:, 0])
    B = np.stack(basis, axis=1)  # [n, 9]
    gram = 4.0 * np.pi * (B.T @ B) / n
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


def test_quat_to_rotmat_identity_and_known():
    q = jnp.array([[1.0, 0, 0, 0]])
    np.testing.assert_allclose(transforms.quat_to_rotmat(q)[0], np.eye(3), atol=1e-6)
    # 90 deg about z: (w,x,y,z) = (cos45, 0, 0, sin45)
    s = np.sin(np.pi / 4)
    q = jnp.array([[np.cos(np.pi / 4), 0.0, 0.0, s]])
    R = np.asarray(transforms.quat_to_rotmat(q)[0])
    expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_quat_to_rotmat_is_rotation():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
    R = np.asarray(transforms.quat_to_rotmat(q))
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(64), atol=1e-5)


def test_covariance_3d_psd_and_eigvals():
    rng = np.random.default_rng(4)
    # Well-separated scales so the eigenvalue <-> scale^2 match is unambiguous in f32.
    scales = np.stack([np.full(32, 0.5), np.full(32, 1.5), np.full(32, 4.0)],
                      axis=-1).astype(np.float32)
    quats = rng.normal(size=(32, 4)).astype(np.float32)
    cov = np.asarray(transforms.build_covariance_3d(jnp.asarray(scales), jnp.asarray(quats)))
    eig = np.sort(np.linalg.eigvalsh(cov), axis=-1)
    np.testing.assert_allclose(eig, np.sort(scales ** 2, axis=-1), rtol=1e-3, atol=1e-4)


def test_strip_unstrip_roundtrip():
    rng = np.random.default_rng(5)
    scales = np.exp(rng.normal(size=(8, 3)).astype(np.float32) * 0.2)
    quats = rng.normal(size=(8, 4)).astype(np.float32)
    cov = transforms.build_covariance_3d(jnp.asarray(scales), jnp.asarray(quats))
    c6 = transforms.strip_symmetric(cov)
    np.testing.assert_allclose(transforms.unstrip_symmetric(c6), cov, rtol=1e-6)


def test_world_to_view_maps_camera_center_to_origin():
    rng = np.random.default_rng(6)
    # random rotation via QR
    A = rng.normal(size=(3, 3))
    R, _ = np.linalg.qr(A)
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    t = rng.normal(size=3)
    W = transforms.world_to_view(R, t)
    cam_center = np.linalg.inv(W)[:3, 3]
    p = W @ np.concatenate([cam_center, [1.0]])
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)


def test_projection_matrix_depth_range():
    znear, zfar = 0.01, 100.0
    P = transforms.projection_matrix(znear, zfar, 1.0, 1.0)
    for z, expected_ndc in [(znear, 0.0), (zfar, 1.0)]:
        p = P @ np.array([0.0, 0.0, z, 1.0])
        np.testing.assert_allclose(p[2] / p[3], expected_ndc, atol=1e-6)


def test_fov_focal_roundtrip():
    fov = 0.8
    assert abs(transforms.focal_to_fov(transforms.fov_to_focal(fov, 640), 640) - fov) < 1e-9


def test_ssim_identical_is_one():
    img = jnp.asarray(np.random.default_rng(7).uniform(size=(3, 32, 32)).astype(np.float32))
    assert float(losses.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_matches_torch_reference():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from math import exp

    def torch_ssim(img1, img2, window_size=11):
        # Reference implementation (/root/reference/utils/loss_utils.py:23-63), rewritten.
        sigma = 1.5
        gauss = torch.tensor([exp(-(x - window_size // 2) ** 2 / (2 * sigma ** 2))
                              for x in range(window_size)])
        gauss = (gauss / gauss.sum()).unsqueeze(1)
        win2d = gauss.mm(gauss.t()).float().unsqueeze(0).unsqueeze(0)
        channel = img1.size(-3)
        window = win2d.expand(channel, 1, window_size, window_size).contiguous()
        pad = window_size // 2
        mu1 = F.conv2d(img1, window, padding=pad, groups=channel)
        mu2 = F.conv2d(img2, window, padding=pad, groups=channel)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = F.conv2d(img1 * img1, window, padding=pad, groups=channel) - mu1_sq
        s2 = F.conv2d(img2 * img2, window, padding=pad, groups=channel) - mu2_sq
        s12 = F.conv2d(img1 * img2, window, padding=pad, groups=channel) - mu1_mu2
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
        return m.mean().item()

    rng = np.random.default_rng(8)
    a = rng.uniform(size=(3, 48, 40)).astype(np.float32)
    b = np.clip(a + rng.normal(size=a.shape).astype(np.float32) * 0.1, 0, 1)
    ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = torch_ssim(torch.from_numpy(a)[None], torch.from_numpy(b)[None])
    assert ours == pytest.approx(ref, abs=1e-4)


def test_psnr_known_value():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    np.testing.assert_allclose(float(losses.psnr(a, b)), 20.0, atol=1e-3)


def test_losses_grad_finite():
    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.uniform(size=(3, 16, 16)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(3, 16, 16)).astype(np.float32))
    g = jax.grad(lambda x: losses.rgb_loss(x, b))(a)
    assert np.all(np.isfinite(np.asarray(g)))
