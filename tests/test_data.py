"""Data layer: PLY roundtrip, COLMAP binary/text parsing, Blender loading, Scene
orchestration, field PLY + checkpoint roundtrip, language-feature contract."""

import json
import os
import struct

import numpy as np
import jax.numpy as jnp
import pytest

from langsplat_tpu.config import ModelConfig
from langsplat_tpu.data import colmap, ply
from langsplat_tpu.data.cameras import Camera
from langsplat_tpu.data.scene import Scene
from langsplat_tpu.models import field_io
from tests.test_model_train import make_field


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    cols = rng.uniform(size=(17, 3)).astype(np.float32)
    path = str(tmp_path / "pc.ply")
    ply.write_point_cloud(path, pts, cols)
    p2, c2, n2 = ply.read_point_cloud(path)
    np.testing.assert_allclose(p2, pts, rtol=1e-6)
    np.testing.assert_allclose(c2, cols, atol=1 / 255.0)
    np.testing.assert_array_equal(n2, np.zeros_like(pts))


def write_colmap_binary(sparse, n_cams=2, n_pts=50, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(sparse, exist_ok=True)
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))          # PINHOLE
        f.write(struct.pack("<dddd", 60.0, 60.0, 32.0, 24.0))
    qvecs, tvecs = [], []
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for i in range(n_cams):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            qvecs.append(q)
            tvecs.append(t)
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))                    # 2 dummy 2D points
            f.write(struct.pack("<ddq", 1.0, 2.0, -1) * 2)
    xyz = rng.normal(size=(n_pts, 3))
    rgb = rng.integers(0, 255, (n_pts, 3))
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            f.write(struct.pack("<QdddBBBd", i + 1, *xyz[i], *rgb[i], 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))
    return np.array(qvecs), np.array(tvecs), xyz, rgb


def test_colmap_binary_parsers(tmp_path):
    sparse = str(tmp_path / "sparse" / "0")
    qvecs, tvecs, xyz, rgb = write_colmap_binary(sparse)
    cams = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    imgs = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
    assert len(imgs) == 2
    np.testing.assert_allclose(imgs[1].qvec, qvecs[0], rtol=1e-6)
    np.testing.assert_allclose(imgs[2].tvec, tvecs[1], rtol=1e-6)
    assert imgs[1].name == "img_000.png"
    pts, cols, err = colmap.read_points3d_binary(os.path.join(sparse, "points3D.bin"))
    np.testing.assert_allclose(pts, xyz, rtol=1e-6)
    np.testing.assert_array_equal(cols, rgb)
    # rotation matrix from quaternion is orthonormal
    R = colmap.qvec_to_rotmat(qvecs[0])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)


def make_colmap_scene(root, n_cams=3):
    sparse = os.path.join(root, "sparse", "0")
    write_colmap_binary(sparse, n_cams=n_cams)
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)
    from PIL import Image
    rng = np.random.default_rng(1)
    for i in range(n_cams):
        arr = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(imgdir, f"img_{i:03d}.png"))


def test_scene_colmap_end_to_end(tmp_path):
    root = str(tmp_path / "scene")
    make_colmap_scene(root)
    cfg = ModelConfig(source_path=root, model_path=str(tmp_path / "out"), resolution=1)
    scene = Scene(cfg, shuffle=False)
    cams = scene.get_train_cameras()
    assert len(cams) == 3
    cam = cams[0]
    assert cam.image.shape == (3, 48, 64)
    assert cam.world_view_transform.shape == (4, 4)
    assert scene.cameras_extent > 0
    assert scene.gaussians.capacity >= 50
    assert int(scene.gaussians.num_alive) == 50
    # fresh-run artifacts
    assert os.path.exists(os.path.join(cfg.model_path, "input.ply"))
    assert os.path.exists(os.path.join(cfg.model_path, "cameras.json"))
    # save + reload via PLY
    scene.save(7)
    reloaded = field_io.load_ply(os.path.join(
        cfg.model_path, "point_cloud", "iteration_7", "point_cloud.ply"))
    assert int(reloaded.num_alive) == 50


def test_blender_scene(tmp_path):
    root = str(tmp_path / "blender")
    os.makedirs(root, exist_ok=True)
    from PIL import Image
    frames = []
    rng = np.random.default_rng(2)
    for i in range(2):
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 3 + i]
        frames.append({"file_path": f"train/r_{i}", "transform_matrix": c2w.tolist()})
        os.makedirs(os.path.join(root, "train"), exist_ok=True)
        arr = (rng.uniform(size=(32, 32, 4)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"train/r_{i}.png"))
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    from langsplat_tpu.data.dataset import read_blender_scene
    info = read_blender_scene(root, white_background=True)
    assert len(info.train_cameras) == 2
    img = info.train_cameras[0].load_image(32, 32)
    assert img.shape == (3, 32, 32)
    assert info.point_cloud[0].shape[0] == 100_000


def test_field_ply_roundtrip(tmp_path):
    field = make_field(n=15, cap=32, seed=9)
    path = str(tmp_path / "field.ply")
    field_io.save_ply(field, path)
    loaded = field_io.load_ply(path, capacity=40)
    alive = np.asarray(field.alive)
    np.testing.assert_allclose(np.asarray(loaded.xyz[:15]),
                               np.asarray(field.xyz)[alive], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.features_dc[:15]),
                               np.asarray(field.features_dc)[alive], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.features_rest[:15]),
                               np.asarray(field.features_rest)[alive], atol=1e-7)
    np.testing.assert_allclose(np.asarray(loaded.scaling[:15]),
                               np.asarray(field.scaling)[alive], rtol=1e-6)
    assert int(loaded.num_alive) == 15


def test_checkpoint_roundtrip(tmp_path):
    import optax
    from langsplat_tpu.config import OptimizationConfig
    from langsplat_tpu.train import densify as dn
    from langsplat_tpu.train import trainer as tr

    field = make_field(n=10, cap=16, seed=3)
    cfg = OptimizationConfig()
    opt = tr.make_optimizer(cfg, 2.0, include_feature=False)
    params = tr.extract_params(field, False)
    opt_state = opt.init(params)
    stats = dn.DensifyStats.zeros(16)
    path = str(tmp_path / "ck.npz")
    field_io.save_checkpoint(path, field, opt_state, stats, step=123,
                             spatial_lr_scale=2.0, active_sh_degree=1)
    f2, o2, s2, step, slr, deg = field_io.load_checkpoint(path, field, opt_state, stats)
    assert (step, slr, deg) == (123, 2.0, 1)
    np.testing.assert_array_equal(np.asarray(f2.xyz), np.asarray(field.xyz))
    import jax
    for a, b in zip(jax.tree.leaves(o2), jax.tree.leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_get_language_feature_contract(tmp_path):
    # seg maps [4, H, W] with ids into the feature table; -1 = no segment
    h, w, m = 8, 10, 5
    rng = np.random.default_rng(4)
    seg = rng.integers(-1, m, (4, h, w)).astype(np.int32)
    feats = rng.normal(size=(m, 3)).astype(np.float32)
    np.save(tmp_path / "view0_s.npy", seg)
    np.save(tmp_path / "view0_f.npy", feats)

    cam = Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.zeros(3), fov_x=0.8,
                 fov_y=0.8, image=None, image_name="view0", width=w, height=h)
    for level in range(4):
        feat, mask = cam.get_language_feature(str(tmp_path), level)
        assert feat.shape == (3, h, w) and mask.shape == (1, h, w)
        for y in range(h):
            for x in range(w):
                sid = seg[level, y, x]
                if sid == -1:
                    assert mask[0, y, x] == 0
                else:
                    assert mask[0, y, x] == 1
                    np.testing.assert_allclose(feat[:, y, x], feats[sid], rtol=1e-6)
