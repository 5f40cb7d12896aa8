"""Host-side camera objects: matrices, ground-truth images, language-feature loading.

Mirrors the reference `Camera` (`/root/reference/scene/cameras.py:18-105`) and the
resolution policy of `loadCam` (`/root/reference/utils/camera_utils.py:19-53`), in numpy
(device arrays are produced on demand; the matrices are static per view).
"""

from __future__ import annotations

import os
import warnings
from dataclasses import dataclass, field

import numpy as np

from langsplat_tpu.core import transforms


@dataclass
class Camera:
    uid: int
    colmap_id: int
    R: np.ndarray               # cam-to-world rotation (COLMAP convention)
    T: np.ndarray               # world-to-cam translation
    fov_x: float
    fov_y: float
    image: np.ndarray | None    # [3, H, W] float32 in [0,1], alpha pre-multiplied
    image_name: str
    width: int
    height: int
    znear: float = 0.01
    zfar: float = 100.0
    trans: np.ndarray = field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0

    def __post_init__(self):
        # row-vector convention matrices (reference cameras.py:54-57)
        self.world_view_transform = transforms.world_to_view(
            self.R, self.T, self.trans, self.scale).T.astype(np.float32)
        proj = transforms.projection_matrix(self.znear, self.zfar,
                                            self.fov_x, self.fov_y).T
        self.full_proj_transform = (self.world_view_transform @ proj).astype(np.float32)
        self.camera_center = np.linalg.inv(
            self.world_view_transform)[3, :3].astype(np.float32)

    @property
    def tanfovx(self) -> float:
        return float(np.tan(self.fov_x * 0.5))

    @property
    def tanfovy(self) -> float:
        return float(np.tan(self.fov_y * 0.5))

    def get_language_feature(self, language_feature_dir: str,
                             feature_level: int) -> tuple[np.ndarray, np.ndarray]:
        """(feature [F, H, W], mask [1, H, W]) — the `<image>_s.npy` seg-map +
        `<image>_f.npy` feature-table contract of `scene/cameras.py:58-92`.

        feature_level: 0=default, 1=s, 2=m, 3=l SAM granularity.
        """
        base = os.path.join(language_feature_dir, self.image_name)
        if not 0 <= feature_level <= 3:
            raise ValueError(f"feature_level={feature_level}")

        # fast path: the native C++ loader (mmap + fused multithreaded gather,
        # langsplat_tpu/native) serves the common case — matching resolution,
        # int16/32/64 seg, fp16/fp32 features — bit-identically; anything it cannot
        # serve falls through to the numpy implementation below
        native_out = _native_language_feature(base, feature_level,
                                              self.height, self.width)
        if native_out is not None:
            return native_out

        seg_map = np.load(base + "_s.npy")          # [4, H', W'] int
        feature_map = np.load(base + "_f.npy")      # [M, F]
        seg = seg_map[feature_level]
        if seg.shape != (self.height, self.width):
            # the reference assumes seg maps match the camera resolution and crashes
            # otherwise; resize with nearest neighbor instead (ids are categorical)
            warnings.warn(f"seg map {seg.shape} != image {(self.height, self.width)}; "
                          "nearest-resizing")
            ys = (np.arange(self.height) * seg.shape[0] // self.height)
            xs = (np.arange(self.width) * seg.shape[1] // self.width)
            seg = seg[np.ix_(ys, xs)]
        seg = seg.astype(np.int64)
        mask = (seg != -1)[None].astype(np.float32)
        feature = feature_map[np.clip(seg, 0, len(feature_map) - 1)]  # [H, W, F]
        feature = np.where(mask[0][..., None] > 0, feature, 0.0)
        return feature.transpose(2, 0, 1).astype(np.float32), mask


def _native_language_feature(base: str, feature_level: int, height: int,
                             width: int) -> tuple[np.ndarray, np.ndarray] | None:
    """Try the native loader; None when it cannot serve this input."""
    from langsplat_tpu import native

    seg_path, feat_path = base + "_s.npy", base + "_f.npy"
    probe = native.npy_shape(feat_path)
    if probe is None:
        return None
    feat_shape, _ = probe
    if len(feat_shape) != 2:
        return None
    return native.gather_language_feature(seg_path, feat_path, feature_level,
                                          height, width, feat_shape[1])


def load_camera(info, resolution_scale: float, resolution: int,
                uid: int) -> Camera:
    """Apply the reference resolution policy and build a Camera.

    `info` is a CameraInfo from dataset readers; `resolution` -1 auto-downscales
    >1600px-wide images (utils/camera_utils.py:25-37).
    """
    orig_w, orig_h = info.width, info.height
    if resolution in (1, 2, 4, 8):
        scale = resolution_scale * resolution
    else:
        if resolution == -1:
            global_down = max(orig_w / 1600, 1.0)
        else:
            global_down = orig_w / resolution
        scale = global_down * resolution_scale
    w, h = round(orig_w / scale), round(orig_h / scale)

    image = info.load_image(w, h) if info.image_path else None
    return Camera(uid=uid, colmap_id=info.uid, R=info.R, T=info.T,
                  fov_x=info.fov_x, fov_y=info.fov_y, image=image,
                  image_name=info.image_name, width=w, height=h)


def camera_to_json(idx: int, cam) -> dict:
    """cameras.json entry (utils/camera_utils.py:63-83)."""
    rt = np.zeros((4, 4))
    rt[:3, :3] = cam.R.transpose()
    rt[:3, 3] = cam.T
    rt[3, 3] = 1.0
    c2w = np.linalg.inv(rt)
    pos = c2w[:3, 3]
    rot = c2w[:3, :3]
    return {
        "id": idx,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": pos.tolist(),
        "rotation": [r.tolist() for r in rot],
        "fy": transforms.fov_to_focal(cam.fov_y, cam.height),
        "fx": transforms.fov_to_focal(cam.fov_x, cam.width),
    }
