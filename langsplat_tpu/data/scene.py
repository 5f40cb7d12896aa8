"""Scene orchestration: load datasets, build camera lists, create/restore the field.

Mirrors `Scene` (`/root/reference/scene/__init__.py:21-94`): dataset-type dispatch by
directory shape, input.ply copy + cameras.json dump on fresh runs, camera shuffling,
NeRF++ extent, per-resolution-scale camera lists, and point_cloud/iteration_N saving.
"""

from __future__ import annotations

import json
import os
import random
import shutil

from langsplat_tpu.config import ModelConfig
from langsplat_tpu.data import dataset as ds
from langsplat_tpu.data.cameras import camera_to_json, load_camera
from langsplat_tpu.models import field_io
from langsplat_tpu.models.gaussian_field import GaussianField, create_from_pcd


class Scene:
    def __init__(self, cfg: ModelConfig, *, load_iteration: int | None = None,
                 shuffle: bool = True, resolution_scales=(1.0,),
                 capacity: int | None = None, initial_capacity_factor: float = 1.5,
                 seed: int = 0):
        self.cfg = cfg
        self.model_path = cfg.model_path
        self.loaded_iter = None

        if load_iteration is not None:
            if load_iteration == -1:
                self.loaded_iter = max_iteration(
                    os.path.join(self.model_path, "point_cloud"))
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        scene_type = ds.detect_scene_type(cfg.source_path)
        if scene_type == "colmap":
            info = ds.read_colmap_scene(cfg.source_path, cfg.images,
                                        eval_split=cfg.eval)
        else:
            info = ds.read_blender_scene(cfg.source_path, cfg.white_background,
                                         eval_split=cfg.eval)
        self.scene_info = info

        if not self.loaded_iter and self.model_path:
            os.makedirs(self.model_path, exist_ok=True)
            shutil.copyfile(info.ply_path,
                            os.path.join(self.model_path, "input.ply"))
            cam_json = [camera_to_json(i, c)
                        for i, c in enumerate(info.train_cameras + info.test_cameras)]
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

        if shuffle:
            # seeded (not global-state) shuffle so checkpoint resume in a fresh
            # process reproduces the exact camera order (reference safe_state
            # seeds the global RNG once per process instead)
            shuffler = random.Random(seed)
            shuffler.shuffle(info.train_cameras)
            shuffler.shuffle(info.test_cameras)

        self.cameras_extent = info.nerf_normalization["radius"]

        self.train_cameras: dict[float, list] = {}
        self.test_cameras: dict[float, list] = {}
        for scale in resolution_scales:
            self.train_cameras[scale] = [
                load_camera(ci, scale, cfg.resolution, uid=i)
                for i, ci in enumerate(info.train_cameras)]
            self.test_cameras[scale] = [
                load_camera(ci, scale, cfg.resolution, uid=i)
                for i, ci in enumerate(info.test_cameras)]

        pts, cols, _ = info.point_cloud
        if self.loaded_iter:
            self.gaussians = field_io.load_ply(
                os.path.join(self.model_path, "point_cloud",
                             f"iteration_{self.loaded_iter}", "point_cloud.ply"),
                capacity=capacity)
        else:
            cap = capacity or int(len(pts) * initial_capacity_factor)
            self.gaussians = create_from_pcd(pts, cols, sh_degree=cfg.sh_degree,
                                             capacity=cap)

    def save(self, iteration: int, field: GaussianField | None = None) -> None:
        field = field if field is not None else self.gaussians
        out = os.path.join(self.model_path, "point_cloud",
                           f"iteration_{iteration}", "point_cloud.ply")
        field_io.save_ply(field, out)

    def get_train_cameras(self, scale: float = 1.0) -> list:
        return self.train_cameras[scale]

    def get_test_cameras(self, scale: float = 1.0) -> list:
        return self.test_cameras[scale]


def max_iteration(folder: str) -> int:
    """searchForMaxIteration (utils/system_utils.py:24-28)."""
    iters = [int(name.split("_")[-1]) for name in os.listdir(folder)]
    return max(iters)
