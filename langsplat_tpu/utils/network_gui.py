"""SIBR remote-viewer bridge: non-blocking TCP server speaking the reference protocol.

Wire format (parity with `/root/reference/gaussian_renderer/network_gui.py`): 4-byte
little-endian length + JSON message carrying resolution, fovs, near/far, train/keep_alive
toggles, scaling modifier and the view / view-projection matrices (with the Y/Z column
sign flip the SIBR viewer expects); reply is raw RGB bytes followed by a length-prefixed
verify string. Implemented as an object (no module globals) with the same
init/try_connect/receive/send surface, polled from the training loop.
"""

from __future__ import annotations

import json
import socket
from dataclasses import dataclass

import numpy as np


@dataclass
class MiniCam:
    """Viewer-supplied camera (reference MiniCam, scene/cameras.py:94-105)."""
    width: int
    height: int
    fovy: float
    fovx: float
    znear: float
    zfar: float
    world_view_transform: np.ndarray
    full_proj_transform: np.ndarray

    @property
    def image_width(self):
        return self.width

    @property
    def image_height(self):
        return self.height

    @property
    def tanfovx(self) -> float:
        return float(np.tan(self.fovx * 0.5))

    @property
    def tanfovy(self) -> float:
        return float(np.tan(self.fovy * 0.5))

    @property
    def camera_center(self) -> np.ndarray:
        return np.linalg.inv(self.world_view_transform)[3, :3]


class NetworkGUI:
    def __init__(self):
        self.conn = None
        self.addr = None
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)

    def init(self, host: str = "127.0.0.1", port: int = 6009) -> None:
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)

    def try_connect(self) -> None:
        try:
            self.conn, self.addr = self.listener.accept()
            print(f"\nConnected by {self.addr}")
            self.conn.settimeout(None)
        except OSError:
            pass

    def _read(self) -> dict:
        raw_len = self.conn.recv(4)
        message_length = int.from_bytes(raw_len, "little")
        message = self.conn.recv(message_length)
        return json.loads(message.decode("utf-8"))

    def send(self, image_bytes: bytes | None, verify: str) -> None:
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def receive(self):
        """-> (MiniCam | None, do_training, shs_python, rot_scale_python,
        keep_alive, scaling_modifier)."""
        msg = self._read()
        width = msg["resolution_x"]
        height = msg["resolution_y"]
        if width == 0 or height == 0:
            return None, None, None, None, None, None
        view = np.asarray(msg["view_matrix"], np.float32).reshape(4, 4)
        view[:, 1] = -view[:, 1]
        view[:, 2] = -view[:, 2]
        proj = np.asarray(msg["view_projection_matrix"], np.float32).reshape(4, 4)
        proj[:, 1] = -proj[:, 1]
        cam = MiniCam(width, height, msg["fov_y"], msg["fov_x"],
                      msg["z_near"], msg["z_far"], view, proj)
        return (cam, bool(msg["train"]), bool(msg["shs_python"]),
                bool(msg["rot_scale_python"]), bool(msg["keep_alive"]),
                msg["scaling_modifier"])

    def disconnect(self) -> None:
        if self.conn is not None:
            try:
                self.conn.close()
            except OSError:
                pass
        self.conn = None

    def poll(self, render_fn, source_path: str, iteration: int,
             max_iterations: int) -> None:
        """One training-loop poll (reference train.py:61-74): serve viewer frames until
        it releases control. render_fn(MiniCam, scaling_modifier) -> [3,H,W] float."""
        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                image_bytes = None
                cam, do_training, _, _, keep_alive, scale_mod = self.receive()
                if cam is not None:
                    img = render_fn(cam, scale_mod)
                    arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
                    image_bytes = memoryview(np.ascontiguousarray(
                        arr.transpose(1, 2, 0)))
                self.send(image_bytes, source_path)
                if do_training and (iteration < max_iterations or not keep_alive):
                    break
            except Exception:
                self.conn = None
