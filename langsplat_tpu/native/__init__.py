"""Native (C++) runtime components, driven through ctypes.

The compute path of this framework is JAX/XLA/Pallas; the host runtime around it —
here, the per-iteration language-feature loader (SURVEY.md §3.1 hot spot #2, reference
contract at `/root/reference/scene/cameras.py:58-92`) — is native C++, compiled once
per machine from `langsplat_io.cpp` with the system toolchain and cached. There is no
pybind11 in this environment, so the binding layer is a C ABI + ctypes.

Everything degrades gracefully: if no C++ toolchain is available the callers fall back
to the numpy implementation with identical semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "langsplat_io.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_build")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_failed = False

# error codes mirrored from langsplat_io.cpp
LS_OK = 0
_ERRORS = {
    -1: "cannot open/map file",
    -2: "npy header parse error",
    -3: "unsupported dtype/layout",
    -4: "shape mismatch",
    -5: "feature level out of range",
}


def _compile() -> str | None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so_path = os.path.join(_BUILD_DIR, "liblangsplat_io.so")
    if (os.path.exists(so_path)
            and os.path.getmtime(so_path) >= os.path.getmtime(_SRC)):
        return so_path
    cxx = os.environ.get("CXX", "g++")
    tmp = so_path + ".tmp"
    cmd = [cxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)  # atomic against concurrent builders
        return so_path
    except (subprocess.SubprocessError, OSError):
        return None


def get_library() -> ctypes.CDLL | None:
    """The loaded native library, compiling it on first use; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        so_path = _compile()
        if so_path is None:
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            _lib_failed = True
            return None
        lib.ls_gather_feature.restype = ctypes.c_int
        lib.ls_gather_feature.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.ls_npy_shape.restype = ctypes.c_int
        lib.ls_npy_shape.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int64),
                                     ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def npy_shape(path: str) -> tuple[tuple[int, ...], str] | None:
    """(shape, dtype-kind+itemsize like 'i4') via the native header parser, or None."""
    lib = get_library()
    if lib is None:
        return None
    shape = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int(0)
    rc = lib.ls_npy_shape(path.encode(), shape, ctypes.byref(ndim))
    if rc < 0:
        return None
    kind = chr(rc >> 8)
    itemsize = rc & 0xFF
    return tuple(shape[: ndim.value]), f"{kind}{itemsize}"


def gather_language_feature(seg_path: str, feat_path: str, feature_level: int,
                            height: int, width: int, num_feat: int,
                            num_threads: int = 0
                            ) -> tuple[np.ndarray, np.ndarray] | None:
    """Fused native load of the language-feature contract.

    Returns (feature [F, H, W] float32, mask [1, H, W] float32) with exactly the
    semantics of Camera.get_language_feature, or None when the native path cannot
    serve this input (no toolchain, exotic dtype, resolution mismatch) — callers
    fall back to numpy.
    """
    lib = get_library()
    if lib is None:
        return None
    feature = np.empty((num_feat, height, width), np.float32)
    mask = np.empty((1, height, width), np.float32)
    rc = lib.ls_gather_feature(
        seg_path.encode(), feat_path.encode(), feature_level,
        height, width, num_feat,
        feature.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads)
    if rc != LS_OK:
        return None
    return feature, mask
