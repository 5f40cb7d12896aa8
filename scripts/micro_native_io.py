"""Reproduce the native language-feature loader speedup claim (docs/PARITY.md P5).

Benchmarks the fused C++ mmap+gather (`native.gather_language_feature`) against
the pure-numpy fallback on a synthetic 1080p view, both cold (per-call open) —
exactly how the training loop consumes them. Prints the measured ratio.
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def numpy_path(seg_path, feat_path, level):
    """The reference semantics in numpy (Camera.get_language_feature fallback,
    /root/reference/scene/cameras.py:58-92)."""
    seg = np.load(seg_path)
    feats = np.load(feat_path)
    s = seg[level]
    mask = s != -1
    gathered = feats[np.clip(s, 0, None)].astype(np.float32)
    gathered[~mask] = 0.0
    return gathered.transpose(2, 0, 1), mask[None].astype(np.float32)


def main():
    from langsplat_tpu import native

    h, w, m, f = 1080, 1920, 600, 3
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="native_io_")
    seg = rng.integers(-1, m, (4, h, w)).astype(np.int32)
    feats = rng.normal(size=(m, f)).astype(np.float16)
    seg_path = os.path.join(tmp, "view_s.npy")
    feat_path = os.path.join(tmp, "view_f.npy")
    np.save(seg_path, seg)
    np.save(feat_path, feats)

    # warm both paths (page cache, lib compile)
    out_native = native.gather_language_feature(seg_path, feat_path, 1, h, w, f)
    assert out_native is not None, "native library unavailable"
    out_np = numpy_path(seg_path, feat_path, 1)
    np.testing.assert_allclose(out_native[0], out_np[0], atol=1e-6)
    np.testing.assert_array_equal(out_native[1], out_np[1])

    def bench(fn, reps=20):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps * 1e3

    t_native = bench(lambda: native.gather_language_feature(
        seg_path, feat_path, 1, h, w, f))
    t_numpy = bench(lambda: numpy_path(seg_path, feat_path, 1))
    print(f"native fused gather : {t_native:7.2f} ms")
    print(f"numpy path          : {t_numpy:7.2f} ms")
    print(f"speedup             : {t_numpy / t_native:7.1f}x  (1080p, bit-identical)")


if __name__ == "__main__":
    main()
