"""Native C++ loader (langsplat_tpu/native): bit-identical to the numpy
language-feature contract across dtypes, with graceful fallback when it cannot
serve an input."""

import numpy as np
import pytest

from langsplat_tpu import native


def _write_scene(tmp_path, *, seg_dtype=np.int32, feat_dtype=np.float16,
                 h=37, w=53, m=17, f=3, seed=0, name="view0"):
    rng = np.random.default_rng(seed)
    seg = rng.integers(-1, m, size=(4, h, w)).astype(seg_dtype)
    # exercise the "negative but not -1" clip quirk of the reference contract
    seg[1, 0, 0] = -1
    if np.issubdtype(seg_dtype, np.signedinteger) and m > 2:
        seg[2, 1, 1] = seg_dtype(-3) if seg_dtype != np.int16 else seg_dtype(-3)
    feat = rng.normal(size=(m, f)).astype(feat_dtype)
    np.save(tmp_path / f"{name}_s.npy", seg)
    np.save(tmp_path / f"{name}_f.npy", feat)
    return seg, feat


def _numpy_oracle(seg, feat, level):
    s = seg[level].astype(np.int64)
    mask = (s != -1)[None].astype(np.float32)
    feature = feat.astype(np.float32)[np.clip(s, 0, len(feat) - 1)]
    feature = np.where(mask[0][..., None] > 0, feature, 0.0)
    return feature.transpose(2, 0, 1).astype(np.float32), mask


def _native_available():
    return native.get_library() is not None


pytestmark = pytest.mark.skipif(not _native_available(),
                                reason="no C++ toolchain for the native loader")


@pytest.mark.parametrize("seg_dtype", [np.int16, np.int32, np.int64])
@pytest.mark.parametrize("feat_dtype", [np.float16, np.float32])
def test_native_matches_numpy(tmp_path, seg_dtype, feat_dtype):
    seg, feat = _write_scene(tmp_path, seg_dtype=seg_dtype, feat_dtype=feat_dtype)
    for level in range(4):
        got = native.gather_language_feature(
            str(tmp_path / "view0_s.npy"), str(tmp_path / "view0_f.npy"),
            level, seg.shape[1], seg.shape[2], feat.shape[1])
        assert got is not None
        want = _numpy_oracle(seg, feat, level)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])


def test_npy_shape_probe(tmp_path):
    seg, feat = _write_scene(tmp_path, h=9, w=11, m=5, f=4)
    assert native.npy_shape(str(tmp_path / "view0_s.npy")) == ((4, 9, 11), "i4")
    assert native.npy_shape(str(tmp_path / "view0_f.npy")) == ((5, 4), "f2")
    assert native.npy_shape(str(tmp_path / "missing.npy")) is None


def test_native_rejects_bad_inputs(tmp_path):
    seg, feat = _write_scene(tmp_path)
    h, w, f = seg.shape[1], seg.shape[2], feat.shape[1]
    sp, fp = str(tmp_path / "view0_s.npy"), str(tmp_path / "view0_f.npy")
    # wrong resolution -> None (callers fall back to numpy resize path)
    assert native.gather_language_feature(sp, fp, 0, h + 1, w, f) is None
    # level out of range
    assert native.gather_language_feature(sp, fp, 7, h, w, f) is None
    # unsupported dtype (float seg map)
    np.save(tmp_path / "bad_s.npy", np.zeros((4, h, w), np.float32))
    assert native.gather_language_feature(
        str(tmp_path / "bad_s.npy"), fp, 0, h, w, f) is None
    # not an npy file
    (tmp_path / "junk_s.npy").write_bytes(b"not numpy at all")
    assert native.gather_language_feature(
        str(tmp_path / "junk_s.npy"), fp, 0, h, w, f) is None


def test_camera_path_uses_native(tmp_path, monkeypatch):
    """Camera.get_language_feature returns identical values through the native and
    numpy paths, including fp16 specials (inf/nan/subnormal)."""
    from langsplat_tpu.data.cameras import Camera

    h, w, m, f = 24, 32, 9, 3
    rng = np.random.default_rng(3)
    seg = rng.integers(-1, m, size=(4, h, w)).astype(np.int32)
    feat = rng.normal(size=(m, f)).astype(np.float16)
    feat[0, 0] = np.float16(np.inf)
    feat[1, 1] = np.float16(6e-8)  # subnormal half
    np.save(tmp_path / "cam0_s.npy", seg)
    np.save(tmp_path / "cam0_f.npy", feat)

    cam = Camera(uid=0, colmap_id=0, R=np.eye(3), T=np.zeros(3), fov_x=0.8,
                 fov_y=0.8, image=None, image_name="cam0", width=w, height=h)
    feat_native, mask_native = cam.get_language_feature(str(tmp_path), 2)

    monkeypatch.setattr("langsplat_tpu.data.cameras._native_language_feature",
                        lambda *a, **k: None)
    feat_np, mask_np = cam.get_language_feature(str(tmp_path), 2)
    np.testing.assert_array_equal(feat_native, feat_np)
    np.testing.assert_array_equal(mask_native, mask_np)
