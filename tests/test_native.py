"""Native (C++) data-path runtime vs the python implementations."""

import numpy as np
import cv2
import pytest

from cermvs_tpu.io import native
from cermvs_tpu.io.pfm import read_pfm, write_pfm

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_native_pfm_roundtrip(tmp_path, rng):
    img = rng.rand(33, 47).astype(np.float32)
    p = tmp_path / "n.pfm"
    native.write_pfm(p, img)
    np.testing.assert_array_equal(native.read_pfm(p), img)
    # cross-compat with the python codec both ways
    np.testing.assert_array_equal(read_pfm(p), img)
    p2 = tmp_path / "py.pfm"
    write_pfm(p2, img)
    np.testing.assert_array_equal(native.read_pfm(p2), img)


def test_native_resize_bilinear_matches_cv2(rng):
    img = rng.rand(37, 53, 3).astype(np.float32)
    ours = native.resize(img, 20, 30)
    ref = cv2.resize(img, (30, 20), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_native_resize_nearest(rng):
    img = rng.rand(16, 16).astype(np.float32)
    ours = native.resize(img, 8, 8, nearest=True)
    # F.interpolate(mode='nearest') convention: src = floor(dst * scale)
    ref = img[::2, ::2]
    np.testing.assert_array_equal(ours, ref)


def test_native_scale_and_crop(rng):
    frames = rng.rand(3, 24, 32, 3).astype(np.float32)
    out = native.scale_and_crop(frames, 48, 64, 5, 7, 20, 30, nearest=False)
    assert out.shape == (3, 20, 30, 3)
    ref0 = cv2.resize(frames[0], (64, 48))[5:25, 7:37]
    np.testing.assert_allclose(out[0], ref0, rtol=1e-4, atol=1e-5)
