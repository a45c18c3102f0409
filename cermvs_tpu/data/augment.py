"""Host-side augmentation and resize/crop with intrinsics bookkeeping.

Numpy/cv2 re-implementation of ``/root/reference/utils/data_utils.py:6-79``:
random log-uniform scale + random crop for training, deterministic scale and
center-crop for inference.  Intrinsics adjustments are identical; images are
(N, H, W, 3) float32 NHWC.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import cv2
import numpy as np

from cermvs_tpu.config import configurable


def _resize_stack(frames: np.ndarray, ht: int, wd: int, interp) -> np.ndarray:
    return np.stack(
        [cv2.resize(f, (wd, ht), interpolation=interp) for f in frames], 0)


@configurable("random_scale_and_crop")
def random_scale_and_crop(
    images: np.ndarray,
    depths: np.ndarray,
    intrinsics: np.ndarray,
    crop_size: Sequence[int] = (1056, 1440),
    smin: float = -0.15,
    smax: float = 0.5,
    rng: Optional[np.random.RandomState] = None,
    use_native: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Scale by 2^U(smin, smax), crop to crop_size, fix intrinsics
    (``data_utils.py:6-34``).  images (N,H,W,3), depths (N,H,W).

    Uses the native C++ fused resize+crop (``native/dataio.cpp``) when
    available; falls back to cv2 per frame.
    """
    rng = rng or np.random
    s = 2.0 ** rng.uniform(smin, smax)
    ht1, wd1 = images.shape[1:3]
    ht2, wd2 = int(s * ht1), int(s * wd1)

    intrinsics = intrinsics.copy()
    intrinsics[:, 0] *= float(wd2) / wd1
    intrinsics[:, 1] *= float(ht2) / ht1

    ch, cw = crop_size
    x0 = rng.randint(0, wd2 - cw + 1)
    y0 = rng.randint(0, ht2 - ch + 1)

    from cermvs_tpu.io import native

    if use_native and native.available():
        images = native.scale_and_crop(images, ht2, wd2, y0, x0, ch, cw,
                                       nearest=False)
        depths = native.scale_and_crop(depths, ht2, wd2, y0, x0, ch, cw,
                                       nearest=True)
    else:
        images = _resize_stack(images, ht2, wd2, cv2.INTER_LINEAR)
        depths = _resize_stack(depths, ht2, wd2, cv2.INTER_NEAREST)
        images = images[:, y0 : y0 + ch, x0 : x0 + cw]
        depths = depths[:, y0 : y0 + ch, x0 : x0 + cw]
    intrinsics[:, 0, 2] -= x0
    intrinsics[:, 1, 2] -= y0
    return images, depths, intrinsics


def scale_operation(images: np.ndarray, intrinsics: np.ndarray, s: float):
    """Deterministic resize by factor s (``data_utils.py:58-68``)."""
    ht1, wd1 = images.shape[1:3]
    ht2, wd2 = int(s * ht1), int(s * wd1)
    intrinsics = intrinsics.copy()
    intrinsics[:, 0] *= s
    intrinsics[:, 1] *= s
    images = _resize_stack(images, ht2, wd2, cv2.INTER_LINEAR)
    return images, intrinsics


def crop_operation(images: np.ndarray, intrinsics: np.ndarray,
                   crop_h: int, crop_w: int):
    """Center crop with intrinsics fix-up (``data_utils.py:71-79``)."""
    ht1, wd1 = images.shape[1:3]
    x0 = (wd1 - crop_w) // 2
    y0 = (ht1 - crop_h) // 2
    images = images[:, y0 : y0 + crop_h, x0 : x0 + crop_w]
    intrinsics = intrinsics.copy()
    intrinsics[:, 0, 2] -= x0
    intrinsics[:, 1, 2] -= y0
    return images, intrinsics


def pad_to_multiple(images: np.ndarray, intrinsics: np.ndarray, multiple: int):
    """Center-crop H and W DOWN to the nearest multiple (static-shape
    requirement of the jitted model; the reference relied on ad-hoc
    divisibility instead)."""
    ht, wd = images.shape[1:3]
    ch = (ht // multiple) * multiple
    cw = (wd // multiple) * multiple
    if ch == ht and cw == wd:
        return images, intrinsics
    return crop_operation(images, intrinsics, ch, cw)
