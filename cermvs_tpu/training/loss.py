"""Sequence loss over cascade iterates with the disparity->depth curriculum.

Parity with ``/root/reference/loss.py``:
  * every prediction is bilinearly upsampled (align corners) to GT size
    (``loss.py:17-18``) — here via the matmul-based resize;
  * per-iterate weight ``gamma^(T-1-i)`` (``loss.py:21``);
  * ``i_loss = gw * depth_L1(clamped at threshold)/3.6e5 + (1-gw) * disp_L1``
    (``loss.py:22-25``);
  * masked mean plus a 0.01-weighted unmasked mean (``loss.py:26-27``);
  * metrics on the final iterate: mean depth error and <3/<10/<25 fractions
    (``loss.py:29-38``).

The iterate loop is fully vectorized: one resize over the folded (T*B) batch,
one weighted reduction — no per-iterate python work inside jit.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from cermvs_tpu.config import configurable
from cermvs_tpu.ops.sampling import resize_bilinear_align_corners


@configurable("sequence_loss")
def sequence_loss(
    disp_est: jnp.ndarray,
    disp_gt: jnp.ndarray,
    gradual_weight,
    depthloss_threshold: float = 100.0,
    gamma: float = 0.9,
    depth_cut: float = 1e-3,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """disp_est: (T, B, h, w) raw predictions; disp_gt: (B, H, W) with zeros
    marking invalid pixels. Returns (scalar loss, metrics dict)."""
    T = disp_est.shape[0]
    H, W = disp_gt.shape[-2:]
    est = resize_bilinear_align_corners(disp_est, H, W)  # (T, B, H, W)
    est = est.astype(jnp.float32)
    disp_gt = disp_gt.astype(jnp.float32)
    gradual_weight = jnp.asarray(gradual_weight, jnp.float32)

    valid = (disp_gt > 0.0).astype(jnp.float32)

    loss_disp = jnp.abs(est - disp_gt)
    loss_depth = jnp.abs(
        1.0 / jnp.clip(est, min=depth_cut) - 1.0 / jnp.clip(disp_gt, min=depth_cut)
    )
    loss_depth = jnp.clip(loss_depth, max=depthloss_threshold) / 3.6e5
    i_loss = gradual_weight * loss_depth + (1.0 - gradual_weight) * loss_disp

    weights = gamma ** jnp.arange(T - 1, -1, -1, dtype=jnp.float32)
    masked = (i_loss * valid).mean(axis=(1, 2, 3))
    unmasked = i_loss.mean(axis=(1, 2, 3))
    total = jnp.sum(weights * (masked + 0.01 * unmasked))

    # metrics on the final iterate (depth error in scene units); the reference
    # divides by raw gt but only reads valid pixels (loss.py:29-30), so use a
    # safe denominator under the mask
    gt_safe = jnp.where(valid > 0, disp_gt, 1.0)
    epe = jnp.abs(1.0 / jnp.clip(est[-1], min=depth_cut) - 1.0 / gt_safe)
    denom = jnp.maximum(valid.sum(), 1.0)

    def vmean(x):
        return (x * valid).sum() / denom

    metrics = {
        "mean_depth_error": vmean(epe),
        "less3": vmean((epe < 3).astype(jnp.float32)),
        "less10": vmean((epe < 10).astype(jnp.float32)),
        "less25": vmean((epe < 25).astype(jnp.float32)),
    }
    return total, metrics
