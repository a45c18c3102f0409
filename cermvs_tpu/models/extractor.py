"""Feature / context encoders.

TPU-native re-design of ``/root/reference/core/extractor.py``: flax NHWC
convolutions (XLA's native TPU layout), fp32 parameters with a configurable
bf16 compute dtype, instance norm computed in fp32.

Architecture parity (``core/extractor.py:62-155``):
  conv7x7 stride 2 (3->32) -> norm -> relu
  layer1: 2x ResidualBlock(32, stride 1)
  layer2: ResidualBlock(64, stride 2) + ResidualBlock(64)
  [layer3: ResidualBlock(128, stride 2) + ResidualBlock(128)  iff type=="LR"]
  conv1x1 -> output_dim
"HR" yields 1/4 resolution features, "LR" 1/8 (``core/extractor.py:87-90``).
The reference's InstanceNorm2d default has no affine parameters
(``core/extractor.py:30``), mirrored here.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu') equivalent
# (``core/extractor.py:111-114``)
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-(sample, channel) normalization over H, W; no affine params."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(-3, -2), keepdims=True)
    var = x32.var(axis=(-3, -2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def group_norm(x: jnp.ndarray, num_groups: int, eps: float = 1e-5):
    """Affine-free group norm (the reference's GroupNorm option carries
    affine params initialized to identity; fnet/cnet never use it in the
    shipped configs, ``core/raft.py:29-30``)."""
    B, H, W, C = x.shape
    x32 = x.astype(jnp.float32).reshape(B, H, W, num_groups, C // num_groups)
    mean = x32.mean(axis=(1, 2, 4), keepdims=True)
    var = x32.var(axis=(1, 2, 4), keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return out.reshape(B, H, W, C).astype(x.dtype)


def _norm(norm_fn: str, planes: int = 32) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if norm_fn == "instance":
        return instance_norm
    if norm_fn == "group":
        return lambda x: group_norm(x, max(1, planes // 8))
    if norm_fn == "none":
        return lambda x: x
    raise ValueError(
        f"unsupported norm_fn {norm_fn!r} (instance/group/none; the shipped "
        "configs use instance and none)")


class ResidualBlock(nn.Module):
    """Two 3x3 convs with optional strided 1x1 downsample shortcut
    (``core/extractor.py:7-57``)."""

    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        norm = _norm(self.norm_fn, self.planes)
        y = nn.Conv(
            self.planes, (3, 3), strides=self.stride, padding=1,
            kernel_init=kaiming_out, dtype=self.dtype,
        )(x)
        y = nn.relu(norm(y))
        y = nn.Conv(
            self.planes, (3, 3), padding=1, kernel_init=kaiming_out,
            dtype=self.dtype,
        )(y)
        y = nn.relu(norm(y))
        if self.stride != 1:
            x = nn.Conv(
                self.planes, (1, 1), strides=self.stride,
                kernel_init=kaiming_out, dtype=self.dtype,
            )(x)
            x = norm(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """HR (1/4) or LR (1/8) residual encoder (``core/extractor.py:62-155``)."""

    output_dim: int = 128
    norm_fn: str = "instance"
    type: str = "HR"
    dtype: Any = jnp.bfloat16

    @property
    def stride_factor(self) -> int:
        return 8 if self.type == "LR" else 4

    @nn.compact
    def __call__(self, x):
        """x: (..., H, W, 3) normalized images -> (..., H/f, W/f, output_dim)."""
        batch_dims = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:]).astype(self.dtype)

        norm = _norm(self.norm_fn)
        DIM = 32
        x = nn.Conv(
            DIM, (7, 7), strides=2, padding=3, kernel_init=kaiming_out,
            dtype=self.dtype,
        )(x)
        x = nn.relu(norm(x))

        def layer(x, dim, stride):
            x = ResidualBlock(dim, self.norm_fn, stride=stride, dtype=self.dtype)(x)
            return ResidualBlock(dim, self.norm_fn, stride=1, dtype=self.dtype)(x)

        x = layer(x, DIM, 1)
        x = layer(x, 2 * DIM, 2)
        if self.type == "LR":
            x = layer(x, 4 * DIM, 2)
        x = nn.Conv(self.output_dim, (1, 1), kernel_init=kaiming_out, dtype=self.dtype)(x)
        return x.reshape(batch_dims + x.shape[1:])
