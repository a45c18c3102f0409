"""Iterative update operator: ConvGRU + correlation/disparity encoders.

TPU-native re-design of ``/root/reference/core/update.py``: NHWC flax convs,
fp32 params / bf16 compute, the 7x7 unfold replaced by static shifted slices
that XLA fuses into elementwise work (no gather).

Parity notes:
  * ``cor_planes = len(aggregation) * num_levels * (2*radius+1)`` = 33 default
    (``core/update.py:56``).
  * Weight sharing across cascade stages defaults to shared corr-encoder and
    GRU with a per-stage delta head (``core/update.py:46-48``).
  * Disparity context: 7x7 neighborhood minus center, scaled x100
    (``core/update.py:80-85,97``); delta output scaled x0.01
    (``core/update.py:114``).
  * Multi-view aggregation over the view axis: mean (default), optional
    max/std (``core/update.py:101-109``).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cermvs_tpu.config import configurable
from cermvs_tpu.models.extractor import kaiming_out


class ConvGRU(nn.Module):
    """z/r/q convolutional gates (``core/update.py:9-25``)."""

    h_planes: int
    kernel: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, net, inp):
        k = (self.kernel, self.kernel)
        pad = self.kernel // 2
        net_inp = jnp.concatenate([net, inp], axis=-1)
        conv = lambda name: nn.Conv(
            self.h_planes, k, padding=pad, kernel_init=kaiming_out,
            dtype=self.dtype, name=name,
        )
        z = nn.sigmoid(conv("convz")(net_inp))
        r = nn.sigmoid(conv("convr")(net_inp))
        q = nn.tanh(conv("convq")(jnp.concatenate([r * net, inp], axis=-1)))
        return (1 - z) * net + z * q


def disp_context(disp: jnp.ndarray, size: int = 7) -> jnp.ndarray:
    """(B, H, W, 1) -> (B, H, W, size^2) of neighbor-minus-center disparities.

    Equivalent to the reference's zero-padded unfold minus center
    (``core/update.py:80-85``) with channel order (dy, dx) row-major, but
    built from static pads/slices so XLA keeps it fused on the VPU.
    """
    B, H, W, _ = disp.shape
    r = size // 2
    padded = jnp.pad(disp[..., 0], ((0, 0), (r, r), (r, r)))
    shifts = [
        padded[:, dy : dy + H, dx : dx + W]
        for dy in range(size)
        for dx in range(size)
    ]
    stacked = jnp.stack(shifts, axis=-1)
    return stacked - disp


class _TwoConv(nn.Module):
    """conv -> relu -> conv [-> relu] pair used by the corr encoder and the
    delta head (``core/update.py:62-71``)."""

    dim0: int
    dim1: int
    k0: int
    k1: int
    final_relu: bool
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim0, (self.k0,) * 2, padding=self.k0 // 2,
                    kernel_init=kaiming_out, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.dim1, (self.k1,) * 2, padding=self.k1 // 2,
                    kernel_init=kaiming_out, dtype=self.dtype, name="conv2")(x)
        return nn.relu(x) if self.final_relu else x


@configurable("UpdateBlock")
class UpdateBlock(nn.Module):
    """Per-iteration update: corr encoding, view aggregation, GRU, delta head
    (``core/update.py:28-120``).  All per-stage modules are declared up front
    in ``setup`` so the parameter tree is independent of which stages a given
    trace touches (the reference's ``setattr`` loop, ``core/update.py:59-77``)."""

    cascade: Sequence[Tuple[int, int, int]]
    dim_net: int = 64
    dim_inp: int = 64
    dim0_corr: int = 64
    dim1_corr: int = 64
    kernel_corr: int = 3
    dim0_delta: int = 256
    kernel0_delta: int = 3
    kernel1_delta: int = 3
    num_levels: int = 3
    radius: int = 5
    size_disp_enc: int = 7
    share_corr: bool = True
    share_gru: bool = True
    share_delta: bool = False
    aggregation: Sequence[str] = ("mean",)
    dtype: Any = jnp.bfloat16

    def setup(self):
        n = len(self.cascade)
        dt = self.dtype

        def per_stage(shared, make, base):
            names = [base] if shared else [f"{base}{i}" for i in range(n)]
            return [make(name) for name in names]

        self.corr_encoders = per_stage(
            self.share_corr,
            lambda nm: _TwoConv(self.dim0_corr, self.dim1_corr, 1,
                                self.kernel_corr, True, dt, name=nm),
            "corr_encoder")
        self.grus = per_stage(
            self.share_gru,
            lambda nm: ConvGRU(h_planes=self.dim_net, dtype=dt, name=nm),
            "gru")
        self.deltas = per_stage(
            self.share_delta,
            lambda nm: _TwoConv(self.dim0_delta, 1, self.kernel0_delta,
                                self.kernel1_delta, False, dt, name=nm),
            "delta")

    def __call__(self, net, inp, disp, corr_frames, stage: int):
        """net/inp: (B, H, W, dim); disp: (B, H, W, 1) fp32;
        corr_frames: (B, V, H, W, cor_planes) fp32. Returns (net, delta)."""
        dt = self.dtype
        dctx = (100.0 * disp_context(disp, self.size_disp_enc)).astype(dt)

        parts = []
        if "mean" in self.aggregation:
            parts.append(jnp.mean(corr_frames, axis=1))
        if "max" in self.aggregation:
            parts.append(jnp.max(corr_frames, axis=1))
        if "std" in self.aggregation:
            parts.append(jnp.std(corr_frames, axis=1))
        corr = jnp.concatenate(parts, axis=-1).astype(dt)

        if self.is_initializing():
            # materialize every stage's parameters regardless of which stages
            # this trace touches (linen creates params lazily on first call)
            for enc in self.corr_encoders[1:]:
                enc(corr)
            gi = jnp.concatenate([inp.astype(dt), dctx,
                                  jnp.zeros(corr.shape[:-1] + (self.dim1_corr,), dt)],
                                 axis=-1)
            for g in self.grus[1:]:
                g(net.astype(dt), gi)
            for d in self.deltas[1:]:
                d(net.astype(dt))

        corr = self.corr_encoders[stage if not self.share_corr else 0](corr)
        gru_inp = jnp.concatenate([inp.astype(dt), dctx, corr], axis=-1)
        net = self.grus[stage if not self.share_gru else 0](net.astype(dt), gru_inp)
        d = self.deltas[stage if not self.share_delta else 0](net)
        delta = 0.01 * d.astype(jnp.float32)
        return net, delta

    @property
    def cor_planes(self) -> int:
        return len(self.aggregation) * self.num_levels * (2 * self.radius + 1)
