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

import jax
import jax.numpy as jnp
from flax import linen as nn

from cermvs_tpu.config import configurable
from cermvs_tpu.models.extractor import kaiming_out


class _ConvP(nn.Module):
    """Parameter holder with ``nn.Conv``'s exact tree ({kernel, bias}) and
    init, but no fixed application: the GRU slices/concatenates these kernels
    to fuse gates and hoist loop-invariant input channels (see ConvGRU)."""

    features: int
    in_features: int
    kernel: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", kaiming_out,
            (self.kernel, self.kernel, self.in_features, self.features),
            jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


def _conv2d(x, w, precision=None):
    """NHWC same-padding conv (matches ``nn.Conv(padding=k//2)``)."""
    p = (w.shape[0] // 2, w.shape[0] // 2)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), (p, p),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)


class ConvGRU(nn.Module):
    """z/r/q convolutional gates (``core/update.py:9-25``).

    Parameters are bit-identical to three separate ``nn.Conv`` layers over
    ``[net, inp]`` (and ``[r*net, inp]`` for q) — the torch checkpoint
    mapping is unchanged — but application is restructured for the MXU:

    * the z and r convolutions share their input, so their kernels are
      concatenated into ONE conv with ``2*h_planes`` output channels
      (separate 64-channel outputs pad to 128 lanes and waste half the MXU);
    * the ``static_planes`` leading channels of ``inp`` (the context
      features, constant across GRU iterations — ``core/raft.py:57-60``
      computes them once) can be pre-reduced OUTSIDE the iteration scan via
      :meth:`ctx`, removing their K-columns (and all three gate biases) from
      the per-iteration convs.

    Numerics: per output channel the reduction is split at the static/dynamic
    channel boundary and re-associated (one extra rounding in the carried
    dtype); gate fusion itself is exact.
    """

    h_planes: int
    static_planes: int
    dyn_planes: int
    kernel: int = 3
    dtype: Any = jnp.bfloat16

    def setup(self):
        cin = self.h_planes + self.static_planes + self.dyn_planes
        mk = lambda nm: _ConvP(self.h_planes, cin, self.kernel, name=nm)
        self.convz = mk("convz")
        self.convr = mk("convr")
        self.convq = mk("convq")

    def _gate_kernels(self):
        h, s = self.h_planes, self.static_planes
        parts = []
        for kern, bias in (self.convz(), self.convr(), self.convq()):
            parts.append((kern[:, :, :h], kern[:, :, h:h + s],
                          kern[:, :, h + s:], bias))
        return parts

    def ctx(self, inp_static):
        """Loop-invariant gate contributions: one conv of the static context
        channels against all three gates' matching kernel columns, biases
        folded in. Returns (B, H, W, 3*h_planes) in compute dtype."""
        parts = self._gate_kernels()
        w = jnp.concatenate([p[1] for p in parts], axis=-1)
        b = jnp.concatenate([p[3] for p in parts])
        dt = self.dtype
        return _conv2d(inp_static.astype(dt), w.astype(dt)) + b.astype(dt)

    def __call__(self, net, dyn, ctx):
        """net (B,H,W,h); dyn (B,H,W,dyn_planes) = the per-iteration gru
        input channels (disparity context + corr encoding); ctx from
        :meth:`ctx` on the static context channels."""
        dt = self.dtype
        parts = self._gate_kernels()
        h = self.h_planes
        wzr = jnp.concatenate(
            [jnp.concatenate([p[0], p[2]], axis=2) for p in parts[:2]],
            axis=-1)  # (k, k, h + dyn, 2h)
        net_dyn = jnp.concatenate([net, dyn], axis=-1)
        zr = nn.sigmoid(_conv2d(net_dyn, wzr.astype(dt)) + ctx[..., :2 * h])
        z, r = zr[..., :h], zr[..., h:]
        wq = jnp.concatenate([parts[2][0], parts[2][2]], axis=2)
        q = nn.tanh(
            _conv2d(jnp.concatenate([r * net, dyn], axis=-1), wq.astype(dt))
            + ctx[..., 2 * h:])
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
    def __call__(self, x, row_mask=None):
        x = nn.Conv(self.dim0, (self.k0,) * 2, padding=self.k0 // 2,
                    kernel_init=kaiming_out, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        if row_mask is not None:
            # row-sharded callers: zero the out-of-image ghost rows between
            # the convs (conv1's bias makes them nonzero even on zero input)
            # so conv2 sees the unsharded model's zero padding there
            x = x * row_mask.astype(x.dtype)
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
        dyn = self.size_disp_enc ** 2 + self.dim1_corr
        self.grus = per_stage(
            self.share_gru,
            lambda nm: ConvGRU(h_planes=self.dim_net,
                               static_planes=self.dim_inp, dyn_planes=dyn,
                               dtype=dt, name=nm),
            "gru")
        self.deltas = per_stage(
            self.share_delta,
            lambda nm: _TwoConv(self.dim0_delta, 1, self.kernel0_delta,
                                self.kernel1_delta, False, dt, name=nm),
            "delta")

    def gru_ctx(self, inp, stage: int):
        """Loop-invariant GRU gate contributions of the context features —
        compute ONCE per cascade stage, outside the iteration scan
        (``core/raft.py:57-60``: the context encoder runs once; its gate
        convolutions need not rerun every iteration either)."""
        return self.grus[stage if not self.share_gru else 0].ctx(
            inp.astype(self.dtype))

    def __call__(self, net, inp, disp, corr_frames, stage: int,
                 gru_ctx=None, row_mask=None, pre_aggregated=False):
        """net/inp: (B, H, W, dim); disp: (B, H, W, 1) fp32;
        corr_frames: (B, V, H, W, cor_planes) fp32; gru_ctx: optional
        precomputed :meth:`gru_ctx` (else computed here, per call).
        ``row_mask`` (B, H, 1, 1): row-sharded callers (parallel/spatial.py)
        run this block on a block of rows EXTENDED by ghost rows; rows
        beyond the global image must enter every convolution as zeros (the
        unsharded model's SAME padding) — the mask zeroes them at each conv
        input.  ``pre_aggregated``: corr_frames is already the
        view-aggregated (B, H, W, len(aggregation)*cor_planes) tensor
        (view-sharded callers compute mean/max/std with mesh collectives,
        parallel/infer.py).  Returns (net, delta)."""
        dt = self.dtype
        dctx = (100.0 * disp_context(disp, self.size_disp_enc)).astype(dt)

        if pre_aggregated:
            corr = corr_frames.astype(dt)
        else:
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
            gd = jnp.concatenate(
                [dctx, jnp.zeros(corr.shape[:-1] + (self.dim1_corr,), dt)],
                axis=-1)
            for g in self.grus[1:]:
                g(net.astype(dt), gd, g.ctx(inp.astype(dt)))
            for d in self.deltas[1:]:
                d(net.astype(dt))

        mk = None if row_mask is None else row_mask.astype(dt)
        corr = self.corr_encoders[stage if not self.share_corr else 0](
            corr if mk is None else corr * mk, row_mask=row_mask)
        if gru_ctx is None:
            gru_ctx = self.gru_ctx(inp, stage)
        dyn = jnp.concatenate([dctx, corr], axis=-1)
        if mk is not None:
            dyn = dyn * mk
        net = net.astype(dt)
        net = self.grus[stage if not self.share_gru else 0](
            net if mk is None else net * mk, dyn, gru_ctx)
        if mk is not None:
            net = net * mk
        d = self.deltas[stage if not self.share_delta else 0](
            net, row_mask=row_mask)
        delta = 0.01 * d.astype(jnp.float32)
        return net, delta

    @property
    def cor_planes(self) -> int:
        return len(self.aggregation) * self.num_levels * (2 * self.radius + 1)
