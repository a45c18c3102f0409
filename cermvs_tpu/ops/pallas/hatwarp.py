"""Fused 1-D hat-resample kernel: the MXU half of the two-pass warp.

``rectify.warp_image_twopass`` turns a homography warp into two 1-D hat
resamples expressed as matmuls (replacing ``alt_cuda_corr``-style HBM
gathers, see ``ops/rectify.py``).  This kernel builds each hat tile
``S[o, s] = max(0, 1 - |s - pos[r, o]|)`` in VMEM (one VPU expression over
an iota) and feeds the MXU directly, avoiding the XLA formulation's
materialized hat transient.

STATUS — measured experiment, NOT the default: on TPU v5e (in-graph
amortized timing) XLA fuses the hat construction into its einsums well
enough to beat this kernel at every profiled shape (bench back-warp 2.2
vs 2.4 ms, wide src-warp 2.6 vs 4.4 ms, scale-2 over-budget chunked case
48 vs 91 ms — benchmarks/profile_hatwarp.py).  Output is BIT-IDENTICAL
to the XLA path, the custom VJP matches XLA autodiff, and it lowers on
the real Mosaic toolchain — kept as ``engine="pallas"`` for future
tuning (narrower banded windows via scalar-prefetched offsets are the
obvious next step; the full-width ``S`` row is the cost).

Primitive: ``hat_resample_rows(img, pos)`` with ``img (R, S, C)`` and
``pos (R, O)`` returns ``out (R, O, C) = sum_s hat(s - pos[r, o]) *
img[r, s, :]`` in fp32.  Out-of-range positions get zero weight (the hat
support does this naturally — same semantics as the XLA path's
out-of-range hats); "clamp" modes are the caller's position preprocessing,
exactly as in ``warp_image_twopass``.

Differentiable w.r.t. ``img`` via a custom VJP running the TRANSPOSED
kernel (``d_img[r, s, :] = sum_o hat(s - pos[r, o]) * d_out[r, o, :]``);
``pos`` gets zero gradient (parity with the XLA path's ``stop_gradient``
on position maps, itself mirroring the reference CUDA backward that never
writes coordinate grads, ``correlation_kernel.cu:307``).

Mosaic notes (DEVNOTES.md): iotas are built int32 then cast; dots carry an
explicit ``precision`` (bf16 images run DEFAULT single-pass, fp32 images
HIGHEST — the TPU default would truncate fp32 operands to bf16 passes); no
rolls, no dynamic slices.  Grid order keeps the image block index constant
across the inner (output-tile) dimension, so Mosaic holds each row block
in VMEM across its output tiles instead of refetching.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 8    # rows per block (sublane alignment)
OC = 128  # output-position tile (lanes)


def _hat_kernel(img_ref, pos_ref, out_ref, *, S, C, oc, rb, cdtype, prec):
    """One (row-block, out-tile) cell: out[r, o, :] = hat-row @ img-row."""
    for r in range(rb):
        imr = img_ref[r]                                   # (S, C)
        # keep the slice 2-D then relayout lanes->sublane column (the 1-vreg
        # pattern epiband uses for its per-cell base/sigma rows)
        pr = pos_ref[pl.ds(r, 1), :].reshape(oc, 1)        # (oc, 1) f32
        s = jax.lax.broadcasted_iota(jnp.int32, (oc, S), 1).astype(
            jnp.float32)
        w = jnp.maximum(1.0 - jnp.abs(s - pr), 0.0)        # (oc, S)
        out_ref[r] = jax.lax.dot_general(
            w.astype(cdtype), imr.astype(cdtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)


def _hat_kernel_t(dout_ref, pos_ref, dimg_ref, *, O, C, sc, rb, cdtype,
                  prec):
    """Transposed cell: d_img[r, s, :] = sum_o hat(s - pos[r, o]) dout[r, o].

    The output tile runs over SAMPLE positions s; the full position row
    (O lanes) is resident per cell.
    """
    s0 = pl.program_id(1) * sc
    for r in range(rb):
        do = dout_ref[r]                                   # (O, C)
        pr = pos_ref[pl.ds(r, 1), :]                       # (1, O) f32
        s = (jax.lax.broadcasted_iota(jnp.int32, (sc, O), 0)
             + s0).astype(jnp.float32)
        w = jnp.maximum(1.0 - jnp.abs(s - pr), 0.0)        # (sc, O)
        dimg_ref[r] = jax.lax.dot_general(
            w.astype(cdtype), do.astype(cdtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)


def _pad_axis(a, axis, mult, value=0.0):
    pad = -a.shape[axis] % mult
    if not pad:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths, constant_values=value)


def _cfg(img, interpret):
    cdtype = img.dtype if img.dtype == jnp.bfloat16 else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if cdtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    if jax.default_backend() == "cpu":
        interpret = True  # pallas has no CPU backend; tests run interpreted
    return cdtype, prec, interpret


def hat_resample_rows(img: jnp.ndarray, pos: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """(R, S, C) x (R, O) -> (R, O, C) fp32 per-row hat resample (above)."""
    return _hat_rows_vjp(img, pos, img.shape[1], jnp.dtype(img.dtype).name,
                         interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _hat_rows_vjp(img, pos, S, img_dtype, interpret):
    return _hat_fwd(img, pos, interpret)


def _hat_fwd(img, pos, interpret):
    R, S, C = img.shape
    O = pos.shape[1]
    assert pos.shape[0] == R, (pos.shape, img.shape)
    cdtype, prec, interpret = _cfg(img, interpret)

    imgp = _pad_axis(_pad_axis(img, 0, RB), 1, 128)
    # padded positions get -1e4: zero hat weight everywhere
    posp = _pad_axis(_pad_axis(pos.astype(jnp.float32), 0, RB), 1, OC,
                     value=-1e4)
    Rp, Sp = imgp.shape[0], imgp.shape[1]
    Op = posp.shape[1]

    kern = functools.partial(_hat_kernel, S=Sp, C=C, oc=OC, rb=RB,
                             cdtype=cdtype, prec=prec)
    out = pl.pallas_call(
        kern,
        grid=(Rp // RB, Op // OC),
        in_specs=[
            pl.BlockSpec((RB, Sp, C), lambda r, o: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, OC), lambda r, o: (r, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, OC, C), lambda r, o: (r, o, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, Op, C), jnp.float32),
        interpret=interpret,
    )(imgp, posp)
    return out[:R, :O]


def _hat_vjp_fwd(img, pos, S, img_dtype, interpret):
    return _hat_fwd(img, pos, interpret), pos


def _hat_vjp_bwd(S, img_dtype, interpret, pos, dout):
    R, O, C = dout.shape
    cdtype = jnp.bfloat16 if img_dtype == "bfloat16" else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if cdtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    if jax.default_backend() == "cpu":
        interpret = True

    doutp = _pad_axis(_pad_axis(dout, 0, RB), 1, 128)
    posp = _pad_axis(_pad_axis(pos.astype(jnp.float32), 0, RB), 1, 128,
                     value=-1e4)
    Rp, Op = doutp.shape[0], doutp.shape[1]
    Sp = -(-S // OC) * OC

    kern = functools.partial(_hat_kernel_t, O=Op, C=C, sc=OC, rb=RB,
                             cdtype=cdtype, prec=prec)
    dimg = pl.pallas_call(
        kern,
        grid=(Rp // RB, Sp // OC),
        in_specs=[
            pl.BlockSpec((RB, Op, C), lambda r, s: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, Op), lambda r, s: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, OC, C), lambda r, s: (r, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, Sp, C), jnp.float32),
        interpret=interpret,
    )(doutp, posp)
    return dimg[:R, :S].astype(img_dtype), jnp.zeros_like(pos)


_hat_rows_vjp.defvjp(_hat_vjp_fwd, _hat_vjp_bwd)
