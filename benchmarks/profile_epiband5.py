"""Round-5 epiband kernel study: the BANDED-DYNAMIC variant.

The dynamic kernel's cost splits ~evenly between the hat/segment stage and
the alignment rolls (round-4 profile_epiband4).  This variant attacks the
rolls and the G matmul together: instead of a full-width ``G = fr @ fs^T``
(xc, ws) plus a two-level barrel ladder (log2(ws/128) full-width stages +
7 narrow), it

1. computes a per-(view,row,x-chunk) 8-aligned BAND START outside the
   kernel (min over the chunk of ``floor(p0) - (M-2)``, clamped), shipped
   via scalar prefetch (SMEM);
2. matmuls only the (xc, W_band) diagonal band ``fs[start : start+W_band]``;
3. aligns with a single ladder of ``ceil(log2(W_band - M + 1))`` stages on
   the W_band-narrow array.

APPROXIMATION: pixels whose window start exceeds ``start + W_band - M``
(intra-chunk base spread beyond the static pad) are CLAMPED — wrong values
at extreme depth discontinuities.  The probe reports the clamp fraction on
a smooth base field (realistic stage-1 origins) and on the adversarial
uniform-random base.  Promotion to production would require a planner-side
spread bound; this script measures whether the speed justifies that work.
"""
import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)

from cermvs_tpu.ops.pallas import epiband as eb
from cermvs_tpu.ops.corr_rectified import _resample_rows_oracle

XC = 128


def _banded_kernel(start_ref, fr_ref, fs_ref, base_ref, sigma_ref, ones_ref,
                   kv_ref, sm_ref, out_ref, *, D, s_max, ws, M, W_band, xc,
                   n_rows, n_chunks):
    r = ((pl.program_id(0) * n_rows + pl.program_id(1)) * n_chunks
         + pl.program_id(2))
    # scalar array carries start/8: the in-kernel *8 lets Mosaic prove
    # the sublane slice is 8-aligned
    start = start_ref[r] * 8
    fr = fr_ref[0, 0]
    fs_band = fs_ref[0, 0, pl.ds(start, W_band), :]
    G = jax.lax.dot_general(
        fr, fs_band, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (xc, W_band)

    base = base_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)
    sigma = sigma_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)
    xg = (jax.lax.broadcasted_iota(jnp.int32, (xc, 1), 0).astype(jnp.float32)
          + (pl.program_id(2) * xc).astype(jnp.float32))
    p0 = xg + float(s_max) - base
    c = jnp.floor(p0).astype(jnp.int32) - (M - 2)
    c = jnp.clip(c, -M, ws - 1)
    rel0 = p0 - c.astype(jnp.float32)
    # band offset; left-of-band windows WRAP (their wrapped entries are
    # the correct columns or masked invalid — exact); right overflow is
    # CLAMPED (the approximation, counted host-side)
    off = jnp.clip(c - start, -(M + 8), W_band - M)
    amt = jnp.where(off < 0, off + W_band, off)

    nbits = max(1, math.ceil(math.log2(W_band)))
    for b in range(nbits):
        a = 1 << b
        if a >= W_band:
            break
        bit = (amt & a) > 0
        G = jnp.where(bit, pltpu.roll(G, W_band - a, axis=1), G)
    aligned = G[:, :M]

    miota = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    s_abs = c + miota                                 # absolute src column
    valid = ((s_abs >= 0) & (s_abs <= ws - 1)
             & (s_abs >= start) & (s_abs < start + W_band)
             ).astype(jnp.float32)
    av = aligned * valid

    out_ref[0, 0, :, :] = eb._hat_window_sum(
        av, sigma, rel0, ones_ref, kv_ref, sm_ref, xc, M)


def banded_resample(fr_rect, fs_rect, base, sigma, n_hyp, s_max, sigma_lo,
                    sigma_hi, pad=128):
    cfg = eb._setup(fr_rect, fs_rect, n_hyp, s_max, sigma_lo, sigma_hi,
                    False, None, False)
    V, h_r, w_r, C = fr_rect.shape
    ws, M, xc = cfg["ws"], cfg["M"], cfg["xc"]
    W_band = min(-(-(M + xc + pad) // 128) * 128, ws)
    # per-cell 8-aligned band starts (computed in XLA, shipped via SMEM
    # scalar prefetch)
    x = jax.lax.broadcasted_iota(jnp.float32, (V, h_r, w_r), 2)
    p0 = x + float(s_max) - base
    c = jnp.clip(jnp.floor(p0).astype(jnp.int32) - (M - 2), -M, ws - 1)
    cmin = jnp.min(c.reshape(-1, xc), axis=1)
    starts = (jnp.clip((cmin // 8) * 8, 0, ws - W_band) // 8).astype(
        jnp.int32)
    cells = starts.shape[0]
    cells_pad = -(-cells // 8) * 8
    starts = jnp.pad(starts, (0, cells_pad - cells))
    clampfrac = jnp.mean(
        ((c.reshape(-1, xc) - 8 * starts[:cells, None]) > (W_band - M))
        .astype(jnp.float32))

    kern = functools.partial(
        _banded_kernel, D=n_hyp, s_max=s_max, ws=ws, M=M, W_band=W_band,
        xc=xc, n_rows=h_r, n_chunks=cfg["n_chunks"])
    grid = (V, h_r, cfg["n_chunks"])
    n_chunks = cfg["n_chunks"]
    total, Dp, Mp = cfg["total"], cfg["Dp"], cfg["Mp"]

    # with scalar prefetch every index map receives the scalar ref last
    def cell_ix(v, y, x, sref):
        return (((v * h_r + y) * n_chunks + x) // 8, 0)

    in_specs = [
        pl.BlockSpec((1, 1, xc, C), lambda v, y, x, s: (v, y, x, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ws, C), lambda v, y, x, s: (v, y, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, xc), cell_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, xc), cell_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((total, Dp), lambda v, y, x, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, total), lambda v, y, x, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((total, Mp), lambda v, y, x, s: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, 1, xc, Dp), lambda v, y, x, s: (v, y, x, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=in_specs, out_specs=out_spec),
        out_shape=jax.ShapeDtypeStruct((V, h_r, w_r, cfg["Dp"]),
                                       jnp.float32),
        interpret=cfg["interpret"],
    )(starts, fr_rect, fs_rect, cfg["flat"](base), cfg["flat"](sigma),
      cfg["ones"], cfg["kv"], cfg["sm"])
    out = out[..., :n_hyp] if cfg["Dp"] != n_hyp else out
    return out, clampfrac, W_band


def scan_time(label, f, args):
    def body(c, x):
        return c, jnp.sum(f(*x))

    def run(a):
        _, outs = jax.lax.scan(body, 0.0, a)
        return outs

    r = jax.jit(run)
    out = r(args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = r(args)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / args[0].shape[0] * 1000
    print(f"  {label}: {dt:.1f} ms/view-call", flush=True)
    return dt


def run_shape(tag, h_r, w_r, C, s_max, D, sig_lo, sig_hi, smooth=True,
              n_iter=4, pad=128):
    s_neg = 16
    ws = w_r + s_max + s_neg
    rng = np.random.RandomState(0)
    fr = jnp.asarray(rng.randn(n_iter, 1, h_r, w_r, C).astype(np.float32)
                     ).astype(jnp.bfloat16)
    fs = jnp.asarray(rng.randn(n_iter, 1, h_r, ws, C).astype(np.float32)
                     ).astype(jnp.bfloat16)
    if smooth:
        # realistic stage-1 base: smooth origin field (rate * disparity)
        yy, xx = np.meshgrid(np.arange(h_r), np.arange(w_r), indexing="ij")
        b0 = (60 * np.sin(2 * np.pi * xx / w_r)
              * np.cos(2 * np.pi * yy / h_r) + 40).astype(np.float32)
        base = jnp.asarray(np.broadcast_to(b0, (n_iter, 1, h_r, w_r)).copy())
    else:
        base = jnp.asarray(rng.uniform(-20., 120., (n_iter, 1, h_r, w_r)
                                       ).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(sig_lo, sig_hi, (n_iter, 1, h_r, w_r)
                                    ).astype(np.float32))
    print(f"[{tag}] ws={ws} D={D} sigma=[{sig_lo:.2f},{sig_hi:.2f}] "
          f"smooth_base={smooth}", flush=True)

    kc = eb.pick_k_chunks(D, sig_lo, sig_hi, ws, C, s_max=s_max)
    print(f"  pick_k_chunks -> {kc} (unchunked estimate "
          f"{eb.kernel_vmem_bytes(D, sig_lo, sig_hi, ws, C, s_max=s_max)/1e6:.1f} MB)",
          flush=True)
    if kc == 1:
        # correctness + clamp stats (single call)
        out_b, clampfrac, W_band = jax.jit(
            lambda a, b, c, d: banded_resample(a, b, c, d, D, s_max, sig_lo,
                                               sig_hi, pad=pad))(
            fr[0], fs[0], base[0], sigma[0])
        ref = jax.jit(lambda a, b, c, d: eb.epiband_resample(
            a, b, c, d, D, s_max, sig_lo, sig_hi))(fr[0], fs[0], base[0],
                                                   sigma[0])
        err = float(jnp.max(jnp.abs(out_b - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        print(f"  banded W_band={W_band} clamp_frac={float(clampfrac):.5f} "
              f"max|diff| vs baseline {err:.3e} (scale {scale:.1f})",
              flush=True)
        scan_time("baseline dynamic", lambda a, b, c, d:
                  eb.epiband_resample(a, b, c, d, D, s_max, sig_lo, sig_hi),
                  (fr, fs, base, sigma))
        scan_time("banded dynamic", lambda a, b, c, d: banded_resample(
            a, b, c, d, D, s_max, sig_lo, sig_hi, pad=pad)[0],
            (fr, fs, base, sigma))
    else:
        print("  unchunked kernel does NOT fit the scoped-VMEM limit at "
              "this window (measured: 16.25M > 16M) — chunked variants "
              "only", flush=True)
        for k in (kc, 2 * kc):
            scan_time(f"chunked k={k}", lambda a, b, c, d, _k=k:
                      eb.epiband_resample(a, b, c, d, D, s_max, sig_lo,
                                          sig_hi, k_chunks=_k),
                      (fr, fs, base, sigma))
    scan_time("oracle (XLA gathers)", lambda a, b, c, d:
              _resample_rows_oracle(a[0], b[0], c[0], d[0], D, s_max)[None],
              (fr, fs, base, sigma))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="all")
    a = ap.parse_args()
    if a.mode in ("bench", "all"):
        # round-4 profile shape (stage-1 dynamic at the bench scale)
        rate_hi = 576 / 0.00375
        incre = 0.0025 / 44
        run_shape("bench 512x512 D=44", 512, 512, 64, 576, 44,
                  rate_hi / 1.6 * incre, rate_hi * incre)
    if a.mode in ("s2", "all"):
        # DTU scale-2-like: doubled resolution and rates
        rate_hi = 1152 / 0.00375
        incre = 0.0025 / 44
        run_shape("s2-like 576x768 D=44", 576, 768, 64, 1152, 44,
                  rate_hi / 1.6 * incre, rate_hi * incre)
