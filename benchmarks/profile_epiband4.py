"""Ablate the dynamic epiband kernel's components at the largest bench view.

Variants (timing only — some produce wrong values):
  full        baseline kernel
  no-ladder   alignment ladder removed
  no-hat      hat pieces + segment matmul replaced by a slice copy
  hat-default segment matmul at DEFAULT precision (bf16 passes)
  no-matmul   G matmul replaced by a broadcast (DMA + rest kept)
"""
import functools, math, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
print("devices:", jax.devices(), flush=True)

import cermvs_tpu.ops.pallas.epiband as eb

V, h_r, w_r, C = 1, 512, 512, 64
s_max, s_neg = 576, 16
ws = w_r + s_max + s_neg
D = 44
incre = 0.0025 / 44
rate_hi = s_max / 0.00375
rate_lo = rate_hi / 1.6
sig_lo, sig_hi = rate_lo * incre, rate_hi * incre

rng = np.random.RandomState(0)
fr = jnp.asarray(rng.randn(V, h_r, w_r, C).astype(np.float32)).astype(
    jnp.bfloat16)
fs = jnp.asarray(rng.randn(V, h_r, ws, C).astype(np.float32)).astype(
    jnp.bfloat16)
base = jnp.asarray(
    rng.uniform(-20.0, 120.0, (V, h_r, w_r)).astype(np.float32))
sigma = jnp.asarray(
    rng.uniform(sig_lo, sig_hi, (V, h_r, w_r)).astype(np.float32))


def timeit(label, f, n_iter=8):
    f_j = jax.jit(f)
    out = f_j()
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f_j()
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n_iter * 1000
    print(f"{label}: {dt:.1f} ms", flush=True)


def variant(mode):
    orig = eb._epiband_kernel

    def kern(fr_ref, fs_ref, base_ref, sigma_ref, ones_ref, out_ref, *,
             D, s_max, ws, M, slices, xc, n_rows, n_chunks):
        fr = fr_ref[0, 0]
        fs = fs_ref[0, 0]
        if mode == "no-matmul":
            G = jnp.broadcast_to(fr[:, :1].astype(jnp.float32), (xc, ws))
            G = G * 1.0
        else:
            G = jax.lax.dot_general(
                fr, fs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        r = ((pl.program_id(0) * n_rows + pl.program_id(1)) * n_chunks
             + pl.program_id(2))
        b_ = base_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)
        sg = sigma_ref[pl.ds(r % 8, 1), :].reshape(xc, 1)
        xg = (jax.lax.broadcasted_iota(jnp.int32, (xc, 1), 0)
              .astype(jnp.float32)
              + (pl.program_id(2) * xc).astype(jnp.float32))
        p0 = xg + float(s_max) - b_
        c = jnp.floor(p0).astype(jnp.int32) - (M - 2)
        c = jnp.clip(c, -M, ws - 1)
        rel0 = p0 - c.astype(jnp.float32)
        if mode != "no-ladder":
            cpos = jnp.where(c < 0, c + ws, c)
            for b in range(max(1, math.ceil(math.log2(-(-ws // 128))))):
                amt = 128 << b
                if amt >= ws:
                    break
                bit = (cpos & amt) > 0
                G = jnp.where(bit, pltpu.roll(G, ws - amt, axis=1), G)
            Wn = min(M + 128, ws)
            Gn = G[:, :Wn]
            for b in range(7):
                amt = 1 << b
                bit = (cpos & amt) > 0
                Gn = jnp.where(bit, pltpu.roll(Gn, Wn - amt, axis=1), Gn)
            aligned = Gn[:, :M]
        else:
            aligned = G[:, :M]
        miota = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
        valid = (((c + miota) >= 0) & ((c + miota) <= ws - 1)).astype(
            jnp.float32)
        av = aligned * valid
        if mode == "no-hat":
            out_ref[0, 0, :, :] = av[:, :out_ref.shape[-1]]
            return
        pieces = []
        for k in range(D):
            u0, u1 = slices[k]
            rel = rel0 - float(k) * sg
            m = (jax.lax.broadcasted_iota(jnp.int32, (1, u1 - u0), 1)
                 .astype(jnp.float32) + float(u0))
            wgt = jnp.maximum(1.0 - jnp.abs(m - rel), 0.0)
            pieces.append(av[:, u0:u1] * wgt)
        prod = jnp.concatenate(pieces, axis=1)
        if mode == "hat-default" or ones_ref.dtype != jnp.float32:
            out_ref[0, 0, :, :] = jnp.dot(
                prod.astype(ones_ref.dtype), ones_ref[:, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        else:
            out_ref[0, 0, :, :] = jnp.dot(
                prod, ones_ref[:, :], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    return kern


print("--- xc sweep (bf16 segment sum) ---", flush=True)
for xc in [128, 256, 512]:
    try:
        timeit(f"xc={xc}", lambda xc=xc: eb.epiband_resample(
            fr, fs, base, sigma, D, s_max, sigma_lo=sig_lo, sigma_hi=sig_hi,
            xc=xc))
    except Exception as e:
        print(f"xc={xc}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


for mode in ["no-ladder", "no-hat", "no-matmul"]:
    eb_kern = variant(mode)
    orig = eb._epiband_kernel
    eb._epiband_kernel = lambda *a, **k: eb_kern(*a, **k)
    try:
        timeit(mode, lambda: eb.epiband_resample(
            fr, fs, base, sigma, D, s_max, sigma_lo=sig_lo, sigma_hi=sig_hi))
    finally:
        eb._epiband_kernel = orig


