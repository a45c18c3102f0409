"""Chunked epiband kernel on the REAL toolchain: compile check at the
previously-unaffordable far-view window (sigma ~17 px/hypothesis), numeric
check vs the XLA oracle, and timing vs the unchunked kernel at affordable
windows (the round-5 kernel study's chunked row).

Usage: python benchmarks/profile_epiband_chunked.py [--bench|--far|--all]
"""
import argparse, math, sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

from cermvs_tpu.ops.pallas.epiband import (
    epiband_resample, kernel_vmem_bytes, pick_k_chunks)
from cermvs_tpu.ops.corr_rectified import _resample_rows_oracle


def timeit(label, f, n_iter=6):
    f_j = jax.jit(f)
    out = f_j()
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f_j()
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n_iter * 1000
    print(f"  {label}: {dt:.1f} ms", flush=True)
    return dt


def scan_time(label, f, args, n_iter=8):
    """In-graph amortized timing (iteration-dependent inputs beat CSE;
    args passed as jit ARGUMENTS — closures embed as HLO constants and
    413 the relay)."""
    def body(c, x):
        return c, jnp.sum(f(*x))

    def run(a):
        _, outs = jax.lax.scan(body, 0.0, a)
        return outs

    r = jax.jit(run)
    out = r(args)
    float(jnp.sum(out))
    import time as _t
    t0 = _t.perf_counter()
    out = r(args)
    float(jnp.sum(out))
    dt = (_t.perf_counter() - t0) / args[0].shape[0] * 1000
    print(f"  {label}: {dt:.1f} ms/view-call", flush=True)
    return dt


def make_inputs(V, h_r, w_r, C, ws, sig_lo, sig_hi, n_iter=4, seed=0):
    rng = np.random.RandomState(seed)
    fr = jnp.asarray(rng.randn(n_iter, V, h_r, w_r, C).astype(np.float32)
                     ).astype(jnp.bfloat16)
    fs = jnp.asarray(rng.randn(n_iter, V, h_r, ws, C).astype(np.float32)
                     ).astype(jnp.bfloat16)
    base = jnp.asarray(rng.uniform(-20., 120., (n_iter, V, h_r, w_r)
                                   ).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(sig_lo, sig_hi, (n_iter, V, h_r, w_r)
                                    ).astype(np.float32))
    return fr, fs, base, sigma


def far_view():
    # TNT-far-view-like geometry: the round-4 unaffordable window
    V, h_r, w_r, C = 1, 256, 512, 64
    s_max, s_neg = 1280, 16
    ws = w_r + s_max + s_neg
    D = 64
    sig_lo, sig_hi = 14.0, 17.5
    unchunked = kernel_vmem_bytes(D, sig_lo, sig_hi, ws, C, s_max=s_max)
    kc = pick_k_chunks(D, sig_lo, sig_hi, ws, C, s_max=s_max)
    print(f"far view: unchunked estimate {unchunked/1e6:.1f} MB, "
          f"pick_k_chunks -> {kc}", flush=True)
    assert kc > 1
    fr, fs, base, sigma = make_inputs(V, h_r, w_r, C, ws, sig_lo, sig_hi)
    # args passed explicitly: closure-captured arrays embed as HLO
    # constants and blow the relay's compile-request size cap (HTTP 413)
    out = jax.jit(lambda a, b, c, d: epiband_resample(
        a, b, c, d, D, s_max, sig_lo, sig_hi,
        k_chunks=kc))(fr[0], fs[0], base[0], sigma[0])
    ref = jax.jit(lambda a, b, c, d: _resample_rows_oracle(
        a.astype(jnp.float32), b.astype(jnp.float32),
        c, d, D, s_max))(fr[0, 0], fs[0, 0], base[0, 0], sigma[0, 0])
    err = float(jnp.max(jnp.abs(out[0] - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    print(f"far view chunked (k={kc}) vs oracle: max abs {err:.3e} "
          f"(scale {scale:.1f})", flush=True)
    assert err < 2e-2 * scale, (err, scale)
    scan_time(f"far-view chunked k={kc} fwd", lambda a, b, c, d:
              epiband_resample(a, b, c, d, D, s_max, sig_lo, sig_hi,
                               k_chunks=kc), (fr, fs, base, sigma))
    scan_time("far-view ORACLE (XLA gather) fwd", lambda a, b, c, d:
              _resample_rows_oracle(a[0], b[0], c[0], d[0], D, s_max)[None],
              (fr, fs, base, sigma))


def bench_shape():
    # the round-4 profile shape (profile_epiband4.py): stage-1 dynamic
    V, h_r, w_r, C = 1, 512, 512, 64
    s_max, s_neg = 576, 16
    ws = w_r + s_max + s_neg
    D = 44
    rate_hi = s_max / 0.00375
    rate_lo = rate_hi / 1.6
    incre = 0.0025 / 44
    sig_lo, sig_hi = rate_lo * incre, rate_hi * incre
    print(f"bench shape: sigma in [{sig_lo:.2f}, {sig_hi:.2f}], "
          f"unchunked {kernel_vmem_bytes(D, sig_lo, sig_hi, ws, C, s_max=s_max)/1e6:.1f} MB",
          flush=True)
    fr, fs, base, sigma = make_inputs(V, h_r, w_r, C, ws, sig_lo, sig_hi)
    ref = None
    for kc in (1, 2, 4, 8):
        f = lambda a, b, c, d, _k=kc: epiband_resample(
            a, b, c, d, D, s_max, sig_lo, sig_hi, k_chunks=_k)
        out = jax.jit(f)(fr[0], fs[0], base[0], sigma[0])
        if ref is None:
            ref = out
        else:
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"  k={kc} vs k=1: {err:.2e}", flush=True)
        scan_time(f"bench k_chunks={kc} fwd", f, (fr, fs, base, sigma))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="all")
    a = ap.parse_args()
    if a.mode in ("far", "all"):
        far_view()
    if a.mode in ("bench", "all"):
        bench_shape()
