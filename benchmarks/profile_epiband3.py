"""Epiband x-chunk sweep: is the kernel grid-cell-overhead bound?

First-principles compute cost of the tight-window config (~25 ms for 10
views) is ~7x below measurement (186 ms) — suspect per-cell fixed costs
(DMA issue latency, grid bookkeeping).  Sweep xc (cells per row) at fixed
work to discriminate.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from cermvs_tpu.ops.pallas.epiband import epiband_resample, _window_and_slices


def bench(V, h_r, w_r, ws, C, D, slo, shi, xc, label):
    rng = np.random.RandomState(0)
    s_max = ws - w_r - 16
    fr = jnp.asarray(rng.randn(V, h_r, w_r, C).astype(np.float32)).astype(jnp.bfloat16)
    fs = jnp.asarray(rng.randn(V, h_r, ws, C).astype(np.float32)).astype(jnp.bfloat16)
    base = jnp.asarray(rng.uniform(0, s_max * 0.8, (V, h_r, w_r)).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(slo, shi, (V, h_r, w_r)).astype(np.float32))
    f = jax.jit(lambda a, b, c, d: epiband_resample(
        a, b, c, d, D, s_max, sigma_lo=slo, sigma_hi=shi, xc=xc).sum())
    try:
        v = float(f(fr, fs, base, sigma))
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        v = float(f(fr, fs, base, sigma))
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: xc={xc}: {dt*1e3:.1f} ms/call (sum={v:.3e})", flush=True)


INC = 0.0025 / 64
# tight-lo config from profile_epiband2 (186 ms at xc=128)
for xc in (128, 256, 512):
    bench(10, 512, 512, 656, 64, 64, 30865 * INC, 31631 * INC, xc,
          f"tight-lo D64 ws656")
# tight-hi config (239 ms at xc=128)
for xc in (256, 512):
    bench(10, 512, 512, 1040, 64, 64, 123381 * INC, 135170 * INC, xc,
          f"tight-hi D64 ws1040")
