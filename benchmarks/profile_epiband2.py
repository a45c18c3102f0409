"""Epiband kernel sweep: scene-wide vs per-view-tight static windows.

Measured question (bench.py DTU-rig scene, plan h_r=512 w_r=512 ws=1104):
how much of the kernel is inflated by scene-wide rate bounds
(sigma in [1.05, 5.64], segment width 9557) vs per-view-tight bounds
(spread ~1.1x, width ~1.1k), and how much does shrinking the src band
(per-view s_max) buy on top.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from cermvs_tpu.ops.pallas.epiband import epiband_resample, _window_and_slices


def bench(V, h_r, w_r, ws, C, D, slo, shi, label):
    rng = np.random.RandomState(0)
    s_max = ws - w_r - 16
    M, slices = _window_and_slices(D, slo, shi)
    total = sum(u1 - u0 for u0, u1 in slices)
    fr = jnp.asarray(rng.randn(V, h_r, w_r, C).astype(np.float32)).astype(jnp.bfloat16)
    fs = jnp.asarray(rng.randn(V, h_r, ws, C).astype(np.float32)).astype(jnp.bfloat16)
    base = jnp.asarray(rng.uniform(0, s_max * 0.8, (V, h_r, w_r)).astype(np.float32))
    sigma = jnp.asarray(rng.uniform(slo, shi, (V, h_r, w_r)).astype(np.float32))
    f = jax.jit(lambda a, b, c, d: epiband_resample(
        a, b, c, d, D, s_max, sigma_lo=slo, sigma_hi=shi).sum())
    t0 = time.perf_counter(); v = float(f(fr, fs, base, sigma)); t1 = time.perf_counter()
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        v = float(f(fr, fs, base, sigma))
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: V={V} ws={ws} M={M} total={total}: "
          f"{dt*1e3:.1f} ms/call (compile {t1-t0:.0f}s, sum={v:.3e})", flush=True)


INC = 0.0025 / 64
# scene-wide (current): rate 26974..144317
bench(10, 512, 512, 1104, 64, 64, 26973.8 * INC, 144316.6 * INC, "scene-wide D64")
# per-view tight, largest-baseline view (rate 123381..135170), full ws
bench(10, 512, 512, 1104, 64, 64, 123381 * INC, 135170 * INC, "tight-hi D64 full-ws")
# per-view tight + per-view band: view 9 needs s~507 -> ws = 512+512+16
bench(10, 512, 512, 1040, 64, 64, 123381 * INC, 135170 * INC, "tight-hi D64 ws1040")
# small-baseline view: rate 30865..31631, s_need 119 -> ws = 512+128+16
bench(10, 512, 512, 656, 64, 64, 30865 * INC, 31631 * INC, "tight-lo D64 ws656")
# stage-1: D=44, incre x ~1.45 (64/44)
INC1 = 0.0025 / 44
bench(10, 512, 512, 1104, 64, 44, 26973.8 * INC1, 144316.6 * INC1, "scene-wide D44")
bench(10, 512, 512, 1040, 64, 44, 123381 * INC1, 135170 * INC1, "tight-hi D44 ws1040")
