"""Compile-check + timing of the epiband backward kernels on the real TPU.

Shapes mirror the largest bench view (dynamic) and the stage-0 slab
(static).  Values are checked against jax.grad of the XLA oracle at a
smaller shape first (full-shape oracle grads OOM the gather path).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
# the ORACLE's backward einsums run at DEFAULT precision (bf16 passes) on
# TPU otherwise — the value check needs the oracle exact
jax.config.update("jax_default_matmul_precision", "highest")
print("devices:", jax.devices(), flush=True)

from cermvs_tpu.ops.corr_rectified import _resample_rows_oracle
from cermvs_tpu.ops.pallas.epiband import epiband_resample

rng = np.random.RandomState(0)


def timeit(label, f, *args, n_iter=4):
    f_j = jax.jit(f)
    t0 = time.perf_counter()
    out = f_j(*args)
    float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)))
    print(f"  [{label} compile {time.perf_counter()-t0:.0f}s]", flush=True)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f_j(*args)
    float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)))
    print(f"{label}: {(time.perf_counter()-t0)/n_iter*1000:.1f} ms",
          flush=True)


# ---- small-shape value check vs oracle grad (on TPU)
V, h_r, w_r, C, D = 1, 16, 128, 8, 8
s_max = 64
ws = w_r + s_max + 16
fr = jnp.asarray(rng.randn(V, h_r, w_r, C).astype(np.float32))
fs = jnp.asarray(rng.randn(V, h_r, ws, C).astype(np.float32))
base = jnp.asarray(rng.uniform(-10., 40., (V, h_r, w_r)).astype(np.float32))
sig = jnp.asarray(rng.uniform(1., 3., (V, h_r, w_r)).astype(np.float32))
cot = jnp.asarray(rng.randn(V, h_r, w_r, D).astype(np.float32))

for static in (False, True):
    b = jnp.zeros_like(base) if static else base

    def lo(fr, fs, _b=b):
        out = jax.vmap(lambda a, q, c, d: _resample_rows_oracle(
            a, q, c, d, D, s_max))(fr, fs, _b, sig)
        return jnp.sum(out * cot)

    def lk(fr, fs, _b=b, _s=static):
        out = epiband_resample(fr, fs, _b, sig, D, s_max, sigma_lo=1.0,
                               sigma_hi=3.0, static_base=_s)
        return jnp.sum(out * cot)

    g0 = jax.jit(jax.grad(lo, argnums=(0, 1)))(fr, fs)
    g1 = jax.jit(jax.grad(lk, argnums=(0, 1)))(fr, fs)
    for a, bb, name in [(g0[0], g1[0], "dfr"), (g0[1], g1[1], "dfs")]:
        err = float(jnp.max(jnp.abs(a - bb)))
        sc = float(jnp.max(jnp.abs(a)))
        print(f"static={static} {name}: max abs err {err:.2e} "
              f"(scale {sc:.1f})", flush=True)
        assert err < 1e-3 * max(sc, 1.0), (static, name, err)

# ---- production-shape timing (largest bench view), bf16 features
V, h_r, w_r, C = 1, 512, 512, 64
s_max, s_neg = 576, 16
ws = w_r + s_max + s_neg
D = 44
incre = 0.0025 / 44
rate_hi = s_max / 0.00375
rate_lo = rate_hi / 1.6
sig_lo, sig_hi = rate_lo * incre, rate_hi * incre

fr = jnp.asarray(rng.randn(V, h_r, w_r, C).astype(np.float32)).astype(
    jnp.bfloat16)
fs = jnp.asarray(rng.randn(V, h_r, ws, C).astype(np.float32)).astype(
    jnp.bfloat16)
base = jnp.asarray(rng.uniform(-20., 120., (V, h_r, w_r)).astype(np.float32))
sig = jnp.asarray(
    rng.uniform(sig_lo, sig_hi, (V, h_r, w_r)).astype(np.float32))
cot = jnp.asarray(rng.randn(V, h_r, w_r, D).astype(np.float32))


def fwd(fr, fs):
    return epiband_resample(fr, fs, base, sig, D, s_max, sigma_lo=sig_lo,
                            sigma_hi=sig_hi)


def fwdbwd(fr, fs):
    return jax.grad(
        lambda a, b: jnp.sum(fwd(a, b).astype(jnp.float32) * cot),
        argnums=(0, 1))(fr, fs)


timeit("dynamic fwd (D=44, bf16)", fwd, fr, fs)
timeit("dynamic fwd+bwd (D=44, bf16)", fwdbwd, fr, fs)

# stage-0 static variant at D=64
D0 = 64
incre0 = 0.0025 / 64
sig0 = jnp.asarray(rng.uniform(rate_lo * incre0, rate_hi * incre0,
                               (V, h_r, w_r)).astype(np.float32))
cot0 = jnp.asarray(rng.randn(V, h_r, w_r, D0).astype(np.float32))
z = jnp.zeros((V, h_r, w_r), jnp.float32)


def fwd0(fr, fs):
    return epiband_resample(fr, fs, z, sig0, D0, s_max,
                            sigma_lo=rate_lo * incre0,
                            sigma_hi=rate_hi * incre0, static_base=True)


def fwdbwd0(fr, fs):
    return jax.grad(
        lambda a, b: jnp.sum(fwd0(a, b).astype(jnp.float32) * cot0),
        argnums=(0, 1))(fr, fs)


timeit("static fwd (D=64, bf16)", fwd0, fr, fs)
timeit("static fwd+bwd (D=64, bf16)", fwdbwd0, fr, fs)
