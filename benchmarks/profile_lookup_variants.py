"""Lookup cost: banded vs pallas vs pre-interp vs bf16 vs gather.

The 16 per-iteration 33-tap lookups cost ~25 ms/map (~1.6 ms/iter) at the
bench shape — ~15x the HBM traffic floor (pyramid read 51 MB + out 15 MB).
The banded formulation builds a per-pixel (K+1, D) one-hot and reduces it
(~88M compare+select+fma per level-0): VPU-bound.  Variants:

  banded      — current (ops/corr.py:_lookup_banded), fp32
  banded_pre  — pre-interp g[d] = (1-f)*pool[d] + f*pool[d+1] once, then a
                K-band one-hot select (saves the lerp inside the band and
                one tap row)
  banded_bf16 — one-hot + reduce in bf16 (values stay fp32-accumulated)
  pallas      — ops/pallas/lookup.lookup_fused (pools in kernel)
  pallas_v2   — ops/pallas/lookup_v2.lookup_fused_v2 (prefix-sum)
  gather      — interp1d take_along_axis fallback

Run: python benchmarks/profile_lookup_variants.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

B, V, H, W, D = 1, 1, 288, 400, 64
R = 5
K = 2 * R + 1
LEVELS = 3
rng = np.random.RandomState(0)

corr0 = jnp.asarray(rng.randn(B, V, H, W, D).astype(np.float32))


def build_pyramid(corr, n):
    levels = [corr]
    for _ in range(n - 1):
        c = levels[-1]
        Dl = c.shape[-1]
        levels.append((c[..., 0:Dl:2] + c[..., 1:Dl:2]) * 0.5)
    return levels


pyr = build_pyramid(corr0, LEVELS)
x0_base = jnp.asarray((rng.rand(B, V, H, W) * (D - 2) + 1).astype(np.float32))


def banded(levels, x0, radius=R):
    from cermvs_tpu.ops.corr import _lookup_banded

    return _lookup_banded(levels, x0, radius)


def banded_pre(levels, x0, radius=R):
    outs = []
    for lvl, corr in enumerate(levels):
        D_l = corr.shape[-1]
        q = x0 / (2.0 ** lvl)
        c0 = jnp.floor(q)
        f = (q - c0)[..., None]
        c0 = c0.astype(jnp.int32)
        # pre-interp along D once (VPU, no per-tap lerp); pad both ends so
        # g[m] = (1-f)*pool[m] + f*pool[m+1] exists for m in [-1, D-1]
        # (m=-1 carries the f*pool[0] contribution of a just-below-range tap)
        poolp = jnp.pad(corr, [(0, 0)] * 4 + [(1, 1)])
        g = (1.0 - f) * poolp[..., :-1] + f * poolp[..., 1:]   # (..., D+1)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, D_l + 1), 4)
        a = j - (c0[..., None] - radius + 1)      # fires at m = c0-r+k
        k_idx = jnp.arange(K, dtype=jnp.int32).reshape(K, 1)
        onehot = (a[..., None, :] == k_idx).astype(corr.dtype)
        outs.append(jnp.einsum("bvhwj,bvhwkj->bvhwk", g, onehot))
    return jnp.concatenate(outs, axis=-1)


def banded_bf16(levels, x0, radius=R):
    outs = []
    for lvl, corr in enumerate(levels):
        D_l = corr.shape[-1]
        q = x0 / (2.0 ** lvl)
        c0 = jnp.floor(q)
        f = (q - c0)[..., None]
        c0 = c0.astype(jnp.int32)
        cb = corr.astype(jnp.bfloat16)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, D_l), 4)
        a = j - (c0[..., None] - radius)
        k_idx = jnp.arange(K + 1, dtype=jnp.int32).reshape(K + 1, 1)
        onehot = (a[..., None, :] == k_idx).astype(jnp.bfloat16)
        s = jnp.einsum("bvhwj,bvhwkj->bvhwk", cb, onehot,
                       preferred_element_type=jnp.float32)
        outs.append((1.0 - f) * s[..., :-1] + f * s[..., 1:])
    return jnp.concatenate(outs, axis=-1)


def pallas_fused(levels, x0, radius=R):
    from cermvs_tpu.ops.pallas.lookup import lookup_fused

    return lookup_fused(levels[0], x0, radius, LEVELS)


def pallas_v2(levels, x0, radius=R):
    from cermvs_tpu.ops.pallas.lookup_v2 import lookup_fused_v2

    return lookup_fused_v2(levels[0], x0, radius, LEVELS)


def gather(levels, x0, radius=R):
    from cermvs_tpu.ops.sampling import interp1d

    dx = jnp.arange(-radius, radius + 1, dtype=x0.dtype)
    outs = []
    for i, corr in enumerate(levels):
        taps = x0[..., None] / (2.0 ** i) + dx
        outs.append(interp1d(corr, taps))
    return jnp.concatenate(outs, axis=-1)


def timeit(label, fn, n=6, iters=16):
    def scanned(levels, x0b):
        def body(c, _):
            x0 = x0b * c  # carry-dependent (like the real per-iter disp)
            out = fn(levels, x0)
            return c + out.astype(jnp.float32).mean() * 1e-9, ()

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    f = jax.jit(scanned)
    try:
        t0 = time.perf_counter()
        float(f(pyr, x0_base))
        comp = time.perf_counter() - t0
    except Exception as e:
        print(f"{label:26s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n):
        float(f(pyr, x0_base))
    dt = (time.perf_counter() - t0) / n / iters
    print(f"{label:26s}: {dt*1e3:7.3f} ms/iter  [compile {comp:.0f}s]",
          flush=True)


# correctness vs banded first
ref = np.asarray(banded(pyr, x0_base))
for name, fn in [("banded_pre", banded_pre), ("banded_bf16", banded_bf16),
                 ("gather", gather), ("pallas", pallas_fused),
                 ("pallas_v2", pallas_v2)]:
    try:
        got = np.asarray(fn(pyr, x0_base))
        err = np.abs(ref - got.astype(np.float32)).max()
        print(f"{name:26s} max|err| = {err:.5f}", flush=True)
    except Exception as e:
        print(f"{name:26s} check FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)

for name, fn in [("banded (current)", banded), ("banded_pre", banded_pre),
                 ("banded_bf16", banded_bf16), ("gather", gather),
                 ("pallas", pallas_fused), ("pallas_v2", pallas_v2)]:
    timeit(name, fn)
