"""Compiled-mode check + timing: Pallas fused lookup vs XLA banded, on chip.
Volumes passed as jit arguments (closures would be serialized into the
remote-compile request)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from cermvs_tpu.ops import corr as corr_ops

def timeit_scalar(fn, *args, iters=3):
    v = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    return (time.perf_counter() - t0) / iters

B, V, h, w, D = 1, 9, 288, 400, 64
rng = np.random.RandomState(0)
vol = jnp.asarray(rng.rand(B, V, h, w, D).astype(np.float32))
origin = jnp.full((B, 1, h, w), 32 * 0.0025 / 64, jnp.float32)
incre = 0.0025 / 64
zinv0 = jnp.broadcast_to(origin[:, 0][:, None], (B, V, h, w)) + 0.0005

def banded_once(vol, origin, z):
    pyr = corr_ops.CorrPyramid(corr_ops.build_pyramid(vol, 3), origin, incre, D, 3)
    return corr_ops.lookup(pyr, z, 5, impl="banded")

def pallas_once(vol, origin, z):
    pyr = corr_ops.CorrPyramid([vol], origin, incre, D, 3)
    return corr_ops.lookup(pyr, z, 5, impl="pallas")

a = np.asarray(jax.jit(banded_once)(vol, origin, zinv0))
b = np.asarray(jax.jit(pallas_once)(vol, origin, zinv0))
print(f"compiled banded-vs-pallas max|err| = {np.abs(a - b).max():.7f}")

def scan16(once):
    def fn(vol, origin, z):
        def body(zc, _):
            out = once(vol, origin, zc)
            zc = zc + 1e-6 * out[..., 0]
            return zc, out.sum()
        _, sums = jax.lax.scan(body, z, None, length=16)
        return sums.sum()
    return jax.jit(fn)

# NOTE: banded builds the pyramid once per scan here (inside jit, hoisted by
# XLA loop-invariant code motion? it's outside the scan body) — fair.
def banded_fn(vol, origin, z):
    pyr = corr_ops.CorrPyramid(corr_ops.build_pyramid(vol, 3), origin, incre, D, 3)
    def body(zc, _):
        out = corr_ops.lookup(pyr, zc, 5, impl="banded")
        return zc + 1e-6 * out[..., 0], out.sum()
    _, sums = jax.lax.scan(body, z, None, length=16)
    return sums.sum()

def pallas_fn(vol, origin, z):
    pyr = corr_ops.CorrPyramid([vol], origin, incre, D, 3)
    def body(zc, _):
        out = corr_ops.lookup(pyr, zc, 5, impl="pallas")
        return zc + 1e-6 * out[..., 0], out.sum()
    _, sums = jax.lax.scan(body, z, None, length=16)
    return sums.sum()

t = timeit_scalar(jax.jit(banded_fn), vol, origin, zinv0)
print(f"banded x16 (incl pyramid build): {t*1e3:7.1f} ms ({t/16*1e3:.2f} ms/iter)")
t = timeit_scalar(jax.jit(pallas_fn), vol, origin, zinv0)
print(f"pallas x16 (no pyramid):         {t*1e3:7.1f} ms ({t/16*1e3:.2f} ms/iter)")
