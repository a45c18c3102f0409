"""Compiled timing: banded XLA vs pallas v1 vs pallas v2 prefix-sum lookup."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.ops.pallas.lookup import lookup_fused
from cermvs_tpu.ops.pallas.lookup_v2 import lookup_fused_v2

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

def x0_of(o, z):
    return jnp.maximum((z - o) / incre + D // 2, 0.0)

# correctness compiled
a = np.asarray(jax.jit(lambda v, o, z: corr_ops._lookup_banded(
    corr_ops.build_pyramid(v, 3), x0_of(o, z), 5))(vol, origin, zinv0))
b = np.asarray(jax.jit(lambda v, o, z: lookup_fused_v2(
    v, x0_of(o, z), 5, 3))(vol, origin, zinv0))
print(f"banded-vs-v2 max|err| = {np.abs(a - b).max():.6f}")

def scan16(once):
    def fn(v, o, z):
        def body(zc, _):
            out = once(v, o, zc)
            return zc + 1e-6 * out[..., 0], out.sum()
        _, s = jax.lax.scan(body, z, None, length=16)
        return s.sum()
    return jax.jit(fn)

t = timeit_scalar(scan16(lambda v, o, z: corr_ops._lookup_banded(
    corr_ops.build_pyramid(v, 3), x0_of(o, z), 5)), vol, origin, zinv0)
print(f"banded  x16: {t*1e3:7.1f} ms ({t/16*1e3:.2f} ms/iter)")
t = timeit_scalar(scan16(lambda v, o, z: lookup_fused(
    v, x0_of(o, z), 5, 3)), vol, origin, zinv0)
print(f"pallas1 x16: {t*1e3:7.1f} ms ({t/16*1e3:.2f} ms/iter)")
t = timeit_scalar(scan16(lambda v, o, z: lookup_fused_v2(
    v, x0_of(o, z), 5, 3)), vol, origin, zinv0)
print(f"pallas2 x16: {t*1e3:7.1f} ms ({t/16*1e3:.2f} ms/iter)")
