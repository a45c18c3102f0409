"""hyp_chunk sweep for the bf16 mean-volume construction at full scale."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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

h, w, C, N = 288, 400, 64, 11
V = N - 1
rng = np.random.RandomState(0)
fmaps = jnp.asarray(rng.rand(1, N, h, w, C).astype(np.float32))
K = np.array([[2892.0 * w / 1600, 0, w / 2], [0, 2892.0 * w / 1600, h / 2],
              [0, 0, 1]], np.float32)
intr = jnp.asarray(np.tile(K, (1, N, 1, 1)))
poses = np.tile(np.eye(4, dtype=np.float32), (1, N, 1, 1))
for i in range(1, N):
    poses[0, i, :3, 3] = rng.randn(3) * 20
poses = jnp.asarray(poses)
ii = jnp.zeros(V, jnp.int32)
jj = jnp.arange(1, N, dtype=jnp.int32)
origin = jnp.full((1, 1, h, w), 32 * 0.0025 / 64, jnp.float32)

for chunk in [8, 16, 32, 64]:
    f = jax.jit(lambda fm, o, _c=chunk: corr_ops.build_corr_volume(
        fm, poses, intr, ii, jj, o, 64, 0.0025 / 64, _c, True,
        jnp.bfloat16).sum())
    t = timeit_scalar(f, fmaps, origin)
    print(f"bf16 mean-volume D=64 chunk={chunk:2d}: {t*1e3:7.1f} ms")
