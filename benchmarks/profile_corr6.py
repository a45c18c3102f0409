"""Time the quads-v2 default construction (descriptor-minimal) fairly."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.ops.geometry import relative_projection

def timeit_scalar(fn, *args, iters=5):
    v = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    return (time.perf_counter() - t0) / iters

H, W = 512, 640
N, C = 5, 64
h, w = H // 4, W // 4
V = N - 1
rng = np.random.RandomState(0)
fmaps = jnp.asarray(rng.rand(1, N, h, w, C).astype(np.float32))
Km = np.array([[900.0, 0, w / 2], [0, 900.0, h / 2], [0, 0, 1]], np.float32)
intr = jnp.asarray(np.tile(Km, (1, N, 1, 1)))
poses = np.tile(np.eye(4, dtype=np.float32), (1, N, 1, 1))
for i in range(1, N):
    poses[0, i, :3, 3] = rng.randn(3) * 20
poses = jnp.asarray(poses)
ii = jnp.zeros(V, jnp.int32)
jj = jnp.arange(1, N, dtype=jnp.int32)
origin = jnp.full((1, 1, h, w), 32 * 0.0025 / 64, jnp.float32)
n_hyp, incre = 64, 0.0025 / 64

f = fmaps / 8.0
f_ref = jnp.take(f, ii, axis=1)
f_src = jnp.take(f, jj, axis=1)
Pij = relative_projection(poses, intr, ii, jj)

for chunk in [8, 16, 32]:
    fQ = jax.jit(lambda fr, fs, o, _c=chunk: corr_ops.build_corr_volume_from(
        fr, fs, Pij, o, n_hyp, incre, _c).sum())
    t = timeit_scalar(fQ, f_ref, f_src, origin)
    print(f"quads-v2 chunk={chunk:2d}:  {t*1e3:7.1f} ms (incl ~29ms dispatch)")
