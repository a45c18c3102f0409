"""einsum vs explicit mul+sum for the corner dot: does XLA avoid
materializing the gathered buffer when the consumer is elementwise+reduce?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.ops.geometry import relative_projection

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
Km = np.array([[2892.0 * w / 1600, 0, w / 2], [0, 2892.0 * w / 1600, h / 2],
               [0, 0, 1]], np.float32)
intr = jnp.asarray(np.tile(Km, (1, N, 1, 1)))
poses = np.tile(np.eye(4, dtype=np.float32), (1, N, 1, 1))
for i in range(1, N):
    poses[0, i, :3, 3] = rng.randn(3) * 20
poses = jnp.asarray(poses)
ii = jnp.zeros(V, jnp.int32)
jj = jnp.arange(1, N, dtype=jnp.int32)
origin = jnp.full((1, 1, h, w), 32 * 0.0025 / 64, jnp.float32)

# baseline (einsum corner dots)
f0 = jax.jit(lambda fm, o: corr_ops.build_corr_volume(
    fm, poses, intr, ii, jj, o, 64, 0.0025 / 64, 8, True, jnp.bfloat16).sum())
t = timeit_scalar(f0, fmaps, origin)
print(f"einsum corner dots:   {t*1e3:7.1f} ms")

# patched: explicit mul+sum
orig = corr_ops._gather_corr_chunk
def patched(f_ref, f_quads, coords, H, W):
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    fx = x - x0; fy = y - y0
    ix = x0.astype(jnp.int32); iy = y0.astype(jnp.int32)
    B, V, K = x.shape[:3]
    C = f_ref.shape[-1]
    Wp = W + 2
    xp = jnp.clip(ix + 1, 0, W); yp = jnp.clip(iy + 1, 0, H)
    idx = yp * Wp + xp
    in_x0 = ((ix >= 0) & (ix <= W - 1)).astype(jnp.float32)
    in_x1 = ((ix + 1 >= 0) & (ix + 1 <= W - 1)).astype(jnp.float32)
    in_y0 = ((iy >= 0) & (iy <= H - 1)).astype(jnp.float32)
    in_y1 = ((iy + 1 >= 0) & (iy + 1 <= H - 1)).astype(jnp.float32)
    g = jnp.take_along_axis(
        f_quads, idx.reshape(B, V, K * H * W)[..., None], axis=2, mode="clip")
    g = g.reshape(B, V, K, H, W, 4 * C).astype(jnp.float32)
    fr = f_ref[:, :, None].astype(jnp.float32)
    dot = lambda q: jnp.sum(g[..., q*C:(q+1)*C] * fr, axis=-1)
    return (dot(0) * ((1-fx)*(1-fy)*in_x0*in_y0)
            + dot(1) * (fx*(1-fy)*in_x1*in_y0)
            + dot(2) * ((1-fx)*fy*in_x0*in_y1)
            + dot(3) * (fx*fy*in_x1*in_y1))

corr_ops._gather_corr_chunk = patched
f1 = jax.jit(lambda fm, o: corr_ops.build_corr_volume(
    fm, poses, intr, ii, jj, o, 64, 0.0025 / 64, 8, True, jnp.bfloat16).sum())
t = timeit_scalar(f1, fmaps, origin)
print(f"mul+sum corner dots:  {t*1e3:7.1f} ms")
err = abs(float(f0.__wrapped__(fmaps, origin)) - float(f1(fmaps, origin))) if False else 0
v0 = float(jax.jit(lambda fm,o: corr_ops.build_corr_volume(fm, poses, intr, ii, jj, o, 64, 0.0025/64, 8, True, jnp.bfloat16).sum())(fmaps, origin))
corr_ops._gather_corr_chunk = orig
v1 = float(jax.jit(lambda fm,o: corr_ops.build_corr_volume(fm, poses, intr, ii, jj, o, 64, 0.0025/64, 8, True, jnp.bfloat16).sum())(fmaps, origin))
print(f"checksum diff: {abs(v0-v1):.6f} (of {abs(v1):.1f})")
