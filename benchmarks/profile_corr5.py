"""Discriminate gather-bound vs materialization-bound + bf16 pairs."""
import math, time
import numpy as np
import jax
import jax.numpy as jnp
from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.ops.geometry import relative_projection, apply_projection

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
f_pairs = corr_ops._make_corner_pairs(f_src)

offsets_all = (jnp.arange(64) - 32).astype(jnp.float32) * incre
offsets = offsets_all.reshape(4, 16)

def coords_of(offs):
    disps = origin[:, :, None, :, :] + offs[None, None, :, None, None]
    return apply_projection(Pij, disps)

# 1) gather only: sum of gathered rows (no einsum, no weights)
def gather_only(fp):
    def one(offs):
        coords = coords_of(offs)
        x, y = coords[..., 0], coords[..., 1]
        ix = jnp.floor(x).astype(jnp.int32)
        iy = jnp.floor(y).astype(jnp.int32)
        B, V, K = x.shape[:3]
        xp = jnp.clip(ix + 1, 0, w)
        idx = jnp.clip(iy, 0, h - 1) * (w + 2) + xp
        g = jnp.take_along_axis(fp, idx.reshape(B, V, K * h * w)[..., None], axis=2)
        return g.sum()
    return jax.lax.map(one, offsets).sum()

t = timeit_scalar(jax.jit(gather_only), f_pairs)
print(f"gather-only (2 of 4 corners): {t*1e3:7.1f} ms")

# 2) full pairs fp32 (reference point)
fB = jax.jit(lambda fr, fs, o: corr_ops.build_corr_volume_from(
    fr, fs, Pij, o, n_hyp, incre, 16).sum())
t = timeit_scalar(fB, f_ref, f_src, origin)
print(f"pairs full fp32:              {t*1e3:7.1f} ms")

# 3) pairs with bf16 gather source, fp32 dot
def pairs_bf16(f_ref, f_src, origin):
    fp16 = corr_ops._make_corner_pairs(f_src.astype(jnp.bfloat16))
    B, V = f_ref.shape[:2]
    def one(offs):
        coords = coords_of(offs)
        coords = jax.lax.stop_gradient(coords)
        return corr_ops._gather_corr_chunk(f_ref, fp16, coords, h, w)
    out = jax.lax.map(one, offsets)
    return out.sum()

t = timeit_scalar(jax.jit(pairs_bf16), f_ref, f_src, origin)
print(f"pairs bf16 gather:            {t*1e3:7.1f} ms")

# 4) dispatch-overhead floor: trivial scalar jit
fz = jax.jit(lambda x: x.sum())
t = timeit_scalar(fz, f_ref)
print(f"dispatch floor:               {t*1e3:7.1f} ms")
