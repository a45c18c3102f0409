"""Break down TPU time: encoders vs cost-volume construction vs lookups/GRU.

Informs the Pallas kernel priority (SURVEY.md section 7 'hard parts').
Run on the real chip: python profile_corr.py [--scale1]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cermvs_tpu.models.extractor import BasicEncoder
from cermvs_tpu.ops import corr as corr_ops


def timeit(fn, *args, iters=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    full = "--scale1" in sys.argv
    H, W = (1152, 1600) if full else (512, 640)
    N = 11 if full else 5
    V = N - 1
    C = 64
    h, w = H // 4, W // 4
    rng = np.random.RandomState(0)

    # encoder timing
    enc = BasicEncoder(output_dim=C, norm_fn="instance", type="HR")
    img = jnp.asarray(rng.rand(N, H, W, 3).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), img[:1])
    enc_fn = jax.jit(lambda p, x: enc.apply(p, x))
    t_enc = timeit(enc_fn, params, img)
    print(f"fnet({N} frames {H}x{W}): {t_enc*1e3:.1f} ms")

    # cost volume timing
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

    for n_hyp, tag in [(64, "stage0 D=64"), (44, "stage1 D=44")]:
        for chunk in [8, 16]:
            f = jax.jit(lambda fm, o: corr_ops.build_corr_volume(
                fm, poses, intr, ii, jj, o, n_hyp, 0.0025 / 64, chunk))
            t = timeit(f, fmaps, origin)
            gb = V * n_hyp * h * w * 4 * C * 4 / 1e9
            print(f"corr volume {tag} chunk={chunk}: {t*1e3:.1f} ms "
                  f"({gb:.1f} GB naive gather traffic -> {gb/t:.0f} GB/s)")

    # lookup timing
    vol = jnp.asarray(rng.rand(1, V, h, w, 64).astype(np.float32))
    pyr = corr_ops.CorrPyramid(
        levels=corr_ops.build_pyramid(vol, 3), origin=origin,
        incre=0.0025 / 64, n_hyp=64)
    zinv = jnp.broadcast_to(origin[:, 0][:, None], (1, V, h, w))
    lk = jax.jit(lambda z: corr_ops.lookup(pyr, z, 5))
    t = timeit(lk, zinv)
    print(f"lookup (33 taps, {V} views): {t*1e3:.1f} ms x16 iters = "
          f"{16*t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
