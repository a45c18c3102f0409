"""Does batching reference views through one forward help? B=1 vs B=2."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from cermvs_tpu.models.raft import RAFT

def timeit_scalar(fn, *args, iters=3):
    v = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    return (time.perf_counter() - t0) / iters

H, W, N = 1152, 1600, 11
rng = np.random.RandomState(0)
K = np.array([[2892.0 * W / 1600, 0, W / 2], [0, 2892.0 * W / 1600, H / 2],
              [0, 0, 1]], np.float32)
model = RAFT(test_mode=True, hyp_chunk=8)

for B in (1, 2):
    images = jnp.asarray((rng.rand(B, N, H, W, 3) * 255).astype(np.float32))
    intr = jnp.asarray(np.tile(K, (B, N, 1, 1)))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for i in range(1, N):
        poses[:, i, :3, 3] = rng.randn(3) * 20
    poses = jnp.asarray(poses)
    scale = jnp.ones((B,), jnp.float32)
    if B == 1:
        params = model.init(jax.random.PRNGKey(0), images, poses, intr, scale)
    fwd = jax.jit(lambda p, im, po, k, s: model.apply(p, im, po, k, s).sum())
    t = timeit_scalar(fwd, params, images, poses, intr, scale)
    print(f"B={B}: {t*1e3:7.1f} ms total -> {t/B*1e3:7.1f} ms/view")
