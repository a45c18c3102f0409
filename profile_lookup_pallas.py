"""Compiled-mode check + timing: Pallas fused lookup vs XLA banded, on chip.

Also times a 16-iteration scan of each (the in-model shape of the work) to
amortize dispatch overhead.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.ops.pallas.lookup import lookup_fused


def timeit_scalar(fn, *args, iters=5):
    v = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    B, V, h, w, D = 1, 9, 288, 400, 64  # full DTU scale-1 shape
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(B, V, h, w, D).astype(np.float32))
    origin = jnp.full((B, 1, h, w), 32 * 0.0025 / 64, jnp.float32)
    incre = 0.0025 / 64
    pyr_full = corr_ops.CorrPyramid(
        levels=corr_ops.build_pyramid(vol, 3), origin=origin, incre=incre,
        n_hyp=D, num_levels=3)
    pyr_l0 = corr_ops.CorrPyramid(
        levels=[vol], origin=origin, incre=incre, n_hyp=D, num_levels=3)
    zinv0 = jnp.broadcast_to(origin[:, 0][:, None], (B, V, h, w)) + 0.0005

    # correctness, compiled
    a = np.asarray(jax.jit(
        lambda z: corr_ops.lookup(pyr_full, z, 5, impl="banded"))(zinv0))
    b = np.asarray(jax.jit(
        lambda z: corr_ops.lookup(pyr_l0, z, 5, impl="pallas"))(zinv0))
    print(f"compiled banded-vs-pallas max|err| = {np.abs(a - b).max():.7f}")

    def scan16(impl, pyr):
        def fn(z):
            def body(zc, _):
                out = corr_ops.lookup(pyr, zc, 5, impl=impl)
                # cheap data dependence to serialize iterations
                zc = zc + 1e-6 * out[..., 0]
                return zc, out.sum()
            _, sums = jax.lax.scan(body, z, None, length=16)
            return sums.sum()
        return jax.jit(fn)

    t = timeit_scalar(scan16("banded", pyr_full), zinv0, iters=3)
    print(f"banded x16: {t*1e3:7.1f} ms  ({t/16*1e3:.2f} ms/iter)")
    t = timeit_scalar(scan16("pallas", pyr_l0), zinv0, iters=3)
    print(f"pallas x16: {t*1e3:7.1f} ms  ({t/16*1e3:.2f} ms/iter)")


if __name__ == "__main__":
    main()
