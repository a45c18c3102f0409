"""Measure Pallas lane-gather throughput vs source extent.

The fused epipolar-correlation kernel wants to gather pixels from a VMEM-
resident source band laid out channels-on-sublanes / space-on-lanes.  Mosaic
supports take_along_axis on the lane axis (probe_pallas.py); the open question
is how it scales with the lane extent L — native 128-lane shuffles vs looped
selects.  Times gathers from (64, L) for several L at fixed output size.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64
OUT = 2048  # gathered elements per row per call
REPS = 32   # gathers per kernel invocation (amortize call overhead)


def make_gather(L):
    def kern(src_ref, idx_ref, out_ref):
        acc = jnp.zeros((C, OUT), jnp.float32)
        for r in range(REPS):
            idx = (idx_ref[:] + r) % L
            acc = acc + jnp.take_along_axis(src_ref[:], idx, axis=1)[:, :OUT]
        out_ref[:] = acc

    @jax.jit
    def run(src, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, OUT), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)

    return run


def main():
    rng = np.random.RandomState(0)
    for L in [128, 512, 2048, 8192, 16384]:
        src = jnp.asarray(rng.rand(C, L).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, L, (C, max(OUT, L))).astype(np.int32))
        idx = idx[:, :max(OUT, 128)]
        # idx must be at least OUT wide
        idx = jnp.asarray(rng.randint(0, L, (C, OUT)).astype(np.int32))
        try:
            fn = make_gather(L)
            out = fn(src, idx)
            _ = np.asarray(out)
            t0 = time.perf_counter()
            n = 20
            for _ in range(n):
                out = fn(src, idx)
            _ = np.asarray(out)
            dt = (time.perf_counter() - t0) / n
            elems = C * OUT * REPS
            print(f"L={L:6d}: {dt*1e6:9.1f} us/call  "
                  f"{elems/dt/1e9:7.2f} Gelem/s")
        except Exception as e:
            print(f"L={L:6d}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
