"""Lane-gather throughput with idx lane-width == src lane-width."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64
REPS = 16

def make(L):
    def kern(src_ref, idx_ref, out_ref):
        acc = jnp.zeros((C, L), jnp.float32)
        s = src_ref[:]
        for r in range(REPS):
            idx = idx_ref[:] + r
            idx = jnp.where(idx >= L, idx - L, idx)
            acc = acc + jnp.take_along_axis(s, idx, axis=1)
        out_ref[:] = acc

    @jax.jit
    def run(src, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
    return run

rng = np.random.RandomState(0)
for L in [128, 512, 2048, 8192, 16384]:
    src = jnp.asarray(rng.rand(C, L).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, L, (C, L)).astype(np.int32))
    try:
        fn = make(L)
        _ = np.asarray(fn(src, idx))
        t0 = time.perf_counter(); n = 30
        for _ in range(n):
            out = fn(src, idx)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / n
        elems = C * L * REPS
        print(f"L={L:6d}: {dt*1e6:9.1f} us/call  {elems/dt/1e9:7.2f} Gelem/s")
    except Exception as e:
        print(f"L={L:6d}: FAIL {type(e).__name__}: {str(e)[:100]}")
