"""Does a flat jnp.take beat batched take_along_axis for the corner gather?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

def timeit_scalar(fn, *args, iters=3):
    v = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    return (time.perf_counter() - t0) / iters

h, w, C = 288, 400, 64
HW = (h + 2) * (w + 2)
M = 8 * h * w  # one hypothesis chunk of samples
rng = np.random.RandomState(0)
src = jnp.asarray(rng.rand(HW, 4 * C).astype(np.float32)).astype(jnp.bfloat16)
idx = jnp.asarray(rng.randint(0, HW, (M,)).astype(np.int32))
f1 = jnp.asarray(rng.rand(M, C).astype(np.float32)).astype(jnp.bfloat16)

def v_tala(src, idx, f1):
    g = jnp.take_along_axis(src[None, None], idx.reshape(1, 1, M, 1),
                            axis=2, mode="clip")[0, 0]
    return sum(jnp.einsum("mc,mc->m", g[:, q*C:(q+1)*C], f1,
                          preferred_element_type=jnp.float32).sum()
               for q in range(4))

def v_take(src, idx, f1):
    g = jnp.take(src, idx, axis=0, mode="clip")
    return sum(jnp.einsum("mc,mc->m", g[:, q*C:(q+1)*C], f1,
                          preferred_element_type=jnp.float32).sum()
               for q in range(4))

def v_gather_slice(src, idx, f1):
    # lax.gather with explicit 1-row slices
    out = jax.lax.gather(
        src, idx[:, None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,)),
        slice_sizes=(1, 4 * C), mode=jax.lax.GatherScatterMode.CLIP)
    return sum(jnp.einsum("mc,mc->m", out[:, q*C:(q+1)*C], f1,
                          preferred_element_type=jnp.float32).sum()
               for q in range(4))

for name, fn in [("take_along_axis", v_tala), ("take", v_take),
                 ("lax.gather", v_gather_slice)]:
    t = timeit_scalar(jax.jit(fn), src, idx, f1)
    print(f"{name:16s}: {t*1e3:7.1f} ms  ({M*512/t/1e9:6.1f} GB/s)")
