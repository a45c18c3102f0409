"""Probe which gather forms Mosaic/Pallas supports on this TPU.

Determines the viable design for the fused epipolar-correlation kernel:
  (a) sublane gather: jnp.take(rows) from a VMEM-resident (R, 128) buffer
  (b) lane gather: take_along_axis along the last (lane) axis
  (c) dynamic_slice with a traced scalar start (known-good baseline)
"""

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(tag, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        out.block_until_ready()
        print(f"{tag}: OK {np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{tag}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    R, C = 256, 128
    src = jnp.asarray(np.random.RandomState(0).rand(R, C).astype(np.float32))
    idx_rows = jnp.asarray((np.arange(64) * 3 % R).astype(np.int32))
    idx_lane = jnp.asarray(
        (np.random.RandomState(1).randint(0, C, (64, C))).astype(np.int32))

    # (a) sublane row gather
    def kern_a(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(src_ref[:], idx_ref[:], axis=0)

    run("a_row_gather", lambda s, i: pl.pallas_call(
        kern_a,
        out_shape=jax.ShapeDtypeStruct((64, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, i), src, idx_rows)

    # (a2) take_along_axis on sublanes
    def kern_a2(src_ref, idx_ref, out_ref):
        idx = idx_ref[:].reshape(64, 1)
        out_ref[:] = jnp.take_along_axis(
            src_ref[:], jnp.broadcast_to(idx, (64, C)), axis=0)

    run("a2_sublane_tala", lambda s, i: pl.pallas_call(
        kern_a2,
        out_shape=jax.ShapeDtypeStruct((64, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, i), src, idx_rows)

    # (b) lane gather
    def kern_b(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:64], idx_ref[:], axis=1)

    run("b_lane_tala", lambda s, i: pl.pallas_call(
        kern_b,
        out_shape=jax.ShapeDtypeStruct((64, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, i), src, idx_lane)

    # (c) dynamic slice, traced scalar start via fori_loop
    def kern_c(src_ref, idx_ref, out_ref):
        def body(i, _):
            start = idx_ref[i]
            out_ref[i, :] = src_ref[pl.ds(start, 1), :][0]
            return 0
        jax.lax.fori_loop(0, 64, body, 0)

    run("c_scalar_dynslice", lambda s, i: pl.pallas_call(
        kern_c,
        out_shape=jax.ShapeDtypeStruct((64, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, i), src, idx_rows)


if __name__ == "__main__":
    main()
