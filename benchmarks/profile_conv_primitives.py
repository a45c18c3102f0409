"""What conv efficiency is actually achievable on this chip?

The update block's XLA convs run ~17% MFU (profile_update_variants.py:
3.45 ms/iter vs a 0.58 ms FLOP floor).  This probe measures, at the same
(288x400) spatial shape:

  1. pure matmul peak at the GRU's (M, K, N) sizes — the MXU ceiling;
  2. lax.conv at the real channel widths vs channel-padded variants;
  3. a prototype Pallas conv3x3 (row-strip grid, 9 accumulated matmuls
     in VMEM) — is a custom kernel actually faster than XLA's conv?

Run: python benchmarks/profile_conv_primitives.py
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)

H, W = 288, 400
DT = jnp.bfloat16
rng = np.random.RandomState(0)
PEAK = 197e12


def mk(*shape):
    return jnp.asarray((rng.randn(*shape) * 0.05).astype(np.float32)).astype(DT)


def timeit(label, fn, *args, gflop=None, n=6, iters=32):
    """fn(carry_scalar, *args) -> new value; scanned `iters` times with a
    carry-dependent input scale so CSE can't collapse the loop."""

    def scanned(*a):
        def body(c, _):
            out = fn(c, *a)
            return out.astype(jnp.float32).mean(), ()

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    f = jax.jit(scanned)
    t0 = time.perf_counter()
    float(f(*args))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        float(f(*args))
    dt = (time.perf_counter() - t0) / n / iters
    mfu = f" {gflop*1e9/dt/PEAK*100:5.1f}% MFU" if gflop else ""
    print(f"{label:44s}: {dt*1e3:7.3f} ms{mfu}  [compile {comp:.0f}s]",
          flush=True)


# ---- 1. matmul peaks ------------------------------------------------------
M = H * W
for K, N in [(192, 128), (192, 192), (512, 512), (1024, 1024)]:
    A = mk(M, K)
    Bm = mk(K, N)
    gf = 2 * M * K * N / 1e9
    timeit(f"matmul ({M},{K})@({K},{N})",
           lambda c, A, Bm: jax.lax.dot_general(
               A * c.astype(DT), Bm, (((1,), (0,)), ((), ())),
               preferred_element_type=jnp.float32),
           A, Bm, gflop=gf)


# ---- 2. conv variants ------------------------------------------------------
def conv(x, w):
    p = (w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), p, dimension_numbers=("NHWC", "HWIO", "NHWC"))


for Cin, Cout, note in [(177, 128, "zr real"), (192, 128, "zr pad192"),
                        (256, 128, "zr pad256"), (177, 64, "q real"),
                        (64, 256, "delta1"), (64, 64, "corr2"),
                        (128, 128, "aligned128"), (256, 256, "aligned256")]:
    x = mk(1, H, W, Cin)
    w = mk(3, 3, Cin, Cout)
    gf = 2 * 9 * M * Cin * Cout / 1e9
    timeit(f"conv3x3 {Cin}->{Cout} ({note})",
           lambda c, x, w: conv(x * c.astype(DT), w), x, w, gflop=gf)


# ---- 3. pallas conv3x3 prototype -------------------------------------------
# overlapping input blocks are not expressible with plain BlockSpec index
# maps (block i must read rows [i*Tr, i*Tr+Tr+2)) — use an element-indexed
# variant: keep x in ANY/HBM and DMA strips manually.
def pallas_conv3_dma(x, w, Tr=16):
    Hx, Wx, C = x.shape
    N = w.shape[-1]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))   # (Hx+2, Wx+2, C)

    def kernel(x_hbm, w_ref, o_ref):
        i = pl.program_id(0)

        def body(xs, sem):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * Tr, Tr + 2)], xs, sem)
            cp.start()
            cp.wait()
            acc = None
            for dy in range(3):
                for dx in range(3):
                    sl = xs[dy:dy + Tr, dx:dx + Wx, :].reshape(Tr * Wx, C)
                    t = jax.lax.dot_general(
                        sl, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = t if acc is None else acc + t
            o_ref[:] = acc.reshape(Tr, Wx, N).astype(DT)

        pl.run_scoped(
            body,
            pltpu.VMEM((Tr + 2, Wx + 2, C), DT),
            pltpu.SemaphoreType.DMA(()),
        )

    return pl.pallas_call(
        kernel,
        grid=(Hx // Tr,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3, C, N), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Tr, Wx, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hx, Wx, N), DT),
    )(xp, w)


for Cin, Cout, note in [(177, 128, "zr real"), (192, 128, "zr pad"),
                        (64, 256, "delta1"), (64, 64, "corr2")]:
    x3 = mk(H, W, Cin)
    w3 = mk(3, 3, Cin, Cout)
    gf = 2 * 9 * M * Cin * Cout / 1e9
    # correctness vs XLA conv first
    ref = conv(x3[None], w3)[0]
    try:
        got = pallas_conv3_dma(x3, w3)
        err = float(jnp.abs(ref.astype(jnp.float32)
                            - got.astype(jnp.float32)).max())
        print(f"pallas_dma {Cin}->{Cout} max|err| = {err:.4f}", flush=True)
        timeit(f"pallas_dma conv3x3 {Cin}->{Cout} ({note})",
               lambda c, x3, w3: pallas_conv3_dma(x3 * c.astype(DT), w3),
               x3, w3, gflop=gf)
    except Exception as e:
        print(f"pallas_dma {Cin}->{Cout} FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
