"""Feasibility probes for a fused Pallas update-iteration kernel.

profile_conv_primitives.py showed HBM-streamed small-N matmuls run at
single-digit MFU and XLA's convs at ~17%; a fused kernel only wins if the
MXU sustains a decent rate on VMEM-RESIDENT (M_tile, K)@(K, N) matmuls at
the GRU's K/N sizes, with plain BlockSpecs (manual ANY-space DMA 500s on
the remote compile helper).

Probes:
  1. in-VMEM matmul rate: grid over M tiles, weights resident, one dot per
     step at (K, N) in {(177,192), (576,128), (1017,192), (576,256)}.
  2. chained in-VMEM ops: dot -> sigmoid -> dot (GRU-like) per tile.
  3. the two-tile halo trick: in_specs mapping block i AND min(i+1, n-1)
     of the same array, concatenated in-kernel -> shifted-row conv taps.

Run: python benchmarks/probe_pallas_gru.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)

DT = jnp.bfloat16
PEAK = 197e12
rng = np.random.RandomState(0)


def mk(*shape):
    return jnp.asarray((rng.randn(*shape) * 0.05).astype(np.float32)).astype(DT)


def timeit(label, fn, *args, gflop=None, n=6, iters=16):
    def scanned(*a):
        def body(c, _):
            out = fn(c.astype(DT) * a[0], *a[1:])
            return out.astype(jnp.float32).mean(), ()

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    f = jax.jit(scanned)
    try:
        t0 = time.perf_counter()
        float(f(*args))
        comp = time.perf_counter() - t0
    except Exception as e:
        print(f"{label:46s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n):
        float(f(*args))
    dt = (time.perf_counter() - t0) / n / iters
    mfu = f" {gflop*1e9/dt/PEAK*100:5.1f}% MFU" if gflop else ""
    print(f"{label:46s}: {dt*1e3:7.3f} ms{mfu}  [compile {comp:.0f}s]",
          flush=True)


M = 288 * 400           # one iteration's pixels
TM = 1600               # M tile (72 grid steps)


# ---- 1. in-VMEM matmul rate -------------------------------------------------
def vmem_matmul(x, w):
    Mx, K = x.shape
    N = w.shape[-1]

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(DT)

    return pl.pallas_call(
        kernel,
        grid=(Mx // TM,),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mx, N), DT),
    )(x, w)


for K, N in [(177, 192), (576, 128), (1017, 192), (576, 256), (128, 128)]:
    x = mk(M, K)
    w = mk(K, N)
    gf = 2 * M * K * N / 1e9
    timeit(f"pallas vmem matmul K={K} N={N}",
           lambda x, w: vmem_matmul(x, w), x, w, gflop=gf)


# ---- 2. chained ops per tile (GRU-like) ------------------------------------
def vmem_chain(x, w1, w2, w3):
    """x (M, 177): zr = sigmoid(x@w1[177->128]); q = tanh(x@w2[177->64]);
    y = relu(net'@w3[64->256]) — all intermediates in VMEM."""
    Mx = x.shape[0]

    def kernel(x_ref, w1_ref, w2_ref, w3_ref, o_ref):
        xs = x_ref[:]
        zr = jax.nn.sigmoid(jax.lax.dot_general(
            xs, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        z, r = zr[..., :64], zr[..., 64:]
        q = jnp.tanh(jax.lax.dot_general(
            xs, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        net = ((1 - z) * xs[:, :64].astype(jnp.float32) + z * q).astype(DT)
        y = jax.nn.relu(jax.lax.dot_general(
            net, w3_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        o_ref[:] = y.astype(DT)

    return pl.pallas_call(
        kernel,
        grid=(Mx // TM,),
        in_specs=[
            pl.BlockSpec((TM, 177), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((177, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((177, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mx, 256), DT),
    )(x, w1, w2, w3)


xc = mk(M, 177)
gf_chain = 2 * M * (177 * 128 + 177 * 64 + 64 * 256) / 1e9
timeit("pallas vmem chain (3 dots + gates)",
       lambda x, a, b, c: vmem_chain(x, a, b, c),
       xc, mk(177, 128), mk(177, 64), mk(64, 256), gflop=gf_chain)


# ---- 3. two-tile halo conv3x3 ----------------------------------------------
def pallas_conv3_halo(x, w, Tr=16):
    """x (H, W, C) -> conv3x3 via two-tile halo loads + 9 in-VMEM matmuls.
    Block i reads row-tiles i and min(i+1, n-1); rows are pre-shifted by
    the 1-row top pad so tile i starts at image row i*Tr-1."""
    Hx, Wx, C = x.shape
    N = w.shape[-1]
    xp = jnp.pad(x, ((1, 1 + Tr), (1, 1), (0, 0)))  # top 1, bottom 1+Tr
    nt = Hx // Tr

    def kernel(a_ref, b_ref, w_ref, o_ref):
        xs = jnp.concatenate([a_ref[:], b_ref[:2]], axis=0)  # (Tr+2, W+2, C)
        acc = None
        for dy in range(3):
            for dx in range(3):
                sl = xs[dy:dy + Tr, dx:dx + Wx, :].reshape(Tr * Wx, C)
                t = jax.lax.dot_general(
                    sl, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        o_ref[:] = acc.reshape(Tr, Wx, N).astype(DT)

    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((Tr, Wx + 2, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tr, Wx + 2, C), lambda i: (i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, N), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Tr, Wx, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hx, Wx, N), DT),
    )(xp, xp, w)


def conv_ref(x, w):
    p = (1, 1), (1, 1)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), p, dimension_numbers=("NHWC", "HWIO", "NHWC"))


H, W = 288, 400
for Cin, Cout in [(177, 128), (64, 256)]:
    x3 = mk(H, W, Cin)
    w3 = mk(3, 3, Cin, Cout)
    gf = 2 * 9 * H * W * Cin * Cout / 1e9
    try:
        got = pallas_conv3_halo(x3, w3)
        ref = conv_ref(x3[None], w3)[0]
        err = float(jnp.abs(ref.astype(jnp.float32)
                            - got.astype(jnp.float32)).max())
        print(f"halo conv {Cin}->{Cout} max|err| = {err:.4f}", flush=True)
        timeit(f"pallas halo conv3x3 {Cin}->{Cout}",
               lambda x, w: pallas_conv3_halo(x, w), x3, w3, gflop=gf)
    except Exception as e:
        print(f"halo conv {Cin}->{Cout} FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
