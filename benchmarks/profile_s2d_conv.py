"""Space-to-depth conv restructuring + pallas tile-size question.

profile_conv_primitives.py: XLA conv3x3 MFU rises steeply with channel
width (64ch 4%, 128ch 17%, 256ch 37%).  Packing spatial W (and/or H) into
channels multiplies the channel width at a structural-FLOP cost of 0.67*p
(1.33x for p=2, 1.78x for 2x2): if MFU more than doubles, the packed conv
wins — pure XLA, differentiable, exactly equivalent math (packed kernels
are the original weights scattered with zeros).

Also re-times the pallas VMEM matmul with LARGER M tiles (probe_pallas_gru
used TM=1600 and saw ~25us/grid-step overhead).

Run: python benchmarks/profile_s2d_conv.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

H, W = 288, 400
DT = jnp.bfloat16
PEAK = 197e12
rng = np.random.RandomState(0)


def mk(*shape):
    return jnp.asarray((rng.randn(*shape) * 0.05).astype(np.float32)).astype(DT)


def timeit(label, fn, *args, gflop=None, n=6, iters=32):
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
        print(f"{label:52s}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n):
        float(f(*args))
    dt = (time.perf_counter() - t0) / n / iters
    mfu = f" {gflop*1e9/dt/PEAK*100:5.1f}% MFU(real)" if gflop else ""
    print(f"{label:52s}: {dt*1e3:7.3f} ms{mfu}  [compile {comp:.0f}s]",
          flush=True)


def conv(x, w, dn=("NHWC", "HWIO", "NHWC")):
    p = tuple((k // 2, k // 2) for k in w.shape[:2])
    return jax.lax.conv_general_dilated(x, w, (1, 1), p,
                                        dimension_numbers=dn)


def pack_w(x, p):
    """(B, H, W, C) -> (B, H, W/p, p*C); channel blocks ordered by dx."""
    B, Hx, Wx, C = x.shape
    return x.reshape(B, Hx, Wx // p, p * C)


def s2d_kernel_w(w, p):
    """Packed-W kernel: (3, 3, C, N) -> (3, 1+2//p+1? , p*C, p*N).

    out packed col X, sub-output j (real x = p*X + j):
      real tap dx in {-1,0,1} reads real col p*X + j + dx = packed col
      (j + dx) // p (floor), sub-channel (j + dx) % p.
    packed dX offsets range over floor((j+dx-?)/p) for j in [0,p), dx in
    [-1,1] -> {-1, 0} for p>=2 shifted to a width-2 kernel with padding
    (1, 0) on the packed axis... easier: build width (1 + ceil(2/p))
    kernel by scatter and use explicit padding below.
    """
    kh, kw, C, N = w.shape
    r = kw // 2
    # packed kernel width: taps j+dx span [-r, p-1+r] real cols ->
    # packed cols floor(-r/p)..floor((p-1+r)/p)
    lo = -(r // p) - (1 if r % p else 0)
    hi = (p - 1 + r) // p
    kwp = hi - lo + 1
    wp = np.zeros((kh, kwp, p * C, p * N), np.float32)
    wnp = np.asarray(w, np.float32)
    for j in range(p):          # sub-output
        for dx in range(-r, r + 1):
            t = j + dx
            dX = t // p - lo    # packed kernel x index
            sub = t % p         # sub-channel of input
            wp[:, dX, sub * C:(sub + 1) * C, j * N:(j + 1) * N] = \
                wnp[:, dx + r, :, :]
    return jnp.asarray(wp).astype(w.dtype), lo, hi


def conv_s2d_packed(x, wp, p, lo, hi, kh=3):
    """Exact conv via a PRE-PACKED kernel (wp built host-side: the packing
    scatter is numpy and must not trace)."""
    B, Hx, Wx, C = x.shape
    N = wp.shape[-1] // p
    xp = pack_w(x, p)
    out = jax.lax.conv_general_dilated(
        xp, wp, (1, 1), ((kh // 2, kh // 2), (-lo, hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(B, Hx, Wx, N)


def conv_s2d_w(x, w, p=2):
    wp, lo, hi = s2d_kernel_w(w, p)
    return conv_s2d_packed(x, wp, p, lo, hi, w.shape[0])


# correctness (CPU-identical math check happens on TPU too, small tolerance)
x0 = mk(1, H, W, 177)
w0 = mk(3, 3, 177, 128)
ref = conv(x0, w0)
for p in (2, 4):
    got = conv_s2d_w(x0, w0, p)
    err = float(jnp.abs(ref.astype(jnp.float32)
                        - got.astype(jnp.float32)).max())
    print(f"s2d p={p} max|err| = {err:.5f}", flush=True)

M = H * W
for Cin, Cout, note in [(177, 128, "zr"), (177, 64, "q"), (64, 256, "d1"),
                        (64, 64, "c2")]:
    x = mk(1, H, W, Cin)
    w = mk(3, 3, Cin, Cout)
    gf = 2 * 9 * M * Cin * Cout / 1e9
    timeit(f"conv3x3 {Cin}->{Cout} ({note}) XLA", conv, x, w, gflop=gf)
    for p in (2, 4):
        wpk, lo, hi = s2d_kernel_w(w, p)
        timeit(f"conv3x3 {Cin}->{Cout} ({note}) s2d p={p}",
               lambda x, wpk, p=p, lo=lo, hi=hi: conv_s2d_packed(
                   x, wpk, p, lo, hi), x, wpk, gflop=gf)


# ---- pallas vmem matmul, larger tiles --------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def vmem_matmul(x, w, TM):
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


xm = mk(M, 177)
wm = mk(177, 192)
gf = 2 * M * 177 * 192 / 1e9
for TM in (1600, 3200, 7200, 14400, 28800):
    timeit(f"pallas vmem matmul K=177 N=192 TM={TM}",
           lambda x, w, TM=TM: vmem_matmul(x, w, TM), xm, wm, gflop=gf)
# XLA reference for the same matmul
timeit("XLA matmul K=177 N=192",
       lambda x, w: jax.lax.dot_general(
           x, w, (((1,), (0,)), ((), ())),
           preferred_element_type=jnp.float32).astype(DT),
       xm, wm, gflop=gf)
