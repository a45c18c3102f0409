"""Update-block iteration: XLA convs vs matmul restructurings.

The 16 GRU/update iterations cost ~77 ms/map at DTU scale-1 (4.8 ms/iter,
~11% MFU) with lax.conv at channel widths 33..256 — the round-2 floor probe
showed XLA's convs themselves are the bottleneck (3.77 ms/iter).  A 3x3 conv
is 9 shifted matmuls; on TPU the MXU runs (M=H*W, K=C, N=Cout) matmuls near
peak where the conv op does not.  This probe times ONE full update iteration
(disp-context, corr encoder, fused-gate GRU, delta head — the exact chain of
models/update.py) under a 64-length scan (amortizing ~29 ms tunnel dispatch)
for each conv implementation:

  conv      — lax.conv_general_dilated (current)
  patches   — im2col via conv_general_dilated_patches + ONE matmul
  shift9    — 9 shifted slices, 9 accumulated matmuls
  dxfold    — dx folded into channels (K=3C), 3 accumulated matmuls

Run on the real TPU:  python benchmarks/profile_update_variants.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

B, H, W = 1, 288, 400     # DTU 1152x1600 / 4
DT = jnp.bfloat16
ITERS = 64

rng = np.random.RandomState(0)


def mk(*shape):
    return jnp.asarray((rng.randn(*shape) * 0.05).astype(np.float32)).astype(DT)


# weights of the real stack (models/update.py):
#   corr enc: 1x1 33->64, 3x3 64->64
#   GRU (gates fused, ctx hoisted): zr 3x3 (64net+113dyn)->128, q 3x3 177->64
#   delta: 3x3 64->256, 3x3 256->1
WEIGHTS = dict(
    w_c1=mk(1, 1, 33, 64), b_c1=mk(64),
    w_c2=mk(3, 3, 64, 64), b_c2=mk(64),
    w_zr=mk(3, 3, 177, 128),
    w_q=mk(3, 3, 177, 64),
    w_d1=mk(3, 3, 64, 256), b_d1=mk(256),
    w_d2=mk(3, 3, 256, 1), b_d2=mk(1),
)

net0 = mk(B, H, W, 64)
corr0 = jnp.asarray(rng.randn(B, 1, H, W, 33).astype(np.float32))
gctx0 = mk(B, H, W, 192)
disp0 = jnp.asarray((rng.rand(B, H, W, 1) * 0.002).astype(np.float32))


def conv_xla(x, w):
    p = (w.shape[0] // 2, w.shape[0] // 2), (w.shape[1] // 2, w.shape[1] // 2)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), p, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_patches(x, w):
    kh, kw, C, N = w.shape
    if kh == kw == 1:
        return conv_xla(x, w)
    pat = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # patches feature order is (C, kh, kw) (channel-major)
    wr = w.transpose(2, 0, 1, 3).reshape(C * kh * kw, N)
    out = jax.lax.dot_general(
        pat.reshape(-1, C * kh * kw), wr,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return out.reshape(x.shape[0], x.shape[1], x.shape[2], N).astype(x.dtype)


def conv_shift9(x, w):
    kh, kw, C, N = w.shape
    if kh == kw == 1:
        return conv_xla(x, w)
    Bx, Hx, Wx, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            sl = xp[:, dy:dy + Hx, dx:dx + Wx, :].reshape(-1, C)
            t = jax.lax.dot_general(
                sl, w[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc.reshape(Bx, Hx, Wx, N).astype(x.dtype)


def conv_dxfold(x, w):
    kh, kw, C, N = w.shape
    if kh == kw == 1:
        return conv_xla(x, w)
    Bx, Hx, Wx, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, :, dx:dx + Wx, :] for dx in range(kw)], axis=-1)
    acc = None
    for dy in range(kh):
        sl = cols[:, dy:dy + Hx].reshape(-1, kw * C)
        t = jax.lax.dot_general(
            sl, w[dy].reshape(kw * C, N), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    return acc.reshape(Bx, Hx, Wx, N).astype(x.dtype)


def disp_context(disp, size=7):
    Bx, Hx, Wx, _ = disp.shape
    r = size // 2
    padded = jnp.pad(disp[..., 0], ((0, 0), (r, r), (r, r)))
    shifts = [padded[:, dy:dy + Hx, dx:dx + Wx]
              for dy in range(size) for dx in range(size)]
    return jnp.stack(shifts, axis=-1) - disp


def make_step(conv, ws):
    def step(carry, _):
        net, disp = carry
        dctx = (100.0 * disp_context(disp)).astype(DT)
        # corr input must depend on the carry (CSE) — the real lookup does
        corr = (jnp.mean(corr0, axis=1)
                * (1.0 + disp)).astype(DT)
        c = jax.nn.relu(conv_xla(corr, ws["w_c1"]) + ws["b_c1"])
        c = jax.nn.relu(conv(c, ws["w_c2"]) + ws["b_c2"])
        dyn = jnp.concatenate([dctx, c], axis=-1)          # 113
        nd = jnp.concatenate([net, dyn], axis=-1)          # 177
        zr = jax.nn.sigmoid(conv(nd, ws["w_zr"]) + gctx0[..., :128])
        z, r = zr[..., :64], zr[..., 64:]
        rq = jnp.concatenate([r * net, dyn], axis=-1)
        q = jnp.tanh(conv(rq, ws["w_q"]) + gctx0[..., 128:])
        net = (1 - z) * net + z * q
        d = jax.nn.relu(conv(net, ws["w_d1"]) + ws["b_d1"])
        d = conv(d, ws["w_d2"]) + ws["b_d2"]
        delta = 0.01 * d.astype(jnp.float32)
        return (net, disp + delta), ()

    return step


def run(conv, ws, net, disp):
    (net, disp), _ = jax.lax.scan(make_step(conv, ws), (net, disp), None,
                                  length=ITERS)
    return net.astype(jnp.float32).sum() + disp.sum()


def timeit(label, fn, *args, n=4):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    v = float(f(*args))
    print(f"  [{label}: compile {time.perf_counter()-t0:.0f}s]", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        v = float(f(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:7.1f} ms total, {dt/ITERS*1e3:6.2f} ms/iter",
          flush=True)
    return v


VARIANTS = [("conv (current)", conv_xla), ("patches", conv_patches),
            ("shift9", conv_shift9), ("dxfold", conv_dxfold)]

vals = {}
for label, conv in VARIANTS:
    vals[label] = timeit(label, lambda ws, n, d, c=conv: run(c, ws, n, d),
                         WEIGHTS, net0, disp0)

ref = vals["conv (current)"]
for label, v in vals.items():
    if abs(v - ref) > 1e-2 * max(1.0, abs(ref)):
        print(f"MISMATCH {label}: {v} vs {ref}", flush=True)
print("values agree within tolerance" if all(
    abs(v - ref) <= 1e-2 * max(1.0, abs(ref)) for v in vals.values())
    else "CHECK VALUES", flush=True)
