"""Component breakdown of the TRAIN step at a reduced crop (528x704, b2).

Full-crop train compiles take 10+ min (DEVNOTES.md); pixels scale ~linearly,
so a 1/4-area crop localizes the bottleneck at ~1/4 the time.  Parts timed
as separate value_and_grad jits (fwd+bwd each):
  1. full train step
  2. encoders only (cnet + scanned fnet) -> sum
  3. construction only (build_corr_pyramid on precomputed fmaps, 2 stages)
  4. GRU iterations only (lookup + update_block, 16 iters on a fixed volume)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

from cermvs_tpu.models.raft import RAFT
from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.training.optim import fetch_optimizer
from cermvs_tpu.training.step import init_state, make_train_step

B, N, H, W = 2, 11, 528, 704
h, w = H // 4, W // 4
V = N - 1

rng = np.random.RandomState(0)
K = np.array([[2892.0 * W / 1600, 0, W / 2], [0, 2892.0 * W / 1600, H / 2],
              [0, 0, 1]], np.float32)
poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
rs = np.random.RandomState(1)
for i in range(1, N):
    poses[:, i, :3, 3] = rs.randn(3) * 20.0
batch = {
    "images": jnp.asarray((rng.rand(B, N, H, W, 3) * 255).astype(np.float32)),
    "depths": jnp.asarray((rng.rand(B, N, H, W) * 400 + 400).astype(np.float32)),
    "poses": jnp.asarray(poses),
    "intrinsics": jnp.asarray(np.tile(K, (B, N, 1, 1))),
}

model = RAFT(hyp_chunk=8)
tx, _ = fetch_optimizer(num_steps=1000)
state = init_state(model, tx, jax.random.PRNGKey(0), batch)
params = state.params


def timeit(label, f, *args, n_iter=3):
    f_j = jax.jit(f)
    t0 = time.perf_counter()
    out = f_j(*args)
    float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)))
    print(f"  [{label} compile {time.perf_counter()-t0:.0f}s]", flush=True)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f_j(*args)
    float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)))
    dt = (time.perf_counter() - t0) / n_iter * 1000
    print(f"{label}: {dt:.0f} ms", flush=True)
    return dt


# ---- 1. full train step
step = make_train_step(model, tx, donate=False)
t0 = time.perf_counter()
state2, metrics = step(state, batch, 0.5)
float(metrics["loss"])
print(f"  [full step compile {time.perf_counter()-t0:.0f}s]", flush=True)
t0 = time.perf_counter()
for _ in range(3):
    state2, metrics = step(state, batch, 0.5)
    float(metrics["loss"])
print(f"full train step: {(time.perf_counter()-t0)/3*1000:.0f} ms", flush=True)


# ---- helpers reproducing the model's preprocessing
def encoders(params, images):
    def fwd(mdl, images):
        images = images.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        import flax.linen as nn
        net_inp = mdl.cnet(images[:, 0])

        def encode(m, carry, img):
            return carry, m.fnet(img)
        fmaps = nn.scan(
            nn.remat(encode), variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1,
        )(mdl, (), images)[1]
        return jnp.sum(net_inp.astype(jnp.float32) ** 2) + jnp.sum(
            fmaps.astype(jnp.float32) ** 2)
    return jax.value_and_grad(
        lambda p: model.apply({"params": p}, images, method=fwd))(params)


timeit("encoders fwd+bwd", encoders, params, batch["images"])

# precompute fmaps for parts 3/4
def get_fmaps(params, images):
    def fwd(mdl, images):
        images = images.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        import flax.linen as nn

        def encode(m, carry, img):
            return carry, m.fnet(img)
        return nn.scan(
            encode, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1,
        )(mdl, (), images)[1]
    return model.apply({"params": params}, images, method=fwd)


fmaps = jax.jit(get_fmaps)(params, batch["images"]).astype(jnp.float32)
fmaps = jnp.asarray(fmaps)
intr4 = batch["intrinsics"].at[:, :, :2].divide(4.0)
ii = jnp.zeros(V, jnp.int32)
jj = jnp.arange(1, N, dtype=jnp.int32)
disp0 = jnp.zeros((B, 1, h, w), jnp.float32)
disp1 = jnp.asarray(rng.rand(B, 1, h, w).astype(np.float32) * 0.002)


def construction(fm, d0, d1):
    def f(fm):
        pyr0 = corr_ops.build_corr_pyramid(
            fm, batch["poses"], intr4, ii, jj, d0, 64, 0.0025 / 64,
            shift=True, num_levels=3, hyp_chunk=8,
            mean_over_views=True, gather_dtype=jnp.bfloat16, zero_slab=True)
        pyr1 = corr_ops.build_corr_pyramid(
            fm, batch["poses"], intr4, ii, jj, d1, 44, 0.0025 / 44,
            shift=False, num_levels=3, hyp_chunk=8,
            mean_over_views=True, gather_dtype=jnp.bfloat16)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                   for p in (pyr0, pyr1)
                   for l in jax.tree_util.tree_leaves(p)
                   if hasattr(l, "ndim") and l.ndim > 2)
    return jax.value_and_grad(f)(fm)


timeit("construction x2 stages fwd+bwd", construction, fmaps, disp0, disp1)


def gru_iters(params, fm, d1):
    def fwd(mdl, fm, disp):
        import flax.linen as nn
        images = batch["images"].astype(jnp.float32) * (2.0 / 255.0) - 1.0
        net_inp = mdl.cnet(images[:, 0])
        net = jnp.tanh(net_inp[..., :mdl.dim_net])
        inp = nn.relu(net_inp[..., mdl.dim_net:])
        pyr = corr_ops.build_corr_pyramid(
            jax.lax.stop_gradient(fm), batch["poses"], intr4, ii, jj,
            jax.lax.stop_gradient(disp), 44, 0.0025 / 44, shift=False,
            num_levels=3, hyp_chunk=8, mean_over_views=True,
            gather_dtype=jnp.bfloat16)
        pyr = jax.tree_util.tree_map(jax.lax.stop_gradient, pyr)
        disp = disp[:, 0][..., None]
        preds = []

        def body(mdl, carry, _):
            net, disp = carry
            disp = jax.lax.stop_gradient(disp)
            zinv = disp[..., 0][:, None]
            corr_frames = corr_ops.lookup(pyr, zinv, mdl.radius, impl="banded")
            net, delta = mdl.update_block(net, inp, disp, corr_frames, 1)
            return (net, disp + delta), disp + delta

        fn = nn.remat(body, static_argnums=())
        (net, disp), preds = nn.scan(
            fn, variable_broadcast="params", split_rngs={"params": False},
            length=16)(mdl, (net, disp), None)
        return jnp.sum(preds.astype(jnp.float32) ** 2)
    return jax.value_and_grad(
        lambda p: model.apply({"params": p}, fm, d1, method=fwd))(params)


timeit("cnet + 16 GRU iters fwd+bwd (incl 1 stop-grad construction)",
       gru_iters, params, fmaps, disp1)
