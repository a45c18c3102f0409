"""The non-construction, non-encoder remainder of the train step
(~530 ms at the 528x704 quarter crop): 16 GRU iterations + lookups + loss +
optimizer.  Ablate: scan+remat vs unrolled, lookup share.

NOTE: every device array is passed as a jit ARGUMENT — closures over device
arrays get serialized into the remote compile request (DEVNOTES.md) and can
hang the compile for tens of minutes.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
print("devices:", jax.devices(), flush=True)

from cermvs_tpu.models.update import UpdateBlock
from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.ops.corr import CorrPyramid, build_pyramid

B, H, W = 1, 288, 400
CASCADE = ((64, 64, 8), (-1, 320, 8))
rng = np.random.RandomState(0)

ub = UpdateBlock(cascade=CASCADE)
net0 = jnp.asarray(rng.randn(B, H, W, 64).astype(np.float32)).astype(
    jnp.bfloat16)
inp0 = jnp.asarray(rng.randn(B, H, W, 64).astype(np.float32)).astype(
    jnp.bfloat16)
disp0 = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32) * 0.002)
vol = jnp.asarray(rng.randn(B, 1, H, W, 64).astype(np.float32))
pyr0 = CorrPyramid(build_pyramid(vol, 3), jnp.zeros((B, 1, H, W)),
                   0.0025 / 64, 64, 3)
params = ub.init(jax.random.PRNGKey(0), jnp.tanh(net0), nn.relu(inp0),
                 disp0, corr_ops.lookup(pyr0, disp0[..., 0][:, None], 5), 0)


def timeit(label, f, *args, n_iter=4):
    f_j = jax.jit(f, static_argnums=(0, 1))
    t0 = time.perf_counter()
    out = f_j(*args)
    float(sum(jnp.sum(x.astype(jnp.float32))
              for x in jax.tree_util.tree_leaves(out)))
    print(f"  [{label} compile {time.perf_counter()-t0:.0f}s]", flush=True)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f_j(*args)
    float(sum(jnp.sum(x.astype(jnp.float32))
              for x in jax.tree_util.tree_leaves(out)))
    print(f"{label}: {(time.perf_counter()-t0)/n_iter*1000:.1f} ms",
          flush=True)


class M(nn.Module):
    remat: bool
    with_lookup: bool

    def setup(self):
        self.ub = UpdateBlock(cascade=CASCADE, name="ub")

    def __call__(self, net, disp, inp, levels, corr_fixed):
        pyr = CorrPyramid(list(levels), jnp.zeros((B, 1, H, W)),
                          0.0025 / 64, 64, 3)

        def body(mdl, carry, _):
            net, disp = carry
            disp = jax.lax.stop_gradient(disp)
            if mdl.with_lookup:
                corr = corr_ops.lookup(pyr, disp[..., 0][:, None], 5,
                                       impl="banded")
            else:
                corr = corr_fixed
            net, delta = mdl.ub(net, inp, disp, corr, 1)
            return (net, disp + delta), disp + delta

        fn = nn.remat(body, static_argnums=()) if self.remat else body
        (net, disp), preds = nn.scan(
            fn, variable_broadcast="params",
            split_rngs={"params": False}, length=16)(
                self, (net, disp), None)
        return preds


def run_fwd(remat, with_lookup, p, net, disp, inp, levels, corr_fixed):
    m = M(remat=remat, with_lookup=with_lookup)
    return m.apply({"params": {"ub": p["params"]}}, net, disp, inp,
                   levels, corr_fixed)


def run_bwd(remat, with_lookup, p, net, disp, inp, levels, corr_fixed):
    def loss(p):
        return jnp.sum(run_fwd(remat, with_lookup, p, net, disp, inp,
                               levels, corr_fixed).astype(jnp.float32) ** 2)
    return jax.grad(loss)(p)


levels = tuple(pyr0.levels)
corr_fixed = jnp.asarray(
    rng.randn(B, 1, H, W, 33).astype(np.float32)).astype(jnp.bfloat16)

timeit("16 iters fwd (scan+remat)", run_fwd, True, True,
       params, net0, disp0, inp0, levels, corr_fixed)
timeit("16 iters fwd+bwd (scan+remat)", run_bwd, True, True,
       params, net0, disp0, inp0, levels, corr_fixed)
timeit("16 iters fwd+bwd (scan, no remat)", run_bwd, False, True,
       params, net0, disp0, inp0, levels, corr_fixed)
timeit("16 iters fwd+bwd (remat, no lookup)", run_bwd, True, False,
       params, net0, disp0, inp0, levels, corr_fixed)
