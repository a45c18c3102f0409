"""Encoder fwd/bwd variants at the quarter training crop (528x704, b2 nf10).

Questions: how much do (a) the frame scan, (b) remat, (c) instance norm,
(d) cnet-vs-fnet contribute to the 468 ms encoders-fwd+bwd block.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
print("devices:", jax.devices(), flush=True)

from cermvs_tpu.models.extractor import BasicEncoder

B, N, H, W = 2, 11, 528, 704
rng = np.random.RandomState(0)
images = jnp.asarray(
    (rng.rand(B, N, H, W, 3) * 2 - 1).astype(np.float32))

fnet = BasicEncoder(output_dim=64, norm_fn="instance", type="HR")
cnet = BasicEncoder(output_dim=128, norm_fn="none", type="HR")
pf = fnet.init(jax.random.PRNGKey(0), images[:, 0])
pc = cnet.init(jax.random.PRNGKey(1), images[:, 0])


def timeit(label, f, *args, n_iter=4):
    f_j = jax.jit(f)
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


def grad_of(f):
    return jax.grad(lambda p, x: jnp.sum(f(p, x).astype(jnp.float32) ** 2))


# 1. fnet single batched call, all frames folded into batch
flat = images.reshape(B * N, H, W, 3)
timeit("fnet fwd batched(22)", lambda p, x: fnet.apply(p, x), pf, flat)
timeit("fnet fwd+bwd batched(22)", grad_of(fnet.apply), pf, flat)


# 2. fnet scanned over frames (current model structure), with/without remat
def scanned(remat):
    def f(p, imgs):
        def encode(mdl, carry, img):
            return carry, mdl.fnet(img)
        enc = nn.remat(encode) if remat else encode

        class Wrap(nn.Module):
            @nn.compact
            def __call__(self, imgs):
                return nn.scan(
                    enc, variable_broadcast="params",
                    split_rngs={"params": False}, in_axes=1, out_axes=1,
                )(self, (), imgs)[1]
            def setup(self): pass
        # build an ad-hoc module exposing .fnet
        class M(nn.Module):
            def setup(self):
                self.fnet = BasicEncoder(output_dim=64, norm_fn="instance",
                                         type="HR")
            def __call__(self, imgs):
                def encode(mdl, carry, img):
                    return carry, mdl.fnet(img)
                e = nn.remat(encode) if remat else encode
                return nn.scan(
                    e, variable_broadcast="params",
                    split_rngs={"params": False}, in_axes=1, out_axes=1,
                )(self, (), imgs)[1]
        m = M()
        return m.apply({"params": {"fnet": p["params"]}}, imgs)
    return f


timeit("fnet fwd scan+remat", scanned(True), pf, images)
timeit("fnet fwd+bwd scan+remat", grad_of(scanned(True)), pf, images)
timeit("fnet fwd+bwd scan no-remat", grad_of(scanned(False)), pf, images)

# 3. cnet on the 2 reference frames
timeit("cnet fwd+bwd (2 frames)", grad_of(cnet.apply), pc, images[:, 0])

# 4. fnet without instance norm (isolate norm cost)
fnet_nonorm = BasicEncoder(output_dim=64, norm_fn="none", type="HR")
pn = fnet_nonorm.init(jax.random.PRNGKey(0), images[:, 0])
timeit("fnet(no-norm) fwd+bwd batched(22)", grad_of(fnet_nonorm.apply),
       pn, flat)

# 5. fp32 compute dtype comparison
fnet32 = BasicEncoder(output_dim=64, norm_fn="instance", type="HR",
                      dtype=jnp.float32)
p32 = fnet32.init(jax.random.PRNGKey(0), images[:, 0])
timeit("fnet(fp32) fwd+bwd batched(22)", grad_of(fnet32.apply), p32, flat)
