"""Row-sharded (spatial H-axis) inference vs the unsharded forward.

The row-sharded path (cermvs_tpu/parallel/spatial.py) must reproduce the
single-device test-mode forward on every owned row: halo-conv encoders with
pmean'd instance norm, offset-projected row-block volumes, ghost-row GRU
iterations.  Tolerance 1e-3 — the float-reduction-order class shared with
the view-sharded tests (tests/test_parallel.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cermvs_tpu.models.extractor import BasicEncoder
from cermvs_tpu.models.raft import RAFT
from cermvs_tpu.parallel.spatial import encoder_rows, row_sharded_forward
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.slow


def _row_mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("row",))


def _scene(N=4, H=256, W=64, seed=0):
    rng = np.random.RandomState(seed)
    images = (rng.rand(1, N, H, W, 3) * 255).astype(np.float32)
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32)
    intr = np.tile(K, (1, N, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (1, N, 1, 1))
    for n in range(1, N):
        poses[0, n, 0, 3] = 0.4 * n
        poses[0, n, 1, 3] = 0.2 * ((-1) ** n)
    return (jnp.asarray(images), jnp.asarray(poses), jnp.asarray(intr))


@pytest.mark.parametrize("norm_fn,dtype,rtol,atol", [
    # fp32: the only divergences are reduction order — the pmean'd norm
    # moments and the conv algorithm choice (max abs ~1e-6 observed) —
    # the exactness statement
    ("instance", jnp.float32, 1e-4, 1e-5),
    ("none", jnp.float32, 1e-4, 1e-5),
    # bf16 (production dtype): the fp32 moment reordering rounds to
    # different bf16 ulps which compound across the 11 conv layers —
    # a few-ulp envelope, not an algorithmic difference
    ("instance", jnp.bfloat16, 3e-2, 1e-1),
    ("none", jnp.bfloat16, 1e-2, 1e-2),
])
def test_encoder_rows_matches_unsharded(norm_fn, dtype, rtol, atol):
    """Halo-conv + pmean-norm encoder == BasicEncoder on full rows."""
    H, W = 64, 48
    enc = BasicEncoder(output_dim=64, norm_fn=norm_fn, dtype=dtype)
    x = jnp.asarray(np.random.RandomState(0).rand(2, H, W, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    ref = enc.apply(params, x)

    mesh = _row_mesh()

    def body(p, xl):
        return encoder_rows(p, xl, "row", norm_fn=norm_fn, dtype=dtype)

    out = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, "row")),
        out_specs=P(None, "row"),
        check_vma=False))(params["params"], x)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=rtol, atol=atol)


def test_row_sharded_forward_matches_single_fp32():
    """Full two-stage test-mode forward, 8-way row sharding == single
    device, in fp32 — the algorithmic-equality statement.  The residual
    divergence is float reduction order (pmean'd norm moments + conv
    algorithm choice) amplified through the encoder and 4 GRU iterations:
    observed max 2.5e-4 abs on disparities of ~0.01-0.2."""
    images, poses, intrinsics = _scene()
    model = RAFT(test_mode=True, cascade=((8, 64, 2), (-1, 320, 2)),
                 hyp_chunk=4, dtype=jnp.float32)
    scale = jnp.ones((1,), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images, poses, intrinsics,
                        scale)
    ref = model.apply(params, images, poses, intrinsics, scale)

    mesh = _row_mesh()
    out = row_sharded_forward(model, params, images, poses, intrinsics,
                              scale, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_row_sharded_forward_bf16_runs():
    """bf16 (production dtype) smoke: the sharded program compiles and
    produces finite disparities of the right shape.

    Equality against the unsharded bf16 forward is NOT asserted: row
    sharding retiles every conv, so bf16 rounds differently everywhere,
    and with RANDOM weights the recurrent update amplifies ulp noise
    chaotically (observed ~0.1 disparity divergence after 4 iterations; the
    fp32 test above pins the algorithm — the divergence class is dtype
    rounding, not structure)."""
    images, poses, intrinsics = _scene()
    model = RAFT(test_mode=True, cascade=((8, 64, 2),), hyp_chunk=4)
    scale = jnp.ones((1,), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images, poses, intrinsics,
                        scale)
    out = np.asarray(row_sharded_forward(
        model, params, images, poses, intrinsics, scale, _row_mesh()))
    assert out.shape == (1, images.shape[2] // 4, images.shape[3] // 4)
    assert np.isfinite(out).all()
