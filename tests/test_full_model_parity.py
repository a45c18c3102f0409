"""FULL-MODEL golden parity: the reference RAFT (both cascade stages, cost
volume, pyramid lookups, GRU iterations) executed under torch-cpu with a stub
CUDA-correlation extension, against our model with imported weights.

The stub implements alt_cuda_corr's documented semantics (4-tap bilinear
gather-dot with per-corner bounds, radius=0) in ~15 lines of torch — the same
semantics our oracle tests pin down — so the two implementations share no
code, only the contract.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_raft():
    import torch

    # ---- stubs: gin, fastcore (as in test_torch_parity) ----
    gin = types.ModuleType("gin")
    gin.configurable = lambda *a, **k: (
        a[0] if a and callable(a[0]) else (lambda f: f))
    sys.modules.setdefault("gin", gin)

    fastcore_all = types.ModuleType("fastcore.all")

    def store_attr(names=None, **kw):
        import inspect

        fr = inspect.currentframe().f_back
        args, _, _, values = inspect.getargvalues(fr)
        self_ = values[args[0]]
        for n in args[1:]:
            setattr(self_, n, values[n])

    fastcore_all.store_attr = store_attr
    fastcore = types.ModuleType("fastcore")
    fastcore.all = fastcore_all
    sys.modules.setdefault("fastcore", fastcore)
    sys.modules.setdefault("fastcore.all", fastcore_all)

    # ---- stub alt_cuda_corr: the kernel CONTRACT in plain torch ----
    alt = types.ModuleType("alt_cuda_corr")

    def forward(fmap1, fmap2, coords, radius):
        assert radius == 0
        B, H, W, C = fmap1.shape
        N = coords.shape[1]
        x = coords[..., 0]
        y = coords[..., 1]
        x0 = torch.floor(x)
        y0 = torch.floor(y)
        fx = x - x0
        fy = y - y0
        out = torch.zeros(B, N, 1, H, W)
        f2 = fmap2.reshape(B, H * W, C)
        for (cy, cx, w) in [
            (y0, x0, (1 - fx) * (1 - fy)), (y0, x0 + 1, fx * (1 - fy)),
            (y0 + 1, x0, (1 - fx) * fy), (y0 + 1, x0 + 1, fx * fy),
        ]:
            inside = ((cx >= 0) & (cx <= W - 1) & (cy >= 0)
                      & (cy <= H - 1)).float()
            idx = (cy.clamp(0, H - 1) * W + cx.clamp(0, W - 1)).long()
            g = torch.gather(
                f2, 1, idx.reshape(B, N * H * W, 1).expand(-1, -1, C))
            g = g.reshape(B, N, H, W, C)
            dot = torch.einsum("bnhwc,bhwc->bnhw", g, fmap1)
            out[:, :, 0] += dot * w * inside
        return (out,)

    alt.forward = forward
    sys.modules["alt_cuda_corr"] = alt

    # ---- neutralize .cuda() / autocast on CPU ----
    torch.Tensor.cuda = lambda self, *a, **k: self
    if REF not in sys.path:
        sys.path.insert(0, REF)

    import contextlib

    import core.raft as ref_raft_mod

    ref_raft_mod.autocast = lambda enabled=True: contextlib.nullcontext()
    yield ref_raft_mod


def test_full_raft_parity(ref_raft, rng):
    import torch
    import jax
    import jax.numpy as jnp

    from cermvs_tpu.models.raft import RAFT
    from cermvs_tpu.utils.torch_import import convert_raft

    cascade = [(8, 64, 2), (-1, 320, 2)]
    torch.manual_seed(3)
    tmodel = ref_raft.RAFT(cascade=cascade, test_mode=True).eval()
    params = convert_raft(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()})

    B, N, H, W = 1, 4, 32, 48
    images = (rng.rand(B, N, H, W, 3) * 255).astype(np.float32)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    intr = np.tile(K, (B, N, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for n in range(1, N):
        poses[:, n, 0, 3] = 0.5 * n
        poses[:, n, 1, 3] = 0.2 * ((-1) ** n)
    scale = np.full((B,), 1.0, np.float32)

    with torch.no_grad():
        ref_out = tmodel(
            torch.from_numpy(images.transpose(0, 1, 4, 2, 3)).clone(),
            torch.from_numpy(poses).clone(),
            torch.from_numpy(intr).clone(),
            scale=torch.from_numpy(scale),
        ).numpy()[:, 0]

    model = RAFT(cascade=tuple(map(tuple, cascade)), test_mode=True,
                 hyp_chunk=4, dtype=jnp.float32)
    out = np.asarray(model.apply(
        params, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(intr),
        jnp.asarray(scale)))

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-4)


def test_full_raft_parity_train_mode(ref_raft, rng):
    """Train-mode: every intermediate prediction across both stages."""
    import torch
    import jax.numpy as jnp

    from cermvs_tpu.models.raft import RAFT
    from cermvs_tpu.utils.torch_import import convert_raft

    cascade = [(8, 64, 2), (-1, 320, 1)]
    torch.manual_seed(4)
    tmodel = ref_raft.RAFT(cascade=cascade, test_mode=False).eval()
    params = convert_raft(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()})

    B, N, H, W = 1, 3, 24, 32
    images = (rng.rand(B, N, H, W, 3) * 255).astype(np.float32)
    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32)
    intr = np.tile(K, (B, N, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    poses[:, 1, 0, 3] = 0.6
    poses[:, 2, 1, 3] = 0.4

    with torch.no_grad():
        preds = tmodel(
            torch.from_numpy(images.transpose(0, 1, 4, 2, 3)).clone(),
            torch.from_numpy(poses).clone(),
            torch.from_numpy(intr).clone(),
        )
    ref_out = np.stack([p.numpy()[:, 0] for p in preds], 0)  # (T, B, h, w)

    model = RAFT(cascade=tuple(map(tuple, cascade)), hyp_chunk=4,
                 dtype=jnp.float32)
    out = np.asarray(model.apply(
        params, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(intr)))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-4)


def test_import_checkpoint_cli_roundtrip(ref_raft, tmp_path):
    """scripts/import_checkpoint.py: .pth -> orbax dir -> load_params."""
    import torch
    import jax

    from cermvs_tpu.training.checkpoint import load_params
    from cermvs_tpu.utils.torch_import import convert_raft

    sys.path.insert(0, "/root/repo/scripts")
    import import_checkpoint

    torch.manual_seed(5)
    tmodel = ref_raft.RAFT(cascade=[(8, 64, 2), (-1, 320, 2)]).eval()
    # DataParallel-style "module." prefix, as the released checkpoints have
    sd = {f"module.{k}": v for k, v in tmodel.state_dict().items()}
    pth = tmp_path / "ref.pth"
    torch.save(sd, pth)

    out_dir = tmp_path / "imported"
    import_checkpoint.main([str(pth), str(out_dir)])

    restored = load_params(out_dir)
    expected = convert_raft(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()})
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        restored, expected)


def test_inference_accepts_raw_pth(ref_raft, tmp_path):
    """inference(ckpt="....pth") imports the reference checkpoint in place
    (demo.py's path the moment released weights are dropped in)."""
    import torch

    from cermvs_tpu.data.loader import DataLoader
    from cermvs_tpu.pipeline.inference import inference
    from tests.test_pipeline import PlaneScene

    torch.manual_seed(7)
    tmodel = ref_raft.RAFT(cascade=[(4, 64, 1), (-1, 320, 1)]).eval()
    sd = {f"module.{k}": v for k, v in tmodel.state_dict().items()}
    pth = tmp_path / "train_DTU.pth"
    torch.save(sd, pth)

    scene = PlaneScene(n=3, H=32, W=32, num_frames=2)
    inference(DataLoader(scene, batch_size=None, num_workers=0),
              ckpt=str(pth), output_folder=tmp_path / "out", rescale=1,
              model_kwargs=dict(cascade=((4, 64, 1), (-1, 320, 1)),
                                hyp_chunk=4))
    files = sorted((tmp_path / "out" / "depths").glob("*.pfm"))
    assert len(files) == 3
