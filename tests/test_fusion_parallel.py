"""Batched / mesh-sharded fusion must match the per-view path."""

import numpy as np
import pytest

from cermvs_tpu.data.loader import DataLoader
from cermvs_tpu.io.pfm import write_pfm
from cermvs_tpu.io.ply import read_ply
from cermvs_tpu.parallel.mesh import make_mesh
from cermvs_tpu.pipeline.fusion import fusion
from tests.test_pipeline import PlaneScene


def _run(tmp_path, tag, **kw):
    scene = PlaneScene(n=4, H=24, W=32, Z0=10.0, num_frames=2)
    out_dir = tmp_path / tag
    (out_dir / "depths").mkdir(parents=True)
    for i in range(4):
        write_pfm(out_dir / "depths" / f"{i}_m.pfm", scene.depth(i))
    loader = DataLoader(scene, batch_size=None, num_workers=0)
    ply = fusion(loader, out_dir, suffix="_m", glb=0.25, rescale=1,
                 tot_iter=3, **kw)
    return read_ply(ply)


def test_view_batched_matches_per_view(tmp_path):
    xyz_a, rgb_a = _run(tmp_path, "per_view")
    xyz_b, rgb_b = _run(tmp_path, "batched", view_batch=4)
    assert xyz_a.shape == xyz_b.shape
    np.testing.assert_allclose(
        np.sort(xyz_a, axis=0), np.sort(xyz_b, axis=0), atol=1e-4)


def test_mesh_sharded_fusion(tmp_path):
    mesh = make_mesh(n_data=8, n_view=1)
    xyz_a, _ = _run(tmp_path, "per_view2")
    xyz_c, _ = _run(tmp_path, "sharded", view_batch=8, mesh=mesh)
    assert xyz_a.shape == xyz_c.shape
    np.testing.assert_allclose(
        np.sort(xyz_a, axis=0), np.sort(xyz_c, axis=0), atol=1e-4)


def test_streamed_fusion_matches_in_memory(tmp_path):
    """Streamed memory model (host-resident stacks, per-batch uploads
    sharded over the mesh) must produce the same cloud as the replicated
    index-gather path — it runs the identical kernel."""
    mesh = make_mesh(n_data=8, n_view=1)
    xyz_a, _ = _run(tmp_path, "inmem", view_batch=8, mesh=mesh)
    xyz_b, _ = _run(tmp_path, "stream", view_batch=8, mesh=mesh, stream=True)
    assert xyz_a.shape == xyz_b.shape
    np.testing.assert_allclose(
        np.sort(xyz_a, axis=0), np.sort(xyz_b, axis=0), atol=1e-4)


def test_streamed_fusion_never_materializes_the_stack(tmp_path):
    """The streamed path must not place the full scene stack on device:
    peak live device bytes for the depth arrays stay at the batch size.
    (The scene here is small; the assertion is on the MODEL — no live
    device buffer matches the full-stack shape.)"""
    import jax

    scene_views = 4
    _run(tmp_path, "stream_mem", view_batch=2, stream=True)
    full_stack_shapes = {(scene_views, 24, 32)}
    live = {tuple(a.shape) for a in jax.live_arrays()}
    assert not (live & full_stack_shapes), live & full_stack_shapes
