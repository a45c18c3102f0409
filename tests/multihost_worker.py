"""Subprocess worker for tests/test_multihost.py — NOT a test module.

Runs the REAL multi-process training path (replacing the reference's
single-process ``nn.DataParallel``, ``/root/reference/train.py:54``) on a
CPU backend: ``jax.distributed.initialize`` + Gloo collectives, the
host-sharded loader split (``data/loader.py process_shard``), global-array
assembly via ``jax.make_array_from_process_local_data``
(``training/step.py:shard_batch``), and the rectified-plan
``process_allgather`` union (``training/train.py:pick_step``).

argv: <process_id> <num_processes> <coordinator addr:port> <outdir>
With num_processes == 1 it runs the identical workload single-process (the
exactness reference).
"""

import json
import os
import sys


def main():
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    coord, outdir = sys.argv[3], sys.argv[4]

    # 2 local devices per process => a 2*nprocs-device global mesh
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert jax.device_count() == 2 * nprocs

    import numpy as np

    import cermvs_tpu.data as data_mod
    from cermvs_tpu.config import bind_parameter, clear_config
    from cermvs_tpu.data.loader import DataLoader, Dataset

    H, W, N = 32, 64, 3

    class Synth(Dataset):
        """Deterministic-by-index scenes with per-sample baseline jitter
        (so the two hosts' local plans differ and the union matters)."""

        def __len__(self):
            return 8

        def __getitem__(self, i):
            rng = np.random.RandomState(100 + i)
            K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                         np.float32)
            poses = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
            for k, bx in enumerate([0.0, 1.2 + 0.05 * i, -1.6 - 0.03 * i]):
                poses[k, 0, 3] = -bx
            return {
                "images": (rng.rand(N, H, W, 3) * 255).astype(np.float32),
                "depths": (rng.rand(N, H, W) * 20 + 20).astype(np.float32),
                "poses": poses,
                "intrinsics": np.tile(K, (N, 1, 1)),
            }

    def fake_loader(batch_size=4, **kw):
        shard = ((jax.process_index(), jax.process_count())
                 if jax.process_count() > 1 else None)
        return DataLoader(Synth(), batch_size=batch_size, shuffle=True,
                          drop_last=True, num_workers=0, seed=0,
                          process_shard=shard)

    data_mod.get_train_data_loader = fake_loader

    # checkpointing is covered by its own tests; a multi-process orbax save
    # is out of scope here — stub it identically in both layouts
    import cermvs_tpu.training.checkpoint as ckpt_mod

    class NoCkpt:
        def __init__(self, *a, **kw):
            pass

        def latest_step(self):
            return None

        def restore(self, state):
            return state

        def maybe_save(self, *a, **kw):
            pass

        def wait(self):
            pass

    ckpt_mod.CheckpointManager = NoCkpt

    # the rectified-plan allgather union, directly (pick_step's multi-host
    # branch): local plans differ across hosts; the union must agree
    from cermvs_tpu.ops.rectify import (pack_plan, plan_rectification,
                                        plan_union, unpack_plan)

    loader = fake_loader(batch_size=4)
    first = next(iter(loader))
    poses_np = np.asarray(first["poses"], np.float64)
    intr_np = np.asarray(first["intrinsics"], np.float64).copy()
    intr_np[..., :2, :] /= 4
    local_plan = plan_union(
        plan_rectification(poses_np[b], intr_np[b], H // 4, W // 4)
        for b in range(poses_np.shape[0]))
    assert local_plan.ok, local_plan.reason
    if nprocs > 1:
        from jax.experimental import multihost_utils

        vecs = multihost_utils.process_allgather(pack_plan(local_plan, N - 1))
        union = plan_union(unpack_plan(v, N - 1) for v in vecs)
        np.save(os.path.join(outdir, f"plan_local{pid}.npy"),
                pack_plan(local_plan, N - 1))
        np.save(os.path.join(outdir, f"plan_union{pid}.npy"),
                pack_plan(union, N - 1))

    clear_config()
    bind_parameter("RAFT.cascade", ((4, 64, 1),))
    bind_parameter("RAFT.dtype", jax.numpy.float32)
    bind_parameter("RAFT.hyp_chunk", 4)
    from cermvs_tpu.training.train import train

    state = train(
        name=f"mh{nprocs}", batch_size=4, num_steps=3, SAVE_FREQ=10 ** 6,
        checkpoint_dir=os.path.join(outdir, f"ckpt{nprocs}_{pid}"),
        data_parallel=True, resume=False, log_every=1000,
        construction="rectified")

    leaves = [np.asarray(x).ravel()
              for x in jax.tree_util.tree_leaves(state.params)]
    flat = np.concatenate(leaves)
    np.save(os.path.join(outdir, f"params_n{nprocs}_p{pid}.npy"), flat)
    with open(os.path.join(outdir, f"done_n{nprocs}_p{pid}.json"), "w") as f:
        json.dump({"step": int(state.step),
                   "finite": bool(np.isfinite(flat).all())}, f)
    print(f"worker {pid}/{nprocs} done", flush=True)


if __name__ == "__main__":
    main()
