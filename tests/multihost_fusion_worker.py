"""Subprocess worker for the multi-host fusion test — NOT a test module.

Runs ``cermvs_tpu.pipeline.fusion.fusion`` under ``jax.distributed`` (2 CPU
processes): ref views split across hosts, globally-allgathered adaptive
threshold, per-host PLY shards merged by host 0.

argv: <process_id> <num_processes> <coordinator> <scene_dir> <out_dir>
"""

import os
import sys


def make_loader(scene_dir, n_views, H, W):
    import numpy as np

    data = np.load(os.path.join(scene_dir, "scene.npz"))

    class Loader:
        num_frames = 2

        def __len__(self):
            return n_views

        def __iter__(self):
            for ref in range(n_views):
                srcs = [(ref + 1) % n_views, (ref + 2) % n_views]
                order = [ref] + srcs
                yield (data["images"][order], data["Es"][order],
                       data["Ks"][order], [str(j) for j in order], 1.0)

    return Loader()


def main():
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    coord, scene_dir, outdir = sys.argv[3], sys.argv[4], sys.argv[5]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nprocs, process_id=pid)

    import numpy as np

    from cermvs_tpu.pipeline.fusion import fusion

    meta = np.load(os.path.join(scene_dir, "scene.npz"))
    n_views, H, W = (int(meta["n_views"]), int(meta["H"]), int(meta["W"]))
    loader = make_loader(scene_dir, n_views, H, W)
    out = fusion(loader, outdir, suffix="", glb=0.25, rescale=1, tot_iter=4,
                 view_batch=0)
    print(f"fusion worker {pid}/{nprocs} done: {out}", flush=True)


if __name__ == "__main__":
    main()
