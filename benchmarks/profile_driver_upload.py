"""A/B: double-buffered host->device image upload in the inference driver.

Times the PRODUCTION driver (``pipeline.inference.inference`` — prep
prefetcher + software pipeline + PFM writes) over a synthetic DTU scale-1
scan, with ``device_prefetch`` on/off.  With it off, every view's ~121 MB
bf16 image stack crosses the relay inside ``submit_batch``'s dispatch;
with it on, the transfer starts in the prep thread and overlaps the
previous view's compute (ROADMAP item 6).

Run on the TPU from repo root: python benchmarks/profile_driver_upload.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import dtu_ring_poses, H, W


from cermvs_tpu.data.loader import DataLoader, Dataset


class SynthScan(Dataset):
    def __init__(self, n_refs=8, num_frames=10):
        self.num_frames = num_frames
        self.n_refs = n_refs
        rng = np.random.RandomState(0)
        n = num_frames + 1
        self.images = (rng.rand(n, H, W, 3) * 255).astype(np.float32)
        K = np.array([[2892.0 * W / 1600, 0, W / 2],
                      [0, 2892.0 * W / 1600, H / 2], [0, 0, 1]], np.float32)
        self.intr = np.tile(K, (n, 1, 1))
        self.poses = dtu_ring_poses(n, None)

    def __len__(self):
        return self.n_refs

    def __getitem__(self, i):
        return (self.images, self.poses, self.intr, [str(i)], 1.0)


def main():
    import jax
    import jax.numpy as jnp

    from cermvs_tpu.models.raft import RAFT
    from cermvs_tpu.pipeline.inference import inference

    scan = DataLoader(SynthScan(), batch_size=None, num_workers=0)
    model = RAFT(test_mode=True, hyp_chunk=8)
    s = scan.dataset[0]
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(s[0][None, :2]),
        jnp.asarray(s[1][None, :2]), jnp.asarray(s[2][None, :2]),
        jnp.ones((1,), jnp.float32))

    for dp in (False, True):
        with tempfile.TemporaryDirectory() as td:
            # first pass compiles; the second measures steady state
            inference(scan, output_folder=td, rescale=1, params=params,
                      model_kwargs=dict(hyp_chunk=8), device_prefetch=dp)
            t0 = time.perf_counter()
            inference(scan, output_folder=td, rescale=1, params=params,
                      model_kwargs=dict(hyp_chunk=8), device_prefetch=dp)
            dt = (time.perf_counter() - t0) / len(scan)
            print(f"device_prefetch={dp}: {dt*1e3:.0f} ms/view "
                  f"({1/dt:.2f} maps/s)", flush=True)


if __name__ == "__main__":
    main()
