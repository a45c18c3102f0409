"""End-to-end pipeline at production scale on real hardware, synthetic data.

Builds a DTU-shaped synthetic scan (textured plane, known geometry), runs the
REAL pipeline — inference at rescale 1 and 2, multires merge, adaptive fusion
— through the same code paths as demo.py, with randomly initialized weights
(no pretrained checkpoints exist in this environment).  Validates memory
behavior, the shape-bucketed jit cache, and the file contract at full scale.

    python examples/e2e_synthetic.py [--views 6] [--size 1152 1600]
"""

import argparse
import functools
print = functools.partial(print, flush=True)  # timeouts must not eat buffered output
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class SyntheticScan:
    """DTU-test-protocol dataset: textured plane at known depth."""

    def __init__(self, n_views, H, W, num_frames, Z=600.0):
        import jax.numpy as jnp
        from cermvs_tpu.ops.geometry import pixel_coords_of_hypotheses
        from cermvs_tpu.ops.sampling import bilinear_sample

        self.num_frames = num_frames
        self.n = n_views
        rng = np.random.RandomState(0)
        K = np.array([[2892.0 * W / 1600, 0, W / 2],
                      [0, 2892.0 * W / 1600, H / 2], [0, 0, 1]], np.float32)
        self.K = K
        tex = rng.rand(H, W, 3).astype(np.float32) * 255
        for _ in range(2):
            tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
                   + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)) / 5
        poses = np.tile(np.eye(4, dtype=np.float32), (n_views, 1, 1))
        for v in range(1, n_views):
            poses[v, 0, 3] = 15.0 * v * (1 if v % 2 else -1)
            poses[v, 1, 3] = 7.0 * (v % 3)
        self.poses = poses
        self.images = np.zeros((n_views, H, W, 3), np.float32)
        self.images[0] = tex
        for v in range(1, n_views):
            back = np.asarray(pixel_coords_of_hypotheses(
                jnp.asarray(poses[None]), jnp.asarray(np.tile(K, (1, n_views, 1, 1))),
                jnp.array([v]), jnp.array([0]),
                jnp.full((1, 1, 1, H, W), 1.0 / Z)))[0, 0, 0]
            self.images[v] = np.asarray(
                bilinear_sample(jnp.asarray(tex), jnp.asarray(back)))

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        ids = [i] + [j for j in range(self.n) if j != i][: self.num_frames]
        return (
            np.stack([self.images[j] for j in ids]),
            np.stack([self.poses[j] for j in ids]),
            np.tile(self.K, (len(ids), 1, 1)),
            [str(j) for j in ids],
            1.0,
        )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--views", type=int, default=6)
    parser.add_argument("--size", type=int, nargs=2, default=[1152, 1600])
    parser.add_argument("--num_frames", type=int, default=3)
    parser.add_argument("--out", default="results/e2e_synthetic")
    parser.add_argument("--cpu", action="store_true",
                        help="run on the CPU backend (default targets the "
                             "real TPU through the axon tunnel — do NOT run "
                             "two TPU jobs concurrently, DEVNOTES.md)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    from cermvs_tpu.data.loader import DataLoader
    from cermvs_tpu.models.raft import RAFT
    from cermvs_tpu.pipeline.fusion import fusion
    from cermvs_tpu.pipeline.inference import inference
    from cermvs_tpu.pipeline.multires import multires

    H, W = args.size
    nf = args.num_frames
    out = Path(args.out)

    scan = SyntheticScan(args.views, H, W, nf)
    model = RAFT(test_mode=True, hyp_chunk=8)
    sample = scan[0]
    import jax.numpy as jnp

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(sample[0])[None],
        jnp.asarray(sample[1])[None], jnp.asarray(sample[2])[None],
        jnp.ones(1))

    for rescale in (1, 2):
        tic = time.time()
        loader = DataLoader(scan, batch_size=None, num_workers=2)
        inference(loader, params=params, output_folder=out, rescale=rescale,
                  do_report=True)
        print(f"rescale {rescale}: {time.time() - tic:.1f}s total")

    multires(out, suffix1=f"_nf{nf}", suffix2=f"_nf{nf}", visualize=True)
    loader = DataLoader(scan, batch_size=None, num_workers=2)
    ply = fusion(loader, out, rescale=2, suffix=f"_nf{nf}_nf{nf}_th0.02",
                 tot_iter=4)
    print("wrote", ply)


if __name__ == "__main__":
    main()
