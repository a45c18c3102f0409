"""Multi-host distributed training launcher.

The reference has no multi-node story (single-process DataParallel,
SURVEY.md section 2).  Here training scales over a TPU pod slice with one
process per host:

    # on every host (TPU pod runtimes usually set the env automatically):
    python scripts/launch_distributed.py -g train_DTU \
        --coordinator <host0-addr>:8476 --num_processes N --process_id K

Each process loads a host-local shard of the global batch (the loader's
deterministic order is split round-robin by process id), assembles global
arrays via ``jax.make_array_from_process_local_data``, and the jitted step's
pjit-inserted all-reduce rides ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", default=None,
                        help="host0 address:port (omit on single host or "
                        "when the TPU runtime provides it)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--seed", type=int, default=1234)
    from cermvs_tpu import config as cfg

    cfg.add_cli_flags(parser)
    args = parser.parse_args()

    import jax

    if args.coordinator or args.num_processes:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    print(f"process {jax.process_index()}/{jax.process_count()} "
          f"local devices: {jax.local_device_count()} "
          f"global devices: {jax.device_count()}")

    cfg.parse_cli(args)

    import numpy as np

    np.random.seed(args.seed + jax.process_index())

    from cermvs_tpu.training.train import train

    train(seed=args.seed)


if __name__ == "__main__":
    main()
