"""CLI: train the cascaded RAFT model (parity with /root/reference/train.py CLI)."""
import argparse

import numpy as np

from cermvs_tpu import config as cfg
from cermvs_tpu.training.train import train

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=1234)
    cfg.add_cli_flags(parser)
    args = parser.parse_args()
    cfg.parse_cli(args)
    np.random.seed(args.seed)
    train(seed=args.seed)
