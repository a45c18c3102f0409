"""CLI: multi-resolution depth merge (parity with /root/reference/multires.py CLI)."""
import argparse

from cermvs_tpu import config as cfg
from cermvs_tpu.pipeline.multires import multires

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    cfg.add_cli_flags(parser)
    args = parser.parse_args()
    cfg.parse_cli(args)
    multires()
