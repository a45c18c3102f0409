"""CLI: adaptive-threshold point-cloud fusion (parity with /root/reference/fusion.py CLI)."""
import argparse

from cermvs_tpu import config as cfg
from cermvs_tpu.data import get_test_data_loader
from cermvs_tpu.pipeline.fusion import fusion

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    cfg.add_cli_flags(parser)
    args = parser.parse_args()
    cfg.parse_cli(args)
    fusion(get_test_data_loader())
