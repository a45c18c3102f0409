"""CLI: per-view depth inference (parity with /root/reference/inference.py CLI)."""
import argparse

from cermvs_tpu import config as cfg
from cermvs_tpu.data import get_test_data_loader
from cermvs_tpu.pipeline.inference import inference

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    cfg.add_cli_flags(parser)
    args = parser.parse_args()
    if not args.gin_config:
        args.gin_config = ["inference_DTU"]
    cfg.parse_cli(args)
    inference(get_test_data_loader())
