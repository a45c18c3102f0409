"""Fan out per-scan multires + fusion jobs.

Parity with ``/root/reference/scripts/submit_fusion.py``: one job per scan
running the multi-resolution merge followed by adaptive-threshold fusion.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cermvs_tpu import config as cfg
from cermvs_tpu.data.dtu import TEST_SET, VAL_SET
from cermvs_tpu.data.tnt import ADVANCED_SET, INTERMEDIATE_SET, TRAINING_SET
from scripts.submitter import submitter

OUTPUT_FOLDER = "results"

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    cfg.add_cli_flags(parser)
    args = parser.parse_args()
    if not args.gin_config:
        args.gin_config = ["submitter"]
    cfg.parse_cli(args)

    executor = submitter()

    for scan in VAL_SET + TEST_SET:
        command = (
            f"python multires.py -g inference_DTU -p "
            f"'multires.output_folder = \"{OUTPUT_FOLDER}/scan{scan}\"' && "
            f"python fusion.py -g inference_DTU -p "
            f"'get_test_data_loader.scan = \"scan{scan}\"' "
            f"'fusion.output_folder = \"{OUTPUT_FOLDER}/scan{scan}\"'"
        )
        executor.name = f"fusion_scan{scan}"
        executor.submit(command)

    for scan in TRAINING_SET + INTERMEDIATE_SET + ADVANCED_SET:
        command = (
            f"python multires.py -g inference_TNT -p "
            f"'multires.output_folder = \"{OUTPUT_FOLDER}/{scan}\"' && "
            f"python fusion.py -g inference_TNT -p "
            f"'get_test_data_loader.scan = \"{scan}\"' "
            f"'fusion.output_folder = \"{OUTPUT_FOLDER}/{scan}\"'"
        )
        executor.name = f"fusion_{scan}"
        executor.submit(command)
