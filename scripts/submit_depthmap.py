"""Fan out per-(scan, rescale[, view-subset]) depth-map jobs.

Parity with ``/root/reference/scripts/submit_depthmap.py``: DTU val+test scans
at rescale {1, 2} with nf=10; TNT scans at (1, nf15) and (2, nf25) sharded
into 100-view subsets per job.
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
    parser.add_argument("--tnt_root", default="datasets/TanksAndTemples")
    args = parser.parse_args()
    if not args.gin_config:
        args.gin_config = ["submitter"]
    cfg.parse_cli(args)

    executor = submitter()

    for scale, nf in [(1, 10), (2, 10)]:
        for scan in VAL_SET + TEST_SET:
            command = (
                "python inference.py -g inference_DTU -p "
                f"'get_test_data_loader.scan = \"scan{scan}\"' "
                f"'get_test_data_loader.num_frames = {nf}' "
                f"'inference.rescale = {scale}' "
                f"'inference.output_folder = \"{OUTPUT_FOLDER}/scan{scan}\"'"
            )
            executor.name = f"scan{scan}_{scale}_{nf}"
            executor.submit(command)

    for scale, nf in [(1, 15), (2, 25)]:
        for scan in TRAINING_SET + INTERMEDIATE_SET + ADVANCED_SET:
            if scan in TRAINING_SET:
                image_folder = f"{args.tnt_root}/training_input/{scan}/images"
            elif scan in INTERMEDIATE_SET:
                image_folder = f"{args.tnt_root}/tankandtemples/intermediate/{scan}/images"
            else:
                image_folder = f"{args.tnt_root}/tankandtemples/advanced/{scan}/images"
            if not os.path.isdir(image_folder):
                continue
            n = len(os.listdir(image_folder))
            for start in range(0, n, 100):
                end = min(n, start + 100)
                command = (
                    "python inference.py -g inference_TNT -p "
                    f"'get_test_data_loader.scan = \"{scan}\"' "
                    f"'get_test_data_loader.num_frames = {nf}' "
                    f"'get_test_data_loader.subset = ({start}, {end}, 1)' "
                    f"'inference.rescale = {scale}' "
                    f"'inference.output_folder = \"{OUTPUT_FOLDER}/{scan}\"'"
                )
                executor.name = f"{scan}_{scale}_{nf}_{start}"
                executor.submit(command)
