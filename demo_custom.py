"""Custom-data demo: 3-pass scheme where a 0.5x pass writes per-view
min-depths that calibrate the later passes (parity with
/root/reference/demo_custom.py)."""
import argparse
from pathlib import Path

from cermvs_tpu import config as cfg
from cermvs_tpu.data import get_test_data_loader
from cermvs_tpu.pipeline.fusion import fusion
from cermvs_tpu.pipeline.inference import inference
from cermvs_tpu.pipeline.multires import multires

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", default="pretrained/train_BlendedMVS")
    parser.add_argument("--data", default="datasets/custom")
    cfg.add_cli_flags(parser)
    args = parser.parse_args()
    cfg.parse_cli(args)

    out = Path("results") / "custom"

    for i, (rescale, num_frames) in enumerate([(0.5, 10), (1, 15), (2, 25)]):
        extra = {} if i == 0 else {"min_dist_over_baseline": None}
        loader = get_test_data_loader(
            "Custom", dataset_path=args.data, num_frames=num_frames, **extra)
        inference(
            loader, ckpt=args.ckpt, output_folder=out, rescale=rescale,
            do_report=True,
            write_min_depth=(f"{args.data}/min_depth" if i == 0 else None))
    multires(out, suffix1="_nf15", suffix2="_nf25", visualize=True)
    loader = get_test_data_loader("Custom", dataset_path=args.data,
                                  num_frames=10,
                                  min_dist_over_baseline=None)
    fusion(loader, out, rescale=1, suffix="_nf15_nf25_th0.02")
