"""End-to-end demo: DTU scan3 + TNT Ignatius/Meetingroom reconstruction
(parity with /root/reference/demo.py — the de-facto integration test)."""
import argparse
from pathlib import Path

from cermvs_tpu import config as cfg
from cermvs_tpu.data import get_test_data_loader
from cermvs_tpu.pipeline.fusion import fusion
from cermvs_tpu.pipeline.inference import inference
from cermvs_tpu.pipeline.multires import multires

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtu_ckpt", default="pretrained/train_DTU")
    parser.add_argument("--blended_ckpt", default="pretrained/train_BlendedMVS")
    cfg.add_cli_flags(parser)
    args = parser.parse_args()
    cfg.parse_cli(args)

    output_folder = Path("results")

    for scan in ["scan3"]:
        for rescale, num_frames in [(1, 10), (2, 10)]:
            loader = get_test_data_loader("DTUTest", scan=scan,
                                          num_frames=num_frames)
            inference(loader, ckpt=args.dtu_ckpt,
                      output_folder=output_folder / scan, rescale=rescale,
                      do_report=True)
        multires(output_folder / scan, suffix1="_nf10", suffix2="_nf10",
                 visualize=True)
        loader = get_test_data_loader("DTUTest", scan=scan, num_frames=10)
        fusion(loader, output_folder / scan, rescale=2,
               suffix="_nf10_nf10_th0.02")

    for scan in ["Ignatius", "Meetingroom"]:
        for rescale, num_frames in [(1, 15), (2, 25)]:
            loader = get_test_data_loader("TNT", scan=scan,
                                          num_frames=num_frames)
            inference(loader, ckpt=args.blended_ckpt,
                      output_folder=output_folder / scan, rescale=rescale,
                      do_report=True)
        multires(output_folder / scan, suffix1="_nf15", suffix2="_nf25",
                 visualize=True)
        loader = get_test_data_loader("TNT", scan=scan, num_frames=10)
        fusion(loader, output_folder / scan, rescale=1,
               suffix="_nf15_nf25_th0.02")
