"""Convert a reference torch checkpoint (.pth) to an orbax params directory.

The reference ships released weights as torch ``state_dict`` files
(``train_DTU.pth`` / ``train_BlendedMVS.pth``, reference ``README.md``); this
CLI maps them onto this framework's flax parameter tree
(``cermvs_tpu.utils.torch_import``) and writes a weights-only orbax
checkpoint that ``inference(ckpt=...)`` and ``train(restore=...)`` consume.

    python scripts/import_checkpoint.py train_DTU.pth checkpoints/dtu_imported

Weight-transfer correctness is covered by golden-output tests against the
reference modules run under torch-cpu (tests/test_torch_parity.py).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("pth", help="reference torch checkpoint (.pth)")
    ap.add_argument("out", help="output orbax params directory")
    ap.add_argument("--encoder-type", default="HR", choices=("HR", "LR"),
                    help="reference encoder variant (core/extractor.py)")
    ap.add_argument("--n-stages", type=int, default=2,
                    help="cascade stages in the checkpointed model")
    args = ap.parse_args(argv)

    from cermvs_tpu.training.checkpoint import save_params
    from cermvs_tpu.utils.torch_import import load_reference_checkpoint

    params = load_reference_checkpoint(
        args.pth, encoder_type=args.encoder_type, n_stages=args.n_stages)
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(params))
    save_params(args.out, params)
    print(f"wrote {n / 1e6:.2f}M params -> {args.out}")


if __name__ == "__main__":
    main()
