"""Import reference (torch) checkpoints into this framework's parameter tree.

Maps the reference's ``state_dict`` layout (``core/raft.py`` module names:
``fnet.*``, ``cnet.*``, ``update_block.corr_encoder.*`` / ``gru.*`` /
``delta{i}.*``) onto the flax parameter tree, transposing conv kernels from
torch's (O, I, kh, kw) to flax's (kh, kw, I, O).  Enables running the
reference's released ``train_DTU.pth`` / ``train_BlendedMVS.pth`` weights
without retraining, and powers golden-output parity tests against the
reference modules executed under torch-cpu.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def _conv(sd, torch_name):
    w = np.asarray(sd[f"{torch_name}.weight"]).transpose(2, 3, 1, 0)
    out = {"kernel": w}
    b = sd.get(f"{torch_name}.bias")
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _residual_block(sd, prefix, has_downsample):
    out = {
        "Conv_0": _conv(sd, f"{prefix}.conv1"),
        "Conv_1": _conv(sd, f"{prefix}.conv2"),
    }
    if has_downsample:
        out["Conv_2"] = _conv(sd, f"{prefix}.downsample.0")
    return out


def convert_encoder(sd, prefix: str, enc_type: str = "HR") -> Dict:
    """fnet/cnet BasicEncoder (``core/extractor.py:62-155``)."""
    out = {
        "Conv_0": _conv(sd, f"{prefix}.conv1"),
        "ResidualBlock_0": _residual_block(sd, f"{prefix}.layer1.0", False),
        "ResidualBlock_1": _residual_block(sd, f"{prefix}.layer1.1", False),
        "ResidualBlock_2": _residual_block(sd, f"{prefix}.layer2.0", True),
        "ResidualBlock_3": _residual_block(sd, f"{prefix}.layer2.1", False),
    }
    n = 4
    if enc_type == "LR":
        out["ResidualBlock_4"] = _residual_block(sd, f"{prefix}.layer3.0", True)
        out["ResidualBlock_5"] = _residual_block(sd, f"{prefix}.layer3.1", False)
        n = 6
    out["Conv_1"] = _conv(sd, f"{prefix}.conv2")
    return out


def convert_update_block(sd, prefix: str = "update_block",
                         n_stages: int = 2,
                         share_corr: bool = True, share_gru: bool = True,
                         share_delta: bool = False) -> Dict:
    """UpdateBlock (``core/update.py:28-120``): Sequential indices 0/2 are
    the two convs of each two-conv head."""
    out = {}

    def two_conv(torch_base):
        return {"conv1": _conv(sd, f"{torch_base}.0"),
                "conv2": _conv(sd, f"{torch_base}.2")}

    def gru(torch_base):
        return {k: _conv(sd, f"{torch_base}.{k}")
                for k in ("convz", "convr", "convq")}

    for flax_base, shared, make in [
        ("corr_encoder", share_corr, two_conv),
        ("gru", share_gru, gru),
        ("delta", share_delta, two_conv),
    ]:
        if shared:
            out[flax_base] = make(f"{prefix}.{flax_base}")
        else:
            for i in range(n_stages):
                out[f"{flax_base}{i}"] = make(f"{prefix}.{flax_base}{i}")
    return out


def convert_raft(state_dict, encoder_type: str = "HR",
                 n_stages: int = 2) -> Dict:
    """Full reference checkpoint -> flax params {'params': ...}.

    Accepts a raw ``state_dict`` (possibly with a ``module.`` DataParallel
    prefix, ``inference.py:31-35``).
    """
    sd = {k[7:] if k.startswith("module.") else k: v
          for k, v in state_dict.items()}
    return {
        "params": {
            "fnet": convert_encoder(sd, "fnet", encoder_type),
            "cnet": convert_encoder(sd, "cnet", encoder_type),
            "update_block": convert_update_block(sd, n_stages=n_stages),
        }
    }


def load_reference_checkpoint(path, **kwargs) -> Dict:
    """Load a reference ``.pth`` and convert (torch-cpu is available)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_raft(sd, **kwargs)
