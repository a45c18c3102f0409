"""MVSNet camera-file reading (extrinsic 4x4, intrinsic 3x3, aux row).

File layout (used identically by DTU/BlendedMVS/TNT in the reference via
``np.loadtxt(skiprows=...)``, e.g. ``datasets/dtu.py:56-58``,
``datasets/tnt.py:68-76``):

    extrinsic
    <4x4 world-to-camera>
    (blank)
    intrinsic
    <3x3 K>
    (blank)
    <depth_min [interval [num_depth [depth_max]]]>   # aux row (line 11)
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def read_cam_file(path) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    with open(path) as f:
        lines = f.readlines()
    extrinsic = np.array(
        [[float(v) for v in lines[r].split()] for r in range(1, 5)], np.float64)
    intrinsic = np.array(
        [[float(v) for v in lines[r].split()] for r in range(7, 10)], np.float64)
    aux = None
    if len(lines) > 11 and lines[11].strip():
        aux = np.array([float(v) for v in lines[11].split()], np.float64)
    return extrinsic, intrinsic, aux
