"""Optical-flow / KITTI disparity I/O (Middlebury .flo, KITTI 16-bit PNG).

Parity with the legacy readers in ``/root/reference/utils/frame_utils.py``
(``readFlow``/``writeFlow``/``readFlowKITTI``/``readDispKITTI``/
``writeFlowKITTI``) — unused by the MVS pipeline but part of the reference's
IO surface.
"""

from __future__ import annotations

import cv2
import numpy as np

TAG_FLOAT = 202021.25


def read_flo(path) -> np.ndarray:
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != TAG_FLOAT:
            raise ValueError(f"{path}: invalid .flo magic")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path, flow: np.ndarray) -> None:
    if flow.ndim != 3 or flow.shape[2] != 2:
        raise ValueError("flow must be (H, W, 2)")
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.array([TAG_FLOAT], np.float32).tofile(f)
        np.array([w], np.int32).tofile(f)
        np.array([h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_flow_kitti(path):
    raw = cv2.imread(str(path), cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    raw = raw[:, :, ::-1].astype(np.float32)
    flow, valid = raw[:, :, :2], raw[:, :, 2]
    flow = (flow - 2**15) / 64.0
    return flow, valid


def write_flow_kitti(path, flow: np.ndarray) -> None:
    uv = 64.0 * flow + 2**15
    valid = np.ones((*flow.shape[:2], 1))
    uv = np.concatenate([uv, valid], axis=-1).astype(np.uint16)
    cv2.imwrite(str(path), uv[..., ::-1])


def read_disp_kitti(path):
    disp = cv2.imread(str(path), cv2.IMREAD_ANYDEPTH) / 256.0
    valid = disp > 0.0
    flow = np.stack([-disp, np.zeros_like(disp)], -1)
    return flow, valid


def read_gen(path):
    """Extension-dispatched reader (``utils/frame_utils.py:121-135``)."""
    from os.path import splitext

    from cermvs_tpu.io import read_pfm_fast

    ext = splitext(str(path))[-1].lower()
    if ext in (".png", ".jpeg", ".ppm", ".jpg"):
        return cv2.imread(str(path))
    if ext in (".bin", ".raw"):
        return np.load(path)
    if ext == ".flo":
        return read_flo(path)
    if ext == ".pfm":
        f = read_pfm_fast(path).astype(np.float32)
        return f if f.ndim == 2 else f[:, :, :-1]
    return []
