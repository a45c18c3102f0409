"""Tanks and Temples test adapter.

Re-implementation of ``/root/reference/datasets/tnt.py``: training /
intermediate / advanced splits resolve to different directory layouts, BFS
neighbor backfill with a sliding-window fallback for empty pair lists, and
scene scale ``400 / min_depth`` read from the camera file's aux row
(``tnt.py:74-76``) — aligning stage-0's hypothesis range (slab up to
1/400-spaced inverse depths) with the scene's near plane.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from cermvs_tpu.config import configurable
from cermvs_tpu.data.cams import read_cam_file
from cermvs_tpu.data.loader import Dataset
from cermvs_tpu.data.pairs import backfill_neighbors, load_pair, window_neighbors

TRAINING_SET = ["Barn", "Truck", "Caterpillar", "Ignatius", "Meetingroom",
                "Church", "Courthouse"]
INTERMEDIATE_SET = ["Family", "Francis", "Horse", "Lighthouse", "M60",
                    "Panther", "Playground", "Train"]
ADVANCED_SET = ["Auditorium", "Ballroom", "Courtroom", "Museum", "Palace",
                "Temple"]


@configurable("TNT")
class TNT(Dataset):
    def __init__(self, dataset_path="datasets/TanksAndTemples", scan=None,
                 num_frames=None, subset=None):
        self.scan = scan
        if scan in TRAINING_SET:
            self.root = Path(dataset_path) / "training_input" / scan
        elif scan in INTERMEDIATE_SET:
            self.root = Path(dataset_path) / "tankandtemples" / "intermediate" / scan
        else:
            self.root = Path(dataset_path) / "tankandtemples" / "advanced" / scan
        self.num_frames = num_frames
        self.pair_list = load_pair(self.root / "pair.txt")
        ids = self.pair_list["id_list"]
        self.index = list(range(len(ids))) if subset is None else list(subset)

    def __len__(self):
        return len(self.index)

    def __getitem__(self, index0):
        index = self.index[index0]
        ref_id = self.pair_list["id_list"][index]
        if self.pair_list[ref_id]["pair"]:
            neighbors = backfill_neighbors(self.pair_list, ref_id, self.num_frames)
        else:
            neighbors = window_neighbors(
                self.pair_list["id_list"], index, self.num_frames)

        names = [f"{ref_id:08d}"] + [f"{x:08d}" for x in neighbors]
        images, poses, intrinsics = [], [], []
        for name in names:
            img = cv2.imread(str(self.root / "images" / f"{name}.jpg"))
            if img is None:
                raise FileNotFoundError(self.root / "images" / f"{name}.jpg")
            e, k, _ = read_cam_file(self.root / "cams" / f"{name}_cam.txt")
            images.append(img.astype(np.float32))
            poses.append(e)
            intrinsics.append(k)
        _, _, aux = read_cam_file(self.root / "cams" / f"{names[0]}_cam.txt")
        scale = 400.0 / aux[0]

        images = np.stack(images)
        poses = np.stack(poses).astype(np.float32)
        intrinsics = np.stack(intrinsics).astype(np.float32)
        return images, poses, intrinsics, names, float(scale)
