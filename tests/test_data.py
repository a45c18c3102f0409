"""Data layer tests on synthetic on-disk fixtures (no real datasets)."""

import numpy as np
import cv2
import pytest

from cermvs_tpu.data.augment import (
    crop_operation, pad_to_multiple, random_scale_and_crop, scale_operation,
)
from cermvs_tpu.data.cams import read_cam_file
from cermvs_tpu.data.loader import DataLoader, Dataset
from cermvs_tpu.data.pairs import backfill_neighbors, load_pair, window_neighbors
from cermvs_tpu.io.pfm import write_pfm


def write_cam(path, extrinsic, intrinsic, aux=None):
    with open(path, "w") as f:
        f.write("extrinsic\n")
        for row in extrinsic:
            f.write(" ".join(str(v) for v in row) + "\n")
        f.write("\nintrinsic\n")
        for row in intrinsic:
            f.write(" ".join(str(v) for v in row) + "\n")
        f.write("\n")
        if aux is not None:
            f.write(" ".join(str(v) for v in aux) + "\n")


def test_cam_file_roundtrip(tmp_path):
    E = np.arange(16, dtype=float).reshape(4, 4)
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    write_cam(tmp_path / "c.txt", E, K, aux=[2.5, 0.01])
    e, k, aux = read_cam_file(tmp_path / "c.txt")
    np.testing.assert_array_equal(e, E)
    np.testing.assert_array_equal(k, K)
    np.testing.assert_array_equal(aux, [2.5, 0.01])


def test_load_pair_and_backfill(tmp_path):
    # 4 cameras; camera 3 has a short pair list
    content = "4\n"
    content += "0\n3 1 10.0 2 8.0 3 5.0\n"
    content += "1\n2 0 9.0 2 7.0\n"
    content += "2\n2 1 6.0 0 5.0\n"
    content += "3\n1 0 4.0\n"
    (tmp_path / "pair.txt").write_text(content)
    pairs = load_pair(tmp_path / "pair.txt")
    assert pairs["id_list"] == [0, 1, 2, 3]
    assert pairs[0]["pair"] == [1, 2, 3]
    assert pairs[0]["score"] == [10.0, 8.0, 5.0]

    # ref 3 wants 3 neighbors but has [0]; backfill walks 0's pairs: 1, 2
    nb = backfill_neighbors(pairs, 3, 3)
    assert nb == [0, 1, 2]
    # window fallback
    assert window_neighbors([0, 1, 2, 3], 1, 2) == [0, 2]


def test_random_scale_and_crop_intrinsics(rng):
    N, H, W = 2, 64, 96
    images = rng.rand(N, H, W, 3).astype(np.float32)
    depths = rng.rand(N, H, W).astype(np.float32)
    K = np.tile(np.array([[100.0, 0, 48], [0, 100.0, 32], [0, 0, 1]],
                         np.float32), (N, 1, 1))
    r = np.random.RandomState(3)
    imgs, deps, k2 = random_scale_and_crop(
        images, depths, K, crop_size=(32, 48), smin=0.0, smax=0.5, rng=r)
    assert imgs.shape == (N, 32, 48, 3)
    assert deps.shape == (N, 32, 48)
    # focal scaled by the same factors applied to the image
    assert k2[0, 0, 0] > 100.0 - 1e-5


def test_scale_and_crop_operations(rng):
    images = rng.rand(2, 40, 60, 3).astype(np.float32)
    K = np.tile(np.array([[50.0, 0, 30], [0, 50.0, 20], [0, 0, 1]],
                         np.float32), (2, 1, 1))
    im2, k2 = scale_operation(images, K, 2.0)
    assert im2.shape == (2, 80, 120, 3)
    np.testing.assert_allclose(k2[0, 0, 0], 100.0)
    np.testing.assert_allclose(k2[0, 0, 2], 60.0)

    im3, k3 = crop_operation(im2, k2, 64, 96)
    assert im3.shape == (2, 64, 96, 3)
    np.testing.assert_allclose(k3[0, 0, 2], 60.0 - (120 - 96) // 2)

    im4, k4 = pad_to_multiple(images, K, 16)
    assert im4.shape == (2, 32, 48, 3)


class _Slow(Dataset):
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32)}


def test_loader_ordering_and_batching():
    ds = _Slow(10)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=3)
    batches = list(loader)
    assert len(batches) == 5
    np.testing.assert_array_equal(batches[0]["x"][:, 0], [0, 1])
    np.testing.assert_array_equal(batches[4]["x"][:, 0], [8, 9])

    loader = DataLoader(ds, batch_size=None, shuffle=False, num_workers=2)
    samples = list(loader)
    assert len(samples) == 10
    np.testing.assert_array_equal(samples[3]["x"], [3, 3, 3])


def test_loader_shuffle_deterministic():
    ds = _Slow(8)
    l1 = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                    num_workers=2, seed=7)
    l2 = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                    num_workers=2, seed=7)
    b1 = [b["x"][:, 0].tolist() for b in l1]
    b2 = [b["x"][:, 0].tolist() for b in l2]
    assert b1 == b2
    # next epoch differs
    b3 = [b["x"][:, 0].tolist() for b in l1]
    assert b1 != b3


def test_loader_propagates_errors():
    class Bad(Dataset):
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise ValueError("boom")
            return np.zeros(1)

    loader = DataLoader(Bad(), batch_size=None, num_workers=2)
    with pytest.raises(ValueError):
        list(loader)


@pytest.fixture
def dtu_fixture(tmp_path):
    """Tiny DTU-like tree: 1 scan, 3 lights, 49 views (tiny images)."""
    root = tmp_path / "DTU"
    (root / "Cameras").mkdir(parents=True)
    rng = np.random.RandomState(0)
    K = np.array([[80.0, 0, 16], [0, 80.0, 12], [0, 0, 1]])
    pair_lines = ["49\n"]
    for i in range(49):
        E = np.eye(4)
        E[0, 3] = 0.1 * i
        write_cam(root / "Cameras" / f"{i:08d}_cam.txt", E, K, aux=[2.5, 0.01])
        nbrs = [(i + d) % 49 for d in (1, 2, 3, 4)]
        pair_lines.append(f"{i}\n")
        pair_lines.append(
            "4 " + " ".join(f"{n} {10 - j}.0" for j, n in enumerate(nbrs)) + "\n")
    (root / "Cameras" / "pair.txt").write_text("".join(pair_lines))

    for scan in ["scan113", "scan3"]:
        (root / "Rectified" / scan).mkdir(parents=True)
        (root / "Depths" / scan).mkdir(parents=True)
        for i in range(49):
            img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
            for k in range(7):
                cv2.imwrite(
                    str(root / "Rectified" / scan / f"rect_{i:03d}_{k}_r5000.png"),
                    img)
            write_pfm(root / "Depths" / scan / f"depth_map_{i:04d}.pfm",
                      (rng.rand(24, 32).astype(np.float32) * 5 + 5))
    return root


def test_dtu_train_dataset(dtu_fixture):
    from cermvs_tpu import config as cfg
    from cermvs_tpu.data.dtu import DTU

    cfg.clear_config()
    cfg.parse_config(["random_scale_and_crop.crop_size = [24, 32]"])
    ds = DTU(dataset_path=str(dtu_fixture), num_frames=3, light_number=0)
    # only scan113 is in the training split; 1 light x 49 views
    assert len(ds) == 49
    sample = ds[0]
    assert sample["images"].shape[0] == 4  # ref + 3 neighbors
    assert sample["images"].shape[3] == 3
    assert sample["depths"].shape == sample["images"].shape[:3]
    assert sample["poses"].shape == (4, 4, 4)
    assert sample["intrinsics"].shape == (4, 3, 3)
    # intrinsics scaled by image/depth ratio (=2 here)
    assert ds.image_depth_scale == 2
    cfg.clear_config()


def test_dtu_test_dataset(dtu_fixture):
    from cermvs_tpu.data.dtu import DTUTest

    ds = DTUTest(dataset_path=str(dtu_fixture), scan="scan3", num_frames=5)
    assert len(ds) == 49
    images, poses, intrinsics, names, scale = ds[7]
    assert images.shape[0] == 6
    assert names[0] == "7"
    assert scale == 1.0
    # subset selection
    ds2 = DTUTest(dataset_path=str(dtu_fixture), scan="scan3", num_frames=5,
                  subset=[5, 10])
    assert len(ds2) == 2
    assert ds2[0][3][0] == "5"


def test_loader_process_shard():
    ds = _Slow(16)
    batches_all = [
        b["x"][:, 0].tolist()
        for b in DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                            num_workers=0, seed=3)
    ]
    shards = []
    for pid in range(2):
        loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                            num_workers=0, seed=3, process_shard=(pid, 2))
        shards.append([b["x"][:, 0].tolist() for b in loader])
    # each global batch is the interleave of the two process slices
    for g, s0, s1 in zip(batches_all, shards[0], shards[1]):
        assert sorted(s0 + s1) == sorted(g)
        assert len(s0) == len(s1) == 2
