"""Custom (TUM-format) dataset adapter tests on a synthetic fixture."""

import numpy as np
import cv2
import pytest
from scipy.spatial.transform import Rotation as R

from cermvs_tpu.data.custom import Custom, quat_to_matrix


def test_quat_to_matrix_matches_scipy(rng):
    for _ in range(5):
        q = rng.randn(4)
        q = q / np.linalg.norm(q)
        np.testing.assert_allclose(
            quat_to_matrix(q), R.from_quat(q).as_matrix(), atol=1e-10)


@pytest.fixture
def custom_fixture(tmp_path, rng):
    root = tmp_path / "custom"
    (root / "images").mkdir(parents=True)
    n = 8
    rows = []
    for i in range(n):
        img = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "images" / f"frame_{i:04d}.jpg"), img)
        q = rng.randn(4)
        q = q / np.linalg.norm(q)
        t = [0.5 * i, 0.0, 0.0]
        rows.append([float(i)] + t + q.tolist())
    np.savetxt(root / "cams.txt", np.asarray(rows))
    K = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]])
    np.savetxt(root / "intrinsic.txt", K)
    return root


def test_custom_dataset_baseline_scale(custom_fixture):
    ds = Custom(dataset_path=str(custom_fixture), num_frames=4)
    assert len(ds) == 8
    images, poses, intrinsics, names, scale = ds[4]
    assert images.shape[0] == 5  # ref + 4 window neighbors
    assert poses.shape == (5, 4, 4)
    # mean baseline is 0.5 -> min_depth = 0.5 -> scale = 800
    np.testing.assert_allclose(scale, 400.0 / 0.5, rtol=1e-6)
    # poses are world-to-camera (inverted c2w)
    assert names[0] == "frame_0004"


def test_custom_dataset_min_depth_files(custom_fixture):
    (custom_fixture / "min_depth").mkdir()
    for i in range(8):
        (custom_fixture / "min_depth" / f"frame_{i:04d}.txt").write_text("2.0\n")
    ds = Custom(dataset_path=str(custom_fixture), num_frames=2,
                min_dist_over_baseline=None)
    *_, scale = ds[3]
    np.testing.assert_allclose(scale, 200.0)


def test_custom_window_edges(custom_fixture):
    ds = Custom(dataset_path=str(custom_fixture), num_frames=4)
    # first and last index still produce full windows inside bounds
    for idx in [0, 7]:
        images, poses, _, names, _ = ds[idx]
        assert images.shape[0] == 5
        assert len(set(names)) == 5
