"""KITTI-raw stereo dataset port tests on a fabricated raw tree."""
import os

import cv2
import numpy as np
import pytest

from selfocc_tpu.data.kitti_raw_dataset import (Kitti_Raw, Kitti_Raw_Stereo,
                                                load_raw_calibs)

DAY = "2011_09_26"
SEQ = "2011_09_26_drive_0001_sync"


def _make_raw_tree(tmp_path, n=6, step=1.0):
    root = tmp_path / "raw"
    seq_dir = root / DAY / SEQ
    for sub in ("image_02/data", "image_03/data", "velodyne_points/data"):
        os.makedirs(seq_dir / sub)
    img = (np.random.RandomState(0).rand(48, 96, 3) * 255).astype(np.uint8)
    poses_dir = tmp_path / "poses" / DAY
    os.makedirs(poses_dir)
    lines = []
    for i in range(n):
        for cam in ("image_02", "image_03"):
            cv2.imwrite(str(seq_dir / cam / "data" / f"{i:010d}.png"), img)
        pts = np.random.RandomState(i).rand(40, 4).astype(np.float32) * 8
        pts.tofile(str(seq_dir / "velodyne_points/data" / f"{i:010d}.bin"))
        T = np.eye(4)
        T[2, 3] = step * i
        lines.append(" ".join(str(v) for v in T[:3].reshape(-1)))
    with open(poses_dir / f"{SEQ}.txt", "w") as f:
        f.write("\n".join(lines) + "\n")

    with open(root / DAY / "calib_cam_to_cam.txt", "w") as f:
        f.write("P_rect_02: 60 0 48 0 0 60 24 0 0 0 1 0\n")
        f.write("P_rect_03: 60 0 48 -30 0 60 24 0 0 0 1 0\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
    with open(root / DAY / "calib_velo_to_cam.txt", "w") as f:
        f.write("R: 0 -1 0 0 0 -1 1 0 0\nT: 0 -0.1 -0.2\n")

    split = tmp_path / "split.txt"
    with open(split, "w") as f:
        for i in range(n):
            f.write(f"{DAY}/{SEQ} {i} l\n")
            f.write(f"{DAY}/{SEQ} {i} r\n")
    return str(root), str(tmp_path / "poses"), str(split)


@pytest.fixture()
def raw_ds(tmp_path):
    root, poses, split = _make_raw_tree(tmp_path)
    return Kitti_Raw_Stereo(
        root=root, pose_path=poses, split_path=split,
        frames_interval=0.4, sequence_distance=3, crop_size=(48, 96),
        cur_prob=1.0, choose_nearest=True, return_depth=True)


def test_calib_chain(tmp_path):
    root, _, _ = _make_raw_tree(tmp_path)
    calibs = load_raw_calibs(root)
    c = calibs[DAY]
    np.testing.assert_allclose(c["T_cam0_2_cam3"][0, 3], -0.5)
    assert c["P_v2cl"].shape == (4, 4)


def test_indexing_and_stereo_sides(raw_ds):
    # 6 frames x 2 stereo sides
    assert len(raw_ds.scans) == 12
    scan = raw_ds.scans[raw_ds.frame2scan[f"{DAY}/{SEQ}_3_l"]]
    assert scan["prev_frame_ids"] == [2, 1, 0]
    assert scan["next_frame_ids"] == [4, 5]


def test_getitem_and_matrices(raw_ds):
    np.random.seed(0)
    import random as _r
    _r.seed(0)
    imgs, metas = raw_ds[4]
    l2i = metas["lidar2img"][0]
    np.testing.assert_allclose(l2i @ metas["img2lidar"][0], np.eye(4),
                               atol=1e-6)
    assert imgs[0][0].shape == (48, 96, 3)
    assert "depth_loc" in metas


def test_stereo_substitution(tmp_path):
    root, poses, split = _make_raw_tree(tmp_path)
    ds = Kitti_Raw_Stereo(
        root=root, pose_path=poses, split_path=split, frames_interval=0.4,
        sequence_distance=3, crop_size=(48, 96), cur_prob=1.0,
        choose_nearest=True, include_stereo=True)
    import random as _r
    # force target_sign == 'ns' (stereo replaces prev)
    found_sub = False
    for seed in range(30):
        _r.seed(seed)
        np.random.seed(seed)
        imgs, metas = ds[4]
        if "image_03" in metas["prev_imgs_path"][0] or \
                "image_03" in metas["next_imgs_path"][0]:
            found_sub = True
            break
    assert found_sub, "stereo substitution never triggered"


def test_monocular_variant(tmp_path):
    root, poses, split = _make_raw_tree(tmp_path)
    ds = Kitti_Raw(root=root, pose_path=poses, split_path=split,
                   frames_interval=0.4, sequence_distance=3,
                   crop_size=(48, 96), cur_prob=1.0, choose_nearest=True)
    import random as _r
    _r.seed(0)
    np.random.seed(0)
    imgs, metas = ds[2]
    # monocular: prev/next always temporal frames from the same camera
    assert "image_03" not in metas["prev_imgs_path"][0]
    assert "image_03" not in metas["next_imgs_path"][0]
