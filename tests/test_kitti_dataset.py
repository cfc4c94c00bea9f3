"""KITTI dataset port tests on a fabricated mini KITTI-odometry tree."""
import os

import cv2
import numpy as np
import pytest

from selfocc_tpu.data.kitti_dataset import (Kitti_One_Frame, TRANSXY,
                                            read_calib, read_poses)


def _make_mini_kitti(tmp_path, n_frames=8, step=1.0, with_voxels=False,
                     img_hw=(60, 120)):
    """Fabricate an on-disk SemanticKITTI-odometry mini tree. With
    ``with_voxels`` also writes ``voxels/{fid}.bin/.label/.invalid`` every 5
    frames (the real dataset's completion-GT cadence — the val split indexes
    by those, and ``eval_iou_kitti`` reads the label/invalid pair)."""
    root = tmp_path / "kitti"
    seq = "00"
    seq_dir = root / "dataset" / "sequences" / seq
    os.makedirs(seq_dir / "image_2")
    os.makedirs(seq_dir / "velodyne")
    os.makedirs(root / "dataset" / "poses")
    if with_voxels:
        os.makedirs(seq_dir / "voxels")

    img = (np.random.RandomState(0).rand(*img_hw, 3) * 255).astype(np.uint8)
    poses = []
    for i in range(n_frames):
        cv2.imwrite(str(seq_dir / "image_2" / f"{i:06d}.png"), img)
        pts = np.random.RandomState(i).rand(50, 4).astype(np.float32) * 10
        pts.tofile(str(seq_dir / "velodyne" / f"{i:06d}.bin"))
        if with_voxels and i % 5 == 0:
            rng = np.random.RandomState(100 + i)
            occ = (rng.rand(256 * 256 * 32) < 0.02).astype(np.uint8)
            np.packbits(occ).tofile(str(seq_dir / "voxels" / f"{i:06d}.bin"))
            # raw semantic-kitti label ids (pre-LEARNING_MAP remap)
            raw_ids = np.array([0, 10, 11, 30, 40, 48, 50, 70, 80],
                               np.uint16)
            label = raw_ids[rng.randint(0, len(raw_ids), 256 * 256 * 32)]
            (label * occ).astype(np.uint16).tofile(
                str(seq_dir / "voxels" / f"{i:06d}.label"))
            invalid = (rng.rand(256 * 256 * 32) < 0.1).astype(np.uint8)
            np.packbits(invalid).tofile(
                str(seq_dir / "voxels" / f"{i:06d}.invalid"))
        T = np.eye(4)
        T[2, 3] = step * i  # cam0 z-forward motion
        poses.append(T)
    with open(root / "dataset" / "poses" / f"{seq}.txt", "w") as f:
        for T in poses:
            f.write(" ".join(str(v) for v in T[:3].reshape(-1)) + "\n")
    with open(seq_dir / "calib.txt", "w") as f:
        P2 = "P2: 70 0 60 -3.5 0 70 30 0 0 0 1 0"
        Tr = "Tr: 0 -1 0 0 0 0 -1 1.6 1 0 0 -0.3"
        f.write(P2 + "\n" + Tr + "\n")
    return str(root)


@pytest.fixture()
def kitti_ds(tmp_path):
    root = _make_mini_kitti(tmp_path)
    return Kitti_One_Frame(
        split="train", data_path=root, sequences=["00"],
        frames_interval=0.4, sequence_distance=4, crop_size=(60, 120),
        cur_prob=1.0, choose_nearest=True)


def test_indexing_and_neighbors(kitti_ds):
    assert len(kitti_ds) == 8
    scan = kitti_ds.scans[4]
    # 1 m steps, window (0.4, 4.0]: -1..-4 and +1..+3 qualify
    assert scan["prev_frame_ids"] == ["000003", "000002", "000001", "000000"]
    assert scan["next_frame_ids"] == ["000005", "000006", "000007"]
    np.testing.assert_allclose(scan["prev_dists"], [1, 2, 3, 4])


def test_matrix_chain(kitti_ds):
    np.random.seed(0)
    imgs, metas = kitti_ds[4]
    l2i = metas["lidar2img"][0]
    i2l = metas["img2lidar"][0]
    np.testing.assert_allclose(l2i @ i2l, np.eye(4), atol=1e-7)
    # temImg2lidar of the current frame as its own anchor must equal img2lidar
    np.testing.assert_allclose(metas["temImg2lidar"][0], i2l, atol=1e-7)
    assert imgs[0][0].shape == (60, 120, 3)


def test_depth_from_lidar(kitti_ds):
    np.random.seed(0)
    scan = kitti_ds.scans[4]
    metas = kitti_ds.prepare_img_metas(scan, scan, 0, 0)
    loc, depth, mask = kitti_ds.get_depth_from_lidar(
        scan["lid_path"], metas["lidar2img"], [60, 120])
    assert loc.shape[-1] == 2 and depth.shape == mask.shape
    if mask.sum() > 0:
        assert (loc[mask] >= 0).all() and (loc[mask] <= 1).all()
        assert (depth[mask] > 0).all()


def test_calib_parser(tmp_path):
    root = _make_mini_kitti(tmp_path)
    calib = read_calib(os.path.join(root, "dataset", "sequences", "00",
                                    "calib.txt"))
    assert calib["P2"].shape == (3, 4)
    np.testing.assert_allclose(calib["T_cam0_2_cam2"][0, 3], -3.5 / 70)
    poses = read_poses(os.path.join(root, "dataset", "poses", "00.txt"))
    assert len(poses) == 8 and poses[3][2, 3] == 3.0
