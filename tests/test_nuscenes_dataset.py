"""nuScenes dataset port tests on a fabricated mini-pkl + tiny images.

Validates the geometric contracts the reference checks visually
(``dataset_one_frame_sweeps_dist.py:447-547``): matrix consistency of
img2lidar/lidar2img, img2prevImg chaining, ego-centric rebase, neighbor-window
construction, and the wrapper's canonical batch layout.
"""
import math
import os
import pickle

import cv2
import numpy as np
import pytest

from selfocc_tpu.data.nuscenes_dataset import (SENSOR_TYPES,
                                               get_img2global,
                                               get_lidar2global,
                                               nuScenes_One_Frame_Sweeps_Dist,
                                               quaternion_to_rotmat)
from selfocc_tpu.data.wrapper import TemporalDatasetWrapper


def _yaw_quat(yaw):
    return [math.cos(yaw / 2), 0.0, 0.0, math.sin(yaw / 2)]


def _make_mini_nuscenes(tmp_path, n_samples=6, step=2.0, with_lidar=False,
                        with_occ3d=False, with_openocc=False):
    """Fabricate an on-disk nuScenes-format mini dataset: images + infos pkl,
    optionally lidar sweeps (``samples/lidar_*.bin``, the ``return_depth``
    GT source), Occ3D ``gts/<scene>/<token>/labels.npz`` and OpenOccupancy
    ``scene_<token>/occupancy/<lidar_token>.npy`` label trees — the exact
    real-data layouts ``eval_iou.py`` consumes (reference eval_iou.py:26-41).
    Returns ``(data_path, pkl_path, label_roots)``."""
    root = tmp_path / "nusc"
    os.makedirs(root / "samples", exist_ok=True)
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
    label_roots = {}
    if with_occ3d:
        label_roots["occ3d_root"] = str(root / "occ3d")
    if with_openocc:
        label_roots["openocc_root"] = str(root / "openocc")

    scene = []
    for i in range(n_samples):
        ego_t = [step * i, 0.0, 0.0]
        data = {}
        for ci, cam in enumerate(SENSOR_TYPES):
            fname = f"samples/{cam}_{i}.jpg"
            cv2.imwrite(str(root / fname), img)
            data[cam] = {
                "filename": fname,
                "calib": {
                    "camera_intrinsic": [[80.0, 0, 48], [0, 80.0, 32],
                                         [0, 0, 1]],
                    "rotation": _yaw_quat(2 * math.pi * ci / 6),
                    "translation": [0.5, 0.0, 1.6],
                },
                "pose": {"rotation": _yaw_quat(0.0), "translation": ego_t},
            }
        data["LIDAR_TOP"] = {
            "filename": f"samples/lidar_{i}.bin",
            "token": f"lidartok{i}",
            "calib": {"rotation": _yaw_quat(0.0),
                      "translation": [0.9, 0.0, 1.8]},
            "pose": {"rotation": _yaw_quat(0.0), "translation": ego_t},
        }
        if with_lidar:
            # a ring of points 3-8 m out — projects into the surround rig
            # with camera depth in (1, 80) so the eval mask is non-empty
            n_pts = 256
            ang = rng.rand(n_pts) * 2 * math.pi
            r = 3.0 + 5.0 * rng.rand(n_pts)
            pts = np.stack([r * np.cos(ang), r * np.sin(ang),
                            rng.rand(n_pts) * 2 - 1, np.ones(n_pts),
                            rng.rand(n_pts)], 1).astype(np.float32)
            pts.tofile(str(root / f"samples/lidar_{i}.bin"))
        if with_occ3d:
            d = root / "occ3d" / "scene0" / f"tok{i}"
            os.makedirs(d, exist_ok=True)
            sem = np.full((200, 200, 16), 17, np.uint8)   # 17 = free
            occ_mask = rng.rand(200, 200, 16) < 0.02
            sem[occ_mask] = rng.randint(1, 17, occ_mask.sum()).astype(np.uint8)
            np.savez_compressed(
                str(d / "labels.npz"), semantics=sem,
                mask_camera=(rng.rand(200, 200, 16) < 0.8).astype(np.uint8),
                mask_lidar=(rng.rand(200, 200, 16) < 0.8).astype(np.uint8))
        if with_openocc:
            d = root / "openocc" / "scene_scene0" / "occupancy"
            os.makedirs(d, exist_ok=True)
            # coords sized for the tiny eval grid (102,102,8) = the real
            # 512x512x40 layout at --resolution 1.0; 4th column = class
            coords = np.stack([rng.randint(0, 102, 300),
                               rng.randint(0, 102, 300),
                               rng.randint(0, 8, 300),
                               rng.randint(1, 17, 300)], 1).astype(np.int64)
            np.save(str(d / f"lidartok{i}.npy"), coords)
        scene.append({"token": f"tok{i}", "timestamp": i * 0.5, "data": data})

    infos = {"scene0": scene}
    keyframes = [("scene0", i) for i in range(n_samples)]
    pkl_path = tmp_path / "mini_infos.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"infos": infos, "metadata": keyframes}, f)
    return str(root) + "/", str(pkl_path), label_roots


@pytest.fixture()
def mini_ds(tmp_path):
    data_path, pkl, _ = _make_mini_nuscenes(tmp_path)
    return nuScenes_One_Frame_Sweeps_Dist(
        data_path=data_path, imageset=pkl, crop_size=[64, 96],
        min_dist=0.4, max_dist=5.0, strict=True, cur_prob=1.0,
        composite_prev_next=True, sensor_mus=[0.5, 0.5], sensor_sigma=0.5,
        ego_centric=True)


def test_neighbor_windows(mini_ds):
    scene = mini_ds.scene_infos["scene0"]
    # step=2.0, window (0.4, 5.0] -> samples at +-2, +-4 meters qualify
    s2 = scene[2]
    assert [j for _, j in s2["prev_samples"]] == [1, 0]
    assert [j for _, j in s2["next_samples"]] == [3, 4]
    np.testing.assert_allclose(s2["prev_dists"], [2.0, 4.0])


def test_matrix_consistency(mini_ds):
    np.random.seed(0)
    imgs, metas = mini_ds[2]
    l2i = metas["lidar2img"]
    i2l = metas["img2lidar"]
    for n in range(6):
        np.testing.assert_allclose(l2i[n] @ i2l[n], np.eye(4), atol=1e-8)
    # ego-centric: ego2lidar must be identity after rebase
    np.testing.assert_allclose(metas["ego2lidar"], np.eye(4))


def test_img2previmg_chain(tmp_path):
    """Projecting a world point through cam at t then img2prevImg must equal
    projecting it directly through the prev camera."""
    data_path, pkl, _ = _make_mini_nuscenes(tmp_path)
    ds = nuScenes_One_Frame_Sweeps_Dist(
        data_path=data_path, imageset=pkl, crop_size=[64, 96],
        min_dist=0.4, max_dist=5.0, strict=True, cur_prob=1.0,
        choose_nearest=True, composite_prev_next=False)
    np.random.seed(1)
    imgs, metas = ds[2]

    scene = ds.scene_infos["scene0"]
    info, prev_info = scene[2], scene[1]
    cam = SENSOR_TYPES[0]
    img2global_curr = get_img2global(info["data"][cam]["calib"],
                                     info["data"][cam]["pose"])
    img2global_prev = get_img2global(prev_info["data"][cam]["calib"],
                                     prev_info["data"][cam]["pose"])
    expected = np.linalg.inv(img2global_prev) @ img2global_curr
    np.testing.assert_allclose(metas["img2prevImg"][0], expected, atol=1e-8)

    # homogeneous pixel at depth t -> prev pixel sanity (finite + z>0 path)
    pix = np.array([40.0 * 8, 30.0 * 8, 8.0, 1.0])  # (u*t, v*t, t, 1)
    prev = metas["img2prevImg"][0] @ pix
    assert np.isfinite(prev).all()


def test_wrapper_batch_layout(mini_ds):
    np.random.seed(2)
    w = TemporalDatasetWrapper(mini_ds, phase="train", scale_rate=0.5,
                               photometric_aug=dict(use_swap_channel=False))
    b = w[2]
    assert b["imgs"].shape == (1, 6, 32, 64, 3)       # scaled 0.5, pad/32
    assert b["curr_imgs"].shape == (1, 6, 64, 96, 3)
    assert b["curr_imgs"].max() <= 1.0                # divided by 256
    assert b["lidar2img"].shape == (1, 6, 4, 4)
    assert b["img2prevImg"].shape == (1, 6, 4, 4)
    assert b["imgs"].dtype == np.float32


def test_quaternion_to_rotmat():
    q = _yaw_quat(math.pi / 2)
    R = quaternion_to_rotmat(q)
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-9)


def test_prefetcher_order_and_exceptions():
    """BatchPrefetcher preserves order and re-raises worker exceptions at the
    consumer."""
    import pytest
    from selfocc_tpu.data.prefetch import BatchPrefetcher

    out = list(BatchPrefetcher(lambda x: x * 2, list(range(20)), depth=3))
    assert out == [x * 2 for x in range(20)]

    def boom(x):
        if x == 3:
            raise ValueError("bad sample")
        return x

    it = BatchPrefetcher(boom, list(range(6)), depth=2)
    got = []
    with pytest.raises(ValueError, match="bad sample"):
        for v in it:
            got.append(v)
    assert got == [0, 1, 2]
