"""Eval drivers must score the VAL split through the val pipeline.

The reference evaluates ``val_dataset_loader`` (``eval_iou.py:99-168``) built
from ``val_dataset_config`` + the val wrapper (no PhotoMetric/flip), after
``modify_for_eval`` forces ``strict=False, cur_prob=1, return_depth=True``
(``utils/config_tools.py:10-67``). These tests pin the factory's ``phase='val'``
path to those semantics (VERDICT r2 missing #1) and that every KITTI dataset
type constructs through the factory (missing #2).
"""
import dataclasses
import os

import numpy as np
import pytest

from selfocc_tpu.configs.experiments import get_config
from selfocc_tpu.data import EVAL_OVERRIDES, build_dataset
from selfocc_tpu.data.transforms import (PhotoMetricDistortionMultiViewImage,
                                         RandomFlip)

from test_kitti_dataset import _make_mini_kitti
from test_kitti_raw_dataset import _make_raw_tree
from test_nuscenes_dataset import _make_mini_nuscenes


def _mini_nusc_with_lidar(tmp_path):
    data_path, pkl, _ = _make_mini_nuscenes(tmp_path)
    for i in range(6):
        pts = np.random.RandomState(i).rand(64, 5).astype(np.float32) * 12
        pts.tofile(os.path.join(data_path, f"samples/lidar_{i}.bin"))
    return data_path, pkl


def _nusc_cfg(tmp_path):
    cfg = get_config("nuscenes_occ")
    data_path, pkl = _mini_nusc_with_lidar(tmp_path)
    local = dict(data_path=data_path, imageset=pkl, crop_size=[64, 96],
                 min_dist=0.4, max_dist=5.0)
    return dataclasses.replace(
        cfg,
        train_dataset_args=dict(cfg.train_dataset_args, **local),
        val_dataset_args=dict(cfg.val_dataset_args, **local))


def test_val_phase_builds_val_pipeline(tmp_path):
    cfg = _nusc_cfg(tmp_path)
    w = build_dataset(cfg, phase="val")
    ds = w.dataset
    # modify_for_eval semantics
    assert ds.strict is False
    assert ds.cur_prob == 1.0
    assert ds.return_depth is True
    # val wrapper: no stochastic augmentation in the pipeline
    assert not any(isinstance(t, (PhotoMetricDistortionMultiViewImage,
                                  RandomFlip)) for t in w.transforms)
    b = w[2]
    assert "depth_loc" in b           # return_depth flowed through
    assert b["imgs"].dtype == np.float32


def test_train_phase_uses_reference_train_args(tmp_path):
    cfg = _nusc_cfg(tmp_path)
    w = build_dataset(cfg, phase="train")
    ds = w.dataset
    # reference config/nuscenes/nuscenes_occ.py train_dataset_config
    assert ds.strict is True
    assert ds.cur_prob == pytest.approx(0.333)
    assert ds.return_depth is False
    assert ds.ego_centric is True
    assert any(isinstance(t, PhotoMetricDistortionMultiViewImage)
               for t in w.transforms)


def test_val_overrides_beat_custom_args(tmp_path):
    """Even a config whose val args disagree gets the eval-time surgery."""
    cfg = _nusc_cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg, val_dataset_args=dict(cfg.val_dataset_args, strict=True,
                                   cur_prob=0.5, return_depth=False))
    ds = build_dataset(cfg, phase="val").dataset
    for k, v in EVAL_OVERRIDES.items():
        assert getattr(ds, k) == v


def test_kitti_one_frame_through_factory(tmp_path):
    root = _make_mini_kitti(tmp_path)
    # the val split enumerates frames that HAVE voxel GT (every 5th frame,
    # SemanticKITTI layout) — fabricate them
    vox = os.path.join(root, "dataset", "sequences", "00", "voxels")
    os.makedirs(vox)
    for i in (0, 5):
        open(os.path.join(vox, f"{i:06d}.bin"), "wb").close()
    cfg = get_config("kitti_occ")
    local = dict(data_path=root, sequences=["00"], sequence_distance=4,
                 frames_interval=0.4, crop_size=[60, 120])
    cfg = dataclasses.replace(
        cfg,
        train_dataset_args=dict(cfg.train_dataset_args, **local),
        val_dataset_args=dict(cfg.val_dataset_args, **local))
    wt = build_dataset(cfg, phase="train")
    assert wt.dataset.split == "train" and wt.dataset.cur_prob == \
        pytest.approx(0.333)
    wv = build_dataset(cfg, phase="val")
    assert wv.dataset.split == "val"
    assert wv.dataset.strict is False and wv.dataset.return_depth is True
    assert 1 <= len(wv) <= 2   # frames with voxel GT only
    np.random.seed(0)
    b = wv[len(wv) - 1]
    assert b["imgs"].shape[1] == 1   # mono
    assert "depth_loc" in b
    # KITTI norm (not ImageNet) applied by the wrapper
    norm = [t for t in wv.transforms
            if type(t).__name__ == "NormalizeMultiviewImage"]
    assert norm and norm[0].mean[0] == pytest.approx(124.16)


@pytest.mark.parametrize("dtype", ["Kitti_Raw_Stereo", "Kitti_Raw"])
def test_kitti_raw_through_factory(tmp_path, dtype):
    root, poses, split = _make_raw_tree(tmp_path)
    cfg = get_config("kitti_raw_depth")
    local = dict(data_path=root, pose_path=poses, split_path=split,
                 frames_interval=0.4, sequence_distance=3,
                 crop_size=[48, 96])
    cfg = dataclasses.replace(
        cfg, dataset_type=dtype,
        train_dataset_args=dict(cfg.train_dataset_args, **local),
        val_dataset_args=dict(cfg.val_dataset_args, **local))
    for phase in ("train", "val"):
        w = build_dataset(cfg, phase=phase)
        assert len(w) > 0
        np.random.seed(0)
        import random
        random.seed(0)
        b = w[4]
        assert b["imgs"].shape[1] == 1
    # val carries depth via EVAL_OVERRIDES
    assert w.dataset.return_depth is True
    assert w.dataset.strict is False


def test_missing_data_raises(tmp_path):
    cfg = get_config("kitti_raw_depth")   # default paths absent in sandbox
    with pytest.raises(FileNotFoundError):
        build_dataset(cfg, phase="val")


def test_occ3d_scene_name_openocc_scene_token(tmp_path):
    """Occ3D labels resolve by scene NAME, OpenOccupancy by scene TOKEN +
    LIDAR_TOP sample_data token (reference eval_iou.py:26-39)."""
    import pickle

    from selfocc_tpu.data.nuscenes_dataset import \
        nuScenes_One_Frame_Sweeps_Dist

    data_path, pkl = _mini_nusc_with_lidar(tmp_path)
    with open(pkl, "rb") as f:
        d = pickle.load(f)
    # pkl keyed by token; name rides in the info (examine_sweeps.py)
    tok = "scenetok123"
    d["infos"][tok] = d["infos"].pop("scene0")
    for i, info in enumerate(d["infos"][tok]):
        info["scene_name"] = "scene-0001"
        info["data"]["LIDAR_TOP"]["token"] = f"lidsd{i}"
    d["metadata"] = [(tok, i) for i, _ in enumerate(d["infos"][tok])]
    with open(pkl, "wb") as f:
        pickle.dump(d, f)

    occ3d = tmp_path / "occ3d" / "scene-0001" / "tok2"
    os.makedirs(occ3d)
    np.savez(occ3d / "labels.npz", semantics=np.zeros((2, 2, 2), np.uint8))
    openocc = tmp_path / "openocc" / f"scene_{tok}" / "occupancy"
    os.makedirs(openocc)
    np.save(openocc / "lidsd2.npy", np.zeros((4, 4), np.int64))

    ds = nuScenes_One_Frame_Sweeps_Dist(
        data_path=data_path, imageset=pkl, crop_size=[64, 96],
        min_dist=0.4, max_dist=5.0, strict=False, cur_prob=1.0,
        occ3d_root=str(tmp_path / "occ3d"),
        openocc_root=str(tmp_path / "openocc"))
    np.random.seed(0)
    _, metas = ds[2]
    assert metas["occ3d_label_path"].endswith(
        os.path.join("scene-0001", "tok2", "labels.npz"))
    assert metas["openocc_label_path"].endswith(
        os.path.join(f"scene_{tok}", "occupancy", "lidsd2.npy"))
    # other samples have no labels on disk -> a loud one-time warning
    import warnings
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        np.random.seed(0)
        ds[1]
        np.random.seed(0)
        ds[3]
    assert sum(str(r.message).startswith("occ3d label root")
               for r in rec) == 1
