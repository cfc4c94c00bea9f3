"""Data layer: real nuScenes/KITTI loaders + synthetic fallback.

``build_dataset`` mirrors the reference ``get_dataloader``
(``dataset/__init__.py:20-106``): dataset -> wrapper(aug) -> canonical array
batches. Raises FileNotFoundError when the index pkl is absent so the drivers
fall back to the synthetic scene.
"""
from __future__ import annotations

import os

from .synthetic import SyntheticDataset
from .wrapper import TemporalDatasetWrapper

DEFAULT_PATHS = {
    "nuScenes_One_Frame_Sweeps_Dist": dict(
        data_path="data/nuscenes/",
        train_pkl="data/nuscenes_infos_train_sweeps.pkl",
        val_pkl="data/nuscenes_infos_val_sweeps.pkl",
        # reference modify_for_eval(novel_depth=True) swaps to
        # nuScenes_One_Frame_Eval over the temporal_v2 infos
        # (utils/config_tools.py:93-115)
        novel_pkl="data/nuscenes_infos_val_temporal_v2.pkl"),
    "Kitti_One_Frame": dict(
        data_path="data/kitti/", train_pkl="", val_pkl="",
        novel_pkl="data/kitti/dataset"),
    "Kitti_Raw_Stereo": dict(
        data_path="data/kitti_raw/", train_pkl="", val_pkl=""),
}


def build_dataset(cfg, phase="train"):
    """Real dataset factory; FileNotFoundError when data is not on disk.

    ``phase='novel_eval'`` returns the raw novel-view evaluation dataset
    (``nuScenes_One_Frame_Eval`` / ``Kitti_Novel_View_Eval``) — the
    reference's ``modify_for_eval(novel_depth=True)`` dataset swap
    (``utils/config_tools.py:93-115``)."""
    args = dict(cfg.train_dataset_args if phase == "train"
                else cfg.val_dataset_args)
    defaults = DEFAULT_PATHS.get(cfg.dataset_type, {})
    data_path = args.pop("data_path", defaults.get("data_path", ""))
    pkl_key = {"train": "train_pkl", "val": "val_pkl",
               "novel_eval": "novel_pkl"}[phase]
    imageset = args.pop("imageset", defaults.get(pkl_key, ""))
    if not imageset or not os.path.exists(imageset):
        raise FileNotFoundError(f"dataset index not found: {imageset!r}")

    if phase == "novel_eval":
        if cfg.dataset_type == "nuScenes_One_Frame_Sweeps_Dist":
            from .nuscenes_eval_dataset import nuScenes_One_Frame_Eval
            return nuScenes_One_Frame_Eval(
                data_path=data_path, imageset=imageset,
                crop_size=list(cfg.img_size), **args)
        if cfg.dataset_type == "Kitti_One_Frame":
            from .kitti_eval_dataset import Kitti_Novel_View_Eval
            return Kitti_Novel_View_Eval(
                data_path=data_path, imageset=imageset,
                crop_size=list(cfg.img_size), **args)
        raise FileNotFoundError(
            f"no novel-view eval dataset for {cfg.dataset_type}")

    if cfg.dataset_type == "nuScenes_One_Frame_Sweeps_Dist":
        from .nuscenes_dataset import nuScenes_One_Frame_Sweeps_Dist
        raw = nuScenes_One_Frame_Sweeps_Dist(
            data_path=data_path, imageset=imageset,
            crop_size=list(cfg.img_size), **args)
    elif cfg.dataset_type == "Kitti_One_Frame":
        from .kitti_dataset import Kitti_One_Frame
        raw = Kitti_One_Frame(data_path=data_path, imageset=imageset,
                              crop_size=list(cfg.img_size), **args)
    else:
        raise FileNotFoundError(
            f"dataset type {cfg.dataset_type} has no data present")

    return TemporalDatasetWrapper(
        raw, phase=phase, scale_rate=cfg.scale_rate,
        photometric_aug=dict(use_swap_channel=False), **cfg.wrapper_args)


__all__ = ["SyntheticDataset", "TemporalDatasetWrapper", "build_dataset"]
