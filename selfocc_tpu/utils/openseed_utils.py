"""Open-vocabulary 2D semantic teacher (OpenSeeD) integration.

The reference runs OpenSeeD (Swin-T, detectron2 stack) online as a frozen
teacher producing 21-class maps remapped to the 17 nuScenes classes
(``utils/openseed_utils.py:12-62``, ``train.py:98-100,213-215``). That stack
is CUDA/detectron2-bound; the TPU-native integration is **offline
precompute** (the reference's own KITTI path already consumes precomputed
maps, ``kitti_dataset_one_frame.py:318-323``):

  1. Run ``tools/precompute_openseed.py`` (torch, anywhere with a GPU) over
     the dataset images -> per-image ``.npy`` label maps.
  2. Point ``sem_dir`` here; the loader streams the maps and applies the
     openseed->nuscenes LUT (``metric_util.py:36-64``).

``SemTeacher`` is the runtime interface; ``load_sem_map`` gracefully returns
None when maps are absent so training falls back to photometric-only
supervision.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .metrics import openseed2nuscenes

NUSCENES_CLASSES = [
    "barrier", "bicycle", "bus", "car", "construction_vehicle", "crane",
    "motorcycle", "person", "traffic_cone", "trailer", "trailer_truck",
    "truck", "road", "other_flat", "sidewalk", "terrain", "grass",
    "building", "wall", "tree", "sky"]


class SemTeacher:
    """Streams precomputed OpenSeeD label maps, remapped to nuScenes classes."""

    def __init__(self, sem_dir: str, apply_lut: bool = True):
        self.sem_dir = sem_dir
        self.apply_lut = apply_lut

    def available(self) -> bool:
        return bool(self.sem_dir) and os.path.isdir(self.sem_dir)

    def load_sem_map(self, img_path: str) -> Optional[np.ndarray]:
        """Map an image path to its precomputed ``.npy`` semantic map."""
        if not self.available():
            return None
        rel = os.path.basename(img_path) + ".npy"
        path = os.path.join(self.sem_dir, rel)
        if not os.path.exists(path):
            return None
        sem = np.load(path)
        if self.apply_lut:
            sem = openseed2nuscenes(sem)
        return sem

    def load_batch(self, img_paths) -> Optional[np.ndarray]:
        maps = [self.load_sem_map(p) for p in img_paths]
        if any(m is None for m in maps):
            return None
        return np.stack(maps)
