"""Open-vocabulary 2D semantic teacher (OpenSeeD) integration.

The reference runs OpenSeeD (Swin-T, detectron2 stack) online as a frozen
teacher producing 21-class maps remapped to the 17 nuScenes classes
(``utils/openseed_utils.py:12-62``, ``train.py:98-100,213-215``). That stack
lives in an un-vendored external repo; two TPU-native integrations exist:

  1. **Offline precompute** (the reference's own KITTI path already
     consumes precomputed maps, ``kitti_dataset_one_frame.py:318-323``):
     ``tools/precompute_openseed.py`` (torch+GPU, off-host) -> per-image
     ``.npy`` label maps; ``SemTeacher`` streams them with the
     openseed->nuscenes LUT (``metric_util.py:36-64``).
  2. **In-JAX teacher** (``JaxSemTeacher``): flax Swin + UperNet
     (``models/swin.py`` / ``models/upernet.py``, golden-tested vs the HF
     torch implementations), weight-importable from any HF Swin-UperNet
     checkpoint (``utils/swin_import.py``). Runs ON the TPU —
     ``tools/precompute_sem_jax.py`` precomputes maps in-sandbox, with no
     external GPU dependency. OpenSeeD's exact mask-DINO decoder + language
     encoder remain external; class alignment comes from the checkpoint's
     label space (pass ``lut`` accordingly).

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


def apply_label_lut(sem: np.ndarray, lut) -> np.ndarray:
    """Remap a label map through a user LUT: an int array indexed by class
    (out-of-range ids clamp to the last entry, matching np.take 'clip'), or
    any callable. The wiring point for teachers in a non-OpenSeeD label
    space (docs/PARITY.md teacher caveat)."""
    if callable(lut):
        return lut(sem)
    lut = np.asarray(lut)
    return lut[np.clip(np.asarray(sem, np.int64), 0, len(lut) - 1)]


class SemTeacher:
    """Streams precomputed OpenSeeD label maps, remapped to nuScenes classes.

    ``lut`` overrides the default openseed->nuscenes remap for teachers in
    another label space (array indexed by teacher class, or callable);
    ``apply_lut=False`` keeps the teacher space (sem_space="openseed"
    training)."""

    def __init__(self, sem_dir: str, apply_lut: bool = True, lut=None):
        self.sem_dir = sem_dir
        self.apply_lut = apply_lut
        self.lut = lut if lut is not None else openseed2nuscenes

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
            sem = apply_label_lut(sem, self.lut)
        return sem

    def load_batch(self, img_paths) -> Optional[np.ndarray]:
        maps = [self.load_sem_map(p) for p in img_paths]
        if any(m is None for m in maps):
            return None
        return np.stack(maps)


class JaxSemTeacher:
    """In-JAX frozen semantic teacher (Swin + UperNet) mirroring the
    reference's ``forward_openseed_model`` contract
    (``utils/openseed_utils.py:55-62``): resize the batch to height 512
    (aspect preserved), forward, upsample logits to the requested size,
    argmax -> per-pixel class map.

    Deviation (documented): the reference resizes bicubic
    ``align_corners=True``; ``jax.image.resize`` is half-pixel cubic (the
    ``align_corners=False`` analog). The teacher is a label source, not a
    parity surface, so half-pixel is kept.
    """

    IMAGENET_MEAN = (123.675, 116.28, 103.53)
    IMAGENET_STD = (58.395, 57.12, 57.375)

    def __init__(self, variables, num_classes: int = 21, swin_cfg=None,
                 channels: int = 512, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                 lut=None):
        import jax
        import jax.numpy as jnp
        from ..models.swin import SwinConfig
        from ..models.upernet import SwinUperNet

        self.model = SwinUperNet(num_classes=num_classes,
                                 swin=swin_cfg or SwinConfig(),
                                 channels=channels)
        self.variables = variables
        self.lut = lut
        mean = jnp.asarray(mean, jnp.float32)
        std = jnp.asarray(std, jnp.float32)

        def _forward(v, imgs, out_hw):
            # imgs: (B, H, W, 3) RGB in [0, 255]
            b, h, w, _ = imgs.shape
            rh, rw = 512, int(round(512 * w / h))
            x = jax.image.resize(imgs.astype(jnp.float32), (b, rh, rw, 3),
                                 method="cubic")
            x = (x - mean) / std
            logits = self.model.apply(v, x)
            logits = jax.image.resize(
                logits, (b,) + tuple(out_hw) + (logits.shape[-1],),
                method="linear")
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        self._forward = jax.jit(_forward, static_argnums=(2,))

    @classmethod
    def from_checkpoint(cls, path: str, **kw):
        from .swin_import import load_teacher_checkpoint
        variables = load_teacher_checkpoint(path)
        head = variables["params"]["decode_head"]
        kw.setdefault("num_classes", head["classifier"]["bias"].shape[0])
        kw.setdefault("channels", head["classifier"]["kernel"].shape[2])
        if "swin_cfg" not in kw or kw["swin_cfg"] is None:
            # infer the Swin architecture from the parameter shapes
            import re
            from ..models.swin import SwinConfig
            bb = variables["params"]["backbone"]
            stages = {}
            for k in bb:
                m = re.match(r"stage(\d+)_block(\d+)$", k)
                if m:
                    i, j = int(m.group(1)), int(m.group(2))
                    stages[i] = max(stages.get(i, 0), j + 1)
            depths = tuple(stages[i] for i in sorted(stages))
            heads, window = [], None
            for i in sorted(stages):
                t = bb[f"stage{i}_block0"]["attn"][
                    "relative_position_bias_table"]
                heads.append(int(t.shape[1]))
                window = (int(round(t.shape[0] ** 0.5)) + 1) // 2
            kw["swin_cfg"] = SwinConfig(
                patch_size=bb["patch_embed"]["kernel"].shape[0],
                embed_dim=int(bb["patch_embed"]["kernel"].shape[3]),
                depths=depths, num_heads=tuple(heads), window_size=window)
        return cls(variables, **kw)

    def __call__(self, imgs, size=None) -> np.ndarray:
        """imgs: (B, H, W, 3) uint8/float RGB -> (B, *size) uint8 maps,
        remapped through ``lut`` when the checkpoint's label space differs
        from the training space (docs/PARITY.md teacher caveat)."""
        imgs = np.asarray(imgs)
        size = tuple(size) if size is not None else imgs.shape[1:3]
        maps = np.asarray(self._forward(self.variables, imgs, size))
        if self.lut is not None:
            maps = apply_label_lut(maps, self.lut).astype(maps.dtype)
        return maps
