"""Feature-pyramid utilities.

Counterpart of ``utils/feat_tools.py`` (``multi2single_scale``, ``:4-39``).
NOTE: the reference function is DEAD CODE upstream — imported by
``train.py:74`` / ``eval_depth.py:14`` but never called — so this is a
deliberately simplified utility (resize-to-target + sum/mean reduce), not a
behavioral clone of the reference's concat+normalize variant.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def multi2single_scale(feats: Sequence[jnp.ndarray], target_index: int = 0,
                       mode: str = "sum") -> jnp.ndarray:
    """Resize every (B, N, h, w, C) level to level ``target_index``'s spatial
    size (bilinear) and reduce."""
    tgt = feats[target_index]
    B, N, H, W, C = tgt.shape
    acc = None
    for f in feats:
        if f.shape[2:4] != (H, W):
            f = jax.image.resize(f, (f.shape[0], f.shape[1], H, W, f.shape[4]),
                                 "bilinear")
        acc = f if acc is None else acc + f
    if mode == "mean":
        acc = acc / len(feats)
    return acc
