"""UperNet semantic-segmentation head over the Swin backbone (flax, NHWC).

Together with ``models/swin.py`` this is the in-JAX semantic teacher
replacing the reference's externally-hosted OpenSeeD stack (reference
``utils/openseed_utils.py:12-62``): OpenSeeD's exact mask-DINO decoder and
its language encoder live in an un-vendored external repo, so the faithful
portable teacher is Swin + UperNet — the standard open-vocab-free semantic
segmentor the mmseg ecosystem ships for Swin — golden-tested against the
runnable HuggingFace torch implementation (``tests/test_swin_teacher.py``)
and weight-importable from any HF UperNet checkpoint
(``utils/swin_import.py``).

TPU notes: NHWC convs (MXU-native), BatchNorm in inference mode from
imported running stats, bilinear resizes via ``jax.image.resize`` (matches
torch ``align_corners=False`` half-pixel semantics), adaptive average pools
unrolled statically (scales are tiny: 1/2/3/6).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .swin import SwinBackbone, SwinConfig


def _resize_bilinear(x, size):
    """(B, h, w, C) -> (B, *size, C), torch ``align_corners=False``."""
    return jax.image.resize(x, (x.shape[0],) + tuple(size) + (x.shape[-1],),
                            method="linear")


def adaptive_avg_pool(x, out: int):
    """torch ``AdaptiveAvgPool2d`` bins: [floor(i*H/S), ceil((i+1)*H/S)).
    Static python loop — ``out`` <= 6 in UperNet."""
    b, h, w, c = x.shape

    def pool_axis(arr, dim_len, axis, S):
        segs = []
        for i in range(S):
            s = (i * dim_len) // S
            e = -(-((i + 1) * dim_len) // S)   # ceil
            segs.append(jnp.take(arr, jnp.arange(s, e), axis=axis)
                        .mean(axis=axis, keepdims=True))
        return jnp.concatenate(segs, axis=axis)

    x = pool_axis(x, h, 1, out)
    return pool_axis(x, w, 2, out)


class ConvModule(nn.Module):
    """Conv(no bias) + BatchNorm(inference) + ReLU (HF
    ``UperNetConvModule``)."""
    features: int
    kernel: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=pad, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="bn")(x)
        return nn.relu(x)


class UperNetHead(nn.Module):
    """PSP + FPN decode head (HF ``UperNetHead``,
    ``modeling_upernet.py:120-203``)."""
    num_classes: int
    channels: int = 512
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        """feats: backbone maps coarse->fine NOT required — pass strides
        4..32 in order (finest first, like HF). Returns logits at the
        finest feature resolution."""
        # PSP on the coarsest map
        top = feats[-1]
        psp = [top]
        for i, s in enumerate(self.pool_scales):
            p = adaptive_avg_pool(top, s)
            p = ConvModule(self.channels, 1, name=f"psp_{i}")(p)
            psp.append(_resize_bilinear(p, top.shape[1:3]))
        psp = jnp.concatenate(psp, axis=-1)
        psp = ConvModule(self.channels, 3, name="bottleneck")(psp)

        # laterals + top-down
        lats = [ConvModule(self.channels, 1, name=f"lateral_{i}")(f)
                for i, f in enumerate(feats[:-1])] + [psp]
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + _resize_bilinear(
                lats[i], lats[i - 1].shape[1:3])

        outs = [ConvModule(self.channels, 3, name=f"fpn_{i}")(lats[i])
                for i in range(len(lats) - 1)] + [lats[-1]]
        outs = [outs[0]] + [_resize_bilinear(o, outs[0].shape[1:3])
                            for o in outs[1:]]
        x = jnp.concatenate(outs, axis=-1)
        x = ConvModule(self.channels, 3, name="fpn_bottleneck")(x)
        return nn.Conv(self.num_classes, (1, 1), name="classifier")(x)


class SwinUperNet(nn.Module):
    """Full teacher: Swin backbone -> UperNet head -> per-pixel logits at
    the input resolution (HF ``UperNetForSemanticSegmentation`` main head;
    the auxiliary FCN head is train-time-only and omitted)."""
    num_classes: int
    swin: SwinConfig = SwinConfig()
    channels: int = 512

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) normalized float -> (B, H, W, num_classes)."""
        feats = SwinBackbone(self.swin, name="backbone")(images)
        logits = UperNetHead(self.num_classes, self.channels,
                             name="decode_head")(feats)
        return _resize_bilinear(logits, images.shape[1:3])
