"""UNet2D alternative backbone (AdaBins-style encoder/decoder).

Behavioral rewrite of ``model/backbone/unet2d.py`` (214 LoC; registered in
the reference but unused by the 6 shipped configs). The reference wraps a
timm EfficientNet-B5 encoder; that torch-hub dependency isn't portable, so
the encoder here is a strided conv pyramid with matching feature strides
(1/2 .. 1/32) feeding the same UpSampleBN decoder structure: bilinear
upsample + skip concat + two conv-norm-LeakyReLU blocks per level, emitting
``out_feature``-channel maps at strides 1/4, 1/8, 1/16, 1/32 — shaped like
the ResNet+FPN pyramid the segmentor expects.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize_bilinear(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")


class UpSampleBN(nn.Module):
    """Upsample + skip-concat + 2x (conv-norm-leakyrelu)
    (reference ``unet2d.py:11-33``)."""

    output_features: int

    @nn.compact
    def __call__(self, x, concat_with, train=False):
        up = _resize_bilinear(x, concat_with.shape[1], concat_with.shape[2])
        f = jnp.concatenate([up, concat_with], axis=-1)
        for i in range(2):
            f = nn.Conv(self.output_features, (3, 3), padding="SAME",
                        name=f"conv{i}")(f)
            f = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"bn{i}")(f)
            f = nn.leaky_relu(f)
        return f


class UNet2D(nn.Module):
    """Encoder/decoder backbone emitting a 4-level pyramid."""

    out_feature: int = 128
    base_channels: int = 32
    bottleneck_features: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        # encoder: strides 2, 2, 2, 2, 2 -> skips at 1/2 .. 1/32
        skips = []
        c = self.base_channels
        h = x
        for lvl in range(5):
            h = nn.Conv(min(c * (2 ** lvl), self.bottleneck_features),
                        (3, 3), strides=(2, 2), padding="SAME",
                        name=f"enc{lvl}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"enc_bn{lvl}")(h)
            h = nn.leaky_relu(h)
            skips.append(h)

        # decoder (reference DecoderBN: conv2 on the bottleneck, then
        # UpSampleBN chain with skip connections)
        feats = nn.Conv(self.bottleneck_features, (1, 1), name="conv2")(skips[-1])
        f16 = UpSampleBN(self.bottleneck_features // 2, name="up16")(
            feats, skips[3], train)
        f8 = UpSampleBN(self.bottleneck_features // 4, name="up8")(
            f16, skips[2], train)
        f4 = UpSampleBN(self.bottleneck_features // 8, name="up4")(
            f8, skips[1], train)

        outs = []
        for name, f in (("r4", f4), ("r8", f8), ("r16", f16), ("r32", feats)):
            outs.append(nn.Conv(self.out_feature, (1, 1),
                                name=f"resize_{name}")(f))
        return outs
