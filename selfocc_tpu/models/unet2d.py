"""UNet2D alternative backbone (AdaBins encoder/decoder).

Faithful rewrite of ``model/backbone/unet2d.py`` (214 LoC; registered in the
reference but unused by the 6 shipped configs): a ``tf_efficientnet_b7``
MBConv encoder (``models/efficientnet.py`` — replacing the reference's
torch.hub download, ``unet2d.py:166-180``) feeding the AdaBins ``DecoderBN``
— bilinear ``align_corners=True`` upsample + skip concat + two
conv-BN-LeakyReLU blocks per level (``UpSampleBN``, ``unet2d.py:11-33``),
emitting ``out_feature``-channel maps at strides **1/2, 1/4, 1/8, 1/16**
(``unet2d.py:120-126``: ``[1_2, 1_4, 1_8, 1_16]``).

Reference quirks kept (golden-tested against the reference's own DecoderBN
in ``tests/test_unet2d_golden.py``):
  - ``conv2`` is a 1x1 conv with ``padding=1`` (``unet2d.py:44-46``) — it
    GROWS the bottleneck map by a 1-pixel ring that the first upsample then
    blends in.
  - encoder taps are stage outputs 0/1/2/4 + top conv (``unet2d.py:97-103``:
    ``features[4,5,6,8,11]``), i.e. strides 2/4/8/16/32.
  - decoder channel halving: features//2 at 1/16 down to features//16 at
    1/2 (``unet2d.py:53-59``).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .efficientnet import B7, EfficientNetConfig, EfficientNetEncoder


def _ac_weight(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) 1-D bilinear interpolation matrix with
    ``align_corners=True`` index mapping (torch ``F.interpolate``)."""
    w = np.zeros((n_out, n_in), np.float32)
    if n_in == 1:
        w[:, 0] = 1.0
        return w
    coords = (np.arange(n_out) * (n_in - 1) / max(n_out - 1, 1)
              if n_out > 1 else np.zeros(1))
    i0 = np.clip(np.floor(coords).astype(np.int64), 0, n_in - 2)
    f = (coords - i0).astype(np.float32)
    w[np.arange(n_out), i0] = 1.0 - f
    w[np.arange(n_out), i0 + 1] += f
    return w


def resize_bilinear_ac(x, h: int, w: int):
    """NHWC bilinear resize, torch ``align_corners=True`` semantics, as two
    MXU-friendly matmuls (shapes are static; the tiny interpolation
    matrices fold into the program as constants)."""
    mh = jnp.asarray(_ac_weight(h, x.shape[1]))
    mw = jnp.asarray(_ac_weight(w, x.shape[2]))
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


class UpSampleBN(nn.Module):
    """Upsample(align_corners=True) + skip-concat + 2x (conv-BN-LeakyReLU)
    (reference ``unet2d.py:11-33``)."""

    output_features: int

    @nn.compact
    def __call__(self, x, concat_with, train=False):
        up = resize_bilinear_ac(x, concat_with.shape[1], concat_with.shape[2])
        f = jnp.concatenate([up, concat_with], axis=-1)
        for i in range(2):
            f = nn.Conv(self.output_features, (3, 3), padding="SAME",
                        name=f"conv{i}")(f)
            f = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"bn{i}")(f)
            f = nn.leaky_relu(f)
        return f


class DecoderBN(nn.Module):
    """AdaBins decoder (reference ``DecoderBN``, ``unet2d.py:36-142``)."""

    out_feature: int
    num_features: int

    @nn.compact
    def __call__(self, taps, train: bool = False):
        """taps: 5 NHWC maps at strides 2/4/8/16/32 (block0/1/2/4 + top)."""
        b0, b1, b2, b3, b4 = taps
        # conv2: 1x1 with padding=1 — pads the input ring (ref :44-46)
        x = jnp.pad(b4, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x_d0 = nn.Conv(self.num_features, (1, 1), padding="VALID",
                       name="conv2")(x)
        f = self.num_features
        x_1_16 = UpSampleBN(f // 2, name="up16")(x_d0, b3, train)
        x_1_8 = UpSampleBN(f // 4, name="up8")(x_1_16, b2, train)
        x_1_4 = UpSampleBN(f // 8, name="up4")(x_1_8, b1, train)
        x_1_2 = UpSampleBN(f // 16, name="up2")(x_1_4, b0, train)
        outs = []
        for name, v in (("1_2", x_1_2), ("1_4", x_1_4),
                        ("1_8", x_1_8), ("1_16", x_1_16)):
            outs.append(nn.Conv(self.out_feature, (1, 1),
                                name=f"resize_output_{name}")(v))
        return outs


class UNet2D(nn.Module):
    """EfficientNet encoder + AdaBins decoder emitting a 4-level pyramid at
    strides 1/2 .. 1/16 with ``out_feature`` channels each."""

    out_feature: int = 128
    encoder_cfg: EfficientNetConfig = B7

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem, stages, top = EfficientNetEncoder(
            self.encoder_cfg, name="encoder")(x, train)
        # reference taps: features[4,5,6,8,11] = stages 0/1/2/4 + conv_head
        taps = [stages[0], stages[1], stages[2], stages[4], top]
        return DecoderBN(self.out_feature, num_features=top.shape[-1],
                         name="decoder")(taps, train)
