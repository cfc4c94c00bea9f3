"""FPN neck (mmdet semantics) in Flax, NHWC.

Replaces the mmdet ``FPN`` (``config/nuscenes/nuscenes_occ.py:260-267``):
lateral 1x1 convs, nearest top-down upsample + add, 3x3 output convs.
With ``num_outs == len(in_channels)`` (the shipped configs) no extra levels
are generated; ``add_extra_convs='on_output'`` / ``relu_before_extra_convs``
only matter when ``num_outs`` exceeds the inputs, which we support for parity.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample_nearest_2x(x):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 96
    num_outs: int = 4
    start_level: int = 0
    add_extra_convs: str = "on_output"
    relu_before_extra_convs: bool = True
    dtype: object = None   # bf16 compute (amp analog)

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        used = inputs[self.start_level:]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(used)]
        for i in range(len(laterals) - 1, 0, -1):
            # mmdet upsamples by scale_factor=2 (nearest); crop guards odd sizes
            up = _upsample_nearest_2x(laterals[i])
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + up[:, :h, :w]
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"fpn_{i}")(x)
            for i, x in enumerate(laterals)]
        # extra output levels (mmdet add_extra_convs='on_output')
        i = len(outs)
        while len(outs) < self.num_outs:
            src = outs[-1]
            if self.relu_before_extra_convs and len(outs) > len(laterals):
                src = nn.relu(src)
            outs.append(nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)),
                                name=f"fpn_extra_{i}")(src))
            i += 1
        return outs


class IdentityNeck(nn.Module):
    """Passthrough neck (reference ``model/neck/identity_neck.py:6-13``) —
    for backbones whose feature channels already match the encoder's
    ``embed_dims`` (e.g. UNet2D with ``out_feature=embed_dims``)."""

    @nn.compact
    def __call__(self, inputs):
        return list(inputs)
