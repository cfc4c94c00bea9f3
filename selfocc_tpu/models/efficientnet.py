"""EfficientNet encoder (flax, NHWC) — the UNet2D backbone's encoder.

The reference's ``UNet2D`` wraps a ``tf_efficientnet_b7_ns`` pulled from
torch.hub at construction time (``model/backbone/unet2d.py:166-180``) — an
external network dependency. This is the TPU-native equivalent: an MBConv
encoder with the TF-style asymmetric "same" padding, golden-tested against
the runnable HuggingFace torch implementation
(``tests/test_unet2d_golden.py``) and weight-importable from HF
``google/efficientnet-b*`` checkpoints (``utils/effnet_import.py``).

TPU notes: NHWC convs; SE squeeze is a (1, 1, C) mean (no host sync);
stride-2 depthwise convs reproduce torch's explicit asymmetric ZeroPad2d +
VALID conv exactly (HF ``modeling_efficientnet.py:52-69,149-186``);
BatchNorm runs in inference mode for the frozen-teacher use and in train
mode under the segmentor (standard flax ``batch_stats``).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EfficientNetConfig:
    """HF ``EfficientNetConfig`` equivalents; defaults are the base (B0)
    stage table — B7 is ``width_coefficient=2.0, depth_coefficient=3.1``
    (the variant the reference's UNet2D wraps)."""
    width_coefficient: float = 1.0
    depth_coefficient: float = 1.0
    depth_divisor: int = 8
    kernel_sizes: Tuple[int, ...] = (3, 3, 5, 3, 5, 5, 3)
    in_channels: Tuple[int, ...] = (32, 16, 24, 40, 80, 112, 192)
    out_channels: Tuple[int, ...] = (16, 24, 40, 80, 112, 192, 320)
    strides: Tuple[int, ...] = (1, 2, 2, 2, 1, 2, 1)
    num_block_repeats: Tuple[int, ...] = (1, 2, 2, 3, 3, 4, 1)
    expand_ratios: Tuple[int, ...] = (1, 6, 6, 6, 6, 6, 6)
    squeeze_expansion_ratio: float = 0.25
    top_channels: int = 1280
    batch_norm_eps: float = 1e-3

    def round_filters(self, c: int) -> int:
        """HF ``round_filters`` (``modeling_efficientnet.py:33-49``)."""
        d = self.depth_divisor
        c = c * self.width_coefficient
        new = max(d, int(c + d / 2) // d * d)
        if new < 0.9 * c:
            new += d
        return int(new)

    def round_repeats(self, r: int) -> int:
        return int(math.ceil(self.depth_coefficient * r))


B7 = EfficientNetConfig(width_coefficient=2.0, depth_coefficient=3.1)


def _pad_asym(x, k: int, adjust: bool = True):
    """TF 'same' pad for a stride-2 conv: (k//2 - 1, k//2) per spatial dim
    when ``adjust`` (HF ``correct_pad``)."""
    c = k // 2
    lo = c - 1 if adjust else c
    return jnp.pad(x, ((0, 0), (lo, c), (lo, c), (0, 0)))


class MBConv(nn.Module):
    """One MBConv block (HF ``EfficientNetBlock``): expand 1x1 -> depthwise
    (TF-same) -> SE -> project 1x1 (+residual when stride 1 and not the
    stage's first block)."""
    cfg: EfficientNetConfig
    in_dim: int
    out_dim: int
    stride: int
    kernel: int
    expand_ratio: int
    id_skip: bool          # True on the FIRST block of a stage => NO residual
    adjust_padding: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        inp = x
        dim = self.in_dim * self.expand_ratio
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       epsilon=cfg.batch_norm_eps,
                                       momentum=0.99, name=name)
        if self.expand_ratio != 1:
            x = nn.Conv(dim, (1, 1), use_bias=False, name="expand_conv")(x)
            x = nn.silu(bn("expand_bn")(x))

        if self.stride == 2:
            x = _pad_asym(x, self.kernel, self.adjust_padding)
            pad = "VALID"
        else:
            pad = "SAME"
        x = nn.Conv(dim, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    feature_group_count=dim, use_bias=False,
                    name="depthwise_conv")(x)
        x = nn.silu(bn("depthwise_norm")(x))

        # squeeze-excite: reduction sized from the PRE-expansion dim
        se_dim = max(1, int(self.in_dim * cfg.squeeze_expansion_ratio))
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.silu(nn.Conv(se_dim, (1, 1), name="se_reduce")(s))
        s = jax.nn.sigmoid(nn.Conv(dim, (1, 1), name="se_expand")(s))
        x = x * s

        x = nn.Conv(self.out_dim, (1, 1), use_bias=False,
                    name="project_conv")(x)
        x = bn("project_bn")(x)
        if self.stride == 1 and not self.id_skip:
            x = x + inp        # drop-connect is eval-identity; omitted
        return x


class EfficientNetEncoder(nn.Module):
    """Stem + 7 MBConv stages + top conv. Returns ``(stem, stages, top)``
    where ``stages`` is the list of per-stage outputs — the taps UNet2D
    reads (reference ``unet2d.py:97-103``: blocks 0, 1, 2, 4 + conv_head).
    """
    cfg: EfficientNetConfig = EfficientNetConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       epsilon=cfg.batch_norm_eps,
                                       momentum=0.99, name=name)
        # stem: pad (0,1,0,1) + 3x3/2 VALID (HF EfficientNetEmbeddings)
        s = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        s = nn.Conv(cfg.round_filters(32), (3, 3), strides=(2, 2),
                    padding="VALID", use_bias=False, name="stem_conv")(s)
        stem = nn.silu(bn("stem_bn")(s))

        h = stem
        stages = []
        blk = 0
        for i in range(len(cfg.in_channels)):
            for j in range(cfg.round_repeats(cfg.num_block_repeats[i])):
                h = MBConv(
                    cfg,
                    in_dim=cfg.round_filters(
                        cfg.in_channels[i]) if j == 0 else
                    cfg.round_filters(cfg.out_channels[i]),
                    out_dim=cfg.round_filters(cfg.out_channels[i]),
                    stride=cfg.strides[i] if j == 0 else 1,
                    kernel=cfg.kernel_sizes[i],
                    expand_ratio=cfg.expand_ratios[i],
                    id_skip=(j == 0),
                    name=f"block{blk}")(h, train)
                blk += 1
            stages.append(h)

        top = nn.Conv(cfg.round_filters(cfg.top_channels), (1, 1),
                      use_bias=False, name="top_conv")(h)
        top = nn.silu(bn("top_bn")(top))
        return stem, stages, top
