"""ResNet-50 backbone (torchvision/mmdet layout) in Flax, NHWC.

Replaces the mmdet ``ResNet`` the reference builds from its registry
(``config/nuscenes/nuscenes_occ.py:251-259``; pretrained
``ckpts/resnet50-0676ba61.pth`` = torchvision resnet50 weights).
``convert_torch_resnet50`` maps a torchvision state_dict onto this module's
params so the same pretrained weights load.

'pytorch' style bottleneck: stride on conv2 (mmdet ``style='pytorch'``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Optional[str] = None   # bf16 compute (AMP analog); params stay fp32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, axis_name=self.bn_axis_name,
                                dtype=self.dtype, name=name)
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="ds_conv")(x)
            identity = bn("ds_bn")(identity)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    """Outputs the four stage features (C2..C5), channels 256/512/1024/2048."""

    bn_axis_name: Optional[str] = None
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    dtype: Optional[str] = None   # bf16 compute (reference amp analog)
    remat_blocks: bool = True     # recompute bottlenecks in backward

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, axis_name=self.bn_axis_name,
                          dtype=self.dtype, name="bn1")
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = 64
        # `train` must stay a static python bool under remat (it picks the
        # BatchNorm branch); flax counts `self` as argnum 0, so the second
        # positional call arg is argnum 2.
        Block = nn.remat(Bottleneck, prevent_cse=False, static_argnums=(2,)) \
            if self.remat_blocks else Bottleneck
        for stage, blocks in enumerate(self.stage_blocks):
            for blk in range(blocks):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = Block(
                    planes, stride=stride, downsample=(blk == 0),
                    bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                    name=f"layer{stage + 1}_{blk}")(x, train)
            outs.append(x)
            planes *= 2
        return outs


class TinyBackbone(nn.Module):
    """4-level strided-conv stub emitting ResNet-shaped pyramids — test/CI
    stand-in (compiles in seconds where ResNet-50's grad graph takes minutes
    on the CPU test backend). Not used by any shipped config."""

    channels: Sequence[int] = (256, 512, 1024, 2048)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, ch in enumerate(self.channels):
            stride = 4 if i == 0 else 2
            x = nn.Conv(ch, (3, 3), strides=(stride, stride),
                        padding="SAME", name=f"conv{i}")(x)
            x = nn.relu(x)
            outs.append(x)
        return outs


# --------------------------------------------------------------- conversion
def _conv_w(t):
    # torch OIHW -> flax HWIO
    return jnp.asarray(np.transpose(np.asarray(t), (2, 3, 1, 0)))


def _bn(sd, prefix):
    return (
        {"scale": jnp.asarray(np.asarray(sd[prefix + ".weight"])),
         "bias": jnp.asarray(np.asarray(sd[prefix + ".bias"]))},
        {"mean": jnp.asarray(np.asarray(sd[prefix + ".running_mean"])),
         "var": jnp.asarray(np.asarray(sd[prefix + ".running_var"]))},
    )


def convert_torch_resnet50(state_dict: Dict[str, Any]):
    """torchvision resnet50 state_dict -> (params, batch_stats) pytrees."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv1"] = {"kernel": _conv_w(state_dict["conv1.weight"])}
    p, s = _bn(state_dict, "bn1")
    params["bn1"], stats["bn1"] = p, s

    blocks = (3, 4, 6, 3)
    for stage, n in enumerate(blocks):
        for blk in range(n):
            tp = f"layer{stage + 1}.{blk}"
            name = f"layer{stage + 1}_{blk}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = {"kernel": _conv_w(state_dict[f"{tp}.conv{i}.weight"])}
                pb, sb = _bn(state_dict, f"{tp}.bn{i}")
                bp[f"bn{i}"], bs[f"bn{i}"] = pb, sb
            if f"{tp}.downsample.0.weight" in state_dict:
                bp["ds_conv"] = {"kernel": _conv_w(state_dict[f"{tp}.downsample.0.weight"])}
                pb, sb = _bn(state_dict, f"{tp}.downsample.1")
                bp["ds_bn"], bs["ds_bn"] = pb, sb
            params[name] = bp
            stats[name] = bs
    return params, stats
