"""HF EfficientNet torch checkpoint -> flax encoder converter.

Imports ``google/efficientnet-b*`` (HF ``EfficientNetModel``) weights into
``models/efficientnet.py::EfficientNetEncoder`` — the pretrained-encoder
path for the UNet2D backbone (the reference downloads
``tf_efficientnet_b7_ns`` from torch.hub instead,
``model/backbone/unet2d.py:166-180``). Golden-tested with shared random
weights in ``tests/test_unet2d_golden.py``.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def _conv(w):
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def _dwconv(w):
    """torch depthwise (C, 1, kh, kw) -> flax grouped-conv (kh, kw, 1, C)."""
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def _arr(w):
    return jnp.asarray(_np(w))


def _set(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _bn(params, stats, name: Tuple[str, ...], leaf: str, val) -> bool:
    if leaf == "weight":
        _set(params, name + ("scale",), _arr(val))
    elif leaf == "bias":
        _set(params, name + ("bias",), _arr(val))
    elif leaf == "running_mean":
        _set(stats, name + ("mean",), _arr(val))
    elif leaf == "running_var":
        _set(stats, name + ("var",), _arr(val))
    else:
        return False
    return True


_BLOCK_RE = re.compile(r"^encoder\.blocks\.(\d+)\.(.+)$")

_BLOCK_CONVS = {
    "expansion.expand_conv.weight": ("expand_conv", _conv),
    "depthwise_conv.depthwise_conv.weight": ("depthwise_conv", _dwconv),
    "projection.project_conv.weight": ("project_conv", _conv),
}
_BLOCK_BNS = {
    "expansion.expand_bn": "expand_bn",
    "depthwise_conv.depthwise_norm": "depthwise_norm",
    "projection.project_bn": "project_bn",
}
_BLOCK_SE = {
    "squeeze_excite.reduce": "se_reduce",
    "squeeze_excite.expand": "se_expand",
}


def convert_hf_efficientnet(state_dict) -> Dict:
    """HF ``EfficientNetModel`` state dict -> flax variables
    ``{"params", "batch_stats"}`` for ``EfficientNetEncoder`` (pooler /
    classifier keys ignored)."""
    params: Dict = {}
    stats: Dict = {}
    for key, val in state_dict.items():
        if key == "embeddings.convolution.weight":
            _set(params, ("stem_conv", "kernel"), _conv(val))
        elif key.startswith("embeddings.batchnorm."):
            _bn(params, stats, ("stem_bn",),
                key[len("embeddings.batchnorm."):], val)
        elif key == "encoder.top_conv.weight":
            _set(params, ("top_conv", "kernel"), _conv(val))
        elif key.startswith("encoder.top_bn."):
            _bn(params, stats, ("top_bn",), key[len("encoder.top_bn."):],
                val)
        elif m := _BLOCK_RE.match(key):
            blk, leaf = f"block{m.group(1)}", m.group(2)
            if leaf in _BLOCK_CONVS:
                name, fn = _BLOCK_CONVS[leaf]
                _set(params, (blk, name, "kernel"), fn(val))
                continue
            done = False
            for pref, name in _BLOCK_BNS.items():
                if leaf.startswith(pref + "."):
                    done = _bn(params, stats, (blk, name),
                               leaf[len(pref) + 1:], val)
                    break
            if done:
                continue
            for pref, name in _BLOCK_SE.items():
                if leaf.startswith(pref + "."):
                    sub = leaf[len(pref) + 1:]
                    if sub == "weight":
                        _set(params, (blk, name, "kernel"), _conv(val))
                    elif sub == "bias":
                        _set(params, (blk, name, "bias"), _arr(val))
                    break
    return {"params": params, "batch_stats": stats}
