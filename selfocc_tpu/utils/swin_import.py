"""HF Swin / UperNet torch checkpoint -> flax teacher converter.

Imports any HuggingFace ``SwinBackbone`` / ``UperNetForSemanticSegmentation``
(Swin backbone) state dict into ``models/swin.py`` / ``models/upernet.py``
variables — the weight path for the in-JAX semantic teacher that replaces
the reference's external OpenSeeD stack (``utils/openseed_utils.py:12-62``).
Golden-tested with shared random weights in ``tests/test_swin_teacher.py``.

Layout conversions: Conv2d (O, I, kh, kw) -> (kh, kw, I, O); Linear
(O, I) -> (I, O); LayerNorm/BatchNorm ``weight`` -> ``scale``; BatchNorm
running stats -> the ``batch_stats`` collection.
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


def _lin(w):
    return jnp.asarray(_np(w).T)


def _arr(w):
    return jnp.asarray(_np(w))


def _set(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


_BLOCK_LEAF = {
    # HF SwinLayer leaf -> (flax sub-path, converter) within stage{i}_block{j}
    "layernorm_before.weight": (("norm1", "scale"), _arr),
    "layernorm_before.bias": (("norm1", "bias"), _arr),
    "attention.self.query.weight": (("attn", "query", "kernel"), _lin),
    "attention.self.query.bias": (("attn", "query", "bias"), _arr),
    "attention.self.key.weight": (("attn", "key", "kernel"), _lin),
    "attention.self.key.bias": (("attn", "key", "bias"), _arr),
    "attention.self.value.weight": (("attn", "value", "kernel"), _lin),
    "attention.self.value.bias": (("attn", "value", "bias"), _arr),
    "attention.self.relative_position_bias_table":
        (("attn", "relative_position_bias_table"), _arr),
    "attention.output.dense.weight": (("attn", "proj", "kernel"), _lin),
    "attention.output.dense.bias": (("attn", "proj", "bias"), _arr),
    "layernorm_after.weight": (("norm2", "scale"), _arr),
    "layernorm_after.bias": (("norm2", "bias"), _arr),
    "intermediate.dense.weight": (("mlp_fc1", "kernel"), _lin),
    "intermediate.dense.bias": (("mlp_fc1", "bias"), _arr),
    "output.dense.weight": (("mlp_fc2", "kernel"), _lin),
    "output.dense.bias": (("mlp_fc2", "bias"), _arr),
}

_BLOCK_RE = re.compile(r"^encoder\.layers\.(\d+)\.blocks\.(\d+)\.(.+)$")
_DOWN_RE = re.compile(r"^encoder\.layers\.(\d+)\.downsample\.(.+)$")
_STAGE_NORM_RE = re.compile(r"^hidden_states_norms\.stage(\d+)\.(weight|bias)$")


def convert_hf_swin_backbone(state_dict) -> Dict:
    """HF ``SwinBackbone`` state dict -> flax params for
    ``models.swin.SwinBackbone`` (keys relative to the backbone module —
    strip any ``backbone.`` prefix first)."""
    params: Dict = {}
    skipped = []
    for key, val in state_dict.items():
        if key == "embeddings.patch_embeddings.projection.weight":
            _set(params, ("patch_embed", "kernel"), _conv(val))
        elif key == "embeddings.patch_embeddings.projection.bias":
            _set(params, ("patch_embed", "bias"), _arr(val))
        elif key == "embeddings.norm.weight":
            _set(params, ("patch_norm", "scale"), _arr(val))
        elif key == "embeddings.norm.bias":
            _set(params, ("patch_norm", "bias"), _arr(val))
        elif m := _BLOCK_RE.match(key):
            i, j, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
            if leaf in _BLOCK_LEAF:
                sub, fn = _BLOCK_LEAF[leaf]
                _set(params, (f"stage{i}_block{j}",) + sub, fn(val))
            else:
                skipped.append(key)
        elif m := _DOWN_RE.match(key):
            i, leaf = int(m.group(1)), m.group(2)
            if leaf == "reduction.weight":
                _set(params, (f"stage{i}_downsample", "reduction", "kernel"),
                     _lin(val))
            elif leaf == "norm.weight":
                _set(params, (f"stage{i}_downsample", "norm", "scale"),
                     _arr(val))
            elif leaf == "norm.bias":
                _set(params, (f"stage{i}_downsample", "norm", "bias"),
                     _arr(val))
            else:
                skipped.append(key)
        elif m := _STAGE_NORM_RE.match(key):
            i = int(m.group(1)) - 1          # HF names stages 1-based
            leaf = "scale" if m.group(2) == "weight" else "bias"
            _set(params, (f"stage{i}_out_norm", leaf), _arr(val))
        else:
            skipped.append(key)
    if skipped:
        import logging
        logging.getLogger(__name__).info(
            "swin_import: %d unmapped keys (e.g. %s)", len(skipped),
            skipped[:3])
    return params


def _conv_module(dst_p: Dict, dst_b: Dict, name: Tuple[str, ...],
                 leaf: str, val):
    """Map one HF UperNetConvModule leaf (conv/batch_norm.*)."""
    if leaf == "conv.weight":
        _set(dst_p, name + ("conv", "kernel"), _conv(val))
    elif leaf == "batch_norm.weight":
        _set(dst_p, name + ("bn", "scale"), _arr(val))
    elif leaf == "batch_norm.bias":
        _set(dst_p, name + ("bn", "bias"), _arr(val))
    elif leaf == "batch_norm.running_mean":
        _set(dst_b, name + ("bn", "mean"), _arr(val))
    elif leaf == "batch_norm.running_var":
        _set(dst_b, name + ("bn", "var"), _arr(val))
    else:
        return False
    return True


_PSP_RE = re.compile(r"^psp_modules\.(\d+)\.1\.(.+)$")
_LAT_RE = re.compile(r"^lateral_convs\.(\d+)\.(.+)$")
_FPN_RE = re.compile(r"^fpn_convs\.(\d+)\.(.+)$")


def convert_hf_upernet(state_dict) -> Dict:
    """HF ``UperNetForSemanticSegmentation`` state dict -> flax variables
    ``{"params": ..., "batch_stats": ...}`` for
    ``models.upernet.SwinUperNet`` (auxiliary head ignored — it is a
    train-time deep-supervision branch only)."""
    bb = {k[len("backbone."):]: v for k, v in state_dict.items()
          if k.startswith("backbone.")}
    params = {"backbone": convert_hf_swin_backbone(bb)}
    stats: Dict = {}
    head_p: Dict = {}
    head_b: Dict = {}
    for key, val in state_dict.items():
        if not key.startswith("decode_head."):
            continue
        key = key[len("decode_head."):]
        if key == "classifier.weight":
            _set(head_p, ("classifier", "kernel"), _conv(val))
        elif key == "classifier.bias":
            _set(head_p, ("classifier", "bias"), _arr(val))
        elif m := _PSP_RE.match(key):
            _conv_module(head_p, head_b, (f"psp_{m.group(1)}",),
                         m.group(2), val)
        elif m := _LAT_RE.match(key):
            _conv_module(head_p, head_b, (f"lateral_{m.group(1)}",),
                         m.group(2), val)
        elif m := _FPN_RE.match(key):
            _conv_module(head_p, head_b, (f"fpn_{m.group(1)}",),
                         m.group(2), val)
        elif key.startswith("bottleneck."):
            _conv_module(head_p, head_b, ("bottleneck",),
                         key[len("bottleneck."):], val)
        elif key.startswith("fpn_bottleneck."):
            _conv_module(head_p, head_b, ("fpn_bottleneck",),
                         key[len("fpn_bottleneck."):], val)
    params["decode_head"] = head_p
    if head_b:
        stats["decode_head"] = head_b
    return {"params": params, "batch_stats": stats}


def load_teacher_checkpoint(path: str) -> Dict:
    """Load a ``.pt``/``.bin`` (torch) or ``.safetensors`` HF UperNet
    checkpoint from disk and convert."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = load_file(path)
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if "state_dict" in sd:
            sd = sd["state_dict"]
    return convert_hf_upernet(sd)
