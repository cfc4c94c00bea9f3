"""Import a reference-SelfOcc torch checkpoint into this framework's params.

The reference's ``state_dict`` layout is fixed by its module tree:

  * ``img_backbone.*``      — mmdet ResNet-50, torchvision naming
                              (``model/segmentor/base_segmentor.py:21``)
  * ``img_neck.lateral_convs.{i}.conv.* / fpn_convs.{i}.conv.*``
                              — mmdet FPN
  * ``lifter.tpv_hw|tpv_zh|tpv_wz`` — ``model/lifter/tpv_query_lifter.py:23-25``
    (``lifter.bev`` for the BEV variant, ``bev_query_lifter.py:21``;
    ``lifter.position_layer_{hw,zh,wz}`` for ``tpv_pos_lifter.py:76-78``)
  * ``encoder.level_embeds / cams_embeds``
                              — ``tpvformer_encoder.py:122-124``
  * ``encoder.positional_encoding.position_layer_{hw,zh,wz}.*``
                              — ``tpvformer_pos_embed.py:50-52``
  * ``encoder.layers.{n}.attentions.0.*`` — CrossViewHybridAttention, an mmcv
    ``MultiScaleDeformableAttention`` (``cross_view_hybrid_attention.py:12``):
    ``sampling_offsets / attention_weights / value_proj / output_proj``
  * ``encoder.layers.{n}.attentions.1.attn_{hw,zh,wz}.*`` — image cross
    attention (``tpvformer/attention/image_cross_attention.py:36-69``), each an
    outer ``output_proj`` plus ``deformable_attention.{sampling_offsets,
    attention_weights,value_proj}``
    (``bevformer/attention/image_cross_attention.py:218-223``)
  * ``encoder.layers.{n}.ffns.0.layers.0.0 / layers.1`` — mmcv FFN Linears
  * ``encoder.layers.{n}.norms.{j}`` — LayerNorms
  * ``head.model.field.deviation_network.variance`` — NeuS inv_s

Transforms: torch Linear ``(out, in)`` -> flax kernel ``(in, out)``; torch
Conv ``OIHW`` -> flax ``HWIO``; LayerNorm ``weight`` -> ``scale``; the N
encoder layers are STACKED along a new leading axis to match this framework's
``nn.scan`` layout (one compiled layer body, params ``(N, ...)``).

Both DeformHeads flatten offsets/weights as ``(heads, levels, points, 2)`` —
the same order as mmcv (``multi_scale_deform_attn.py`` ``.view(bs, nq, heads,
levels, points, 2)``) — so Linear weights copy over with only a transpose.

Field decode MLP: the in-repo template is ``BEVNeRF.density_net``, a
``nn.Sequential([Softplus, Linear] x density_layers)`` whose Linears sit at
odd indices (``model/head/nerfacc_head/bev_nerf.py:62-71``). Keys matched:

  * ``head.radiance_field.density_net.{2i+1}.*`` — NeRFAccHead (exact
    in-repo naming, ``nerfacc_head.py:108``)
  * ``head.model.field.density_net.{2i+1}.*`` — NeuSHead, assuming the
    private sdfstudio fork mirrors the template's naming (its config
    surface does, ``neus_head.py:170-185``); the last Linear maps to
    ``density_out``, earlier ones to ``density_{i}``. A real fork
    checkpoint with different names still imports via ``extra``.

``color_proj``: imported when the checkpoint carries
``head.model.field.color_proj.*`` (the naming ``ref_export`` writes, so
export->import roundtrips); AUTHENTIC reference checkpoints don't have the
key (the fork's internal color head is opaque) — those keep a random color
projection, which leaves SDF/semantics eval [IoU/mIoU] untouched and only
perturbs rendered RGB. A fork with different field naming imports via
``extra`` (worked example: ``tests/test_ref_import.py::
test_extra_mapping_divergent_fork_naming``). ``head.flow_net.*`` imports
directly (both sides are Conv-BatchNorm-ReLU x2 + 1x1 Conv, reference
``neus_head.py:224-235``). The inverse direction — exporting a checkpoint
trained here for the reference's own eval scripts — is ``ref_export.py``.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.resnet import convert_torch_resnet50


def _lin_w(t):
    return jnp.asarray(np.asarray(t).T)


def _conv_w(t):
    return jnp.asarray(np.transpose(np.asarray(t), (2, 3, 1, 0)))


def _arr(t):
    return jnp.asarray(np.asarray(t))


def _scalar(t):
    """(1,)-shaped reference scalar (e.g. SingleVarianceNetwork.variance)
    -> 0-d param; ref_export inverts back to (1,)."""
    return jnp.asarray(np.asarray(t)).reshape(())


def _set(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


# per-layer encoder sub-keys: reference suffix -> (our suffix path, transform)
_LAYER_MAP = {}
for _ours, _ref in [("self_attn", "attentions.0")]:
    _LAYER_MAP.update({
        f"{_ref}.sampling_offsets.weight":
            ((_ours, "heads", "sampling_offsets", "kernel"), _lin_w),
        f"{_ref}.sampling_offsets.bias":
            ((_ours, "heads", "sampling_offsets", "bias"), _arr),
        f"{_ref}.attention_weights.weight":
            ((_ours, "heads", "attention_weights", "kernel"), _lin_w),
        f"{_ref}.attention_weights.bias":
            ((_ours, "heads", "attention_weights", "bias"), _arr),
        f"{_ref}.value_proj.weight": ((_ours, "value_proj", "kernel"), _lin_w),
        f"{_ref}.value_proj.bias": ((_ours, "value_proj", "bias"), _arr),
        f"{_ref}.output_proj.weight": ((_ours, "output_proj", "kernel"), _lin_w),
        f"{_ref}.output_proj.bias": ((_ours, "output_proj", "bias"), _arr),
    })
for _i, _plane in enumerate(("hw", "zh", "wz")):
    _ours = f"cross_attn_{_i}"
    _ref = f"attentions.1.attn_{_plane}"
    _LAYER_MAP.update({
        f"{_ref}.deformable_attention.sampling_offsets.weight":
            ((_ours, "heads", "sampling_offsets", "kernel"), _lin_w),
        f"{_ref}.deformable_attention.sampling_offsets.bias":
            ((_ours, "heads", "sampling_offsets", "bias"), _arr),
        f"{_ref}.deformable_attention.attention_weights.weight":
            ((_ours, "heads", "attention_weights", "kernel"), _lin_w),
        f"{_ref}.deformable_attention.attention_weights.bias":
            ((_ours, "heads", "attention_weights", "bias"), _arr),
        f"{_ref}.deformable_attention.value_proj.weight":
            ((_ours, "value_proj", "kernel"), _lin_w),
        f"{_ref}.deformable_attention.value_proj.bias":
            ((_ours, "value_proj", "bias"), _arr),
        f"{_ref}.output_proj.weight": ((_ours, "output_proj", "kernel"), _lin_w),
        f"{_ref}.output_proj.bias": ((_ours, "output_proj", "bias"), _arr),
    })
_LAYER_MAP.update({
    "ffns.0.layers.0.0.weight": (("ffn", "fc1", "kernel"), _lin_w),
    "ffns.0.layers.0.0.bias": (("ffn", "fc1", "bias"), _arr),
    "ffns.0.layers.1.weight": (("ffn", "fc2", "kernel"), _lin_w),
    "ffns.0.layers.1.bias": (("ffn", "fc2", "bias"), _arr),
})
for _j in range(3):
    _LAYER_MAP[f"norms.{_j}.weight"] = ((f"norm{_j + 1}", "scale"), _arr)
    _LAYER_MAP[f"norms.{_j}.bias"] = ((f"norm{_j + 1}", "bias"), _arr)

_LAYER_RE = re.compile(r"^encoder\.layers\.(\d+)\.(.+)$")

# top-level (non-layer) keys
_TOP_MAP: Dict[str, Tuple[Tuple[str, ...], Callable]] = {
    "encoder.level_embeds": (("encoder", "level_embeds"), _arr),
    "encoder.cams_embeds": (("encoder", "cams_embeds"), _arr),
    "lifter.tpv_hw": (("lifter", "tpv_hw"), _arr),
    "lifter.tpv_zh": (("lifter", "tpv_zh"), _arr),
    "lifter.tpv_wz": (("lifter", "tpv_wz"), _arr),
    "lifter.bev": (("lifter", "bev"), _arr),
    # reference stores inv_s as shape (1,) (SingleVarianceNetwork); ours is
    # a scalar param — squeeze on import (ref_export writes (1,) back)
    "head.model.field.deviation_network.variance":
        (("head", "field", "deviation", "variance"), _scalar),
}
for _p in ("hw", "zh", "wz"):
    for _owner in ("encoder.positional_encoding", "lifter"):
        _ours_owner = tuple(_owner.split("."))
        _TOP_MAP[f"{_owner}.position_layer_{_p}.weight"] = (
            _ours_owner + (f"position_layer_{_p}", "kernel"), _lin_w)
        _TOP_MAP[f"{_owner}.position_layer_{_p}.bias"] = (
            _ours_owner + (f"position_layer_{_p}", "bias"), _arr)

_NECK_RE = re.compile(r"^img_neck\.(lateral|fpn)_convs\.(\d+)\.conv\.(weight|bias)$")

# BEV flow head (reference neus_head.py:224-235 Sequential):
# [0]=Conv3x3 [1]=BN [3]=Conv3x3 [4]=BN [6]=Conv1x1
_FLOW_RE = re.compile(
    r"^head\.flow_net\.(\d+)\.(weight|bias|running_mean|running_var)$")
_FLOW_SEQ = {0: ("conv0", "conv"), 1: ("norm0", "bn"),
             3: ("conv1", "conv"), 4: ("norm1", "bn"), 6: ("out", "conv")}

# field decode MLP (NeuS fork / NeRFAcc BEVNeRF, see module docstring)
_FIELD_RE = re.compile(
    r"^head\.(model\.field|radiance_field)\.density_net\.(\d+)\.(weight|bias)$")
# explicit SH color projection — this framework's own export naming
# (ref_export.py); also the natural fork name if one materializes
_COLOR_RE = re.compile(
    r"^head\.(model\.field|radiance_field)\.color_proj\.(weight|bias)$")


def convert_reference_state_dict(
        state_dict: Dict[str, Any],
        extra: Optional[Dict[str, Tuple[Tuple[str, ...], Callable]]] = None,
):
    """Convert a reference-SelfOcc ``state_dict`` to (params, batch_stats,
    unmatched_keys).

    ``extra`` supplies mappings for keys this repo cannot derive (the
    sdfstudio-fork field MLP); entries look like
    ``{"head.model.field.glin0.weight": (("head","field","density_0","kernel"),
    ref_import._lin_w)}``.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    unmatched = []

    backbone_sd = {k[len("img_backbone."):]: v for k, v in state_dict.items()
                   if k.startswith("img_backbone.")}
    if backbone_sd:
        bb_params, bb_stats = convert_torch_resnet50(backbone_sd)
        params["img_backbone"] = bb_params
        stats["img_backbone"] = bb_stats

    # encoder layers: collect per-layer, then stack to the nn.scan layout
    per_layer: Dict[int, Dict[Tuple[str, ...], Any]] = {}
    # field MLP: collect Sequential indices, then name by position
    field_net: Dict[int, Dict[str, Any]] = {}

    for key, val in state_dict.items():
        if key.startswith("img_backbone."):
            continue
        if extra and key in extra:
            path, fn = extra[key]
            _set(params, path, fn(val))
            continue
        if key in _TOP_MAP:
            path, fn = _TOP_MAP[key]
            _set(params, path, fn(val))
            continue
        m = _NECK_RE.match(key)
        if m:
            kind, i, wb = m.group(1), int(m.group(2)), m.group(3)
            leaf = "kernel" if wb == "weight" else "bias"
            fn = _conv_w if wb == "weight" else _arr
            _set(params, ("img_neck", f"{kind}_{i}", leaf), fn(val))
            continue
        m = _FLOW_RE.match(key)
        if m and int(m.group(1)) in _FLOW_SEQ:
            name, kind, leaf = *_FLOW_SEQ[int(m.group(1))], m.group(2)
            if kind == "conv":
                fn = _conv_w if leaf == "weight" else _arr
                _set(params, ("head", "flow_net", name,
                              "kernel" if leaf == "weight" else "bias"),
                     fn(val))
            elif leaf in ("weight", "bias"):
                _set(params, ("head", "flow_net", name,
                              "scale" if leaf == "weight" else "bias"),
                     _arr(val))
            else:
                _set(stats, ("head", "flow_net", name,
                             "mean" if leaf == "running_mean" else "var"),
                     _arr(val))
            continue
        m = _FIELD_RE.match(key)
        if m:
            idx, wb = int(m.group(2)), m.group(3)
            leaf = "kernel" if wb == "weight" else "bias"
            fn = _lin_w if wb == "weight" else _arr
            # the NeuS head registers the field as 'field'; NeRFAccHead as
            # 'radiance_field' (density_head.py:74) — keep the spelling so
            # merge_imported lands on the right flax subtree
            owner = "radiance_field" if m.group(1) == "radiance_field" \
                else "field"
            field_net.setdefault((owner, idx), {})[leaf] = fn(val)
            continue
        m = _COLOR_RE.match(key)
        if m:
            owner = "radiance_field" if m.group(1) == "radiance_field" \
                else "field"
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            fn = _lin_w if m.group(2) == "weight" else _arr
            _set(params, ("head", owner, "color_proj", leaf), fn(val))
            continue
        m = _LAYER_RE.match(key)
        if m and m.group(2) in _LAYER_MAP:
            path, fn = _LAYER_MAP[m.group(2)]
            per_layer.setdefault(int(m.group(1)), {})[path] = fn(val)
            continue
        unmatched.append(key)

    if field_net:
        # Sequential Linears sit at odd indices; i-th Linear -> density_{i},
        # last -> density_out (models/field.py setup); grouped per owner
        # ('field' for NeuSHead, 'radiance_field' for NeRFAccHead)
        owners = {}
        for (owner, seq_idx), leaves in field_net.items():
            owners.setdefault(owner, {})[seq_idx] = leaves
        for owner, net in owners.items():
            order = sorted(net)
            for i, seq_idx in enumerate(order):
                name = "density_out" if i == len(order) - 1 \
                    else f"density_{i}"
                for leaf, v in net[seq_idx].items():
                    _set(params, ("head", owner, name, leaf), v)

    if per_layer:
        n_layers = max(per_layer) + 1
        paths = sorted(per_layer[0], key="/".join)
        for path in paths:
            stacked = jnp.stack([per_layer[i][path] for i in range(n_layers)])
            _set(params, ("encoder", "layers") + path, stacked)

    return params, stats, unmatched


def merge_imported(variables: Dict[str, Any], imported_params: Dict[str, Any],
                   imported_stats: Dict[str, Any]):
    """Overlay imported subtrees onto freshly-initialised ``variables``,
    asserting shape agreement leaf-by-leaf."""
    import jax

    def overlay(dst, src, scope):
        for k, v in src.items():
            if isinstance(v, dict):
                assert k in dst, f"{scope}/{k} missing in model"
                overlay(dst[k], v, f"{scope}/{k}")
            else:
                assert k in dst, f"{scope}/{k} missing in model"
                assert dst[k].shape == v.shape, \
                    f"{scope}/{k}: model {dst[k].shape} vs ckpt {v.shape}"
                dst[k] = v.astype(dst[k].dtype)

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # copy
    overlay(variables["params"], imported_params, "params")
    if imported_stats:
        overlay(variables.setdefault("batch_stats", {}), imported_stats,
                "batch_stats")
    return variables
