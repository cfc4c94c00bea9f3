"""Export this framework's params to a reference-SelfOcc ``.pth`` state_dict.

The inverse of ``ref_import.convert_reference_state_dict``: a checkpoint
trained HERE can be scored by the reference repo's own eval scripts — the
strongest off-sandbox parity evidence available (VERDICT r2 #8). Key naming
follows the reference module tree (see ``ref_import`` module docstring for
the file:line derivation); transforms are the exact inverses (flax kernel
``(in, out)`` -> torch Linear ``(out, in)``; flax ``HWIO`` conv -> torch
``OIHW``; LayerNorm ``scale`` -> ``weight``; the ``nn.scan``-stacked encoder
layers are UNSTACKED back into ``encoder.layers.{n}.*``).

``color_proj`` (this framework's explicit SH projection, absent from the
reference tree) exports as ``head.model.field.color_proj.{weight,bias}`` —
``ref_import`` recognizes the same name, so export->import roundtrips; the
reference itself ignores the unknown key under ``strict=False`` loading.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from . import ref_import as ri


def _np(x):
    return np.asarray(x)


def _lin_back(kernel):
    return _np(kernel).T.copy()


def _conv_back(kernel):
    return np.transpose(_np(kernel), (3, 2, 0, 1)).copy()


_INV = {ri._lin_w: _lin_back, ri._conv_w: _conv_back, ri._arr: _np,
        ri._scalar: lambda v: _np(v).reshape(1)}


def _get(tree, path):
    node = tree
    for k in path:
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


def _export_resnet50(params: Dict, stats: Dict, sd: Dict):
    """Inverse of ``models/resnet.py::convert_torch_resnet50``."""
    sd["img_backbone.conv1.weight"] = _conv_back(params["conv1"]["kernel"])
    _export_bn(params["bn1"], stats["bn1"], "img_backbone.bn1", sd)
    for stage, n in enumerate((3, 4, 6, 3)):
        for blk in range(n):
            name = f"layer{stage + 1}_{blk}"
            tp = f"img_backbone.layer{stage + 1}.{blk}"
            bp, bs = params[name], stats[name]
            for i in (1, 2, 3):
                sd[f"{tp}.conv{i}.weight"] = _conv_back(bp[f"conv{i}"]["kernel"])
                _export_bn(bp[f"bn{i}"], bs[f"bn{i}"], f"{tp}.bn{i}", sd)
            if "ds_conv" in bp:
                sd[f"{tp}.downsample.0.weight"] = _conv_back(
                    bp["ds_conv"]["kernel"])
                _export_bn(bp["ds_bn"], bs["ds_bn"], f"{tp}.downsample.1", sd)


def _export_bn(p, s, prefix, sd):
    sd[prefix + ".weight"] = _np(p["scale"])
    sd[prefix + ".bias"] = _np(p["bias"])
    sd[prefix + ".running_mean"] = _np(s["mean"])
    sd[prefix + ".running_var"] = _np(s["var"])


def export_reference_state_dict(variables: Dict[str, Any],
                                as_torch: bool = True) -> Dict[str, Any]:
    """params/batch_stats -> reference-named state_dict (numpy or torch)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, Any] = {}

    # only the ResNet-50 backbone has a reference-layout export; other
    # backbones (tiny test stub, UNet2D) have no reference counterpart to
    # name their tensors after and are skipped (they stay in Orbax ckpts)
    if "img_backbone" in params and "bn1" in params["img_backbone"]:
        _export_resnet50(params["img_backbone"], stats.get("img_backbone", {}),
                         sd)

    # neck (mmdet FPN naming, ref_import._NECK_RE)
    neck = params.get("img_neck", {})
    for key, leaves in neck.items():
        kind, i = key.rsplit("_", 1)
        sd[f"img_neck.{kind}_convs.{i}.conv.weight"] = _conv_back(
            leaves["kernel"])
        if "bias" in leaves:
            sd[f"img_neck.{kind}_convs.{i}.conv.bias"] = _np(leaves["bias"])

    # top-level map inverted (lifter embeds, positional encodings, deviation)
    for ref_key, (path, fn) in ri._TOP_MAP.items():
        val = _get(params, path)
        if val is not None:
            sd[ref_key] = _INV[fn](val)

    # encoder layers: unstack the nn.scan leading axis
    enc_layers = _get(params, ("encoder", "layers"))
    if enc_layers is not None:
        n_layers = None
        for ref_suffix, (path, fn) in ri._LAYER_MAP.items():
            val = _get(enc_layers, path)
            if val is None:
                continue
            n_layers = val.shape[0]
            for n in range(n_layers):
                sd[f"encoder.layers.{n}.{ref_suffix}"] = _INV[fn](val[n])

    # field decode MLP (+ color_proj); NeuS='field', NeRFAcc='radiance_field'
    for owner, ref_owner in (("field", "head.model.field"),
                             ("radiance_field", "head.radiance_field")):
        net = _get(params, ("head", owner))
        if not net:
            continue
        hidden = sorted(int(k.split("_")[1]) for k in net
                        if k.startswith("density_") and k != "density_out")
        for i in hidden:
            sd[f"{ref_owner}.density_net.{2 * i + 1}.weight"] = _lin_back(
                net[f"density_{i}"]["kernel"])
            sd[f"{ref_owner}.density_net.{2 * i + 1}.bias"] = _np(
                net[f"density_{i}"]["bias"])
        out_idx = 2 * len(hidden) + 1
        sd[f"{ref_owner}.density_net.{out_idx}.weight"] = _lin_back(
            net["density_out"]["kernel"])
        sd[f"{ref_owner}.density_net.{out_idx}.bias"] = _np(
            net["density_out"]["bias"])
        if "color_proj" in net:
            sd[f"{ref_owner}.color_proj.weight"] = _lin_back(
                net["color_proj"]["kernel"])
            sd[f"{ref_owner}.color_proj.bias"] = _np(net["color_proj"]["bias"])

    # BEV flow head (ref_import._FLOW_SEQ inverted)
    flow = _get(params, ("head", "flow_net"))
    if flow:
        flow_stats = _get(stats, ("head", "flow_net")) or {}
        for seq_idx, (name, kind) in ri._FLOW_SEQ.items():
            if name not in flow:
                continue
            tp = f"head.flow_net.{seq_idx}"
            if kind == "conv":
                sd[tp + ".weight"] = _conv_back(flow[name]["kernel"])
                if "bias" in flow[name]:
                    sd[tp + ".bias"] = _np(flow[name]["bias"])
            else:
                sd[tp + ".weight"] = _np(flow[name]["scale"])
                sd[tp + ".bias"] = _np(flow[name]["bias"])
                if name in flow_stats:
                    sd[tp + ".running_mean"] = _np(flow_stats[name]["mean"])
                    sd[tp + ".running_var"] = _np(flow_stats[name]["var"])

    if as_torch:
        import torch
        sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
              sd.items()}
    return sd


def save_reference_pth(variables: Dict[str, Any], path: str):
    """Write ``{'state_dict': ...}`` the way the reference's ``train.py``
    checkpoints do, loadable by its eval drivers via ``load_from``."""
    import torch
    torch.save({"state_dict": export_reference_state_dict(variables)}, path)
