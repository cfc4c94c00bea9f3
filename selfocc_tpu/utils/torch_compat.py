"""PyTorch checkpoint interop: map the reference's ``state_dict`` layout onto
this framework's param pytree (and back).

The BASELINE north star requires evaluating the reference's released
``model_state_dict.pth`` files through our eval drivers (SURVEY §5.4 /
hard part #4). Key-by-key mapping:

  reference (torch)                               ours (flax)
  ------------------------------------------------------------------
  img_backbone.{conv1,bn1,layerL.B.*}             img_backbone/{conv1,bn1,layerL_B/*}
  img_neck.lateral_convs.i.conv.*                 img_neck/lateral_i
  img_neck.fpn_convs.i.conv.*                     img_neck/fpn_i
  lifter.tpv_{hw,zh,wz}                           lifter/tpv_*
  encoder.level_embeds / cams_embeds              encoder/{level,cams}_embeds
  encoder.positional_encoding.position_layer_*    encoder/positional_encoding/*
  encoder.layers.L.attentions.0.*   (self attn)   encoder/layers/self_attn/* [stacked axis 0]
  encoder.layers.L.attentions.1.attn_{hw,zh,wz}.* encoder/layers/cross_attn_{0,1,2}/*
  encoder.layers.L.ffns.0.layers.{0.0,1}.*        encoder/layers/ffn/{fc1,fc2}
  encoder.layers.L.norms.{0,1,2}.*                encoder/layers/norm{1,2,3}
  head.model.field.density_net.{2k+1}.*           head/field/density_{k}|density_out
  head.model.field.deviation_network.variance     head/field/deviation/variance

Notes: torch Linear (out, in) <-> flax kernel (in, out); torch Conv OIHW <->
flax HWIO; the four encoder layers are nn.scan-stacked on a leading axis.
The sdfstudio fork's field is not vendored in the reference, so the field
mapping targets the BEVNeRF-style ``density_net`` Sequential naming
(``bev_nerf.py:62-71``); mismatched keys are reported, not fatal
(reference loads with ``strict=False``, ``train.py:155``).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _t(x):
    return np.asarray(x)


def _lin(sd, key):
    """torch Linear -> flax Dense dict."""
    out = {"kernel": _t(sd[key + ".weight"]).T}
    if key + ".bias" in sd:
        out["bias"] = _t(sd[key + ".bias"])
    return out


def _conv(sd, key):
    out = {"kernel": np.transpose(_t(sd[key + ".weight"]), (2, 3, 1, 0))}
    if key + ".bias" in sd:
        out["bias"] = _t(sd[key + ".bias"])
    return out


def _ln(sd, key):
    return {"scale": _t(sd[key + ".weight"]), "bias": _t(sd[key + ".bias"])}


def _stack(dicts: List[Dict]) -> Dict:
    """Stack per-layer param dicts along a new leading (scan) axis."""
    out = {}
    for k in dicts[0]:
        if isinstance(dicts[0][k], dict):
            out[k] = _stack([d[k] for d in dicts])
        else:
            out[k] = np.stack([d[k] for d in dicts])
    return out


def _deform_heads(sd, prefix):
    return {
        "sampling_offsets": _lin(sd, prefix + ".sampling_offsets"),
        "attention_weights": _lin(sd, prefix + ".attention_weights"),
    }


def import_torch_state_dict(sd: Dict[str, Any], params: Dict,
                            num_layers: int = 4, density_layers: int = 2,
                            strict: bool = False):
    """Graft a reference ``state_dict`` into a copy of ``params``.

    Returns (new_params, missing_keys) — missing = our leaves that found no
    torch source (left at their current values, mirroring ``strict=False``).
    """
    import jax
    sd = {k: _t(v) for k, v in sd.items()}
    new = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    missing: List[str] = []

    def put(path: List[str], value):
        node = new
        for p in path[:-1]:
            if p not in node:
                missing.append("/".join(path))
                return
            node = node[p]
        if path[-1] not in node:
            missing.append("/".join(path))
            return
        assert node[path[-1]].shape == value.shape, \
            f"{'/'.join(path)}: {node[path[-1]].shape} vs {value.shape}"
        node[path[-1]] = value.astype(node[path[-1]].dtype)

    def put_tree(path: List[str], tree: Dict):
        for k, v in tree.items():
            if isinstance(v, dict):
                put_tree(path + [k], v)
            else:
                put(path + [k], v)

    def has(prefix):
        return any(k.startswith(prefix) for k in sd)

    # ---- backbone (torchvision layout under the img_backbone. prefix)
    if has("img_backbone."):
        from ..models.resnet import convert_torch_resnet50
        bsd = {k[len("img_backbone."):]: v for k, v in sd.items()
               if k.startswith("img_backbone.")}
        try:
            bp, _ = convert_torch_resnet50(bsd)
            put_tree(["img_backbone"], bp)
        except KeyError:
            missing.append("img_backbone")

    # ---- FPN neck
    for i in range(8):
        if has(f"img_neck.lateral_convs.{i}."):
            put_tree(["img_neck", f"lateral_{i}"],
                     _conv(sd, f"img_neck.lateral_convs.{i}.conv"))
        if has(f"img_neck.fpn_convs.{i}."):
            put_tree(["img_neck", f"fpn_{i}"],
                     _conv(sd, f"img_neck.fpn_convs.{i}.conv"))

    # ---- lifter
    for name in ("tpv_hw", "tpv_zh", "tpv_wz", "bev"):
        if f"lifter.{name}" in sd:
            put(["lifter", name], sd[f"lifter.{name}"])

    # ---- encoder embeds + positional encoding
    for name in ("level_embeds", "cams_embeds"):
        if f"encoder.{name}" in sd:
            put(["encoder", name], sd[f"encoder.{name}"])
    for plane in ("hw", "zh", "wz"):
        key = f"encoder.positional_encoding.position_layer_{plane}"
        if has(key):
            put_tree(["encoder", "positional_encoding",
                      f"position_layer_{plane}"], _lin(sd, key))

    # ---- encoder layers (stacked for nn.scan)
    if has("encoder.layers.0."):
        def layer_tree(L):
            p = f"encoder.layers.{L}"
            tree = {
                "self_attn": {
                    "heads": _deform_heads(sd, p + ".attentions.0"),
                    "value_proj": _lin(sd, p + ".attentions.0.value_proj"),
                    "output_proj": _lin(sd, p + ".attentions.0.output_proj"),
                },
                "ffn": {
                    "fc1": _lin(sd, p + ".ffns.0.layers.0.0"),
                    "fc2": _lin(sd, p + ".ffns.0.layers.1"),
                },
                "norm1": _ln(sd, p + ".norms.0"),
                "norm2": _ln(sd, p + ".norms.1"),
                "norm3": _ln(sd, p + ".norms.2"),
            }
            for i, plane in enumerate(("hw", "zh", "wz")):
                ap = f"{p}.attentions.1.attn_{plane}"
                tree[f"cross_attn_{i}"] = {
                    "heads": _deform_heads(
                        sd, ap + ".deformable_attention"),
                    "value_proj": _lin(
                        sd, ap + ".deformable_attention.value_proj"),
                    "output_proj": _lin(sd, ap + ".output_proj"),
                }
            return tree
        try:
            put_tree(["encoder", "layers"],
                     _stack([layer_tree(L) for L in range(num_layers)]))
        except KeyError as e:
            missing.append(f"encoder.layers ({e})")

    # ---- head field (BEVNeRF-style Sequential naming)
    for k in range(density_layers):
        tk = f"head.model.field.density_net.{2 * k + 1}"
        ours = f"density_{k}" if k < density_layers - 1 else "density_out"
        if has(tk):
            put_tree(["head", "field", ours], _lin(sd, tk))
    if "head.model.field.deviation_network.variance" in sd:
        put(["head", "field", "deviation", "variance"],
            sd["head.model.field.deviation_network.variance"].reshape(()))

    if strict and missing:
        raise KeyError(f"unmapped keys: {missing}")
    return new, missing


def export_torch_state_dict(params: Dict, num_layers: int = 4,
                            density_layers: int = 2) -> Dict[str, np.ndarray]:
    """Inverse mapping: our param pytree -> a reference-layout state_dict
    (used for cross-framework validation and round-trip tests)."""
    sd: Dict[str, np.ndarray] = {}

    def lin(key, tree):
        sd[key + ".weight"] = np.asarray(tree["kernel"]).T
        if "bias" in tree:
            sd[key + ".bias"] = np.asarray(tree["bias"])

    def ln(key, tree):
        sd[key + ".weight"] = np.asarray(tree["scale"])
        sd[key + ".bias"] = np.asarray(tree["bias"])

    p = params
    if "lifter" in p:
        for name in ("tpv_hw", "tpv_zh", "tpv_wz", "bev"):
            if name in p["lifter"]:
                sd[f"lifter.{name}"] = np.asarray(p["lifter"][name])
    if "encoder" in p:
        e = p["encoder"]
        for name in ("level_embeds", "cams_embeds"):
            if name in e:
                sd[f"encoder.{name}"] = np.asarray(e[name])
        pe = e.get("positional_encoding", {})
        for plane in ("hw", "zh", "wz"):
            if f"position_layer_{plane}" in pe:
                lin(f"encoder.positional_encoding.position_layer_{plane}",
                    pe[f"position_layer_{plane}"])
        if "layers" in e:
            ly = e["layers"]

            def unstack(tree, L):
                return {k: (unstack(v, L) if isinstance(v, dict)
                            else np.asarray(v)[L]) for k, v in tree.items()}
            for L in range(num_layers):
                t = unstack(ly, L)
                pfx = f"encoder.layers.{L}"
                lin(pfx + ".attentions.0.sampling_offsets",
                    t["self_attn"]["heads"]["sampling_offsets"])
                lin(pfx + ".attentions.0.attention_weights",
                    t["self_attn"]["heads"]["attention_weights"])
                lin(pfx + ".attentions.0.value_proj",
                    t["self_attn"]["value_proj"])
                lin(pfx + ".attentions.0.output_proj",
                    t["self_attn"]["output_proj"])
                for i, plane in enumerate(("hw", "zh", "wz")):
                    ap = f"{pfx}.attentions.1.attn_{plane}"
                    lin(ap + ".deformable_attention.sampling_offsets",
                        t[f"cross_attn_{i}"]["heads"]["sampling_offsets"])
                    lin(ap + ".deformable_attention.attention_weights",
                        t[f"cross_attn_{i}"]["heads"]["attention_weights"])
                    lin(ap + ".deformable_attention.value_proj",
                        t[f"cross_attn_{i}"]["value_proj"])
                    lin(ap + ".output_proj", t[f"cross_attn_{i}"]["output_proj"])
                lin(pfx + ".ffns.0.layers.0.0", t["ffn"]["fc1"])
                lin(pfx + ".ffns.0.layers.1", t["ffn"]["fc2"])
                ln(pfx + ".norms.0", t["norm1"])
                ln(pfx + ".norms.1", t["norm2"])
                ln(pfx + ".norms.2", t["norm3"])
    if "head" in p and "field" in p["head"]:
        f = p["head"]["field"]
        for k in range(density_layers):
            ours = f"density_{k}" if k < density_layers - 1 else "density_out"
            if ours in f:
                lin(f"head.model.field.density_net.{2 * k + 1}", f[ours])
        if "deviation" in f:
            sd["head.model.field.deviation_network.variance"] = \
                np.asarray(f["deviation"]["variance"]).reshape(1)
    return sd
