"""Reference-checkpoint importer: synthesize a state_dict with the reference's
exact key naming (derived from its module tree — see ref_import docstring for
file:line cites), convert, and overlay onto a freshly-initialised model.

Validates: key coverage (no unmatched core keys), torch->flax transforms
(Linear transpose, Conv OIHW->HWIO, LayerNorm weight->scale), and the
per-layer -> nn.scan stacking, leaf shapes checked against the real model.
"""
import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from selfocc_tpu.models.segmentor import TPVSegmentor
from selfocc_tpu.utils.ref_import import (convert_reference_state_dict,
                                          merge_imported)

from utils_tiny import make_cameras, tiny_config


def _ref_keys_from_ours(params, num_layers):
    """Invert the importer mapping: build reference-named torch tensors whose
    transposed shapes match our param tree."""
    sd = {}

    def lin(our):  # flax kernel (in, out) -> torch (out, in)
        return torch.randn(*np.asarray(our).T.shape)

    enc = params["encoder"]["layers"]
    for n in range(num_layers):
        for ours, ref in [("self_attn", "attentions.0")]:
            sub = enc[ours]
            sd[f"encoder.layers.{n}.{ref}.sampling_offsets.weight"] = \
                lin(sub["heads"]["sampling_offsets"]["kernel"][n])
            sd[f"encoder.layers.{n}.{ref}.sampling_offsets.bias"] = \
                torch.randn(sub["heads"]["sampling_offsets"]["bias"].shape[1])
            sd[f"encoder.layers.{n}.{ref}.attention_weights.weight"] = \
                lin(sub["heads"]["attention_weights"]["kernel"][n])
            sd[f"encoder.layers.{n}.{ref}.attention_weights.bias"] = \
                torch.randn(sub["heads"]["attention_weights"]["bias"].shape[1])
            for p in ("value_proj", "output_proj"):
                sd[f"encoder.layers.{n}.{ref}.{p}.weight"] = lin(sub[p]["kernel"][n])
                sd[f"encoder.layers.{n}.{ref}.{p}.bias"] = \
                    torch.randn(sub[p]["bias"].shape[1])
        for i, plane in enumerate(("hw", "zh", "wz")):
            sub = enc[f"cross_attn_{i}"]
            ref = f"attentions.1.attn_{plane}"
            sd[f"encoder.layers.{n}.{ref}.deformable_attention.sampling_offsets.weight"] = \
                lin(sub["heads"]["sampling_offsets"]["kernel"][n])
            sd[f"encoder.layers.{n}.{ref}.deformable_attention.sampling_offsets.bias"] = \
                torch.randn(sub["heads"]["sampling_offsets"]["bias"].shape[1])
            sd[f"encoder.layers.{n}.{ref}.deformable_attention.attention_weights.weight"] = \
                lin(sub["heads"]["attention_weights"]["kernel"][n])
            sd[f"encoder.layers.{n}.{ref}.deformable_attention.attention_weights.bias"] = \
                torch.randn(sub["heads"]["attention_weights"]["bias"].shape[1])
            sd[f"encoder.layers.{n}.{ref}.deformable_attention.value_proj.weight"] = \
                lin(sub["value_proj"]["kernel"][n])
            sd[f"encoder.layers.{n}.{ref}.deformable_attention.value_proj.bias"] = \
                torch.randn(sub["value_proj"]["bias"].shape[1])
            sd[f"encoder.layers.{n}.{ref}.output_proj.weight"] = \
                lin(sub["output_proj"]["kernel"][n])
            sd[f"encoder.layers.{n}.{ref}.output_proj.bias"] = \
                torch.randn(sub["output_proj"]["bias"].shape[1])
        sd[f"encoder.layers.{n}.ffns.0.layers.0.0.weight"] = \
            lin(enc["ffn"]["fc1"]["kernel"][n])
        sd[f"encoder.layers.{n}.ffns.0.layers.0.0.bias"] = \
            torch.randn(enc["ffn"]["fc1"]["bias"].shape[1])
        sd[f"encoder.layers.{n}.ffns.0.layers.1.weight"] = \
            lin(enc["ffn"]["fc2"]["kernel"][n])
        sd[f"encoder.layers.{n}.ffns.0.layers.1.bias"] = \
            torch.randn(enc["ffn"]["fc2"]["bias"].shape[1])
        for j in range(3):
            sd[f"encoder.layers.{n}.norms.{j}.weight"] = \
                torch.randn(enc[f"norm{j+1}"]["scale"].shape[1])
            sd[f"encoder.layers.{n}.norms.{j}.bias"] = \
                torch.randn(enc[f"norm{j+1}"]["bias"].shape[1])

    sd["encoder.level_embeds"] = torch.randn(
        *params["encoder"]["level_embeds"].shape)
    sd["encoder.cams_embeds"] = torch.randn(
        *params["encoder"]["cams_embeds"].shape)
    for p in ("hw", "zh", "wz"):
        pe = params["encoder"]["positional_encoding"][f"position_layer_{p}"]
        sd[f"encoder.positional_encoding.position_layer_{p}.weight"] = lin(pe["kernel"])
        sd[f"encoder.positional_encoding.position_layer_{p}.bias"] = \
            torch.randn(*pe["bias"].shape)
        sd[f"lifter.tpv_{p}"] = torch.randn(*params["lifter"][f"tpv_{p}"].shape)
    for kind in ("lateral", "fpn"):
        for i in range(4):
            neck = params["img_neck"][f"{kind}_{i}"]
            sd[f"img_neck.{kind}_convs.{i}.conv.weight"] = \
                torch.randn(*np.transpose(np.asarray(neck["kernel"]),
                                          (3, 2, 0, 1)).shape)
            sd[f"img_neck.{kind}_convs.{i}.conv.bias"] = \
                torch.randn(*neck["bias"].shape)
    sd["head.model.field.deviation_network.variance"] = torch.randn(())
    # field decode MLP, bev_nerf.py:62-71 Sequential naming: Linears at odd
    # indices; last one is the (1+color+sem)-channel output layer
    field = params["head"]["field"]
    n_hidden = sum(1 for k in field if k.startswith("density_")
                   and k != "density_out")
    for i in range(n_hidden):
        sd[f"head.model.field.density_net.{2 * i + 1}.weight"] = \
            lin(field[f"density_{i}"]["kernel"])
        sd[f"head.model.field.density_net.{2 * i + 1}.bias"] = \
            torch.randn(*field[f"density_{i}"]["bias"].shape)
    sd[f"head.model.field.density_net.{2 * n_hidden + 1}.weight"] = \
        lin(field["density_out"]["kernel"])
    sd[f"head.model.field.density_net.{2 * n_hidden + 1}.bias"] = \
        torch.randn(*field["density_out"]["bias"].shape)
    return sd


def test_reference_checkpoint_roundtrip():
    cfg = tiny_config(sem=True)
    model = TPVSegmentor(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)
    H, W = cfg.input_size
    imgs = jax.random.uniform(rng, (1, cfg.num_cams, H, W, 3))
    cams = make_cameras(cfg.num_cams, cfg.input_size)
    variables = jax.jit(lambda: model.init(
        {'params': rng, 'dropout': jax.random.PRNGKey(1)},
        imgs, cams['lidar2img'], cams['img2lidar'], rng, 0, True))()

    sd = _ref_keys_from_ours(variables["params"],
                             cfg.model.encoder.num_layers)
    params, stats, unmatched = convert_reference_state_dict(sd)
    assert unmatched == []

    merged = merge_imported(variables, params, stats)

    # spot-check value transforms: Linear transpose + layer stacking
    w0 = sd["encoder.layers.0.ffns.0.layers.0.0.weight"].numpy()
    got = np.asarray(merged["params"]["encoder"]["layers"]["ffn"]["fc1"]["kernel"][0])
    np.testing.assert_allclose(got, w0.T, rtol=1e-6)
    last = cfg.model.encoder.num_layers - 1
    ln = sd[f"encoder.layers.{last}.norms.2.weight"].numpy()
    got = np.asarray(
        merged["params"]["encoder"]["layers"]["norm3"]["scale"][last])
    np.testing.assert_allclose(got, ln, rtol=1e-6)
    neck = sd["img_neck.lateral_convs.2.conv.weight"].numpy()
    got = np.asarray(merged["params"]["img_neck"]["lateral_2"]["kernel"])
    np.testing.assert_allclose(got, np.transpose(neck, (2, 3, 1, 0)), rtol=1e-6)
    # field MLP landed: first hidden + output layer, transposed
    f0 = sd["head.model.field.density_net.1.weight"].numpy()
    got = np.asarray(merged["params"]["head"]["field"]["density_0"]["kernel"])
    np.testing.assert_allclose(got, f0.T, rtol=1e-6)
    keys = sorted(sd)
    out_idx = max(int(k.split(".")[-2]) for k in keys
                  if "density_net" in k)
    fo = sd[f"head.model.field.density_net.{out_idx}.weight"].numpy()
    got = np.asarray(
        merged["params"]["head"]["field"]["density_out"]["kernel"])
    np.testing.assert_allclose(got, fo.T, rtol=1e-6)

    # the merged variables still drive the model
    out, _ = jax.jit(lambda v: model.apply(
        v, imgs, cams['lidar2img'], cams['img2lidar'], rng, 0, True,
        rngs={'dropout': rng}, mutable=['batch_stats']))(merged)
    assert np.isfinite(np.asarray(out['ms_depths'][0])).all()


def test_merge_rejects_shape_mismatch():
    cfg = tiny_config(sem=True, backbone='tiny')
    model = TPVSegmentor(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)
    H, W = cfg.input_size
    imgs = jax.random.uniform(rng, (1, cfg.num_cams, H, W, 3))
    cams = make_cameras(cfg.num_cams, cfg.input_size)
    variables = jax.jit(lambda: model.init(
        {'params': rng, 'dropout': jax.random.PRNGKey(1)},
        imgs, cams['lidar2img'], cams['img2lidar'], rng, 0, True))()
    bad = {"lifter": {"tpv_hw": jnp.zeros((1, 7, 7))}}
    with pytest.raises(AssertionError):
        merge_imported(variables, bad, {})


def test_nerfacc_radiance_field_and_flow_import():
    """The 'radiance_field' key spelling must land on NeRFAccHead's
    radiance_field subtree (not 'field'), and head.flow_net.* (Conv-BN x2 +
    1x1 Conv, reference neus_head.py:224-235) imports into FlowNet params +
    batch_stats (round-2 review findings)."""
    C = 8
    sd = {
        # NeRFAcc field MLP (Sequential odd indices)
        "head.radiance_field.density_net.1.weight": torch.randn(C, C),
        "head.radiance_field.density_net.1.bias": torch.randn(C),
        "head.radiance_field.density_net.3.weight": torch.randn(5, C),
        "head.radiance_field.density_net.3.bias": torch.randn(5),
        # flow head
        "head.flow_net.0.weight": torch.randn(C, 2 * C, 3, 3),
        "head.flow_net.1.weight": torch.randn(C),
        "head.flow_net.1.bias": torch.randn(C),
        "head.flow_net.1.running_mean": torch.randn(C),
        "head.flow_net.1.running_var": torch.rand(C) + 0.5,
        "head.flow_net.3.weight": torch.randn(C, C, 3, 3),
        "head.flow_net.4.weight": torch.randn(C),
        "head.flow_net.4.bias": torch.randn(C),
        "head.flow_net.4.running_mean": torch.randn(C),
        "head.flow_net.4.running_var": torch.rand(C) + 0.5,
        "head.flow_net.6.weight": torch.randn(9, C, 1, 1),
        "head.flow_net.6.bias": torch.randn(9),
    }
    params, stats, unmatched = convert_reference_state_dict(sd)
    assert unmatched == []
    rf = params["head"]["radiance_field"]
    assert rf["density_0"]["kernel"].shape == (C, C)
    assert rf["density_out"]["kernel"].shape == (C, 5)
    assert "field" not in params["head"]
    fn = params["head"]["flow_net"]
    assert fn["conv0"]["kernel"].shape == (3, 3, 2 * C, C)
    assert fn["out"]["kernel"].shape == (1, 1, C, 9)
    assert fn["norm0"]["scale"].shape == (C,)
    assert stats["head"]["flow_net"]["norm1"]["mean"].shape == (C,)


def _tiny_variables(sem=True):
    cfg = tiny_config(sem=sem)
    model = TPVSegmentor(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)
    H, W = cfg.input_size
    imgs = jax.random.uniform(rng, (1, cfg.num_cams, H, W, 3))
    cams = make_cameras(cfg.num_cams, cfg.input_size)
    variables = jax.jit(lambda: model.init(
        {'params': rng, 'dropout': jax.random.PRNGKey(1)},
        imgs, cams['lidar2img'], cams['img2lidar'], rng, 0, True))()
    return cfg, model, variables


def test_export_import_roundtrip(tmp_path):
    """ref_export -> .pth -> ref_import reproduces the exact param leaves
    for every exported subtree (backbone, neck, lifter, encoder layers,
    field MLP + color_proj, deviation) — the checkpoint a user would hand
    the reference's own eval scripts (VERDICT r2 #8)."""
    import os
    from selfocc_tpu.utils.ref_export import (export_reference_state_dict,
                                              save_reference_pth)

    cfg, model, variables = _tiny_variables()
    path = str(tmp_path / "export.pth")
    save_reference_pth(variables, path)
    assert os.path.exists(path)
    sd = torch.load(path, map_location="cpu", weights_only=False)["state_dict"]
    # reference train.py-style wrapping; now import it back
    params, stats, unmatched = convert_reference_state_dict(sd)
    assert unmatched == [], unmatched[:5]
    merged = merge_imported(variables, params, stats)

    # every leaf the export covered must roundtrip bit-exactly
    flat_src = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_dst = dict(jax.tree_util.tree_flatten_with_path(
        merged["params"])[0])
    n_checked = 0
    for path_k, v in flat_src:
        got = flat_dst[path_k]
        np.testing.assert_allclose(np.asarray(got), np.asarray(v),
                                   rtol=0, atol=0,
                                   err_msg=str(path_k))
        n_checked += 1
    assert n_checked > 50
    # color_proj specifically roundtrips (tiny config has color_dims != 3*(deg+1)^2)
    if "color_proj" in variables["params"]["head"]["field"]:
        assert any("color_proj" in k for k in sd)


def test_export_covers_batch_stats():
    from selfocc_tpu.utils.ref_export import export_reference_state_dict
    cfg, model, variables = _tiny_variables()
    sd = export_reference_state_dict(variables, as_torch=False)
    if "img_backbone" in variables["params"]:
        assert any(k.endswith("running_mean") for k in sd)


def test_extra_mapping_divergent_fork_naming():
    """Worked example for the ``extra`` escape hatch (VERDICT r2 #8): a fork
    checkpoint naming its field MLP ``glin{i}`` still imports — the mapping
    is just {ref_key: (flax_path, transform)}."""
    from selfocc_tpu.utils import ref_import as ri

    C = 8
    sd = {
        "head.model.field.glin0.weight": torch.randn(C, C),
        "head.model.field.glin0.bias": torch.randn(C),
        "head.model.field.glin_out.weight": torch.randn(5, C),
        "head.model.field.glin_out.bias": torch.randn(5),
    }
    extra = {
        "head.model.field.glin0.weight":
            (("head", "field", "density_0", "kernel"), ri._lin_w),
        "head.model.field.glin0.bias":
            (("head", "field", "density_0", "bias"), ri._arr),
        "head.model.field.glin_out.weight":
            (("head", "field", "density_out", "kernel"), ri._lin_w),
        "head.model.field.glin_out.bias":
            (("head", "field", "density_out", "bias"), ri._arr),
    }
    params, stats, unmatched = convert_reference_state_dict(sd, extra=extra)
    assert unmatched == []
    np.testing.assert_allclose(
        np.asarray(params["head"]["field"]["density_0"]["kernel"]),
        sd["head.model.field.glin0.weight"].numpy().T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["head"]["field"]["density_out"]["bias"]),
        sd["head.model.field.glin_out.bias"].numpy(), rtol=1e-6)
