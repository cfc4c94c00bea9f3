"""Composite golden: the reference's OWN full occupancy pipeline —
``TPVSegmentor.forward(occ_only=True)`` running backbone -> neck ->
``TPVQueryLifter`` -> ``TPVFormerEncoder`` -> ``NeRFAccHead.forward_occ``
(``BEVNeRF.pre_compute_density_color`` + uniform-grid ``forward_geo``) —
against this repo's ``TPVSegmentor.forward_occ`` with shared weights
(VERDICT r3 next-round #1).

Every stage is goldened per-module elsewhere; this test pins the
*integration seams*: the segmentor's feature reshape/indexing and mode
dispatch (``model/segmentor/tpv_segmentor.py:87-125``), lifter->encoder
representation format, and encoder->field plane decode + grid query
(``model/head/nerfacc_head/bev_nerf.py:73-117``,
``nerfacc_head.py:346-394``). The round-3 BEV ref_2d transpose bug was
exactly the class of error only a composed golden catches.

The backbone/neck pair is a shared-math test double (the reference builds
mmseg backbones from registry configs; ResNet-50 parity is covered by
``test_torch_compat``): a torch mirror of this repo's ``TinyBackbone``
(4-conv strided pyramid, flax-SAME padding) + identity neck, registered
into the shim registry so the reference segmentor builds it from config
like any mmseg backbone.
"""
import math
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "tests" not in sys.path:
    sys.path.insert(0, "tests")
import ref_shim

pytestmark = pytest.mark.skipif(not ref_shim.reference_available(),
                                reason="reference repo not present")

import jax
import jax.numpy as jnp

from utils_tiny import TINY_MAPPING, TINY_PC_RANGE, make_cameras
from test_golden_full_encoder import (_layer_params, _lin,
                                      _load_reference_encoder_module)

C, HEADS, FFN_CH = 12, 2, 20
CAMS, LEVELS, NUM_LAYERS = 2, 3, 2
N_PTS_CROSS, N_PTS_SELF = [4, 4, 2], 4
IMG_SHAPE = (32, 48)
SEM = 4
RESO = 1.0


class GoldenTinyBackbone(torch.nn.Module):
    """Torch mirror of ``selfocc_tpu.models.resnet.TinyBackbone`` — strided
    3x3 convs + relu with flax-style SAME padding (asymmetric: pad_hi gets
    the odd pixel)."""

    def __init__(self, channels=(C, C, C)):
        super().__init__()
        self.convs = torch.nn.ModuleList([
            torch.nn.Conv2d(3 if i == 0 else channels[i - 1], ch, 3,
                            stride=4 if i == 0 else 2, padding=0)
            for i, ch in enumerate(channels)])

    def forward(self, x):
        outs = []
        for i, conv in enumerate(self.convs):
            s = 4 if i == 0 else 2
            h, w = x.shape[-2:]
            ph = max((math.ceil(h / s) - 1) * s + 3 - h, 0)
            pw = max((math.ceil(w / s) - 1) * s + 3 - w, 0)
            x = torch.nn.functional.pad(
                x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
            x = torch.relu(conv(x))
            outs.append(x)
        return outs


class GoldenIdentityNeck(torch.nn.Module):
    def forward(self, feats):
        return feats


def _build_reference_segmentor():
    _load_reference_encoder_module()        # registers TPVFormerEncoder
    ref_shim.load_ref("model.lifter.base_lifter")
    ref_shim.load_ref("model.lifter.tpv_query_lifter")
    ref_shim.load_ref("model.head.base_head")
    ref_shim.load_ref("model.head.nerfacc_head.nerfacc_head")
    seg_mod = ref_shim.load_ref("model.segmentor.tpv_segmentor")

    MODELS = sys.modules["mmengine.registry"].MODELS
    for cls in (GoldenTinyBackbone, GoldenIdentityNeck):
        if cls.__name__ not in MODELS._mods:
            MODELS.register_module(cls)

    from selfocc_tpu.geometry.mappings import make_mapping
    m = make_mapping(**TINY_MAPPING)
    H, W, D = m.size_h, m.size_w, m.size_d
    pc_range = list(TINY_PC_RANGE)

    layer_cfg = dict(
        type="TPVFormerLayer",
        attn_cfgs=[
            dict(type="CrossViewHybridAttention", embed_dims=C,
                 num_heads=HEADS, num_levels=3, num_points=N_PTS_SELF,
                 dropout=0.0, batch_first=True),
            dict(type="TPVCrossAttention", embed_dims=C, num_cams=CAMS,
                 dropout=0.0, batch_first=True, num_heads=HEADS,
                 num_levels=LEVELS, num_points=list(N_PTS_CROSS)),
        ],
        feedforward_channels=FFN_CH, ffn_dropout=0.0,
        operation_order=("self_attn", "norm", "cross_attn", "norm",
                         "ffn", "norm"))
    ref = seg_mod.TPVSegmentor(
        img_backbone=dict(type="GoldenTinyBackbone"),
        img_neck=dict(type="GoldenIdentityNeck"),
        img_backbone_out_indices=[0, 1, 2],
        lifter=dict(type="TPVQueryLifter", tpv_h=H, tpv_w=W, tpv_z=D,
                    dim=C),
        encoder=dict(
            type="TPVFormerEncoder", mapping_args=dict(TINY_MAPPING),
            embed_dims=C, num_cams=CAMS, num_feature_levels=LEVELS,
            positional_encoding=dict(
                type="TPVPositionalEncoding", num_freqs=[3, 4, 5],
                embed_dims=C, tot_range=pc_range),
            num_points_cross=list(N_PTS_CROSS),
            num_points_self=[N_PTS_SELF] * 3,
            transformerlayers=layer_cfg, num_layers=NUM_LAYERS),
        head=dict(
            type="NeRFAccHead", roi_aabb=list(TINY_PC_RANGE),
            resolution=[8, 8, 4], reso=RESO,
            mapping_args=dict(TINY_MAPPING), embed_dims=C, color_dims=0,
            sem_dims=SEM, density_layers=2, sh_deg=0, tpv=True,
            ray_sample_mode="fixed", ray_number=[4, 6],
            ray_img_size=list(IMG_SHAPE), render_bkgd="none"),
    ).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.uniform_(-0.2, 0.2)
    return ref


def _our_config():
    from selfocc_tpu.configs.base import (EncoderConfig, HeadConfig,
                                          ModelConfig)
    enc = EncoderConfig(
        mapping_args=TINY_MAPPING, embed_dims=C, num_heads=HEADS,
        num_cams=CAMS, num_feature_levels=LEVELS,
        num_points_cross=tuple(N_PTS_CROSS), num_points_self=N_PTS_SELF,
        num_layers=NUM_LAYERS, feedforward_channels=FFN_CH, dropout=0.0,
        pos_num_freqs=(3, 4, 5), pc_range=TINY_PC_RANGE)
    head = HeadConfig(
        head_type="nerfacc", roi_aabb=TINY_PC_RANGE,
        mapping_args=TINY_MAPPING, resolution=RESO, embed_dims=C,
        color_dims=0, sem_dims=SEM, density_layers=2, sh_deg=0, tpv=True,
        return_sem=True, ray_sample_mode="fixed", ray_number=(4, 6),
        ray_img_size=IMG_SHAPE)
    return ModelConfig(
        encoder=enc, head=head, lifter_type="TPVQueryLifter",
        backbone_type="tiny", neck_type="identity",
        img_backbone_out_indices=(0, 1, 2), fpn_in_channels=(C, C, C),
        embed_dims=C)


def _import_weights(ref, init_params):
    """reference state_dict -> this repo's TPVSegmentor param tree."""
    sd = ref.state_dict()
    params = jax.tree_util.tree_map(lambda x: x, init_params)

    params["img_backbone"] = {
        f"conv{i}": {
            "kernel": jnp.asarray(
                sd[f"img_backbone.convs.{i}.weight"].numpy().transpose(
                    2, 3, 1, 0)),
            "bias": jnp.asarray(sd[f"img_backbone.convs.{i}.bias"].numpy())}
        for i in range(3)}
    params["lifter"] = {
        k: jnp.asarray(sd[f"lifter.{k}"].numpy())
        for k in ("tpv_hw", "tpv_zh", "tpv_wz")}

    sd_enc = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, 0),
        *[_layer_params(sd_enc, i) for i in range(NUM_LAYERS)])
    params["encoder"] = {
        "level_embeds": jnp.asarray(sd_enc["level_embeds"].numpy()),
        "cams_embeds": jnp.asarray(sd_enc["cams_embeds"].numpy()),
        "positional_encoding": {
            f"position_layer_{n}": _lin(
                sd_enc, f"positional_encoding.position_layer_{n}")
            for n in ("hw", "zh", "wz")},
        "layers": stacked,
    }
    # BEVNeRF density_net is Sequential([Softplus, Linear] * layers):
    # Linear weights live at odd indices (bev_nerf.py:62-71)
    rf = params["head"]["radiance_field"]
    rf["density_0"] = _lin(sd, "head.radiance_field.density_net.1")
    rf["density_out"] = _lin(sd, "head.radiance_field.density_net.3")
    return params


def test_composite_occ_pipeline_golden():
    torch.manual_seed(0)
    ref = _build_reference_segmentor()

    rng = np.random.RandomState(11)
    imgs = rng.rand(1, CAMS, *IMG_SHAPE, 3).astype(np.float32)
    l2i = np.asarray(make_cameras(CAMS, IMG_SHAPE)["lidar2img"], np.float32)
    metas = [{"flip": False, "lidar2img": l2i[0], "img_shape": IMG_SHAPE}]

    with torch.no_grad():
        out_ref = ref(
            imgs=torch.from_numpy(imgs).permute(0, 1, 4, 2, 3),
            metas=metas, occ_only=True,
            aabb=list(TINY_PC_RANGE), resolution=RESO)

    from selfocc_tpu.models.segmentor import TPVSegmentor
    model = TPVSegmentor(cfg=_our_config())
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(imgs), jnp.asarray(l2i),
        TINY_PC_RANGE, RESO, method="forward_occ")
    params = _import_weights(ref, variables["params"])
    got = model.apply(
        {**variables, "params": params},
        jnp.asarray(imgs), jnp.asarray(l2i),
        TINY_PC_RANGE, RESO, method="forward_occ")

    sigma_ref = out_ref["sigma"].numpy()
    assert np.asarray(got["sdf"]).shape == sigma_ref.shape
    np.testing.assert_allclose(np.asarray(got["sdf"]), sigma_ref,
                               atol=5e-4, rtol=1e-3)
    # reference 'logits' are post-softmax (bev_nerf.py forward_geo)
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(got["logits"], axis=-1)),
        out_ref["logits"].numpy(), atol=5e-4, rtol=1e-3)
    agree = (np.asarray(got["sem"]) == out_ref["sem"].numpy()).mean()
    assert agree > 0.999, f"sem argmax agreement {agree}"
