"""Capstone golden: the FULL ``TPVFormerEncoder`` forward — positional
encoding, cams/level embeds, feature flattening order, fp32 point_sampling,
cross-view ref tables, and N stacked layers — against the reference's own
runnable torch module (``tpvformer_encoder.py:20-290``) with shared weights.
Everything below the encoder is goldened per-module elsewhere; this test
pins the composition plus the ``nn.scan`` parameter stacking."""
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


def _lin(sd, k):
    return {"kernel": jnp.asarray(sd[f"{k}.weight"].numpy().T),
            "bias": jnp.asarray(sd[f"{k}.bias"].numpy())}


def _norm(sd, k):
    return {"scale": jnp.asarray(sd[f"{k}.weight"].numpy()),
            "bias": jnp.asarray(sd[f"{k}.bias"].numpy())}


def _attn(sd, prefix):
    return {
        "value_proj": _lin(sd, f"{prefix}.deformable_attention.value_proj"),
        "output_proj": _lin(sd, f"{prefix}.output_proj"),
        "heads": {
            "sampling_offsets": _lin(
                sd, f"{prefix}.deformable_attention.sampling_offsets"),
            "attention_weights": _lin(
                sd, f"{prefix}.deformable_attention.attention_weights")},
    }


def _layer_params(sd, i):
    p = f"layers.{i}"
    params = {
        "self_attn": {
            "value_proj": _lin(sd, f"{p}.attentions.0.value_proj"),
            "output_proj": _lin(sd, f"{p}.attentions.0.output_proj"),
            "heads": {
                "sampling_offsets": _lin(
                    sd, f"{p}.attentions.0.sampling_offsets"),
                "attention_weights": _lin(
                    sd, f"{p}.attentions.0.attention_weights")}},
        "cross_attn_0": _attn(sd, f"{p}.attentions.1.attn_hw"),
        "cross_attn_1": _attn(sd, f"{p}.attentions.1.attn_zh"),
        "cross_attn_2": _attn(sd, f"{p}.attentions.1.attn_wz"),
        "ffn": {"fc1": _lin(sd, f"{p}.ffns.0.layers.0.0"),
                "fc2": _lin(sd, f"{p}.ffns.0.layers.1")},
    }
    for n in range(3):
        params[f"norm{n + 1}"] = _norm(sd, f"{p}.norms.{n}")
    return params


def _load_reference_encoder_module():
    """The encoder file does attribute imports from stubbed parent packages
    (``from ..bevformer.attention import BEVCrossAttention``,
    ``from .modules import CameraAwareSE``) — pre-load the leaf modules and
    surface the attributes on the package stubs."""
    bica = ref_shim.load_ref(
        "model.encoder.bevformer.attention.image_cross_attention")
    pkg = sys.modules["model.encoder.bevformer.attention"]
    pkg.BEVCrossAttention = bica.BEVCrossAttention
    pkg.BEVDeformableAttention = bica.BEVDeformableAttention
    cse = ref_shim.load_ref(
        "model.encoder.tpvformer.modules.camera_se_net")
    sys.modules["model.encoder.tpvformer.modules"].CameraAwareSE = \
        cse.CameraAwareSE
    ref_shim.load_ref("model.encoder.tpvformer.tpvformer_pos_embed")
    ref_shim.load_ref("model.encoder.tpvformer.tpvformer_encoder_layer")
    return ref_shim.load_ref("model.encoder.tpvformer.tpvformer_encoder")


def test_tpvformer_encoder_golden():
    enc_mod = _load_reference_encoder_module()
    torch.manual_seed(0)

    C, heads, F = 12, 2, 20
    cams, levels, num_layers = 2, 2, 2
    n_pts_cross, n_pts_self = [4, 4, 2], 4
    img_shape = (32, 48)
    feat_shapes = ((6, 8), (3, 4))
    pc_range = list(TINY_PC_RANGE)

    layer_cfg = dict(
        type="TPVFormerLayer",
        attn_cfgs=[
            dict(type="CrossViewHybridAttention", embed_dims=C,
                 num_heads=heads, num_levels=3, num_points=n_pts_self,
                 dropout=0.0, batch_first=True),
            dict(type="TPVCrossAttention", embed_dims=C, num_cams=cams,
                 dropout=0.0, batch_first=True, num_heads=heads,
                 num_levels=levels, num_points=list(n_pts_cross)),
        ],
        feedforward_channels=F, ffn_dropout=0.0,
        operation_order=("self_attn", "norm", "cross_attn", "norm",
                         "ffn", "norm"))
    ref = enc_mod.TPVFormerEncoder(
        mapping_args=dict(TINY_MAPPING), embed_dims=C, num_cams=cams,
        num_feature_levels=levels,
        positional_encoding=dict(
            type="TPVPositionalEncoding", num_freqs=[3, 4, 5],
            embed_dims=C, tot_range=pc_range),
        num_points_cross=list(n_pts_cross),
        num_points_self=[n_pts_self] * 3,
        transformerlayers=layer_cfg, num_layers=num_layers).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.uniform_(-0.2, 0.2)

    H, W, D = ref.tpv_size
    sizes = (H * W, D * H, W * D)
    rng = np.random.RandomState(7)
    planes = [rng.randn(1, s, C).astype(np.float32) * 0.5 for s in sizes]
    feats = [rng.randn(1, cams, h, w, C).astype(np.float32)
             for h, w in feat_shapes]
    l2i = np.asarray(make_cameras(cams, img_shape)["lidar2img"],
                     np.float32)   # (1, N, 4, 4)

    metas = [{"lidar2img": l2i[0], "img_shape": img_shape}]
    with torch.no_grad():
        out_ref = ref(
            representation=[torch.from_numpy(p) for p in planes],
            ms_img_feats=[torch.from_numpy(f).permute(0, 1, 4, 2, 3)
                          for f in feats],
            metas=metas)["representation"]

    from selfocc_tpu.models.encoder import TPVFormerEncoder
    ours = TPVFormerEncoder(
        mapping_args=dict(TINY_MAPPING), embed_dims=C, num_heads=heads,
        num_cams=cams, num_feature_levels=levels,
        num_points_cross=tuple(n_pts_cross), num_points_self=n_pts_self,
        num_layers=num_layers, feedforward_channels=F, dropout=0.0,
        pos_num_freqs=(3, 4, 5), pc_range=tuple(pc_range))
    variables = ours.init(
        jax.random.PRNGKey(0), [jnp.asarray(p) for p in planes],
        [jnp.asarray(f) for f in feats], jnp.asarray(l2i), img_shape)

    sd = ref.state_dict()
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, 0),
        *[_layer_params(sd, i) for i in range(num_layers)])
    params = {
        "level_embeds": jnp.asarray(sd["level_embeds"].numpy()),
        "cams_embeds": jnp.asarray(sd["cams_embeds"].numpy()),
        "positional_encoding": {
            f"position_layer_{n}": _lin(
                sd, f"positional_encoding.position_layer_{n}")
            for n in ("hw", "zh", "wz")},
        "layers": stacked,
    }
    got = ours.apply(
        {"params": params, "consts": variables["consts"]},
        [jnp.asarray(p) for p in planes],
        [jnp.asarray(f) for f in feats],
        jnp.asarray(l2i), img_shape)["representation"]

    assert len(got) == 3
    for g, r in zip(got, out_ref):
        assert g.shape == tuple(r.shape)
        np.testing.assert_allclose(np.asarray(g), r.numpy(),
                                   atol=2e-4, rtol=1e-3)
