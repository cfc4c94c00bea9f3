"""Golden: the FULL ``BEVFormerEncoder`` forward (the ``nuscenes_occ_bev``
variant) against the reference's own runnable torch module
(``bevformer/bevformer_encoder.py:18-224`` + ``bevformer_encoder_layer.py``)
with shared weights — BEV positional encoding, cams/level embeds, pillar
ref_3d + fp32 point_sampling, the raw-mmcv-MSDA self-attention (incl. the
reference's (h_norm, w_norm) ``ref_2d`` layout), and N scanned layers."""
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
        "cross_attn": {
            "value_proj": _lin(
                sd, f"{p}.attentions.1.deformable_attention.value_proj"),
            "output_proj": _lin(sd, f"{p}.attentions.1.output_proj"),
            "heads": {
                "sampling_offsets": _lin(
                    sd,
                    f"{p}.attentions.1.deformable_attention.sampling_offsets"),
                "attention_weights": _lin(
                    sd,
                    f"{p}.attentions.1.deformable_attention"
                    ".attention_weights")}},
        "ffn": {"fc1": _lin(sd, f"{p}.ffns.0.layers.0.0"),
                "fc2": _lin(sd, f"{p}.ffns.0.layers.1")},
    }
    for n in range(3):
        params[f"norm{n + 1}"] = _norm(sd, f"{p}.norms.{n}")
    return params


def test_bevformer_encoder_golden():
    ref_shim.load_ref(
        "model.encoder.bevformer.attention.image_cross_attention")
    ref_shim.load_ref("model.encoder.bevformer.bevformer_pos_embed")
    ref_shim.load_ref("model.encoder.bevformer.bevformer_encoder_layer")
    # the encoder does `from .attention import ...` against the stubbed
    # package — surface the attributes first
    bica = sys.modules[
        "model.encoder.bevformer.attention.image_cross_attention"]
    pkg = sys.modules["model.encoder.bevformer.attention"]
    pkg.BEVCrossAttention = bica.BEVCrossAttention
    pkg.BEVDeformableAttention = bica.BEVDeformableAttention
    enc_mod = ref_shim.load_ref("model.encoder.bevformer.bevformer_encoder")

    torch.manual_seed(0)
    C, heads, F = 12, 2, 20
    cams, levels, num_layers = 2, 2, 2
    n_pts_cross, n_pts_self = 3, 4
    img_shape = (32, 48)
    feat_shapes = ((6, 8), (3, 4))
    pc_range = list(TINY_PC_RANGE)

    layer_cfg = dict(
        type="BEVFormerLayer",
        attn_cfgs=[
            dict(type="MultiScaleDeformableAttention", embed_dims=C,
                 num_heads=heads, num_levels=1, num_points=n_pts_self,
                 dropout=0.0, batch_first=True),
            dict(type="BEVCrossAttention", embed_dims=C, num_cams=cams,
                 dropout=0.0, batch_first=True,
                 deformable_attention=dict(
                     type="BEVDeformableAttention", embed_dims=C,
                     num_heads=heads, num_levels=levels,
                     num_points=n_pts_cross, dropout=0.0,
                     batch_first=True)),
        ],
        feedforward_channels=F, ffn_dropout=0.0,
        operation_order=("self_attn", "norm", "cross_attn", "norm",
                         "ffn", "norm"))
    ref = enc_mod.BEVFormerEncoder(
        mapping_args=dict(TINY_MAPPING), embed_dims=C, num_cams=cams,
        num_feature_levels=levels,
        positional_encoding=dict(
            type="BEVPositionalEncoding", num_freqs=4,
            embed_dims=C, tot_range=pc_range),
        num_points_cross=n_pts_cross, num_points_self=n_pts_self,
        transformerlayers=layer_cfg, num_layers=num_layers).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.uniform_(-0.2, 0.2)

    H, W = ref.bev_size
    rng = np.random.RandomState(9)
    query = rng.randn(1, H * W, C).astype(np.float32) * 0.5
    feats = [rng.randn(1, cams, h, w, C).astype(np.float32)
             for h, w in feat_shapes]
    l2i = np.asarray(make_cameras(cams, img_shape)["lidar2img"],
                     np.float32)

    metas = [{"lidar2img": l2i[0], "img_shape": img_shape}]
    with torch.no_grad():
        out_ref = ref(
            representation=torch.from_numpy(query),
            ms_img_feats=[torch.from_numpy(f).permute(0, 1, 4, 2, 3)
                          for f in feats],
            metas=metas)["representation"]

    from selfocc_tpu.models.encoder import BEVFormerEncoder
    ours = BEVFormerEncoder(
        mapping_args=dict(TINY_MAPPING), embed_dims=C, num_heads=heads,
        num_cams=cams, num_feature_levels=levels,
        num_points_cross=n_pts_cross, num_points_self=n_pts_self,
        num_layers=num_layers, feedforward_channels=F, dropout=0.0,
        pos_num_freqs=(4, 4, 4), pc_range=tuple(pc_range))
    variables = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(query),
        [jnp.asarray(f) for f in feats], jnp.asarray(l2i), img_shape)

    sd = ref.state_dict()
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, 0),
        *[_layer_params(sd, i) for i in range(num_layers)])
    params = {
        "level_embeds": jnp.asarray(sd["level_embeds"].numpy()),
        "cams_embeds": jnp.asarray(sd["cams_embeds"].numpy()),
        "position_layer": _lin(sd, "positional_encoding.position_layer"),
        "layers": stacked,
    }
    got = ours.apply(
        {"params": params, "consts": variables["consts"]},
        jnp.asarray(query), [jnp.asarray(f) for f in feats],
        jnp.asarray(l2i), img_shape)["representation"]

    assert got.shape == tuple(out_ref.shape)
    np.testing.assert_allclose(np.asarray(got), out_ref.numpy(),
                               atol=2e-4, rtol=1e-3)
