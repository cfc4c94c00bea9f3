"""Golden test: full ``TPVFormerLayer`` forward against the reference's own
runnable torch code (``tpvformer_encoder_layer.py:123-219``) with shared
weights — the compositional capstone over the per-module goldens
(CrossViewHybridAttention, BEVCrossAttention, FFN, norm placement): it pins
the post-norm op ORDER, the cat/split plane handling, identity/residual
threading, the per-plane point counts (hw->num_points[2]), and the
MultiPlaneFFN/Norm variant (``split_fpn.py``/``split_norm.py``).
"""
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


def _t(a):
    return torch.from_numpy(np.asarray(a))


def _lin(sd, k):
    return {"kernel": jnp.asarray(sd[f"{k}.weight"].numpy().T),
            "bias": jnp.asarray(sd[f"{k}.bias"].numpy())}


def _norm(sd, k):
    return {"scale": jnp.asarray(sd[f"{k}.weight"].numpy()),
            "bias": jnp.asarray(sd[f"{k}.bias"].numpy())}


def _attn(sd, prefix):
    """Our BEVCrossAttention param tree from a reference BEVCrossAttention
    state-dict prefix."""
    return {
        "value_proj": _lin(sd, f"{prefix}.deformable_attention.value_proj"),
        "output_proj": _lin(sd, f"{prefix}.output_proj"),
        "heads": {
            "sampling_offsets": _lin(
                sd, f"{prefix}.deformable_attention.sampling_offsets"),
            "attention_weights": _lin(
                sd, f"{prefix}.deformable_attention.attention_weights")},
    }


@pytest.mark.parametrize("multi_plane", [False, True])
def test_tpvformer_layer_golden(multi_plane):
    # import order populates the shim MODELS registry the layer builds from
    ref_shim.load_ref(
        "model.encoder.bevformer.attention.image_cross_attention")
    ref_shim.load_ref(
        "model.encoder.tpvformer.attention.image_cross_attention")
    ref_shim.load_ref(
        "model.encoder.tpvformer.attention.cross_view_hybrid_attention")
    ref_shim.load_ref("model.encoder.tpvformer.modules.split_norm")
    ref_shim.load_ref("model.encoder.tpvformer.modules.split_fpn")
    tel = ref_shim.load_ref("model.encoder.tpvformer.tpvformer_encoder_layer")

    torch.manual_seed(0)
    C, heads, P_self, F = 12, 3, 4, 20
    cams = 3
    H, W, D = 4, 6, 2
    sizes = (H * W, D * H, W * D)
    Q = sum(sizes)
    # image feature levels (flagship uses 4; 2 keeps the test fast)
    shapes = ((6, 8), (3, 4))
    L = sum(h * w for h, w in shapes)
    # per-plane anchor counts, reference order [wz, zh, hw] (flagship
    # [48, 48, 8]; attn_hw takes num_points[2])
    n_pts = [3, 3, 2]

    attn_cfgs = [
        dict(type="CrossViewHybridAttention", embed_dims=C, num_heads=heads,
             num_levels=3, num_points=P_self, dropout=0.0, batch_first=True),
        dict(type="TPVCrossAttention", embed_dims=C, num_cams=cams,
             dropout=0.0, batch_first=True, num_heads=heads,
             num_levels=len(shapes), num_points=list(n_pts)),
    ]
    kw = {}
    if multi_plane:
        kw = dict(multi_plane_ffn_norm=True,
                  norm_cfg=dict(type="MultiPlaneNorm"),
                  ffn_cfgs=dict(type="MultiPlaneFFN", embed_dims=C,
                                feedforward_channels=F, ffn_drop=0.0))
    ref = tel.TPVFormerLayer(
        attn_cfgs=attn_cfgs, feedforward_channels=F, ffn_dropout=0.0,
        operation_order=("self_attn", "norm", "cross_attn", "norm",
                         "ffn", "norm"), **kw).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.uniform_(-0.2, 0.2)

    rng = np.random.RandomState(4)
    planes = [rng.randn(1, s, C).astype(np.float32) for s in sizes]
    pos = [rng.randn(1, s, C).astype(np.float32) for s in sizes]
    value = rng.randn(cams, L, C).astype(np.float32)
    ref2d = rng.rand(1, Q, 3, P_self, 2).astype(np.float32)
    ref_cams, masks = [], []
    for i, s in enumerate(sizes):
        d = n_pts[2 - i]
        r = rng.rand(cams, 1, s, d, 2).astype(np.float32)
        m = rng.rand(cams, 1, s, d) > 0.35
        m[:, :, min(5, s - 1)] = False    # a query invisible everywhere
        m[0] = True                        # a camera that sees everything
        ref_cams.append(r)
        masks.append(m)

    key_t = _t(value)[:, :, None, :]       # (cams, L, bs, C)
    with torch.no_grad():
        out_ref = ref(
            query=[_t(p) for p in planes],
            key=key_t, value=key_t,
            tpv_pos=[_t(p) for p in pos],
            ref_2d=_t(ref2d),
            spatial_shapes=torch.tensor(shapes, dtype=torch.long),
            level_start_index=torch.tensor(
                [0, shapes[0][0] * shapes[0][1]], dtype=torch.long),
            reference_points_cams=[_t(r) for r in ref_cams],
            tpv_masks=[_t(m) for m in masks],
            tpv_size=(H, W, D))

    from selfocc_tpu.models.encoder import TPVFormerLayer
    sd = ref.state_dict()
    params = {
        "self_attn": {
            "value_proj": _lin(sd, "attentions.0.value_proj"),
            "output_proj": _lin(sd, "attentions.0.output_proj"),
            "heads": {
                "sampling_offsets": _lin(sd, "attentions.0.sampling_offsets"),
                "attention_weights": _lin(
                    sd, "attentions.0.attention_weights")}},
        "cross_attn_0": _attn(sd, "attentions.1.attn_hw"),
        "cross_attn_1": _attn(sd, "attentions.1.attn_zh"),
        "cross_attn_2": _attn(sd, "attentions.1.attn_wz"),
    }
    if multi_plane:
        for n in range(3):               # norms.{n} -> norm{n+1}_{plane}
            for i in range(3):
                params[f"norm{n + 1}_{i}"] = _norm(
                    sd, f"norms.{n}.norms.{i}")
        for i in range(3):
            params[f"ffn_{i}"] = {
                "fc1": _lin(sd, f"ffns.0.ffns.{i}.layers.0.0"),
                "fc2": _lin(sd, f"ffns.0.ffns.{i}.layers.1")}
    else:
        for n in range(3):
            params[f"norm{n + 1}"] = _norm(sd, f"norms.{n}")
        params["ffn"] = {"fc1": _lin(sd, "ffns.0.layers.0.0"),
                         "fc2": _lin(sd, "ffns.0.layers.1")}

    ours = TPVFormerLayer(
        embed_dims=C, num_heads=heads, num_levels=len(shapes),
        num_points_cross=tuple(n_pts), num_points_self=P_self,
        feedforward_channels=F, img_spatial_shapes=shapes,
        tpv_size=(H, W, D), dropout=0.0,
        multi_plane_ffn_norm=multi_plane)
    out_ours, _ = ours.apply(
        {"params": params},
        tuple(jnp.asarray(p) for p in planes),
        jnp.asarray(value),
        [jnp.asarray(p) for p in pos],
        jnp.asarray(ref2d[0]),
        [jnp.asarray(r[:, 0]) for r in ref_cams],
        [jnp.asarray(m[:, 0]) for m in masks])

    assert len(out_ours) == 3
    for g, r in zip(out_ours, out_ref):
        assert g.shape == tuple(r.shape)
        np.testing.assert_allclose(np.asarray(g), r.numpy(),
                                   atol=5e-5, rtol=1e-4)
