"""Golden tests for encoder modules against the reference's own runnable
torch code (extends tests/test_golden_reference.py to the TPVFormer
attention surface): CameraAwareSE and CrossViewHybridAttention forwards
with shared weights.
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


def _lin(sd, k):
    return {"kernel": jnp.asarray(sd[f"{k}.weight"].numpy().T),
            "bias": jnp.asarray(sd[f"{k}.bias"].numpy())}


def test_camera_aware_se_golden():
    """CameraAwareSE forward == reference camera_se_net.py:52-131 with
    shared weights (16-scalar camera vector -> BN -> MLP -> sigmoid gate;
    reduce conv active since in != mid)."""
    m = ref_shim.load_ref("model.encoder.tpvformer.modules.camera_se_net")
    torch.manual_seed(0)
    ref = m.CameraAwareSE(in_channels=8, mid_channels=16,
                          out_channles=8).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.uniform_(-0.2, 0.2)
        ref.bn.running_mean.uniform_(-0.5, 0.5)
        ref.bn.running_var.uniform_(0.5, 1.5)
        rbn = ref.reduce_conv[1]
        rbn.running_mean.uniform_(-0.2, 0.2)
        rbn.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(1)
    B, N = 1, 3
    feats = [rng.randn(B, N, 8, 12, 8).astype(np.float32),
             rng.randn(B, N, 4, 6, 8).astype(np.float32)]
    intr = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    intr[..., 0, 0] = rng.rand(B, N) * 100
    intr[..., 1, 1] = rng.rand(B, N) * 100
    intr[..., 0, 2] = rng.rand(B, N) * 50
    intr[..., 1, 2] = rng.rand(B, N) * 50
    c2e = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    c2e[..., :3, :] += rng.randn(B, N, 3, 4).astype(np.float32) * 0.1

    metas = [{"intrinsic": intr[b], "cam2ego": c2e[b]} for b in range(B)]
    with torch.no_grad():
        tfeats = [torch.from_numpy(f).permute(0, 1, 4, 2, 3) for f in feats]
        ref_out = ref(tfeats, metas)

    from selfocc_tpu.models.encoder import CameraAwareSE
    sd = ref.state_dict()
    arr = lambda k: jnp.asarray(sd[k].numpy())
    conv = lambda k: jnp.asarray(sd[k].numpy().transpose(2, 3, 1, 0))
    params = {
        "bn": {"scale": arr("bn.weight"), "bias": arr("bn.bias")},
        "context_mlp_fc1": _lin(sd, "context_mlp.fc1"),
        "context_mlp_fc2": _lin(sd, "context_mlp.fc2"),
        "reduce_conv": {"kernel": conv("reduce_conv.0.weight"),
                        "bias": arr("reduce_conv.0.bias")},
        "reduce_bn": {"scale": arr("reduce_conv.1.weight"),
                      "bias": arr("reduce_conv.1.bias")},
        "context_conv": {"kernel": conv("context_conv.weight"),
                         "bias": arr("context_conv.bias")},
    }
    stats = {
        "bn": {"mean": arr("bn.running_mean"),
               "var": arr("bn.running_var")},
        "reduce_bn": {"mean": arr("reduce_conv.1.running_mean"),
                      "var": arr("reduce_conv.1.running_var")},
    }
    ours = CameraAwareSE(in_channels=8, mid_channels=16, out_channels=8)
    got = ours.apply({"params": params, "batch_stats": stats}, feats,
                     jnp.asarray(intr), jnp.asarray(c2e))
    for g, r in zip(got, ref_out):
        r = r.permute(0, 1, 3, 4, 2).numpy()
        assert g.shape == r.shape
        np.testing.assert_allclose(np.asarray(g), r, atol=2e-5)


def test_cross_view_hybrid_attention_golden():
    """CrossViewHybridAttention forward == the reference's own override
    (cross_view_hybrid_attention.py:12-124, P-point reference broadcast
    'changed here' quirk) with shared weights."""
    m = ref_shim.load_ref(
        "model.encoder.tpvformer.attention.cross_view_hybrid_attention")
    torch.manual_seed(0)
    C, H_heads, P = 16, 4, 4
    shapes = ((4, 6), (2, 4), (6, 2))          # (h, w) for 3 planes
    Q = sum(h * w for h, w in shapes)
    ref = m.CrossViewHybridAttention(
        embed_dims=C, num_heads=H_heads, num_levels=3, num_points=P,
        dropout=0.0, batch_first=True).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.uniform_(-0.2, 0.2)

    rng = np.random.RandomState(2)
    query = rng.randn(1, Q, C).astype(np.float32)
    qpos = rng.randn(1, Q, C).astype(np.float32)
    refpts = rng.rand(1, Q, 3, P, 2).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(query), query_pos=torch.from_numpy(qpos),
            reference_points=torch.from_numpy(refpts),
            spatial_shapes=torch.tensor(shapes, dtype=torch.long),
            level_start_index=torch.tensor([0, 24, 32], dtype=torch.long))

    from selfocc_tpu.models.encoder import CrossViewHybridAttention
    sd = ref.state_dict()
    params = {
        "value_proj": _lin(sd, "value_proj"),
        "output_proj": _lin(sd, "output_proj"),
        "heads": {"sampling_offsets": _lin(sd, "sampling_offsets"),
                  "attention_weights": _lin(sd, "attention_weights")},
    }
    ours = CrossViewHybridAttention(embed_dims=C, num_heads=H_heads,
                                    num_points=P, dropout=0.0)
    got = ours.apply({"params": params}, jnp.asarray(query),
                     jnp.asarray(qpos), jnp.asarray(refpts[0]), shapes)
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(got), ref_out.numpy(), atol=3e-5)


def test_point_sampling_golden():
    """geometry.projection.point_sampling == the reference's fp32
    point_sampling (bevformer/utils.py:116-206) incl. the focal-ratio
    post-scale and visibility mask semantics."""
    m = ref_shim.load_ref("model.encoder.bevformer.utils")
    rng = np.random.RandomState(3)
    P, Q, B, N = 4, 10, 1, 3
    pts = rng.randn(P, Q, 3).astype(np.float32) * 20
    l2i = rng.randn(B, N, 4, 4).astype(np.float32)
    img_shape = (32, 48)
    fx = rng.rand(N).astype(np.float32) + 0.5
    fy = rng.rand(N).astype(np.float32) + 0.5

    metas = [{"lidar2img": l2i[0], "img_shape": img_shape,
              "focal_ratios_x": fx, "focal_ratios_y": fy}]
    with torch.no_grad():
        ref_cam, ref_mask = m.point_sampling(
            torch.from_numpy(pts[None]), metas)   # (B, P, Q, 3) -> perm

    from selfocc_tpu.geometry.projection import point_sampling
    got_cam, got_mask = point_sampling(jnp.asarray(pts), jnp.asarray(l2i),
                                       img_shape, jnp.asarray(fx),
                                       jnp.asarray(fy))
    # reference layout (N, B, Q, D, 2) matches ours
    # behind-camera rays produce huge normalized coords (they are masked);
    # compare with rtol so fp32 rounding on those magnitudes doesn't trip
    np.testing.assert_allclose(np.asarray(got_cam), ref_cam.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_mask),
                                  ref_mask.numpy().astype(bool))
