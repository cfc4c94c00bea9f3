"""Config-space completeness modules (VERDICT r1 item 10): CameraAwareSE,
MultiPlaneFFN/Norm, IdentityNeck."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selfocc_tpu.models.segmentor import TPVSegmentor
from utils_tiny import make_cameras, tiny_config


def _forward_rep(cfg, batch_extra=None):
    model = TPVSegmentor(cfg.model)
    cams = make_cameras(cfg.num_cams, (32, 48))
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(1, cfg.num_cams, 32, 48, 3),
        jnp.float32)
    rng = jax.random.PRNGKey(0)
    kwargs = dict(batch_extra or {})
    variables = model.init({"params": rng, "dropout": rng}, imgs,
                           cams["lidar2img"], train=False,
                           method="get_representation", **kwargs)
    rep = model.apply(variables, imgs, cams["lidar2img"], train=False,
                      method="get_representation", **kwargs)
    return variables, rep


def test_multi_plane_ffn_norm():
    """Per-plane FFN/norm parameter sets (reference split_fpn.py:29-41,
    split_norm.py:22-31): 3 FFNs + 3x3 norms per layer, forward finite."""
    cfg = tiny_config(enc_kw=dict(multi_plane_ffn_norm=True))
    variables, rep = _forward_rep(cfg)
    layer_params = variables["params"]["encoder"]["layers"]
    for i in range(3):
        assert f"ffn_{i}" in layer_params
        for n in ("norm1", "norm2", "norm3"):
            assert f"{n}_{i}" in layer_params
    assert "ffn" not in layer_params
    for p in rep:
        assert bool(jnp.isfinite(p).all())


def test_multi_plane_matches_shared_at_identical_params():
    """With all planes carried through the same math, multi-plane mode is the
    same function as shared mode when its three per-plane parameter sets are
    copies of the shared set (split params only change *which* weights apply,
    not the computation)."""
    cfg_s = tiny_config()
    cfg_m = tiny_config(enc_kw=dict(multi_plane_ffn_norm=True))
    v_s, rep_s = _forward_rep(cfg_s)
    v_m, _ = _forward_rep(cfg_m)

    import flax
    pm = flax.core.unfreeze(v_m["params"])
    ps = v_s["params"]
    lp_s, lp_m = ps["encoder"]["layers"], pm["encoder"]["layers"]
    for i in range(3):
        lp_m[f"ffn_{i}"] = jax.tree_util.tree_map(lambda x: x, lp_s["ffn"])
        for n in ("norm1", "norm2", "norm3"):
            lp_m[f"{n}_{i}"] = jax.tree_util.tree_map(lambda x: x, lp_s[n])
    for k in lp_s:
        if k not in ("ffn", "norm1", "norm2", "norm3"):
            lp_m[k] = lp_s[k]
    for k in ps:
        if k != "encoder":
            pm[k] = ps[k]
    for k in ps["encoder"]:
        if k != "layers":
            pm["encoder"][k] = ps["encoder"][k]

    model = TPVSegmentor(cfg_m.model)
    cams = make_cameras(cfg_m.num_cams, (32, 48))
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(1, cfg_m.num_cams, 32, 48, 3),
        jnp.float32)
    vars_m = dict(v_m, params=pm)
    rep_m = model.apply(vars_m, imgs, cams["lidar2img"], train=False,
                        method="get_representation")
    for a, b in zip(rep_s, rep_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _camera_batch(num_cams):
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 40.0, 40.0, 24.0, 16.0
    intr = np.stack([K] * num_cams)[None]
    c2e = np.stack([np.eye(4, dtype=np.float32)] * num_cams)[None]
    for n in range(num_cams):
        c2e[0, n, :3, 3] = [0.1 * n, -0.2 * n, 1.5]
    return jnp.asarray(intr), jnp.asarray(c2e)


def test_camera_aware_se_runs_and_gate_is_input_independent_at_init():
    """CameraAwareSE (camera_se_net.py:52-131): at init the context MLP's
    second layer is zero-weight/bias-10 (``init_weight``), so the sigmoid
    gate ~1 is the same for ANY camera parameters -> outputs identical."""
    cfg = tiny_config(enc_kw=dict(camera_aware=True))
    intr, c2e = _camera_batch(cfg.num_cams)
    variables, rep = _forward_rep(
        cfg, batch_extra=dict(intrinsic=intr, cam2ego=c2e))
    assert "camera_se_net" in variables["params"]["encoder"]
    for p in rep:
        assert bool(jnp.isfinite(p).all())

    model = TPVSegmentor(cfg.model)
    cams = make_cameras(cfg.num_cams, (32, 48))
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(1, cfg.num_cams, 32, 48, 3),
        jnp.float32)
    rep2 = model.apply(variables, imgs, cams["lidar2img"], train=False,
                       method="get_representation",
                       intrinsic=intr * 3.0, cam2ego=c2e)
    for a, b in zip(rep, rep2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_camera_aware_missing_params_raises():
    cfg = tiny_config(enc_kw=dict(camera_aware=True))
    with pytest.raises(ValueError, match="camera_aware"):
        _forward_rep(cfg)


def test_identity_neck_with_unet2d():
    """IdentityNeck passthrough (identity_neck.py:6-13) paired with a UNet2D
    backbone emitting embed_dims channels at every level."""
    cfg = tiny_config(
        backbone="unet2d",
        model_kw=dict(neck_type="identity", fpn_in_channels=(32, 32, 32, 32),
                      unet_scaling=(0.25, 0.35)))
    variables, rep = _forward_rep(cfg)
    assert "img_neck" not in variables["params"]  # no params in a passthrough
    for p in rep:
        assert bool(jnp.isfinite(p).all())


def test_visible_capacity_matches_dense():
    """Cross-attn visibility compaction (static-capacity analog of the
    reference's dynamic rebatch, image_cross_attention.py:84-136) is exactly
    the dense masked computation when the capacity covers every camera's
    visible set."""
    cfg_d = tiny_config()
    cfg_c = tiny_config(enc_kw=dict(cross_visible_capacity=0.75))
    # tiny planes have Q=289/289? (17x17) -> hw Q=289; M=round128(217)=256<289
    model_d = TPVSegmentor(cfg_d.model)
    model_c = TPVSegmentor(cfg_c.model)
    cams = make_cameras(cfg_d.num_cams, (32, 48))
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(1, cfg_d.num_cams, 32, 48, 3),
        jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model_d.init({"params": rng, "dropout": rng}, imgs,
                             cams["lidar2img"], train=False,
                             method="get_representation")
    rep_d = model_d.apply(variables, imgs, cams["lidar2img"], train=False,
                          method="get_representation")
    rep_c, inter = model_c.apply(variables, imgs, cams["lidar2img"],
                                 train=False, method="get_representation",
                                 mutable=["intermediates"])
    # the compaction branch actually engaged (overflow counters sown), and
    # no camera overflowed the capacity -> exactness holds
    flat = jax.tree_util.tree_leaves(inter)
    assert len(flat) > 0
    assert all(int(x) == 0 for x in flat if x.ndim == 0)
    for a, b in zip(rep_d, rep_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)


def test_visible_capacity_composes_with_shared_locations():
    """Compaction under the shared-locations fast path equals the dense
    shared-locations computation (both deviate from per-head reference
    semantics identically)."""
    cfg_s = tiny_config(enc_kw=dict(shared_locations=True))
    cfg_sc = tiny_config(enc_kw=dict(shared_locations=True,
                                     cross_visible_capacity=0.75))
    model_s = TPVSegmentor(cfg_s.model)
    model_c = TPVSegmentor(cfg_sc.model)
    cams = make_cameras(cfg_s.num_cams, (32, 48))
    imgs = jnp.asarray(
        np.random.RandomState(1).rand(1, cfg_s.num_cams, 32, 48, 3),
        jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model_s.init({"params": rng, "dropout": rng}, imgs,
                             cams["lidar2img"], train=False,
                             method="get_representation")
    rep_s = model_s.apply(variables, imgs, cams["lidar2img"], train=False,
                          method="get_representation")
    rep_c = model_c.apply(variables, imgs, cams["lidar2img"], train=False,
                          method="get_representation")
    for a, b in zip(rep_s, rep_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-2)  # bf16 fast path


def _rep_with_shared_params(cfg_variant, variables, cams_imgs):
    cams, imgs = cams_imgs
    model = TPVSegmentor(cfg_variant.model)
    return model.apply(variables, imgs, cams["lidar2img"], train=False,
                       method="get_representation")


def test_attn_value_bf16_close_and_compaction_still_exact():
    """attn_value_bf16 (the exact-recipe prepare-latency lever, VERDICT r3
    #3): per-head semantics kept, only the gathered payload rounds to bf16 —
    the encoder output stays within bf16 rounding of the fp32 path, and the
    visibility-compaction == dense equality is preserved UNDER bf16 (both
    sides compute the identical per-(camera, query) terms)."""
    cfg_d = tiny_config()
    cfg_b = tiny_config(enc_kw=dict(attn_value_bf16=True))
    cfg_bc = tiny_config(enc_kw=dict(attn_value_bf16=True,
                                     cross_visible_capacity=0.75))
    model_d = TPVSegmentor(cfg_d.model)
    cams = make_cameras(cfg_d.num_cams, (32, 48))
    imgs = jnp.asarray(
        np.random.RandomState(2).rand(1, cfg_d.num_cams, 32, 48, 3),
        jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model_d.init({"params": rng, "dropout": rng}, imgs,
                             cams["lidar2img"], train=False,
                             method="get_representation")
    rep_d = model_d.apply(variables, imgs, cams["lidar2img"], train=False,
                          method="get_representation")
    rep_b = _rep_with_shared_params(cfg_b, variables, (cams, imgs))
    rep_bc = _rep_with_shared_params(cfg_bc, variables, (cams, imgs))
    for a, b in zip(rep_d, rep_b):
        # bf16 payload rounding only — post-LayerNorm outputs stay close
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=5e-2)
    for b, c in zip(rep_b, rep_bc):
        # compaction under bf16 remains the dense bf16 computation
        np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                                   atol=2e-5, rtol=1e-5)


def test_msda_bundle_modes_match_default():
    """msda_bundle="pairs"/"full" are pure fp reassociations of the per-head
    gathers — encoder outputs match the unbundled path to fp tolerance."""
    cfg_d = tiny_config()
    model_d = TPVSegmentor(cfg_d.model)
    cams = make_cameras(cfg_d.num_cams, (32, 48))
    imgs = jnp.asarray(
        np.random.RandomState(3).rand(1, cfg_d.num_cams, 32, 48, 3),
        jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model_d.init({"params": rng, "dropout": rng}, imgs,
                             cams["lidar2img"], train=False,
                             method="get_representation")
    rep_d = model_d.apply(variables, imgs, cams["lidar2img"], train=False,
                          method="get_representation")
    for mode in ("pairs", "full"):
        cfg_m = tiny_config(enc_kw=dict(msda_bundle=mode))
        rep_m = _rep_with_shared_params(cfg_m, variables, (cams, imgs))
        for a, b in zip(rep_d, rep_m):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4, err_msg=mode)


def test_msda_bundle_gradients_match_default():
    """Bundled gathers must also backprop identically (the bundled take's
    VJP scatter-adds into the 2C/4C packed table, then the bundle build's
    VJP folds the blocks back) — gates promoting bundle modes into training
    recipes."""
    cfg_d = tiny_config()
    model_d = TPVSegmentor(cfg_d.model)
    cams = make_cameras(cfg_d.num_cams, (32, 48))
    imgs = jnp.asarray(
        np.random.RandomState(4).rand(1, cfg_d.num_cams, 32, 48, 3),
        jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model_d.init({"params": rng, "dropout": rng}, imgs,
                             cams["lidar2img"], train=False,
                             method="get_representation")

    def loss_for(cfg_variant):
        model = TPVSegmentor(cfg_variant.model)

        def f(params):
            rep = model.apply({**variables, "params": params}, imgs,
                              cams["lidar2img"], train=False,
                              method="get_representation")
            return sum(jnp.sum(r ** 2) for r in rep)
        return f

    g_d = jax.grad(loss_for(cfg_d))(variables["params"])
    for mode in ("pairs", "full"):
        cfg_m = tiny_config(enc_kw=dict(msda_bundle=mode))
        g_m = jax.grad(loss_for(cfg_m))(variables["params"])
        flat_d = jax.tree_util.tree_leaves(g_d)
        flat_m = jax.tree_util.tree_leaves(g_m)
        assert len(flat_d) == len(flat_m)
        for a, b in zip(flat_d, flat_m):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-4, err_msg=mode)


def test_per_plane_point_chunk_matches_scalar():
    """``msda_point_chunk`` as a per-plane tuple (hw, zh, wz) is the same
    function as the scalar — chunking the P-axis accumulation is pure fp
    reassociation (fwd + grad). The per-plane form exists because the
    flagship planes' point counts differ (48/48/8), so the HBM-optimal
    chunk differs per plane (docs/PERFORMANCE.md v5e fit ladder)."""
    cfg_s = tiny_config(enc_kw=dict(msda_bundle="full", msda_point_chunk=2))
    cfg_t = tiny_config(enc_kw=dict(msda_bundle="full",
                                    msda_point_chunk=(2, 2, 1)))
    model_s = TPVSegmentor(cfg_s.model)
    cams = make_cameras(cfg_s.num_cams, (32, 48))
    imgs = jnp.asarray(
        np.random.RandomState(5).rand(1, cfg_s.num_cams, 32, 48, 3),
        jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model_s.init({"params": rng, "dropout": rng}, imgs,
                             cams["lidar2img"], train=False,
                             method="get_representation")

    def loss_for(cfg_variant):
        model = TPVSegmentor(cfg_variant.model)

        def f(params):
            rep = model.apply({**variables, "params": params}, imgs,
                              cams["lidar2img"], train=False,
                              method="get_representation")
            return sum(jnp.sum(r ** 2) for r in rep)
        return f

    v_s, g_s = jax.value_and_grad(loss_for(cfg_s))(variables["params"])
    v_t, g_t = jax.value_and_grad(loss_for(cfg_t))(variables["params"])
    np.testing.assert_allclose(float(v_s), float(v_t), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)
