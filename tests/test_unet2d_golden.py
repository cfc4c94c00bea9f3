"""Golden tests for the UNet2D backbone rebuild (VERDICT r2 missing #7):

  - EfficientNet encoder vs the runnable HF torch ``EfficientNetModel``
    (shared converted weights) — replaces the reference's torch.hub
    ``tf_efficientnet_b7`` download.
  - AdaBins DecoderBN vs the REFERENCE'S OWN torch module imported through
    ``tests/ref_shim.py`` (incl. the 1x1-conv-with-padding-1 quirk and
    align_corners=True upsamples).
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None
import ref_shim

from selfocc_tpu.models.efficientnet import (EfficientNetConfig,
                                             EfficientNetEncoder)
from selfocc_tpu.models.unet2d import UNet2D, resize_bilinear_ac
from selfocc_tpu.utils.effnet_import import convert_hf_efficientnet

SMALL = dict(width_coefficient=0.5, depth_coefficient=0.5)


def _hf_effnet():
    from transformers import EfficientNetConfig as HFCfg
    from transformers.models.efficientnet.modeling_efficientnet import (
        EfficientNetModel)
    cfg = HFCfg(image_size=64, hidden_dim=640, drop_connect_rate=0.0,
                dropout_rate=0.0, **SMALL)
    return EfficientNetModel(cfg).eval()


def test_efficientnet_encoder_golden():
    """stem/stage/top feature maps match HF with converted weights (incl.
    the TF asymmetric stride-2 padding and SE sizing)."""
    torch.manual_seed(0)
    hf = _hf_effnet()
    with torch.no_grad():
        for p in hf.parameters():
            p.uniform_(-0.05, 0.05)
        for m in hf.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    variables = convert_hf_efficientnet(hf.state_dict())
    enc = EfficientNetEncoder(EfficientNetConfig(**SMALL))

    img = np.random.RandomState(0).randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(img).permute(0, 3, 1, 2),
                 output_hidden_states=True)
    stem, stages, top = enc.apply(variables, img)

    # HF hidden_states = (stem-out, block0-out, block1-out, ...); compare
    # our per-stage taps against the matching flat-block outputs
    cfg = EfficientNetConfig(**SMALL)
    hs = [h.permute(0, 2, 3, 1).numpy() for h in ref.hidden_states]
    np.testing.assert_allclose(np.asarray(stem), hs[0], atol=2e-5)
    blk = 0
    for i, s in enumerate(stages):
        blk += cfg.round_repeats(cfg.num_block_repeats[i])
        np.testing.assert_allclose(np.asarray(s), hs[blk], atol=3e-5,
                                   err_msg=f"stage {i}")
    ref_top = ref.last_hidden_state.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(top), ref_top, atol=3e-5)


def test_resize_bilinear_ac_matches_torch():
    x = np.random.RandomState(1).randn(2, 5, 7, 3).astype(np.float32)
    for size in [(10, 14), (9, 13), (3, 4), (5, 7)]:
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=size,
            mode="bilinear", align_corners=True)
        got = resize_bilinear_ac(x, *size)
        np.testing.assert_allclose(np.asarray(got),
                                   ref.permute(0, 2, 3, 1).numpy(),
                                   atol=1e-5)


@pytest.mark.skipif(not ref_shim.reference_available(),
                    reason="reference repo not present")
def test_decoder_bn_golden_vs_reference():
    """Flax DecoderBN == the reference's own torch DecoderBN with shared
    weights on the same 5 taps (strides 2/4/8/16/32, B7 tap channels)."""
    m = ref_shim.load_ref("model.backbone.unet2d")
    torch.manual_seed(0)
    ref_dec = m.DecoderBN(num_features=64, bottleneck_features=64,
                          out_feature=16).eval()
    with torch.no_grad():
        for p in ref_dec.parameters():
            p.uniform_(-0.1, 0.1)
        for mod in ref_dec.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 1.5)

    # taps: the reference decoder hardcodes B7 skip channels 32/48/80/224
    rng = np.random.RandomState(2)
    H, W = 64, 96
    taps = [rng.randn(1, H // s, W // s, c).astype(np.float32)
            for s, c in ((2, 32), (4, 48), (8, 80), (16, 224), (32, 64))]
    feats = [torch.zeros(1)] * 12
    for idx, t in zip((4, 5, 6, 8, 11), taps):
        feats[idx] = torch.from_numpy(t).permute(0, 3, 1, 2)
    with torch.no_grad():
        ref_out = ref_dec(feats)

    # convert reference decoder weights -> flax DecoderBN params
    import jax.numpy as jnp
    sd = ref_dec.state_dict()
    conv = lambda k: jnp.asarray(sd[k].numpy().transpose(2, 3, 1, 0))
    arr = lambda k: jnp.asarray(sd[k].numpy())
    params = {"conv2": {"kernel": conv("conv2.weight"),
                        "bias": arr("conv2.bias")}}
    stats = {}
    for up in ("up16", "up8", "up4", "up2"):
        p, b = {}, {}
        for i, (ci, bi) in enumerate(((0, 1), (3, 4))):
            p[f"conv{i}"] = {"kernel": conv(f"{up}._net.{ci}.weight"),
                             "bias": arr(f"{up}._net.{ci}.bias")}
            p[f"bn{i}"] = {"scale": arr(f"{up}._net.{bi}.weight"),
                           "bias": arr(f"{up}._net.{bi}.bias")}
            b[f"bn{i}"] = {"mean": arr(f"{up}._net.{bi}.running_mean"),
                           "var": arr(f"{up}._net.{bi}.running_var")}
        params[up] = p
        stats[up] = b
    for nm in ("1_2", "1_4", "1_8", "1_16"):
        params[f"resize_output_{nm}"] = {
            "kernel": conv(f"resize_output_{nm}.weight"),
            "bias": arr(f"resize_output_{nm}.bias")}

    from selfocc_tpu.models.unet2d import DecoderBN
    dec = DecoderBN(out_feature=16, num_features=64)
    got = dec.apply({"params": params, "batch_stats": stats}, taps)

    assert len(got) == len(ref_out) == 4
    for g, r in zip(got, ref_out):
        r = r.permute(0, 2, 3, 1).numpy()
        assert g.shape == r.shape
        np.testing.assert_allclose(np.asarray(g), r, atol=3e-5)


def test_unet2d_pyramid_contract():
    """Full UNet2D emits out_feature channels at strides 2/4/8/16 (the
    reference's output list, unet2d.py:120-126)."""
    import jax
    m = UNet2D(out_feature=32,
               encoder_cfg=EfficientNetConfig(width_coefficient=0.25,
                                              depth_coefficient=0.35))
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 64, 96, 3))
    variables = m.init(rng, x)
    outs = m.apply(variables, x)
    assert [tuple(o.shape) for o in outs] == [
        (2, 32, 48, 32), (2, 16, 24, 32), (2, 8, 12, 32), (2, 4, 6, 32)]
