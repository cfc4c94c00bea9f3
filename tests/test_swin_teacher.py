"""Golden tests: flax Swin/UperNet teacher vs the runnable HuggingFace
torch implementation, shared weights (VERDICT r2 #10 — the in-JAX semantic
teacher replacing the reference's external OpenSeeD stack).

Small configs keep CPU runtime reasonable; the converter is exercised on
the real parameter surface (same module graph as Swin-T, fewer dims).
"""
import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from selfocc_tpu.models.swin import SwinBackbone, SwinConfig
from selfocc_tpu.models.upernet import SwinUperNet, adaptive_avg_pool
from selfocc_tpu.utils.swin_import import (convert_hf_swin_backbone,
                                           convert_hf_upernet)


def _hf_swin_config(img=64, window=4):
    from transformers import SwinConfig as HFSwinConfig
    return HFSwinConfig(
        image_size=img, patch_size=4, embed_dim=24, depths=[2, 2, 2],
        num_heads=[2, 4, 8], window_size=window, mlp_ratio=4.0,
        qkv_bias=True, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
        use_absolute_embeddings=False,
        out_features=["stage1", "stage2", "stage3"])


def _flax_cfg(window=4):
    return SwinConfig(patch_size=4, embed_dim=24, depths=(2, 2, 2),
                      num_heads=(2, 4, 8), window_size=window)


@pytest.mark.parametrize("hw", [(64, 64), (64, 96)])
def test_swin_backbone_golden(hw):
    """Feature maps match HF SwinBackbone (all stages, shifted windows,
    non-square input) with converted weights."""
    torch.manual_seed(0)
    from transformers.models.swin.modeling_swin import SwinBackbone as HFBB
    hf = HFBB(_hf_swin_config()).eval()
    # randomize (HF zero-inits some tables; make the test discriminating)
    with torch.no_grad():
        for p in hf.parameters():
            p.uniform_(-0.05, 0.05)

    params = convert_hf_swin_backbone(hf.state_dict())
    model = SwinBackbone(_flax_cfg())

    img = np.random.RandomState(1).randn(2, *hw, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(img).permute(0, 3, 1, 2)).feature_maps
    got = model.apply({"params": params}, img)

    assert len(got) == len(ref) == 3
    for g, r in zip(got, ref):
        r = r.permute(0, 2, 3, 1).numpy()
        assert g.shape == r.shape
        np.testing.assert_allclose(np.asarray(g), r, atol=2e-5)


def test_swin_resolution_equals_window_drops_shift():
    """always_partition=False: when min(resolution) <= window the shift is
    dropped (HF SwinModel.set_shift_and_window_size). The only such case
    HF itself can run is resolution == window (a genuine shrink crashes
    HF's own bias-table lookup, modeling_swin.py:457-462 — so shrink is
    unreachable upstream); verify the shift-drop at that point."""
    torch.manual_seed(0)
    from transformers import SwinModel
    from transformers import SwinConfig as HFSwinConfig
    cfg = HFSwinConfig(
        image_size=32, patch_size=4, embed_dim=24, depths=[2],
        num_heads=[2], window_size=8, mlp_ratio=4.0, qkv_bias=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, use_absolute_embeddings=False)
    hf = SwinModel(cfg, add_pooling_layer=False).eval()
    with torch.no_grad():
        for p in hf.parameters():
            p.uniform_(-0.05, 0.05)

    sd = {k: v for k, v in hf.state_dict().items()
          if not k.startswith(("layernorm.", "pooler."))}
    params = convert_hf_swin_backbone(sd)
    # SwinModel's final layernorm plays our single stage's out-norm
    import jax.numpy as jnp
    model = SwinBackbone(
        SwinConfig(patch_size=4, embed_dim=24, depths=(2,), num_heads=(2,),
                   window_size=8),
        always_partition=False)
    hsd = hf.state_dict()
    params["stage0_out_norm"] = {
        "scale": jnp.asarray(hsd["layernorm.weight"].numpy()),
        "bias": jnp.asarray(hsd["layernorm.bias"].numpy())}

    img = np.random.RandomState(2).randn(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(img).permute(0, 3, 1, 2))
    feats = model.apply({"params": params}, img)
    got = np.asarray(feats[-1]).reshape(1, -1, 24)
    np.testing.assert_allclose(got, ref.last_hidden_state.numpy(),
                               atol=2e-5)
    # and with always_partition=True the shifted block DOES shift (the
    # shift-region mask changes the program; with one full-image window
    # the numeric effect is tiny but nonzero)
    feats_ap = SwinBackbone(
        SwinConfig(patch_size=4, embed_dim=24, depths=(2,), num_heads=(2,),
                   window_size=8), always_partition=True).apply(
        {"params": params}, img)
    assert np.abs(np.asarray(feats_ap[-1]) - np.asarray(feats[-1])).max() > 0


def test_adaptive_avg_pool_matches_torch():
    x = np.random.RandomState(0).randn(1, 13, 9, 4).astype(np.float32)
    for s in (1, 2, 3, 6):
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), s)
        got = adaptive_avg_pool(x, s)
        np.testing.assert_allclose(
            np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_swin_upernet_golden():
    """Full teacher logits match HF UperNetForSemanticSegmentation (Swin
    backbone, aux head off) with converted weights incl. BN running
    stats."""
    torch.manual_seed(0)
    from transformers import UperNetConfig, UperNetForSemanticSegmentation
    cfg = UperNetConfig(
        backbone_config=_hf_swin_config(), hidden_size=32,
        pool_scales=[1, 2, 3, 6], use_auxiliary_head=False, num_labels=21)
    hf = UperNetForSemanticSegmentation(cfg).eval()
    with torch.no_grad():
        for p in hf.parameters():
            p.uniform_(-0.05, 0.05)
        # non-trivial BN running stats so the converter mapping is proven
        for m in hf.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    variables = convert_hf_upernet(hf.state_dict())
    model = SwinUperNet(num_classes=21, swin=_flax_cfg(), channels=32)

    img = np.random.RandomState(3).randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(img).permute(0, 3, 1, 2)).logits
    got = model.apply(variables, img)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-5)
    # argmax class maps agree except at decision boundaries
    agree = (np.asarray(got).argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.99


def test_jax_sem_teacher_end_to_end(tmp_path):
    """JaxSemTeacher + precompute tool produce SemTeacher-consumable maps
    (random tiny weights; pipeline correctness, not label quality)."""
    import jax
    from selfocc_tpu.models.upernet import SwinUperNet
    from selfocc_tpu.models.swin import SwinConfig
    from selfocc_tpu.utils.openseed_utils import JaxSemTeacher, SemTeacher

    cfg = SwinConfig(patch_size=4, embed_dim=8, depths=(1, 1),
                     num_heads=(2, 2), window_size=4)
    model = SwinUperNet(num_classes=21, swin=cfg, channels=8)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 3), np.float32))
    teacher = JaxSemTeacher(variables, num_classes=21, swin_cfg=cfg,
                            channels=8)
    imgs = np.random.RandomState(0).randint(
        0, 255, (2, 96, 160, 3)).astype(np.uint8)
    maps = teacher(imgs, size=(48, 80))
    assert maps.shape == (2, 48, 80) and maps.dtype == np.uint8
    assert maps.max() < 21

    # maps round-trip through the SemTeacher streaming interface
    np.save(tmp_path / "cam0.jpg.npy", maps[0])
    st = SemTeacher(str(tmp_path), apply_lut=True)
    loaded = st.load_sem_map("any/dir/cam0.jpg")
    assert loaded is not None and loaded.shape == (48, 80)


def test_online_teacher_train_step(tmp_path, monkeypatch):
    """train.py --teacher-ckpt: the in-JAX teacher produces sem_gt online
    from curr_imgs (reference train.py:213-215 OpenSeeD-online analog) and
    one sem-supervised train step completes."""
    import sys
    import torch as _torch
    from transformers import UperNetConfig, UperNetForSemanticSegmentation

    hf = UperNetForSemanticSegmentation(UperNetConfig(
        backbone_config=_hf_swin_config(), hidden_size=16,
        use_auxiliary_head=False, num_labels=5)).eval()
    ckpt = str(tmp_path / "teacher.pt")
    _torch.save(hf.state_dict(), ckpt)

    # from_checkpoint must infer the small Swin architecture
    from selfocc_tpu.utils.openseed_utils import JaxSemTeacher
    t = JaxSemTeacher.from_checkpoint(ckpt)
    assert t.model.num_classes == 5
    assert t.model.swin.depths == (2, 2, 2)
    assert t.model.swin.embed_dim == 24

    import train as train_mod
    argv = ["train.py", "--py-config", "tiny", "--synthetic",
            "--max-steps", "1", "--work-dir", str(tmp_path / "wd"),
            "--print-freq", "1", "--teacher-ckpt", ckpt, "--prefetch", "0"]
    monkeypatch.setattr(sys, "argv", argv)

    # strip the synthetic dataset's own sem_gt so the ONLINE teacher path
    # is the one exercised
    real_loader = train_mod.get_dataloader

    class _NoSem:
        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            item = dict(self.ds[i])
            item.pop("sem_gt", None)
            return item

    monkeypatch.setattr(train_mod, "get_dataloader",
                        lambda cfg, syn, phase="train":
                        _NoSem(real_loader(cfg, syn, phase)))
    train_mod.main()
