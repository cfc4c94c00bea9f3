"""Golden tests running the REFERENCE's own dataset wrapper + transform
pipeline (``dataset/dataset_wrapper_temporal.py`` + ``dataset/transform_3d.py``,
imported unmodified via ref_shim with mmcv image ops stubbed faithfully)
against this repo's ``TemporalDatasetWrapper``.

This pins the entire host-side eval/train data path end-to-end: photometric
distortion (same np.random draw sequence, so seeded runs match), ImageNet
normalization (BGR->RGB), per-camera focal-ratio scaling, pad-to-32,
random flip, supervision /256 scaling, and the align_corners=True
supervision resize.
"""
import numpy as np
import pytest

from ref_shim import load_ref, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")

N_CAMS, H, W = 3, 46, 78  # odd sizes exercise pad-to-32


class _FakeRaw:
    """Minimal in_dataset: emits ([input, curr, prev, next] imgs, metas)
    — the reference's length-2 / len(imgs)==4 branch
    (dataset_wrapper_temporal.py:119-129)."""

    def __init__(self, seed=0, intrinsic=None):
        rng = np.random.RandomState(seed)
        self.imgs = [
            [rng.rand(H, W, 3).astype(np.float32) * 255.0
             for _ in range(N_CAMS)]
            for _ in range(4)]
        self.metas = {
            "lidar2img": rng.rand(N_CAMS, 4, 4).astype(np.float64),
            "img2lidar": rng.rand(N_CAMS, 4, 4).astype(np.float64),
            "temImg2lidar": rng.rand(2, N_CAMS, 4, 4).astype(np.float64),
            "img2prevImg": rng.rand(N_CAMS, 4, 4).astype(np.float64),
            "img2nextImg": rng.rand(N_CAMS, 4, 4).astype(np.float64),
            "ego2lidar": np.eye(4),
        }
        if intrinsic is not None:
            self.metas["intrinsic"] = intrinsic

    def __len__(self):
        return 1

    def __getitem__(self, i):
        from copy import deepcopy
        return deepcopy(self.imgs), deepcopy(self.metas)


def _ref_wrapper(**kw):
    mod = load_ref("dataset.dataset_wrapper_temporal")
    return mod.tpvformer_dataset_nuscenes_temporal(**kw)


def _ours_wrapper(**kw):
    from selfocc_tpu.data.wrapper import TemporalDatasetWrapper
    return TemporalDatasetWrapper(**kw)


def _compare(ref_tuple, batch, atol=1e-4, check_focal=False, ref_meta=None):
    (r_in, r_curr, r_prev, r_next, r_color, r_metas, _, _, _) = ref_tuple
    # reference tensors are (N, 3, H, W); ours NHWC with bs=1 leading
    def chw(x):
        return np.transpose(np.asarray(x), (0, 3, 1, 2))

    np.testing.assert_allclose(chw(batch["imgs"][0]), r_in.numpy(),
                               atol=atol, rtol=0)
    for key, r in (("curr_imgs", r_curr), ("prev_imgs", r_prev),
                   ("next_imgs", r_next), ("color_imgs", r_color)):
        np.testing.assert_allclose(chw(batch[key][0]), r.numpy(),
                                   atol=atol, rtol=0, err_msg=key)
    assert bool(batch["flip"]) == bool(r_metas["flip"])
    if check_focal:
        np.testing.assert_allclose(batch["focal_ratios_x"],
                                   np.float32(r_metas["focal_ratios_x"]),
                                   atol=1e-6)
        np.testing.assert_allclose(batch["focal_ratios_y"],
                                   np.float32(r_metas["focal_ratios_y"]),
                                   atol=1e-6)
    if ref_meta is not None:
        ref_meta.update(r_metas)


def test_val_pipeline_scaled():
    """Val pipeline (Normalize -> Scale(0.5) -> Pad32): deterministic."""
    kw = dict(phase="val", scale_rate=0.5)
    ref = _ref_wrapper(in_dataset=_FakeRaw(), **kw)
    ours = _ours_wrapper(in_dataset=_FakeRaw(), **kw)
    meta = {}
    _compare(ref[0], ours[0], check_focal=True, ref_meta=meta)
    # the val pipeline must not have applied photometric jitter: recompute
    # normalization by hand on one pixel
    raw = _FakeRaw().imgs[0][0]
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    manual = (raw[0, 0, ::-1] - mean) / std
    got = np.asarray(ref[0][0])[0, :, 0, 0]  # pre-resize top-left != exact
    # (only a sanity check that magnitudes line up; resize moved pixels)
    assert np.isfinite(got).all() and np.isfinite(manual).all()


def test_train_pipeline_seeded_photometric_flip():
    """Train pipeline with photometric + flip + random per-camera scale:
    the np.random draw sequences are identical (transform_3d.py order), so
    seeding gives bit-level agreement."""
    kw = dict(phase="train", scale_rate=0.5,
              photometric_aug=dict(use_swap_channel=False),
              use_flip=True, random_scale=[0.8, 1.2],
              # per-camera random scales give unequal sizes; the reference
              # configs that use random_scale always pad to a fixed size
              pad_img_size=(32, 64))
    ref = _ref_wrapper(in_dataset=_FakeRaw(), **kw)
    ours = _ours_wrapper(in_dataset=_FakeRaw(), **kw)
    for seed in (3, 11):
        np.random.seed(seed)
        r = ref[0]
        np.random.seed(seed)
        b = ours[0]
        _compare(r, b, check_focal=True)


def test_train_pipeline_seeded_swap_channel():
    """use_swap_channel=True exercises the permutation draw position."""
    kw = dict(phase="train", scale_rate=1.0,
              photometric_aug=dict(use_swap_channel=True), use_flip=True,
              # pad_scale_rate forces the RandomScale insert at scale 1
              pad_scale_rate=[1.0, 1.0])
    ref = _ref_wrapper(in_dataset=_FakeRaw(), **kw)
    ours = _ours_wrapper(in_dataset=_FakeRaw(), **kw)
    np.random.seed(42)
    r = ref[0]
    np.random.seed(42)
    b = ours[0]
    _compare(r, b)


def test_val_pipeline_ref_focal_len():
    """ref_focal_len path: per-camera scales from intrinsics
    (transform_3d.py:354-357)."""
    intr = np.stack([np.diag([500.0 + 100 * i, 480.0, 1.0, 1.0])
                     for i in range(N_CAMS)]).astype(np.float64)
    kw = dict(phase="val", scale_rate=0.5, ref_focal_len=450,
              pad_img_size=(32, 64))
    ref = _ref_wrapper(in_dataset=_FakeRaw(intrinsic=intr), **kw)
    ours = _ours_wrapper(in_dataset=_FakeRaw(intrinsic=intr), **kw)
    _compare(ref[0], ours[0], check_focal=True)


def test_supervision_resize_align_corners():
    """supervision_img_size resize must match F.interpolate(align_corners=
    True) (dataset_wrapper_temporal.py:151-154), NOT cv2's half-pixel
    bilinear."""
    kw = dict(phase="val", scale_rate=0.5, supervision_img_size=(24, 40))
    ref = _ref_wrapper(in_dataset=_FakeRaw(), **kw)
    ours = _ours_wrapper(in_dataset=_FakeRaw(), **kw)
    _compare(ref[0], ours[0])
