"""Native C++ image-decode pipeline tests (vs cv2 golden)."""
import os

import cv2
import numpy as np
import pytest

from selfocc_tpu.native import NativeImageLoader, native_available


@pytest.fixture()
def imgs_on_disk(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    for i, ext in enumerate((".png", ".png", ".jpg")):
        img = (rng.rand(40, 64, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"img{i}{ext}")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_native_builds():
    assert native_available(), "native loader failed to build"


def test_decode_matches_cv2_png(imgs_on_disk):
    loader = NativeImageLoader(num_threads=2)
    out = loader.decode_batch(imgs_on_disk[:2], crop_hw=(32, 48))
    assert out.shape == (2, 32, 48, 3) and out.dtype == np.float32
    for i, p in enumerate(imgs_on_disk[:2]):
        ref = cv2.imread(p, cv2.IMREAD_COLOR).astype(np.float32)[:32, :48]
        np.testing.assert_allclose(out[i], ref, atol=1e-4)


def test_decode_jpeg_close_to_cv2(imgs_on_disk):
    # JPEG decoders may differ by a few LSBs (IDCT variants)
    loader = NativeImageLoader(num_threads=2)
    out = loader.decode_batch(imgs_on_disk[2:], crop_hw=(40, 64))
    ref = cv2.imread(imgs_on_disk[2], cv2.IMREAD_COLOR).astype(np.float32)
    assert np.mean(np.abs(out[0] - ref)) < 2.0


def test_normalize_and_resize(imgs_on_disk):
    loader = NativeImageLoader(num_threads=2)
    mean = [103.53, 116.28, 123.675]
    std = [57.375, 57.12, 58.395]
    out = loader.decode_batch(imgs_on_disk[:1], crop_hw=(40, 64),
                              out_hw=(20, 32), mean=mean, std=std)
    assert out.shape == (1, 20, 32, 3)
    ref = cv2.imread(imgs_on_disk[0], cv2.IMREAD_COLOR).astype(np.float32)
    ref = cv2.resize(ref, (32, 20), interpolation=cv2.INTER_LINEAR)
    ref = (ref - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    np.testing.assert_allclose(out[0], ref, atol=0.05)


def test_missing_file_falls_back(tmp_path, imgs_on_disk):
    loader = NativeImageLoader(num_threads=2)
    rng = np.random.RandomState(1)
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, img)
    out = loader.decode_batch([p], crop_hw=(16, 16))
    assert np.isfinite(out).all()
