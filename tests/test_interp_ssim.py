"""Interpolation + SSIM golden tests against PyTorch CPU (the reference's
numerical backend for ``F.grid_sample`` and the monodepth2 SSIM)."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from selfocc_tpu.ops.interp import bilinear_sample, trilinear_sample, grid_sample_2d
from selfocc_tpu.ops.ssim import ssim


def test_bilinear_vs_torch_zeros():
    rng = np.random.RandomState(0)
    img = rng.randn(7, 9, 3).astype(np.float32)
    # sample points incl. out-of-range
    xy = rng.uniform(-2, 10, size=(50, 2)).astype(np.float32)
    out = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(xy), "zeros"))

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]          # 1,C,H,W
    gx = torch.from_numpy(xy[:, 0]) / (9 - 1) * 2 - 1
    gy = torch.from_numpy(xy[:, 1]) / (7 - 1) * 2 - 1
    grid = torch.stack([gx, gy], dim=-1)[None, None]              # 1,1,R,2
    ref = F.grid_sample(t_img, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=True)[0, :, 0].T.numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_bilinear_vs_torch_border():
    rng = np.random.RandomState(1)
    img = rng.randn(5, 6, 2).astype(np.float32)
    xy = rng.uniform(-3, 9, size=(40, 2)).astype(np.float32)
    out = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(xy), "border"))
    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
    gx = torch.from_numpy(xy[:, 0]) / (6 - 1) * 2 - 1
    gy = torch.from_numpy(xy[:, 1]) / (5 - 1) * 2 - 1
    grid = torch.stack([gx, gy], dim=-1)[None, None]
    ref = F.grid_sample(t_img, grid, mode="bilinear", padding_mode="border",
                        align_corners=True)[0, :, 0].T.numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_trilinear_vs_torch():
    rng = np.random.RandomState(2)
    vol = rng.randn(5, 6, 7, 4).astype(np.float32)   # H,W,D,C
    hwd = rng.uniform(-1, 8, size=(60, 3)).astype(np.float32)
    out = np.asarray(trilinear_sample(jnp.asarray(vol), jnp.asarray(hwd), "zeros"))

    # torch: input (1,C,D1,D2,D3) indexed by grid (x->D3, y->D2, z->D1).
    # Arrange input as (C, H, W, D) so grid (d, w, h) matches (x, y, z) —
    # exactly the reference's permutation (bev_nerf.py:109-113).
    t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]  # 1,C,H,W,D
    g = torch.from_numpy(hwd)
    gh = g[:, 0] / (5 - 1) * 2 - 1
    gw = g[:, 1] / (6 - 1) * 2 - 1
    gd = g[:, 2] / (7 - 1) * 2 - 1
    grid = torch.stack([gd, gw, gh], dim=-1).reshape(1, -1, 1, 1, 3)
    ref = F.grid_sample(t_vol, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=True)[0, :, :, 0, 0].T.numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_grid_sample_2d_batched():
    rng = np.random.RandomState(3)
    imgs = rng.randn(2, 8, 10, 3).astype(np.float32)
    xy = rng.uniform(-1, 1, size=(2, 25, 2)).astype(np.float32)
    out = np.asarray(grid_sample_2d(jnp.asarray(imgs), jnp.asarray(xy), "border"))
    t_imgs = torch.from_numpy(imgs).permute(0, 3, 1, 2)
    grid = torch.from_numpy(xy)[:, None]  # B,1,R,2
    ref = F.grid_sample(t_imgs, grid, mode="bilinear", padding_mode="border",
                        align_corners=True)[:, :, 0].transpose(1, 2).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def _torch_ssim(x, y):
    # reference loss/rgb_loss_ms.py:7-37
    refl = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    x, y = refl(x), refl(y)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x ** 2) - mu_x ** 2
    sigma_y = pool(y ** 2) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_vs_torch():
    rng = np.random.RandomState(4)
    x = rng.rand(2, 12, 16, 3).astype(np.float32)
    y = rng.rand(2, 12, 16, 3).astype(np.float32)
    out = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    ref = _torch_ssim(torch.from_numpy(x).permute(0, 3, 1, 2),
                      torch.from_numpy(y).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_trilinear_cf_matches_channel_last():
    rng = np.random.RandomState(5)
    vol = rng.randn(5, 6, 7, 4).astype(np.float32)   # H,W,D,C
    hwd = rng.uniform(-1, 8, size=(60, 3)).astype(np.float32)
    from selfocc_tpu.ops.interp import trilinear_sample_cf
    ref = np.asarray(trilinear_sample(jnp.asarray(vol), jnp.asarray(hwd), "zeros"))
    cf = np.asarray(trilinear_sample_cf(
        jnp.asarray(np.moveaxis(vol, -1, 0)), jnp.asarray(hwd), "zeros"))
    np.testing.assert_allclose(cf, ref, atol=1e-5)
    ref_b = np.asarray(trilinear_sample(jnp.asarray(vol), jnp.asarray(hwd), "border"))
    cf_b = np.asarray(trilinear_sample_cf(
        jnp.asarray(np.moveaxis(vol, -1, 0)), jnp.asarray(hwd), "border"))
    np.testing.assert_allclose(cf_b, ref_b, atol=1e-5)


def test_trilinear_with_grad_matches_autodiff():
    """Fused corner-gather value+grad must equal autodiff of the plain
    sampler (exact same piecewise-trilinear function)."""
    import jax
    from selfocc_tpu.ops.interp import (trilinear_sample_cf,
                                        trilinear_sample_cf_with_grad)
    rng = np.random.RandomState(7)
    vol = jnp.asarray(rng.randn(4, 5, 6, 7).astype(np.float32))  # C,H,W,D
    pts = jnp.asarray(rng.uniform(0.2, 4.2, size=(40, 3)).astype(np.float32))
    vals, grad0 = trilinear_sample_cf_with_grad(vol, pts, "zeros")
    ref_vals = trilinear_sample_cf(vol, pts, "zeros")
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               atol=1e-5)
    ad_grad = jax.grad(
        lambda p: trilinear_sample_cf(vol, p, "zeros")[..., 0].sum())(pts)
    np.testing.assert_allclose(np.asarray(grad0), np.asarray(ad_grad),
                               atol=1e-4)


def test_bundled_trilinear_matches_unbundled():
    """Corner-bundled sampling (one fat gather) must reproduce the 8-gather
    zeros-padding path exactly, including out-of-bounds points and gradients."""
    from selfocc_tpu.ops.interp import (bundle_corners_cf,
                                        trilinear_sample_cf,
                                        trilinear_sample_cf_bundled,
                                        trilinear_sample_cf_bundled_with_grad,
                                        trilinear_sample_cf_with_grad)
    rng = np.random.RandomState(0)
    C, H, W, D = 5, 9, 8, 6
    vol = jnp.asarray(rng.randn(C, H, W, D).astype(np.float32))
    # points spanning interior, edges, and far out-of-bounds
    pts = rng.uniform(-2.5, np.array([H, W, D]) + 1.5,
                      size=(400, 3)).astype(np.float32)
    pts[:50] = rng.uniform(0, np.array([H - 1, W - 1, D - 1]),
                           size=(50, 3))
    pts = jnp.asarray(pts)

    bundle = bundle_corners_cf(vol)
    assert bundle.shape == (8 * C, (H - 1) * (W - 1) * (D - 1))

    ref = np.asarray(trilinear_sample_cf(vol, pts, padding="zeros"))
    got = np.asarray(trilinear_sample_cf_bundled(bundle, (C, H, W, D), pts))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    rv, rg = trilinear_sample_cf_with_grad(vol, pts, "zeros")
    bv, bg = trilinear_sample_cf_bundled_with_grad(bundle, (C, H, W, D), pts)
    np.testing.assert_allclose(np.asarray(bv), np.asarray(rv), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bg), np.asarray(rg), atol=1e-4)


def test_separable_resample_matches_trilinear_cf():
    """Factored per-axis lerps == the 8-corner gather on a separable grid,
    including out-of-range indices (zeros padding must factor per axis)."""
    import numpy as np
    import jax.numpy as jnp
    from selfocc_tpu.ops.interp import (separable_grid_resample_cf,
                                        trilinear_sample_cf)

    rng = np.random.RandomState(0)
    C, H, W, D = 5, 9, 8, 6
    vol = jnp.asarray(rng.randn(C, H, W, D).astype(np.float32))
    # fractional indices straddling both borders
    gh = jnp.asarray(rng.uniform(-1.5, H + 0.5, 11).astype(np.float32))
    gw = jnp.asarray(rng.uniform(-1.5, W + 0.5, 7).astype(np.float32))
    gd = jnp.asarray(rng.uniform(-1.5, D + 0.5, 4).astype(np.float32))

    sep = separable_grid_resample_cf(vol, gh, gw, gd)     # (C, 11, 7, 4)

    hwd = jnp.stack(jnp.meshgrid(gh, gw, gd, indexing="ij"), -1)
    ref = trilinear_sample_cf(vol, hwd, "zeros")          # (11, 7, 4, C)
    np.testing.assert_allclose(np.moveaxis(np.asarray(sep), 0, -1),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_separable_resample_exact_on_grid_points():
    """Integer indices inside the volume reproduce the voxel values exactly
    (no interpolation error), and fully out-of-range rows are exactly 0."""
    import numpy as np
    import jax.numpy as jnp
    from selfocc_tpu.ops.interp import separable_grid_resample_cf

    rng = np.random.RandomState(1)
    vol = jnp.asarray(rng.randn(3, 5, 4, 6).astype(np.float32))
    gh = jnp.asarray([0.0, 2.0, 4.0, -3.0], jnp.float32)
    gw = jnp.asarray([1.0, 3.0], jnp.float32)
    gd = jnp.asarray([0.0, 5.0], jnp.float32)
    out = np.asarray(separable_grid_resample_cf(vol, gh, gw, gd))
    np.testing.assert_array_equal(
        out[:, :3], np.asarray(vol)[:, [0, 2, 4]][:, :, [1, 3]][..., [0, 5]])
    np.testing.assert_array_equal(out[:, 3], 0.0)
