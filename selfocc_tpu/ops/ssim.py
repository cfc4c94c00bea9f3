"""SSIM loss layer (monodepth2-style) in XLA.

Behavioral rewrite of the ``SSIM`` module duplicated in the reference losses
(``loss/reproj_loss_mono_multi_new_combine.py:7-37``, ``loss/rgb_loss_ms.py``):
reflection-pad 1 then 3x3 average pooling, C1=0.01^2, C2=0.03^2, output
``clip((1 - SSIM)/2, 0, 1)``.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _avg_pool3(x):
    """3x3/stride-1 mean pooling on (B, H, W, C), valid padding."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID")
    return s / 9.0


def _reflect_pad1(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


def ssim(x, y):
    """Per-pixel SSIM-based dissimilarity, channel-last (B, H, W, C) images.

    Returns (B, H, W, C) of ``clip((1 - SSIM)/2, 0, 1)``.
    """
    x = _reflect_pad1(x)
    y = _reflect_pad1(y)

    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)
    sigma_x = _avg_pool3(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y

    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1 - ssim_n / ssim_d) / 2, 0.0, 1.0)
