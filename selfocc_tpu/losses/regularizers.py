"""SDF regularizers + depth smoothness losses.

Behavioral rewrites of ``loss/eikonal_loss.py``, ``loss/second_grad_loss.py``,
``loss/edge_loss_3d_ms.py`` and the ``loss/sparsity_loss.py`` family.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.interp import bilinear_sample
from .base import BaseLoss, register


@register
class EikonalLoss(BaseLoss):
    """``((|grad sdf| - 1)^2).mean()`` (reference ``eikonal_loss.py:19-22``)."""

    def __init__(self, weight=1.0, input_dict=None, **kwargs):
        super().__init__(weight, input_dict)
        if input_dict is None:
            self.input_dict = {"eik_grad": "eik_grad"}

    def loss_func(self, eik_grad):
        norm = jnp.linalg.norm(eik_grad, axis=-1)
        return jnp.mean((norm - 1.0) ** 2)


@register
class SecondGradLoss(BaseLoss):
    """``|second derivative|.mean()`` (reference ``second_grad_loss.py:19-20``)."""

    def __init__(self, weight=1.0, input_dict=None, **kwargs):
        super().__init__(weight, input_dict)
        if input_dict is None:
            self.input_dict = {"second_grad": "second_grad"}

    def loss_func(self, second_grad):
        return jnp.abs(second_grad).mean()


def get_smooth_loss(disp, img):
    """Edge-aware smoothness (monodepth2), channel-last (B, H, W, C)
    (reference ``edge_loss_3d_ms.py:7-21``)."""
    grad_disp_x = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    grad_disp_y = jnp.abs(disp[:, :-1] - disp[:, 1:])
    grad_img_x = jnp.abs(img[:, :, :-1] - img[:, :, 1:]).mean(-1, keepdims=True)
    grad_img_y = jnp.abs(img[:, :-1] - img[:, 1:]).mean(-1, keepdims=True)
    return (grad_disp_x * jnp.exp(-grad_img_x)).mean() + \
        (grad_disp_y * jnp.exp(-grad_img_y)).mean()


@register
class EdgeLoss3DMS(BaseLoss):
    """Edge-aware smoothness on the ray-grid depth
    (reference ``edge_loss_3d_ms.py:24-79``)."""

    def __init__(self, weight=1.0, input_dict=None, **kwargs):
        super().__init__(weight, input_dict)
        if input_dict is None:
            self.input_dict = {
                "curr_imgs": "curr_imgs", "ms_depths": "ms_depths",
                "ms_rays": "ms_rays"}
        self.img_size = kwargs.get("img_size", [768, 1600])
        self.ray_resize = kwargs.get("ray_resize", None)
        self.use_inf_mask = kwargs.get("use_inf_mask", False)
        assert self.ray_resize is not None

    def loss_func(self, curr_imgs, ms_depths, ms_rays, ms_accs=None,
                  max_depths=None):
        if self.use_inf_mask:
            assert ms_accs is not None and max_depths is not None
        bs, num_cams, num_rays = ms_depths[0].shape
        h, w = self.ray_resize

        xn = ms_rays[:, 0] / self.img_size[1] * 2 - 1
        yn = ms_rays[:, 1] / self.img_size[0] * 2 - 1
        px = (xn + 1) * 0.5 * (curr_imgs.shape[3] - 1)
        py = (yn + 1) * 0.5 * (curr_imgs.shape[2] - 1)
        pix = jnp.stack([px, py], axis=-1)
        imgs = curr_imgs.reshape(bs * num_cams, *curr_imgs.shape[2:])
        rgb = jax.vmap(lambda im: bilinear_sample(im, pix, "border"))(imgs)
        rgb = rgb.reshape(bs * num_cams, h, w, -1)

        tot = 0.0
        for scale, depth in enumerate(ms_depths):
            if self.use_inf_mask:
                depth = depth * ms_accs[scale] + \
                    max_depths[scale] * (1 - ms_accs[scale])
            d = depth.reshape(bs * num_cams, h, w, 1)
            mean_d = d.mean(axis=(1, 2), keepdims=True)
            norm_d = d / (mean_d + 1e-6)
            tot = tot + get_smooth_loss(norm_d, rgb)
        return tot / len(ms_depths)


@register
class SparsityLoss(BaseLoss):
    """StreetSurf sech^2 sparsity (reference ``sparsity_loss.py:7-28``)."""

    def __init__(self, weight=1.0, scale=1.0, input_dict=None, **kwargs):
        super().__init__(weight, input_dict)
        if input_dict is None:
            self.input_dict = {"density": "density"}
        self.scale = scale

    def loss_func(self, density):
        return (1.0 / jnp.cosh(density / (2.0 * self.scale))) ** 2

    def __call__(self, inputs):
        actual = {k: inputs[v] for k, v in self.input_dict.items()}
        return self.weight * self.loss_func(**actual).mean()


@register
class HardSparsityLoss(BaseLoss):
    """Penalize occupied-voxel fraction above a threshold
    (reference ``sparsity_loss.py:31-62``). ``crop`` border voxels are forced
    to free space before the count."""

    def __init__(self, weight=1.0, scale=1.0, thresh=0.2,
                 crop=((0, 0), (0, 0), (0, 0)), input_dict=None, **kwargs):
        super().__init__(weight, input_dict)
        if input_dict is None:
            self.input_dict = {"density": "density"}
        self.scale = scale
        self.thresh = thresh
        self.crop = crop

    def loss_func(self, density):
        c = self.crop
        for axis in range(3):
            lo, hi = c[axis]
            idx = [slice(None)] * 3
            if lo > 0:
                idx_lo = list(idx); idx_lo[axis] = slice(0, lo)
                density = density.at[tuple(idx_lo)].set(100.0)
            if hi > 0:
                idx_hi = list(idx); idx_hi[axis] = slice(-hi, None)
                density = density.at[tuple(idx_hi)].set(100.0)
        occupied = jax.nn.sigmoid(-self.scale * density).mean()
        return jax.nn.relu(occupied - self.thresh)


@register
class SoftSparsityLoss(BaseLoss):
    """``relu(-sdf).mean()`` on the uniform grid
    (reference ``sparsity_loss.py:65-80``)."""

    def __init__(self, weight=1.0, input_dict=None, **kwargs):
        super().__init__(weight, input_dict)
        if input_dict is None:
            self.input_dict = {"density": "density"}

    def loss_func(self, density):
        return jax.nn.relu(-density).mean()


@register
class AdaptiveSparsityLoss(BaseLoss):
    """Penalize negative SDF behind (depth + slack) along each ray
    (reference ``sparsity_loss.py:83-114``), masked mean instead of boolean
    indexing for static shapes."""

    def __init__(self, weight=1.0, input_dict=None, slack=4.0, **kwargs):
        super().__init__(weight, input_dict)
        if input_dict is None:
            self.input_dict = {"sdfs": "sdfs", "ts": "ts",
                               "ms_depths": "ms_depths"}
        self.slack = slack

    def loss_func(self, sdfs, ts, ms_depths):
        # sdfs/ts: (B, N, R, S); ms_depths: [(B, N, R)]
        depths = ms_depths[0]
        mask = ts > (depths + self.slack)[..., None]
        behind = jax.nn.relu(-sdfs) * mask
        return behind.sum() / jnp.maximum(mask.sum(), 1)
