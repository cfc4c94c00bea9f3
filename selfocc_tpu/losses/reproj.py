"""Multi-frame photometric reprojection losses (monodepth2-style, per camera).

Behavioral rewrite of ``loss/reproj_loss_mono_multi_new.py`` and
``loss/reproj_loss_mono_multi_new_combine.py`` for the dense TPU layout:
per-sample tensors arrive as ``(B, N, R, S)`` instead of flattened-with-
``ray_indices``, so every ``index_add_`` scatter becomes a plain ``sum`` over
the sample axis (bit-identical math, zero scatters).

Pipeline per camera (reference ``..._combine.py:108-244``):
  ray sample at depth t -> homogeneous pixel (u*t, v*t, t, 1) -> project with
  img2prevImg/img2nextImg (fp32 island) -> bilinear-sample neighbor RGB ->
  photometric diff vs current RGB -> render-weight accumulation per ray ->
  SSIM blend -> monodepth2 automask min -> mean.

Quirks preserved: automask failure fill 1e3 (``:229``), border padding for
warped samples, weight renormalization by the per-ray valid-weight sum.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.projection import cal_pixel
from ..ops.interp import bilinear_sample
from ..ops.ssim import ssim
from .base import BaseLoss, register

_FAIL = 1e3


def _sample_img(img, pix, img_size):
    """img: (H, W, 3); pix: (..., 2) pixel coords in the ``img_size`` frame
    -> (..., 3), border pad.

    The reference normalizes by the CONFIG img_size then grid_samples with
    ``align_corners=True`` (``reproj_loss_mono_multi_new_combine.py:144-152``),
    so the fractional index is ``pix * (dim_img - 1) / img_size`` — NOT the
    raw pixel coordinate (even when the image matches img_size the index is
    scaled by (dim-1)/dim). Golden-tested vs the reference's own code in
    ``tests/test_golden_reference.py``.
    """
    sx = (img.shape[1] - 1) / img_size[1]
    sy = (img.shape[0] - 1) / img_size[0]
    idx = jnp.stack([pix[..., 0] * sx, pix[..., 1] * sy], axis=-1)
    return bilinear_sample(img, idx, padding="border")


def _ssim_ray_grid(pred, target, ray_resize):
    """SSIM over the ray grid; returns per-ray (R,) channel-mean map."""
    h, w = ray_resize
    p = pred.reshape(1, h, w, -1)
    t = target.reshape(1, h, w, -1)
    return ssim(p, t).mean(-1).reshape(-1)


class _ReprojBase(BaseLoss):

    def __init__(self, weight=1.0, input_dict=None, **kwargs):
        super().__init__(weight, input_dict)
        if input_dict is None:
            self.input_dict = {
                "curr_imgs": "curr_imgs", "prev_imgs": "prev_imgs",
                "next_imgs": "next_imgs", "weights": "weights", "ts": "ts",
                "img2prevImg": "img2prevImg", "img2nextImg": "img2nextImg",
                "ms_rays": "ms_rays"}
        self.no_ssim = kwargs.get("no_ssim", False)
        self.img_size = kwargs.get("img_size", [768, 1600])
        self.ray_resize = kwargs.get("ray_resize", None)
        self.no_automask = kwargs.get("no_automask", False)
        self.dims = kwargs.get("dims", 3)
        self.no_ssim = self.no_ssim or (self.ray_resize is None)

    def _project_and_sample(self, rays, t, trans, img):
        """rays (R,2), t (R,S), trans (4,4), img (H,W,3) ->
        rgb (R,S,3), mask (R,S)."""
        coords = jnp.concatenate([
            rays[:, None, :] * t[..., None],      # (u*t, v*t)
            t[..., None],                          # t
            jnp.ones_like(t[..., None])], axis=-1)
        pix, mask = cal_pixel(trans, coords, self.img_size)
        rgb = _sample_img(img, pix, self.img_size)
        return rgb, mask


@register
class ReprojLossMonoMultiNewCombine(_ReprojBase):
    """Combined prev+next diff before the automask min
    (reference ``reproj_loss_mono_multi_new_combine.py:41-248``)."""

    def loss_func(self, curr_imgs, prev_imgs, next_imgs, weights, ts,
                  img2prevImg, img2nextImg, ms_rays, deltas=None):
        # imgs: (B, N, H, W, 3); weights/ts: (B, N, R, S); matrices (B, N, 4, 4)
        bs, num_cams = curr_imgs.shape[:2]
        assert bs == 1
        rays = ms_rays                                      # (R, 2)
        eps = jnp.finfo(jnp.float32).eps

        def per_cam(cam_in):
            w, t, i2p, i2n, curr, prev, nxt, delta = cam_in
            if delta is not None:
                delta = jax.lax.stop_gradient(delta)
                w = jnp.where(delta < eps, 0.0, w) / jnp.maximum(delta, eps)

            rgb_prev, prev_mask = self._project_and_sample(rays, t, i2p, prev)
            rgb_next, next_mask = self._project_and_sample(rays, t, i2n, nxt)

            rgb_curr = _sample_img(curr, rays, self.img_size)  # (R, 3)
            diff_prev = jnp.abs(rgb_curr[:, None] - rgb_prev).mean(-1)
            diff_next = jnp.abs(rgb_curr[:, None] - rgb_next).mean(-1)
            diff_prev = jnp.where(prev_mask, diff_prev, 0.0)
            diff_next = jnp.where(next_mask, diff_next, 0.0)
            cnt = prev_mask.astype(jnp.float32) + next_mask.astype(jnp.float32)
            general_mask = cnt > 0
            diff = (diff_prev + diff_next) / jnp.maximum(cnt, 1.0)

            w = jnp.where(general_mask, w, 0.0)             # (R, S)
            w_sum = jnp.maximum(w.sum(-1, keepdims=True), eps)
            w_norm = w / w_sum
            l1 = (w_norm * diff).sum(-1)                    # (R,)
            prev_next_loss = l1

            if not self.no_ssim:
                rgb_p = jnp.where(prev_mask[..., None], rgb_prev, 0.0)
                rgb_n = jnp.where(next_mask[..., None], rgb_next, 0.0)
                rgb_comb = (rgb_p + rgb_n) / jnp.maximum(cnt, 1.0)[..., None]
                rgb_comb = (w_norm[..., None] * rgb_comb).sum(-2)  # (R, 3)
                ssim_l = _ssim_ray_grid(rgb_comb, rgb_curr, self.ray_resize)
                prev_next_loss = 0.15 * prev_next_loss + 0.85 * ssim_l

            def reproj(pred, target):
                l1_ = jnp.abs(target - pred).mean(-1)
                if self.no_ssim:
                    return l1_
                s = _ssim_ray_grid(pred, target, self.ray_resize)
                return 0.85 * s + 0.15 * l1_

            if not self.no_automask:
                target_prev = _sample_img(prev, rays, self.img_size)
                target_next = _sample_img(nxt, rays, self.img_size)
                mask_prev_l = reproj(target_prev, rgb_curr)
                mask_next_l = reproj(target_next, rgb_curr)
                ray_has_valid = general_mask.any(-1)
                prev_next_loss = jnp.where(ray_has_valid, prev_next_loss, _FAIL)
                proj = jnp.stack([prev_next_loss, mask_prev_l, mask_next_l],
                                 axis=-1).min(-1)
            else:
                proj = prev_next_loss
            return proj.mean()

        tot = 0.0
        for cam in range(num_cams):
            tot = tot + per_cam((
                weights[0, cam], ts[0, cam], img2prevImg[0, cam],
                img2nextImg[0, cam], curr_imgs[0, cam], prev_imgs[0, cam],
                next_imgs[0, cam],
                None if deltas is None else deltas[0, cam]))
        return tot / num_cams


@register
class ReprojLossMonoMultiNew(_ReprojBase):
    """Per-direction (prev/next separately) reprojection with automask min
    (reference ``reproj_loss_mono_multi_new.py:72-288``)."""

    def loss_func(self, curr_imgs, prev_imgs, next_imgs, weights, ts,
                  img2prevImg, img2nextImg, ms_rays, deltas=None):
        bs, num_cams = curr_imgs.shape[:2]
        assert bs == 1
        rays = ms_rays
        eps = jnp.finfo(jnp.float32).eps

        def direction_loss(rgb_dir, mask_dir, w, rgb_curr):
            """Weighted per-ray L1 + SSIM on the weight-accumulated image."""
            w_dir = jnp.where(mask_dir, w, 0.0)
            acc = jnp.maximum(w_dir.sum(-1, keepdims=True), eps)
            w_dir = w_dir / acc
            l1 = (w_dir * jnp.abs(rgb_curr[:, None] - rgb_dir).mean(-1)).sum(-1)
            if not self.no_ssim:
                rgb_new = (w_dir[..., None] * rgb_dir).sum(-2)
                s = _ssim_ray_grid(rgb_new, rgb_curr, self.ray_resize)
                loss = 0.85 * s + 0.15 * l1
            else:
                loss = l1
            no_valid = ~mask_dir.any(-1)
            return jnp.where(no_valid, _FAIL, loss)

        tot = 0.0
        for cam in range(num_cams):
            w = weights[0, cam]
            t = ts[0, cam]
            if deltas is not None:
                delta = jax.lax.stop_gradient(deltas[0, cam])
                w = jnp.where(delta < eps, 0.0, w) / jnp.maximum(delta, eps)
            curr, prev, nxt = curr_imgs[0, cam], prev_imgs[0, cam], next_imgs[0, cam]

            rgb_prev, prev_mask = self._project_and_sample(
                rays, t, img2prevImg[0, cam], prev)
            rgb_next, next_mask = self._project_and_sample(
                rays, t, img2nextImg[0, cam], nxt)
            rgb_curr = _sample_img(curr, rays, self.img_size)

            prev_l = direction_loss(rgb_prev, prev_mask, w, rgb_curr)
            next_l = direction_loss(rgb_next, next_mask, w, rgb_curr)
            cands = [prev_l, next_l]

            if not self.no_automask:
                def reproj(pred, target):
                    l1_ = jnp.abs(target - pred).mean(-1)
                    if self.no_ssim:
                        return l1_
                    s = _ssim_ray_grid(pred, target, self.ray_resize)
                    return 0.85 * s + 0.15 * l1_
                cands.append(reproj(_sample_img(prev, rays, self.img_size),
                                    rgb_curr))
                cands.append(reproj(_sample_img(nxt, rays, self.img_size),
                                    rgb_curr))

            proj = jnp.stack(cands, axis=-1).min(-1)
            tot = tot + proj.mean()
        return tot / num_cams
