"""Shared tiny-config helpers for fast CPU tests."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from selfocc_tpu.configs.base import Config, EncoderConfig, HeadConfig, ModelConfig

TINY_MAPPING = dict(
    nonlinear_mode='linear',
    h_size=[8, 0], h_range=[10.0, 0], h_half=False,
    w_size=[8, 0], w_range=[10.0, 0], w_half=False,
    d_size=[8, 0], d_range=[-1.0, 3.0, 3.0])
TINY_PC_RANGE = (-10.0, -10.0, -1.0, 10.0, 10.0, 3.0)


def tiny_config(num_cams=2, sem=False, img_size=(64, 96), num_rays=(4, 6),
                num_samples=16, backbone='resnet50', enc_kw=None,
                model_kw=None, **head_kw):
    num_classes = 5
    head = HeadConfig(
        roi_aabb=TINY_PC_RANGE, mapping_args=TINY_MAPPING, resolution=1.0,
        num_samples=num_samples, return_second_grad=True,
        return_sem=sem, ray_sample_mode='cellular', ray_number=num_rays,
        ray_img_size=img_size, render_bkgd='random', embed_dims=32,
        color_dims=6, sem_dims=num_classes if sem else 0, sh_deg=0,
        tpv=True, **head_kw)
    enc = EncoderConfig(
        mapping_args=TINY_MAPPING, embed_dims=32, num_heads=4,
        num_cams=num_cams, num_feature_levels=4, num_points_cross=(4, 4, 4),
        num_points_self=4, num_layers=1, feedforward_channels=64,
        pos_num_freqs=(4, 4, 4), pc_range=TINY_PC_RANGE, **(enc_kw or {}))
    model_args = dict(lifter_type='TPVQueryLifter', embed_dims=32,
                      backbone_type=backbone,
                      fpn_in_channels=(32, 64, 128, 256))
    model_args.update(model_kw or {})
    model = ModelConfig(encoder=enc, head=head, **model_args)
    loss_cfgs = [
        dict(type='ReprojLossMonoMultiNewCombine', weight=1.0, no_ssim=False,
             img_size=list(img_size), ray_resize=list(num_rays),
             input_dict={
                 'curr_imgs': 'curr_imgs', 'prev_imgs': 'prev_imgs',
                 'next_imgs': 'next_imgs', 'weights': 'weights', 'ts': 'ts',
                 'img2prevImg': 'img2prevImg', 'img2nextImg': 'img2nextImg',
                 'ms_rays': 'ms_rays'}),
        dict(type='RGBLossMS', weight=0.1, img_size=list(img_size),
             no_ssim=False, ray_resize=list(num_rays),
             input_dict={'ms_colors': 'ms_colors', 'ms_rays': 'ms_rays',
                         'gt_imgs': 'color_imgs'}),
        dict(type='EikonalLoss', weight=0.1),
        dict(type='SecondGradLoss', weight=0.01),
    ]
    convertion = dict(
        ms_depths='ms_depths', ms_rays='ms_rays', ms_colors='ms_colors',
        weights='weights', ts='ts', eik_grad='eik_grad',
        second_grad='second_grad')
    if sem:
        convertion['sem'] = 'sem'
        loss_cfgs.append(dict(
            type='SemCELossMS', weight=0.1, img_size=list(img_size),
            ray_resize=list(num_rays),
            input_dict={'sem': 'sem', 'sem_gt': 'sem_gt',
                        'ms_rays': 'ms_rays'}))
    return Config(
        name='tiny', model=model, loss_cfgs=loss_cfgs,
        loss_input_convertion=convertion, img_size=img_size,
        input_size=(32, 48), num_rays=num_rays, num_cams=num_cams, sem=sem,
        num_classes=num_classes, steps_per_epoch=10,
        multistep_decay_t=(90,), warmup_iters=5, eval_num_rays=(8, 12))


def make_cameras(num_cams, img_size, seed=0):
    """Physically plausible pinhole cameras spread around the origin.

    Returns dict with lidar2img, img2lidar (both (1, N, 4, 4) float32).
    """
    H, W = img_size
    fx = fy = 0.8 * W
    cx, cy = W / 2, H / 2
    K = np.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32)
    lidar2img, img2lidar = [], []
    for i in range(num_cams):
        yaw = 2 * np.pi * i / max(num_cams, 1)
        c, s = np.cos(yaw), np.sin(yaw)
        # camera looks along +x rotated by yaw; camera frame: z fwd, x right, y down
        cam2lidar = np.array([
            [-s * 1.0, 0, c, 0.5 * c],
            [c, 0, s, 0.5 * s],
            [0, -1, 0, 1.5],
            [0, 0, 0, 1]], np.float32)
        lidar2cam = np.linalg.inv(cam2lidar)
        l2i = K @ lidar2cam
        lidar2img.append(l2i)
        img2lidar.append(np.linalg.inv(l2i))
    return {
        'lidar2img': jnp.asarray(np.stack(lidar2img)[None]),
        'img2lidar': jnp.asarray(np.stack(img2lidar)[None]),
    }
