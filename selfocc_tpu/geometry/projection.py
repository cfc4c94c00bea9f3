"""Camera projection geometry: metric points <-> image pixels, ray generation.

TPU-native rewrite of the reference's projective transforms. Everything here is
a **fp32 island**: the reference wraps these in ``@autocast(enabled=False)``
(``model/encoder/bevformer/utils.py:114-116``, ``img2lidar.py:24``,
``reproj_loss_mono_multi_new_combine.py:123``) because projective divides are
precision-critical; we force float32 the same way even under bf16 training.

Unlike the reference (dict-of-numpy ``img_metas``), the TPU design carries all
per-sample camera matrices as stacked jnp arrays so the whole model traces
under ``jax.jit`` with static shapes.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-5


def point_sampling(ref_points, lidar2img, img_shape, focal_ratios_x=None,
                   focal_ratios_y=None):
    """Project 3D reference points into every camera.

    Behavioral rewrite of reference ``point_sampling``
    (``model/encoder/bevformer/utils.py:116-206``), dense and fp32.

    Args:
      ref_points: (P, Q, 3) metric xyz — P points per pillar, Q queries.
      lidar2img:  (B, N, 4, 4) projection matrices.
      img_shape:  static (H, W) of the augmented input image.
      focal_ratios_x / focal_ratios_y: optional (N,) per-camera scale factors
        applied to normalized pixel coords (reference ``utils.py:198-204``,
        set by RandomScaleImageMultiViewImage).

    Returns:
      ref_cam: (N, B, Q, P, 2) normalized pixel coords in [0,1] (can exceed).
      mask:    (N, B, Q, P) bool visibility (in front of camera & inside image).
    """
    ref = ref_points.astype(jnp.float32)
    l2i = lidar2img.astype(jnp.float32)
    P, Q = ref.shape[0], ref.shape[1]
    B, N = l2i.shape[0], l2i.shape[1]

    ref_h = jnp.concatenate([ref, jnp.ones_like(ref[..., :1])], axis=-1)  # P,Q,4
    # (B,N,1,1,4,4) @ (1,1,P,Q,4,1) -> (B,N,P,Q,4)
    cam = jnp.einsum('bnij,pqj->bnpqi', l2i, ref_h)

    mask = cam[..., 2] > EPS
    denom = jnp.maximum(cam[..., 2:3], EPS)
    xy = cam[..., 0:2] / denom
    x = xy[..., 0] / img_shape[1]
    y = xy[..., 1] / img_shape[0]

    mask = mask & (x > 0.0) & (x < 1.0) & (y > 0.0) & (y < 1.0)

    if focal_ratios_x is not None:
        x = x * focal_ratios_x.astype(jnp.float32)[None, :, None, None]
    if focal_ratios_y is not None:
        y = y * focal_ratios_y.astype(jnp.float32)[None, :, None, None]

    ref_cam = jnp.stack([x, y], axis=-1)          # B,N,P,Q,2
    ref_cam = jnp.transpose(ref_cam, (1, 0, 3, 2, 4))  # N,B,Q,P,2
    mask = jnp.transpose(mask, (1, 0, 3, 2))           # N,B,Q,P
    return ref_cam, mask


def rays_from_img2lidar(img2lidar, rays):
    """Build ray origins/directions from per-camera img->lidar 4x4 matrices.

    Behavioral rewrite of reference ``Img2LiDAR.forward``
    (``model/head/nerfacc_head/img2lidar.py:25-70``): pixel (u, v, 1)
    homogeneous coords rotated by the 3x3 block; origin is the translation.

    Args:
      img2lidar: (B, N, 4, 4) float matrices.
      rays: (R, 2) pixel (x, y) coordinates.

    Returns:
      origin: (B, N, 3); direction: (B, N, R, 3) — NOT normalized.
    """
    m = img2lidar.astype(jnp.float32)
    rays = rays.astype(jnp.float32)
    origin = m[..., :3, 3]
    rays_pad = jnp.concatenate([rays, jnp.ones_like(rays[..., :1])], axis=-1)  # R,3
    direction = jnp.einsum('bnij,rj->bnri', m[..., :3, :3], rays_pad)
    return origin, direction


def apply_novel_view(img2lidar, novel_view):
    """Offset camera poses for novel-view demo rendering
    (reference ``img2lidar.py:51-61``): ``novel_view = [dx, dy, dz, yaw]``."""
    dx, dy, dz, z_r = novel_view
    c, s = jnp.cos(jnp.deg2rad(z_r)), jnp.sin(jnp.deg2rad(z_r))
    rot = jnp.array([[c, -s, 0.], [s, c, 0.], [0., 0., 1.]], dtype=jnp.float32)
    m = img2lidar.astype(jnp.float32)
    rotated = jnp.einsum('ij,bnjk->bnik', rot, m[..., :3, :3])
    m = m.at[..., :3, :3].set(rotated)
    m = m.at[..., 0, 3].add(dx).at[..., 1, 3].add(dy).at[..., 2, 3].add(dz)
    return m


def cal_pixel(trans, coords, img_size):
    """Project homogeneous points through a 4x4 and return pixel + validity mask.

    fp32 island; behavioral rewrite of the closure in
    ``loss/reproj_loss_mono_multi_new_combine.py:123-133``.

    Args:
      trans: (..., 4, 4); coords: (..., 4) homogeneous points (already scaled
        by ray depth t); img_size: static (H, W).
    Returns:
      pixel (..., 2) in pixels, mask (...,) bool.
    """
    trans = trans.astype(jnp.float32)
    coords = coords.astype(jnp.float32)
    pixel = jnp.einsum('...ij,...j->...i', trans, coords)
    mask = pixel[..., 2] > 0
    denom = jnp.maximum(pixel[..., 2:3], EPS)
    pix = pixel[..., :2] / denom
    mask = mask & (pix[..., 0] > 0) & (pix[..., 0] < img_size[1]) & \
        (pix[..., 1] > 0) & (pix[..., 1] < img_size[0])
    return pix, mask
