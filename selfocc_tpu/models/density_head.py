"""Density-field rendering head — the NeRFAcc-based alternative to the NeuS
SDF head.

TPU-native rewrite of ``model/head/nerfacc_head/`` (SURVEY §2.6):
``nerfacc_head.py`` + ``rendering.py`` + ``estimator.py`` + ``bev_nerf.py``.
The field math follows ``BEVNeRF`` exactly (channel 0 -> softplus density, SH
color, softmax semantics); nerfacc's CUDA machinery maps as:

  * ``traverse_grids`` variable-samples ray marching -> fixed uniform samples
    per ray (static shapes; the NeuS configs already run this regime and on
    TPU dense masked math beats data-dependent skipping).
  * ``render_weight_from_density`` exclusive-scan transmittance ->
    ``jnp.cumprod`` over the sample axis.
  * ``accumulate_along_rays`` segmented reduction -> dense ``sum``.
  * ``CustomOccGridEstimator`` occupancy grid -> :func:`occupancy_grid`
    evaluated directly from the decoded volume (the estimator's EMA update
    from ``query_density`` is unnecessary when the full density volume is
    materialized each step); retained for eval/pruning parity.

Quirk preserved: depth is opacity-normalized in this head
(``rendering.py:158``) unlike the NeuS head (SURVEY §7 quirks).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.projection import rays_from_img2lidar
from ..geometry.ray_sampler import RaySampler
from . import neus
from .field import TPVSDFField

OCC_THRE = 0.0  # reference nerfacc_head.py:18


def occupancy_grid(volume, thre: float = OCC_THRE):
    """Binary occupancy grid from the decoded density volume (channel 0,
    softplus) — the static-shape analog of ``CustomOccGridEstimator``'s
    grid (``estimator.py:8-146``)."""
    return jax.nn.softplus(volume[0]) > thre


class NeRFAccHead(nn.Module):
    """Density-field head with the same driver interface as NeuSHead."""

    roi_aabb: Sequence[float]
    mapping_args: Dict[str, Any]
    resolution: float = 0.4
    near_plane: float = 0.0
    far_plane: float = 1e10
    num_samples: int = 256
    render_step_size: float = 4e-1

    ray_sample_mode: str = "fixed"
    ray_number: Sequence[int] = (192, 400)
    ray_img_size: Sequence[int] = (768, 1600)
    ray_upper_crop: int = 0
    render_bkgd: str = "white"

    embed_dims: int = 96
    color_dims: int = 0
    sem_dims: int = 0
    density_layers: int = 2
    sh_deg: int = 2
    sh_act: str = "relu"
    tpv: bool = False
    return_sem: bool = False
    train_ray_chunk: int = 0

    def setup(self):
        self.radiance_field = TPVSDFField(
            mapping_args=self.mapping_args, embed_dims=self.embed_dims,
            color_dims=self.color_dims, sem_dims=self.sem_dims,
            density_layers=self.density_layers, sh_deg=self.sh_deg,
            sh_act=self.sh_act, tpv=self.tpv)
        self.ray_sampler = RaySampler(
            ray_sample_mode=self.ray_sample_mode,
            ray_number=tuple(self.ray_number),
            ray_img_size=tuple(self.ray_img_size),
            ray_upper_crop=self.ray_upper_crop)
        self.ray_sampler_eval = RaySampler(
            ray_sample_mode="fixed", ray_number=tuple(self.ray_number),
            ray_img_size=tuple(self.ray_img_size),
            ray_upper_crop=self.ray_upper_crop)

    def prepare(self, representation):
        return self.radiance_field.decode(representation)[0]

    def render_rays(self, volume, origin, direction, rng=None, train=True,
                    geo_only=False):
        """Density rendering along fixed uniform samples
        (``rendering.py:15-170`` behavior under the dense regime).

        ``geo_only`` (static): gather only the density channel and skip
        rgb/sem — same depth/weights, much smaller gather payload (see
        ``NeuSHead.render_rays``)."""
        direction = direction.astype(jnp.float32)
        origin = origin.astype(jnp.float32)
        dnorm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
        unit = direction / dnorm
        near, far = neus.ray_aabb_near_far(
            origin, unit, self.roi_aabb, self.near_plane, self.far_plane)
        sample_rng = None
        if train and rng is not None:
            rng, sample_rng = jax.random.split(rng)
        segs = neus.sample_uniform(near, far, self.num_samples, sample_rng)
        mids = segs.mids
        pos = origin[:, None, :] + unit[:, None, :] * mids[..., None]

        geo = self.radiance_field.query_geo(
            volume[:1] if geo_only else volume, pos)
        sigma = jax.nn.softplus(geo["sdf"])                 # bev_nerf.py:117
        alpha = 1.0 - jnp.exp(-sigma * segs.deltas)
        weights = neus.weights_from_alpha(alpha)
        opacity = weights.sum(-1)

        out = {"weights": weights, "acc": opacity, "fars": far,
               "sigma": sigma}
        depth = neus.composite(weights, mids[..., None])[..., 0]
        # nerfacc path: depth normalized by opacity (rendering.py:158)
        depth = depth / jnp.clip(opacity, 1e-10, None)
        out["depth"] = depth / dnorm[:, 0]
        out["ts"] = mids / dnorm
        out["deltas"] = segs.deltas / dnorm

        if self.color_dims > 0 and not geo_only:
            rgb_s = self.radiance_field.color(geo["color_feat"],
                                              unit[:, None, :])
            rgb = neus.composite(weights, rgb_s)
            bkgd_rng = None
            mode = self.render_bkgd
            if mode == "random":
                if rng is None:
                    mode = "white"
                else:
                    rng, bkgd_rng = jax.random.split(rng)
            bkgd = neus.background_color(mode, rgb.shape, bkgd_rng)
            out["rgb"] = rgb + bkgd * (1.0 - opacity)[..., None]
        else:
            out["rgb"] = jnp.zeros(sigma.shape[:-1] + (0,), jnp.float32)
        if self.return_sem and self.sem_dims > 0 and not geo_only:
            sem_s = jax.nn.softmax(geo["sem_logits"], axis=-1)
            out["sem"] = neus.composite(weights, sem_s)
        return out

    def __call__(self, representation, img2lidar, rng=None, global_iter=None,
                 train=True):
        volume = self.radiance_field.decode(representation)[0]
        ray_rng = None
        if rng is not None:
            rng, ray_rng = jax.random.split(rng)
        sampler = self.ray_sampler if train else self.ray_sampler_eval
        rays = sampler(ray_rng if sampler.ray_sample_mode != "fixed" else None)
        origin, direction = rays_from_img2lidar(img2lidar, rays)
        bs, num_cams, num_rays = direction.shape[:3]
        assert bs == 1
        o = jnp.broadcast_to(origin[:, :, None, :],
                             (bs, num_cams, num_rays, 3)).reshape(-1, 3)
        d = direction.reshape(-1, 3)
        r = self.render_rays(volume, o, d, rng=rng, train=train)

        def cams(x, extra=()):
            return x.reshape((bs, num_cams, num_rays) + tuple(extra))

        S = self.num_samples
        outputs = {
            "ms_depths": [cams(r["depth"])],
            "ms_colors": [cams(r["rgb"], (r["rgb"].shape[-1],))],
            "ms_accs": [cams(r["acc"])],
            "ms_fars": [cams(r["fars"])],
            "ms_rays": rays,
            "weights": cams(r["weights"], (S,)),
            "ts": cams(r["ts"], (S,)),
            "deltas": cams(r["deltas"], (S,)),
        }
        if self.return_sem and "sem" in r:
            outputs["sem"] = [cams(r["sem"], (self.sem_dims,))]
        return outputs

    def forward_occ(self, representation, aabb=None, resolution=None):
        """Uniform-grid density for occupancy eval (``--density`` flag in
        eval_iou: occupied where density >= thresh)."""
        volume = self.radiance_field.decode(representation)[0]
        aabb = self.roi_aabb if aabb is None else aabb
        resolution = self.resolution if resolution is None else resolution
        xs = jnp.linspace(aabb[0], aabb[3], int((aabb[3] - aabb[0]) / resolution))
        ys = jnp.linspace(aabb[1], aabb[4], int((aabb[4] - aabb[1]) / resolution))
        zs = jnp.linspace(aabb[2], aabb[5], int((aabb[5] - aabb[2]) / resolution))
        xyz = jnp.stack(jnp.meshgrid(ys, xs, zs, indexing="ij"), axis=-1)
        xyz = xyz[..., [1, 0, 2]]
        geo = self.radiance_field.query_geo(volume, xyz)
        out = {"sdf": jax.nn.softplus(geo["sdf"]), "xyz": xyz}
        if self.return_sem and self.sem_dims > 0:
            out["sem"] = jnp.argmax(geo["sem_logits"], axis=-1)
            out["logits"] = geo["sem_logits"]
        return out

    def occ_from_volume(self, volume, xyz):
        """Density query of an already-decoded volume at arbitrary metric
        points (grid-sharded eval path, see ``NeuSHead.occ_from_volume``)."""
        geo = self.radiance_field.query_geo(volume, xyz)
        out = {"sdf": jax.nn.softplus(geo["sdf"])}
        if self.return_sem and self.sem_dims > 0:
            out["sem"] = jnp.argmax(geo["sem_logits"], axis=-1)
            out["logits"] = geo["sem_logits"]
        return out

    def occ_uniform(self, volume, xs, ys, zs):
        """Separable-grid density query (see ``NeuSHead.occ_uniform``)."""
        geo = self.radiance_field.query_geo_uniform(volume, xs, ys, zs)
        out = {"sdf": jax.nn.softplus(geo["sdf"])}
        if self.return_sem and self.sem_dims > 0:
            out["sem"] = jnp.argmax(geo["sem_logits"], axis=-1)
            out["logits"] = geo["sem_logits"]
        return out
