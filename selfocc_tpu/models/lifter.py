"""2D->3D lifters: learnable TPV/BEV query planes or Fourier position queries.

Behavioral rewrite of ``model/lifter/`` (``tpv_query_lifter.py``,
``bev_query_lifter.py``, ``tpv_pos_lifter.py``).
"""
from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.mappings import make_mapping


class TPVQueryLifter(nn.Module):
    """Three learnable query planes (reference ``tpv_query_lifter.py:7-36``)."""

    tpv_h: int
    tpv_w: int
    tpv_z: int
    dim: int

    @nn.compact
    def __call__(self, ms_img_feats, *args, **kwargs):
        bs = ms_img_feats[0].shape[0]
        init = nn.initializers.normal(stddev=1.0)
        hw = self.param("tpv_hw", init, (1, self.tpv_h * self.tpv_w, self.dim))
        zh = self.param("tpv_zh", init, (1, self.tpv_z * self.tpv_h, self.dim))
        wz = self.param("tpv_wz", init, (1, self.tpv_w * self.tpv_z, self.dim))
        rep = [jnp.broadcast_to(p, (bs,) + p.shape[1:]) for p in (hw, zh, wz)]
        return {"representation": rep}


class BEVQueryLifter(nn.Module):
    """Single learnable BEV plane (reference ``bev_query_lifter.py:7-26``)."""

    bev_h: int
    bev_w: int
    dim: int

    @nn.compact
    def __call__(self, ms_img_feats, *args, **kwargs):
        bs = ms_img_feats[0].shape[0]
        bev = self.param("bev", nn.initializers.normal(stddev=1.0),
                         (1, self.bev_h * self.bev_w, self.dim))
        return {"representation": jnp.broadcast_to(bev, (bs,) + bev.shape[1:])}


def fourier_feat_from_meter(num_freqs: int, meter: jnp.ndarray) -> jnp.ndarray:
    """Fourier features of normalized plane coords (reference
    ``tpvformer_pos_embed.py:6-14``): freqs = pi * 2^[-1 .. num_freqs-2],
    layout (coord, freq, sin/cos) flattened -> (HW, 4*num_freqs)."""
    freqs = jnp.pi * (2.0 ** jnp.arange(-1, num_freqs - 1, dtype=jnp.float32))
    mf = meter[..., None] * freqs            # (H, W, 2, F)
    feat = jnp.stack([jnp.sin(mf), jnp.cos(mf)], axis=-1)  # (H, W, 2, F, 2)
    feat = feat.reshape(*feat.shape[:-3], -1)
    return feat.reshape(-1, feat.shape[-1])


def tpv_plane_meters(mapping):
    """Metric coordinates of each TPV plane's cells (reference
    ``tpvformer_encoder.py:84-101``): hw->(x,y), zh->(y,z), wz->(x,z)."""
    H, W, D = mapping.size_h, mapping.size_w, mapping.size_d
    ah = jnp.arange(H, dtype=jnp.float32)
    aw = jnp.arange(W, dtype=jnp.float32)
    ad = jnp.arange(D, dtype=jnp.float32)

    hw_grid = jnp.stack([
        jnp.broadcast_to(ah[:, None], (H, W)),
        jnp.broadcast_to(aw[None, :], (H, W)),
        jnp.zeros((H, W))], axis=-1)
    hw_meter = mapping.grid2meter(hw_grid)[..., [0, 1]]

    zh_grid = jnp.stack([
        jnp.broadcast_to(ah[None, :], (D, H)),
        jnp.zeros((D, H)),
        jnp.broadcast_to(ad[:, None], (D, H))], axis=-1)
    zh_meter = mapping.grid2meter(zh_grid)[..., [1, 2]]

    wz_grid = jnp.stack([
        jnp.zeros((W, D)),
        jnp.broadcast_to(aw[:, None], (W, D)),
        jnp.broadcast_to(ad[None, :], (W, D))], axis=-1)
    wz_meter = mapping.grid2meter(wz_grid)[..., [0, 2]]
    return hw_meter, zh_meter, wz_meter


def normalize_plane_meters(hw, zh, wz, pc_range):
    """Normalize plane meters into [0,1] by the point-cloud range
    (reference ``tpvformer_pos_embed.py:30-47``)."""
    x0, y0, z0, x1, y1, z1 = pc_range
    hw = jnp.stack([(hw[..., 0] - x0) / (x1 - x0),
                    (hw[..., 1] - y0) / (y1 - y0)], axis=-1)
    zh = jnp.stack([(zh[..., 0] - y0) / (y1 - y0),
                    (zh[..., 1] - z0) / (z1 - z0)], axis=-1)
    wz = jnp.stack([(wz[..., 0] - x0) / (x1 - x0),
                    (wz[..., 1] - z0) / (z1 - z0)], axis=-1)
    return hw, zh, wz


class TPVPositionLifter(nn.Module):
    """Queries from Fourier features of plane-cell metric coords — no learned
    queries (reference ``tpv_pos_lifter.py:18-86``)."""

    embed_dims: int
    tot_range: Sequence[float]
    num_freqs: Sequence[int]
    mapping_args: Dict

    @nn.compact
    def __call__(self, ms_img_feats, *args, **kwargs):
        bs = ms_img_feats[0].shape[0]
        mapping = make_mapping(**self.mapping_args)
        hw, zh, wz = tpv_plane_meters(mapping)
        hw, zh, wz = normalize_plane_meters(hw, zh, wz, list(self.tot_range))
        feats = [fourier_feat_from_meter(f, m)
                 for f, m in zip(self.num_freqs, (hw, zh, wz))]
        names = ("hw", "zh", "wz")
        rep = []
        for name, feat in zip(names, feats):
            x = nn.Dense(self.embed_dims, name=f"position_layer_{name}")(feat)
            rep.append(jnp.broadcast_to(x[None], (bs,) + x.shape))
        return {"representation": rep}
