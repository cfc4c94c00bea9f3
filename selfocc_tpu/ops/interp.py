"""Bilinear / trilinear interpolation (``grid_sample`` equivalents) in pure XLA.

The reference leans on PyTorch ``F.grid_sample`` (cuDNN) and on the
``cuda_gridsample_grad2`` CUDA extension for second-order gradients
(reference ``bev_nerf.py:109``, losses, ``docs/installation.md`` step d).
On TPU neither is needed: these are plain gathers + lerps that XLA fuses, and
JAX autodiff is natively infinite-order through them — the eikonal and
second-gradient losses differentiate through :func:`trilinear_sample` for free.

Conventions match ``F.grid_sample(..., align_corners=True)`` but the public
API takes **fractional indices** (0 .. size-1) rather than [-1, 1] normalized
coords, avoiding the reference's normalize→denormalize round trip
(``bev_nerf.py:102-113``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_weights_1d(coord):
    """Split fractional index into floor/ceil corner indices and lerp weight."""
    c0 = jnp.floor(coord)
    w1 = coord - c0
    i0 = c0.astype(jnp.int32)
    i1 = i0 + 1
    return (i0, i1), w1


def _corner_mask(idx, size):
    return (idx >= 0) & (idx <= size - 1)


def bilinear_sample(img, xy, padding: str = "zeros"):
    """Sample a (H, W, C) image at fractional pixel coords.

    Args:
      img: (H, W, C).
      xy: (..., 2) fractional (x, y) pixel indices, align_corners=True
        convention (0 .. W-1 / 0 .. H-1).
      padding: 'zeros' (out-of-range contributes 0, as grid_sample default) or
        'border' (clamp, as the reprojection loss uses,
        ``reproj_loss_mono_multi_new_combine.py:147-152``).

    Returns:
      (..., C) samples. Differentiable to all orders w.r.t. ``xy``.
    """
    H, W = img.shape[0], img.shape[1]
    x, y = xy[..., 0], xy[..., 1]
    if padding == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)

    (x0, x1), wx = _gather_weights_1d(x)
    (y0, y1), wy = _gather_weights_1d(y)

    out = None
    for yi, wyi in ((y0, 1.0 - wy), (y1, wy)):
        for xi, wxi in ((x0, 1.0 - wx), (x1, wx)):
            if padding == "zeros":
                valid = _corner_mask(xi, W) & _corner_mask(yi, H)
                w = wyi * wxi * valid
            else:
                w = wyi * wxi
            xc = jnp.clip(xi, 0, W - 1)
            yc = jnp.clip(yi, 0, H - 1)
            val = img[yc, xc]  # (..., C)
            term = w[..., None] * val
            out = term if out is None else out + term
    return out


def trilinear_sample(vol, hwd, padding: str = "zeros"):
    """Sample a (H, W, D, C) volume at fractional (h, w, d) indices.

    Equivalent to ``F.grid_sample(volume, grid, align_corners=True)`` on a 5D
    tensor (reference ``bev_nerf.py:109-113`` — note the reference permutes its
    grid to (d, w, h) to match torch's (x, y, z); here we index (h, w, d)
    directly).

    Args:
      vol: (H, W, D, C).
      hwd: (..., 3) fractional indices.
      padding: 'zeros' or 'border'.
    Returns:
      (..., C); differentiable to all orders w.r.t. ``hwd``.
    """
    H, W, D = vol.shape[0], vol.shape[1], vol.shape[2]
    h, w, d = hwd[..., 0], hwd[..., 1], hwd[..., 2]
    if padding == "border":
        h = jnp.clip(h, 0.0, H - 1.0)
        w = jnp.clip(w, 0.0, W - 1.0)
        d = jnp.clip(d, 0.0, D - 1.0)

    (h0, h1), wh = _gather_weights_1d(h)
    (w0, w1), ww = _gather_weights_1d(w)
    (d0, d1), wd = _gather_weights_1d(d)

    out = None
    for hi, whi in ((h0, 1.0 - wh), (h1, wh)):
        for wi, wwi in ((w0, 1.0 - ww), (w1, ww)):
            for di, wdi in ((d0, 1.0 - wd), (d1, wd)):
                if padding == "zeros":
                    valid = (_corner_mask(hi, H) & _corner_mask(wi, W)
                             & _corner_mask(di, D))
                    wgt = whi * wwi * wdi * valid
                else:
                    wgt = whi * wwi * wdi
                hc = jnp.clip(hi, 0, H - 1)
                wc = jnp.clip(wi, 0, W - 1)
                dc = jnp.clip(di, 0, D - 1)
                val = vol[hc, wc, dc]
                term = wgt[..., None] * val
                out = term if out is None else out + term
    return out


def trilinear_sample_cf(vol_cf, hwd, padding: str = "zeros"):
    """Channel-first trilinear sampling: vol (C, H, W, D), hwd (..., 3)
    fractional indices -> (..., C).

    TPU-layout twin of :func:`trilinear_sample`: gathers run along a flattened
    spatial axis with the (large) point count trailing, so the (8, 128) tile
    padding stays ~1x instead of padding the small channel dim to 128 lanes
    (see ops/msda.py `_bilinear_gather_cf` for the observed 8x blowup).
    """
    C, H, W, D = vol_cf.shape
    pts_shape = hwd.shape[:-1]
    hwd = hwd.reshape(-1, 3)
    h, w, d = hwd[:, 0], hwd[:, 1], hwd[:, 2]
    if padding == "border":
        h = jnp.clip(h, 0.0, H - 1.0)
        w = jnp.clip(w, 0.0, W - 1.0)
        d = jnp.clip(d, 0.0, D - 1.0)
    h0, w0, d0 = jnp.floor(h), jnp.floor(w), jnp.floor(d)
    wh, ww, wd = h - h0, w - w0, d - d0
    h0i, w0i, d0i = (h0.astype(jnp.int32), w0.astype(jnp.int32),
                     d0.astype(jnp.int32))

    v_flat = vol_cf.reshape(C, H * W * D)
    out = None
    for hi, whi in ((h0i, 1.0 - wh), (h0i + 1, wh)):
        for wi, wwi in ((w0i, 1.0 - ww), (w0i + 1, ww)):
            for di, wdi in ((d0i, 1.0 - wd), (d0i + 1, wd)):
                if padding == "zeros":
                    valid = ((hi >= 0) & (hi <= H - 1) & (wi >= 0) &
                             (wi <= W - 1) & (di >= 0) & (di <= D - 1))
                    wgt = whi * wwi * wdi * valid
                else:
                    wgt = whi * wwi * wdi
                lin = (jnp.clip(hi, 0, H - 1) * W
                       + jnp.clip(wi, 0, W - 1)) * D + jnp.clip(di, 0, D - 1)
                term = wgt.astype(v_flat.dtype)[None, :] * \
                    jnp.take(v_flat, lin, axis=1)            # (C, N)
                out = term if out is None else out + term
    return out.T.reshape(*pts_shape, C)


def trilinear_sample_cf_with_grad(vol_cf, hwd, padding: str = "zeros"):
    """Channel-first trilinear sampling returning values AND the analytic
    spatial gradient of channel 0 w.r.t. the grid coordinates.

    One corner-gather pass serves both: the value is the weighted corner sum,
    and the derivative of trilinear interpolation along each axis is the
    bilinear interpolation (over the other two axes) of corner differences —
    closed form, no autodiff transpose graph, no second gather
    (the render loop's SDF gradient otherwise doubles HBM gather traffic).

    Returns:
      vals: (..., C); grad0: (..., 3) = d(channel0)/d(h, w, d).
    """
    C, H, W, D = vol_cf.shape
    pts_shape = hwd.shape[:-1]
    hwd = hwd.reshape(-1, 3)
    h, w, d = hwd[:, 0], hwd[:, 1], hwd[:, 2]
    if padding == "border":
        h = jnp.clip(h, 0.0, H - 1.0)
        w = jnp.clip(w, 0.0, W - 1.0)
        d = jnp.clip(d, 0.0, D - 1.0)
    h0, w0, d0 = jnp.floor(h), jnp.floor(w), jnp.floor(d)
    wh, ww, wd = h - h0, w - w0, d - d0
    h0i, w0i, d0i = (h0.astype(jnp.int32), w0.astype(jnp.int32),
                     d0.astype(jnp.int32))

    v_flat = vol_cf.reshape(C, H * W * D)
    wh_ = (1.0 - wh, wh)
    ww_ = (1.0 - ww, ww)
    wd_ = (1.0 - wd, wd)
    # accumulate value + grad contributions per corner so each gathered
    # (C, N) tensor dies immediately (8 simultaneously-live corners defeat
    # XLA fusion and cost ~35% render throughput)
    vals = gh = gw = gd = None
    for ih, hi in enumerate((h0i, h0i + 1)):
        for iw, wi in enumerate((w0i, w0i + 1)):
            for idd, di in enumerate((d0i, d0i + 1)):
                if padding == "zeros":
                    valid = ((hi >= 0) & (hi <= H - 1) & (wi >= 0) &
                             (wi <= W - 1) & (di >= 0) & (di <= D - 1))
                    mask = valid.astype(v_flat.dtype)
                else:
                    mask = None
                lin = (jnp.clip(hi, 0, H - 1) * W
                       + jnp.clip(wi, 0, W - 1)) * D + jnp.clip(di, 0, D - 1)
                g = jnp.take(v_flat, lin, axis=1)           # (C, N)
                c0 = g[0] * mask if mask is not None else g[0]
                wgt = wh_[ih] * ww_[iw] * wd_[idd]
                if mask is not None:
                    wgt = wgt * mask
                term = wgt[None, :] * g
                vals = term if vals is None else vals + term
                th = (1.0 if ih else -1.0) * ww_[iw] * wd_[idd] * c0
                tw = (1.0 if iw else -1.0) * wh_[ih] * wd_[idd] * c0
                td = (1.0 if idd else -1.0) * wh_[ih] * ww_[iw] * c0
                gh = th if gh is None else gh + th
                gw = tw if gw is None else gw + tw
                gd = td if gd is None else gd + td

    grad0 = jnp.stack([gh, gw, gd], axis=-1)
    # gathers may run in bf16 (eval volumes); the NeuS alpha/compositing math
    # downstream stays fp32
    return (vals.T.reshape(*pts_shape, C).astype(jnp.float32),
            grad0.reshape(*pts_shape, 3).astype(jnp.float32))


def grid_sample_2d(imgs, xy_norm, padding: str = "zeros"):
    """Batched drop-in for torch ``F.grid_sample`` on 2D with align_corners=True.

    Args:
      imgs: (B, H, W, C) channel-last images.
      xy_norm: (B, ..., 2) coords in [-1, 1] ((x, y) order, torch convention).
      padding: 'zeros' or 'border'.
    Returns: (B, ..., C).
    """
    H, W = imgs.shape[1], imgs.shape[2]
    x = (xy_norm[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (xy_norm[..., 1] + 1.0) * 0.5 * (H - 1)
    xy = jnp.stack([x, y], axis=-1)
    return jax.vmap(lambda im, c: bilinear_sample(im, c, padding))(imgs, xy)


# ------------------------------------------------ corner-bundled sampling
def bundle_corners_cf(vol_cf):
    """Pack the 8 trilinear corner neighborhoods into the channel axis:
    (C, H, W, D) -> (8*C, (H-1)*(W-1)*(D-1)).

    Measured on v5e: XLA TPU gathers are ROW-rate-bound (~100M rows/s) and
    payload-width-insensitive up to ~256 channels — so fetching all 8 corners
    of a sample as ONE fat row is ~8x cheaper than 8 thin gathers (see
    docs/PERFORMANCE.md). Block k = bh*4 + bw*2 + bd holds the value at
    voxel (h+bh, w+bw, d+bd); base voxels range over [0, H-2] x [0, W-2] x
    [0, D-2], so no halo padding is required.
    """
    C, H, W, D = vol_cf.shape
    blocks = []
    for bh in (0, 1):
        for bw in (0, 1):
            for bd in (0, 1):
                blocks.append(
                    vol_cf[:, bh:H - 1 + bh, bw:W - 1 + bw, bd:D - 1 + bd])
    out = jnp.stack(blocks, axis=0)           # (8, C, H-1, W-1, D-1)
    return out.reshape(8 * C, (H - 1) * (W - 1) * (D - 1))


def _bundled_axis_weights(x, x0i, size):
    """Per-axis physical-block weights with zeros-padding semantics.

    Base b = clip(floor(x), 0, size-2); block offset e = blk - (floor - b)
    recovers the logical corner: weight (1-frac) when e==0, frac when e==1,
    0 otherwise (covers all out-of-bounds cases exactly — for |floor-b| > 1
    both blocks get 0, matching the zeros-padded 8-corner formulation).
    Returns (w0, w1, g0, g1, base): value weights, gradient signs, base idx.
    """
    frac = x - x0i.astype(x.dtype)
    base = jnp.clip(x0i, 0, size - 2)
    sh = x0i - base
    ws, gs = [], []
    for blk in (0, 1):
        e = blk - sh
        w = jnp.where(e == 0, 1.0 - frac, jnp.where(e == 1, frac, 0.0))
        g = jnp.where(e == 0, -1.0, jnp.where(e == 1, 1.0, 0.0))
        ws.append(w)
        gs.append(g)
    return ws[0], ws[1], gs[0], gs[1], base


def trilinear_sample_cf_bundled_with_grad(bundle, vol_shape, hwd):
    """Bundled twin of :func:`trilinear_sample_cf_with_grad` (zeros padding):
    ONE row gather per sample; numerically identical weights.

    Args:
      bundle: (8*C, (H-1)*(W-1)*(D-1)) from :func:`bundle_corners_cf`.
      vol_shape: static (C, H, W, D) of the original volume.
      hwd: (..., 3) fractional grid coords.
    Returns: vals (..., C) fp32; grad0 (..., 3) fp32 (d channel-0 / d hwd).
    """
    C, H, W, D = vol_shape
    pts_shape = hwd.shape[:-1]
    hwd = hwd.reshape(-1, 3)
    h, w, d = hwd[:, 0], hwd[:, 1], hwd[:, 2]
    h0i = jnp.floor(h).astype(jnp.int32)
    w0i = jnp.floor(w).astype(jnp.int32)
    d0i = jnp.floor(d).astype(jnp.int32)
    wh0, wh1, ghs0, ghs1, bh = _bundled_axis_weights(h, h0i, H)
    ww0, ww1, gws0, gws1, bw = _bundled_axis_weights(w, w0i, W)
    wd0, wd1, gds0, gds1, bd = _bundled_axis_weights(d, d0i, D)

    lin = (bh * (W - 1) + bw) * (D - 1) + bd
    g = jnp.take(bundle, lin, axis=1)                      # (8C, N)
    # IMPORTANT: slice blocks out of (8C, N); reshaping to (8, C, N) forces a
    # relayout XLA pads 6x (observed 16 GB HLO temp on the flagship volume)

    wh_, ww_, wd_ = (wh0, wh1), (ww0, ww1), (wd0, wd1)
    gh_, gw_, gd_ = (ghs0, ghs1), (gws0, gws1), (gds0, gds1)
    vals = gh = gw = gd = None
    for ih in (0, 1):
        for iw in (0, 1):
            for idd in (0, 1):
                k = ih * 4 + iw * 2 + idd
                blk = g[k * C:(k + 1) * C]                 # (C, N)
                wgt = wh_[ih] * ww_[iw] * wd_[idd]
                term = wgt.astype(blk.dtype)[None, :] * blk
                vals = term if vals is None else vals + term
                c0 = blk[0].astype(jnp.float32)
                th = gh_[ih] * ww_[iw] * wd_[idd] * c0
                tw = gw_[iw] * wh_[ih] * wd_[idd] * c0
                td = gd_[idd] * wh_[ih] * ww_[iw] * c0
                gh = th if gh is None else gh + th
                gw = tw if gw is None else gw + tw
                gd = td if gd is None else gd + td
    grad0 = jnp.stack([gh, gw, gd], axis=-1)
    return (vals.T.reshape(*pts_shape, C).astype(jnp.float32),
            grad0.reshape(*pts_shape, 3).astype(jnp.float32))


def trilinear_sample_cf_bundled(bundle, vol_shape, hwd):
    """Values-only bundled sampling (zeros padding), one gather per sample."""
    C, H, W, D = vol_shape
    pts_shape = hwd.shape[:-1]
    hwd = hwd.reshape(-1, 3)
    h, w, d = hwd[:, 0], hwd[:, 1], hwd[:, 2]
    h0i = jnp.floor(h).astype(jnp.int32)
    w0i = jnp.floor(w).astype(jnp.int32)
    d0i = jnp.floor(d).astype(jnp.int32)
    wh0, wh1, _, _, bh = _bundled_axis_weights(h, h0i, H)
    ww0, ww1, _, _, bw = _bundled_axis_weights(w, w0i, W)
    wd0, wd1, _, _, bd = _bundled_axis_weights(d, d0i, D)
    lin = (bh * (W - 1) + bw) * (D - 1) + bd
    g = jnp.take(bundle, lin, axis=1)                      # (8C, N)
    wh_, ww_, wd_ = (wh0, wh1), (ww0, ww1), (wd0, wd1)
    vals = None
    for ih in (0, 1):
        for iw in (0, 1):
            for idd in (0, 1):
                k = ih * 4 + iw * 2 + idd
                wgt = (wh_[ih] * ww_[iw] * wd_[idd])
                term = wgt.astype(g.dtype)[None, :] * g[k * C:(k + 1) * C]
                vals = term if vals is None else vals + term
    return vals.T.reshape(*pts_shape, C)


def lerp_axis_cf(vol_cf, g, axis: int):
    """Linear interpolation of a channel-first volume along ONE spatial axis
    at fractional indices ``g`` (1-D), with zeros padding outside
    ``[0, size-1]``. Returns the volume with that axis resized to
    ``g.shape[0]``."""
    size = vol_cf.shape[axis]
    i0 = jnp.floor(g)
    f = (g - i0).astype(vol_cf.dtype)
    i0i = i0.astype(jnp.int32)
    w0 = (1.0 - f) * ((i0i >= 0) & (i0i <= size - 1))
    w1 = f * ((i0i + 1 >= 0) & (i0i + 1 <= size - 1))
    v0 = jnp.take(vol_cf, jnp.clip(i0i, 0, size - 1), axis=axis)
    v1 = jnp.take(vol_cf, jnp.clip(i0i + 1, 0, size - 1), axis=axis)
    shape = [1] * vol_cf.ndim
    shape[axis] = g.shape[0]
    return v0 * w0.reshape(shape) + v1 * w1.reshape(shape)


def separable_grid_resample_cf(vol_cf, gh, gw, gd):
    """Trilinear sampling of a (C, H, W, D) volume on a SEPARABLE index grid
    (``gh`` x ``gw`` x ``gd`` fractional indices) -> (C, Ho, Wo, Do).

    The uniform occupancy-eval grid is separable in metric space and
    ``GridMeterMapping.meter2grid`` maps each metric axis independently
    (h<-y, w<-x, d<-z), so the 8-corner gather of ``trilinear_sample_cf``
    factorizes into three per-axis lerps: bandwidth-bound whole-axis takes
    (~5 GB of HBM traffic on the flagship 512x512x40 query, milliseconds)
    instead of 84M gather rows at the ~145M rows/s issue-rate ceiling
    (docs/PERFORMANCE.md). Same interpolant and the same zeros-padding
    masks (per-corner mask == product of per-axis masks); the fp32
    rounding ORDER differs from the expanded corner sum (nested lerps
    instead of an 8-term weighted sum), so results can differ by ~1 ulp —
    the gather path stays the parity default, this is the opt-in fast
    query (``eval_iou --grid-query separable``)."""
    out = lerp_axis_cf(vol_cf, gh, 1)
    out = lerp_axis_cf(out, gw, 2)
    return lerp_axis_cf(out, gd, 3)
