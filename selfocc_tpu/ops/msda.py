"""Multi-scale deformable attention (MSDeformAttn) core op — pure XLA version.

This replaces the mmcv CUDA kernel ``MultiScaleDeformableAttnFunction``
(reference ``model/encoder/bevformer/attention/image_cross_attention.py:340-342``
and ``cross_view_hybrid_attention.py:111-113``): for every query, K sampling
points per head per level are bilinearly gathered from a flattened feature
pyramid and reduced with softmax attention weights.

Semantics match mmcv's PyTorch fallback ``multi_scale_deformable_attn_pytorch``
(the only in-repo golden reference, per SURVEY §4): ``grid_sample`` with
``align_corners=False`` and zero padding, i.e. fractional pixel index
``loc * size - 0.5``.

TPU notes:
  * ``spatial_shapes`` must be **static** Python ints — levels are unrolled at
    trace time (4 levels in all shipped configs), keeping shapes static.
  * ``query_chunk`` bounds transient memory: the gather materializes
    (B, Qc, H, P, D) per level instead of the full query set.
  * No Pallas kernel here on purpose: the op is bound by gather row rate, and
    Mosaic has no faster dynamic-gather primitive than the XLA lowering — the
    TPU wins come from layout (channel-first, big trailing axis) and from
    ``shared_locations`` (6x fewer gather rows), both implemented above.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .interp import bilinear_sample


def _bilinear_gather_cf(v_flat, xy, h, w):
    """Channel-first bilinear gather: v_flat (C, h*w), xy (Q, P, 2) fractional
    pixel coords -> (C, Q, P), zeros padding.

    TPU layout note: the payload axis C (= head_dim, typically 16) must NOT be
    the trailing axis — the (8, 128) tile would pad 16 lanes to 128 (8x HBM
    blowup, observed as 5.3 GB per-corner temps). Gathering along a flattened
    Q*P trailing axis keeps padding ~1x.
    """
    Q, P = xy.shape[0], xy.shape[1]
    x, y = xy[..., 0].reshape(-1), xy[..., 1].reshape(-1)   # (QP,)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx, wy = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    out = None
    for yi, wyi in ((y0i, 1.0 - wy), (y0i + 1, wy)):
        for xi, wxi in ((x0i, 1.0 - wx), (x0i + 1, wx)):
            valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            # keep the big (C, QP) product in the payload dtype (bf16 in the
            # fast path); accumulation across 4 corners stays in that dtype
            wgt = (wyi * wxi * valid)[None, :].astype(v_flat.dtype)
            lin = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            gathered = jnp.take(v_flat, lin, axis=1)        # (C, QP)
            term = wgt * gathered
            out = term if out is None else out + term
    return out.reshape(-1, Q, P)


def _bundle_corners_2d(v, h, w):
    """(BH, C, h*w) -> (BH, 4C, h*w): row i carries the 2x2 corner block
    anchored at pixel i, channel blocks ordered
    [(y, x), (y, x+1), (y+1, x), (y+1, x+1)]. Far-edge slots are zero-padded
    but never read with nonzero weight (the gather base is clamped to
    [0, size-2]). 2D analog of ``interp.bundle_corners_cf`` — one fat gather
    per sampling point instead of 4 (gathers are row-rate-bound and payload-
    insensitive to ~256 channels, docs/PERFORMANCE.md)."""
    BH, C = v.shape[0], v.shape[1]
    vi = v.reshape(BH, C, h, w)
    blocks = []
    for dy in (0, 1):
        for dx in (0, 1):
            s = vi[:, :, dy:, dx:]
            s = jnp.pad(s, ((0, 0), (0, 0), (0, dy), (0, dx)))
            blocks.append(s)
    return jnp.concatenate(blocks, axis=1).reshape(BH, 4 * C, h * w)


def _bundle_pairs_x(v, h, w):
    """(BH, C, h*w) -> (BH, 2C, h*w): row i carries the x-adjacent pixel pair
    [(y, x), (y, x+1)] (last column's +1 slot zero-padded, never read with
    nonzero weight — the gather base is clamped to [0, w-2]). Half-measure
    between the per-corner path (4 rows/point) and the full 2x2 bundle
    (1 row/point): 2 rows/point with a 2C payload and a much smaller composed
    program — a fallback formulation for the remote-compiler crash the full
    bundle triggers at flagship scale (docs/PERFORMANCE.md)."""
    BH, C = v.shape[0], v.shape[1]
    vi = v.reshape(BH, C, h, w)
    s = jnp.pad(vi[:, :, :, 1:], ((0, 0), (0, 0), (0, 0), (0, 1)))
    return jnp.concatenate([vi, s], axis=1).reshape(BH, 2 * C, h * w)


def _axis_block_weights(base, i0, frac):
    """Zeros-padding bilinear weights re-expressed on the clamped physical
    2-slot block (same scheme as ``interp._block_weights``): slot s at
    coordinate base+s receives the weight of whichever logical corner
    (i0 -> 1-frac, i0+1 -> frac) lands on it, else 0 — OOB logical corners
    (base can't equal them) contribute nothing, exactly grid_sample zeros."""
    w0 = jnp.where(base == i0, 1.0 - frac,
                   jnp.where(base == i0 + 1, frac, 0.0))
    w1 = jnp.where(base + 1 == i0, 1.0 - frac,
                   jnp.where(base + 1 == i0 + 1, frac, 0.0))
    return w0, w1


def _bilinear_gather_cf_bundled(vb, xy, h, w, C):
    """Corner-bundled bilinear gather: vb (4C, h*w), xy (Q, P, 2) fractional
    pixel coords -> (C, Q, P). ONE gather row per point (vs 4 in
    ``_bilinear_gather_cf``). Channel blocks are SLICED, never reshaped to
    (4, C, N) — that relayout tile-pads 6x (see CLAUDE.md)."""
    Q, P = xy.shape[0], xy.shape[1]
    x, y = xy[..., 0].reshape(-1), xy[..., 1].reshape(-1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    bx = jnp.clip(x0i, 0, max(w - 2, 0))
    by = jnp.clip(y0i, 0, max(h - 2, 0))
    wx0, wx1 = _axis_block_weights(bx, x0i, fx)
    wy0, wy1 = _axis_block_weights(by, y0i, fy)
    lin = by * w + bx
    g = jnp.take(vb, lin, axis=1)                         # (4C, QP)
    dt = vb.dtype
    out = (wy0 * wx0)[None].astype(dt) * g[0:C] \
        + (wy0 * wx1)[None].astype(dt) * g[C:2 * C] \
        + (wy1 * wx0)[None].astype(dt) * g[2 * C:3 * C] \
        + (wy1 * wx1)[None].astype(dt) * g[3 * C:4 * C]
    return out.reshape(C, Q, P)


def _bilinear_gather_cf_pairs(vp, xy, h, w, C):
    """x-pair-bundled bilinear gather: vp (2C, h*w), xy (Q, P, 2) fractional
    pixel coords -> (C, Q, P). TWO gather rows per point (top and bottom
    y-corner, each fetching its x-pair). Channel blocks SLICED, never
    reshaped (see ``_bilinear_gather_cf_bundled``)."""
    Q, P = xy.shape[0], xy.shape[1]
    x, y = xy[..., 0].reshape(-1), xy[..., 1].reshape(-1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    bx = jnp.clip(x0i, 0, max(w - 2, 0))
    wx0, wx1 = _axis_block_weights(bx, x0i, fx)
    dt = vp.dtype
    out = None
    for yi, wyi in ((y0i, 1.0 - fy), (y0i + 1, fy)):
        valid_y = (yi >= 0) & (yi <= h - 1)
        lin = jnp.clip(yi, 0, h - 1) * w + bx
        g = jnp.take(vp, lin, axis=1)                     # (2C, QP)
        term = (wyi * valid_y * wx0)[None].astype(dt) * g[0:C] \
            + (wyi * valid_y * wx1)[None].astype(dt) * g[C:2 * C]
        out = term if out is None else out + term
    return out.reshape(C, Q, P)


def _msda_dense(value_levels, sampling_locations, attention_weights,
                spatial_shapes, bundle_corners="none", point_chunk=0):
    """Unchunked core. value_levels: list of (B, H, h, w, D).

    Each level's gather+reduce is a ``jax.checkpoint`` region: the backward
    otherwise keeps every level's (B*H, D, Q, P) sample tensor live at once
    (observed 45 GB HLO temp on the flagship train step) — recomputing them
    level-by-level bounds the peak to one level.

    The attention reduction always accumulates fp32 (``einsum`` with
    ``preferred_element_type``); the gathered payload keeps the value dtype,
    so casting values to bf16 upstream (``attn_value_bf16``) halves gather
    bytes while the output stays fp32 — the render's bf16-volume recipe
    applied to deformable attention (docs/PERFORMANCE.md).

    ``bundle_corners`` ("full"/True) packs the 2x2 corner block into channels
    so each sampling point costs ONE gather row (4D payload) instead of 4
    (D payload); "pairs" packs only the x-adjacent pair (2 rows/point, 2D
    payload) — both numerically identical to fp reassociation (forward AND
    gradients golden/parity-tested, tests/test_msda.py +
    tests/test_encoder_extras.py). Measured on the flagship exact prepare
    (v5e, round 4): "full" 7.9 s vs "pairs" 12.9 vs unbundled 15.9 — gathers
    are row-rate-bound, so fan-in wins ~linearly. The round-3 "full bundle
    faults the TPU runtime" history did NOT reproduce on the current
    toolchain (3 clean flagship runs; the old faults coincided with wounded-
    tunnel windows). One composition IS genuinely bad: bf16 value payloads +
    bundling faults the worker reproducibly (docs/PERFORMANCE.md) — keep
    payloads fp32 when bundling. Default "none" here (op-level neutrality);
    recipes opt in via ``EncoderConfig.msda_bundle``
    (``nuscenes_occ_compact_bundle`` is the reference-exact eval recipe)."""
    if bundle_corners is True:
        bundle_corners = "full"
    elif not bundle_corners:
        bundle_corners = "none"
    B, Q, H, Lv, P, _ = sampling_locations.shape
    D = value_levels[0].shape[-1]

    def level_term(v, loc, w_l, h, w):
        xy = loc * jnp.array([w, h], dtype=loc.dtype) - 0.5
        xy = jnp.moveaxis(xy, 2, 1).reshape(B * H, Q, P, 2)
        if bundle_corners != "none":
            if bundle_corners == "full":
                vb, fan, fn = _bundle_corners_2d(v, h, w), 4, \
                    _bilinear_gather_cf_bundled
            else:
                vb, fan, fn = _bundle_pairs_x(v, h, w), 2, \
                    _bilinear_gather_cf_pairs
            # chunk the point axis by the bundle fan-out: the bundled gather
            # result is fan-x fatter (fan*D channels) than a per-corner
            # gather, so an unchunked (B*H, fan*D, Q*P) transient OOMs the
            # flagship forward (observed 19 GB); dividing P keeps the live
            # transient at the per-corner path's size while retaining the
            # fan-x row reduction. ``point_chunk`` overrides the divisor:
            # the fused TRAIN step's HBM peak tracks this per-chunk gather
            # transient almost linearly (measured ladder in
            # docs/PERFORMANCE.md: P//fan -> 22.75 GB, unchunked-equivalent
            # -> ~40 GB on the reference-exact recipe), so smaller chunks
            # buy backward memory at zero numerics cost beyond the already-
            # documented fp reassociation.
            pc = point_chunk if point_chunk > 0 else max(P // fan, 1)

            # each chunk is its OWN checkpoint region: the outer level
            # checkpoint alone recomputes every chunk's gathered ``samp``
            # during the backward sweep, and since the VJP consumes chunks
            # in REVERSE order they are all live at the turnaround — the
            # measured train peak barely moved with pc (22.75 GB at pc=12
            # vs 19.26 at pc=2 on the reference-exact recipe). Nesting the
            # checkpoint re-materializes each chunk at its use site, so
            # exactly one chunk's transient is live at a time.
            @jax.checkpoint
            def chunk_term(vb_, xy_c, w_c):
                samp = jax.vmap(
                    lambda vf, c: fn(vf, c, h, w, D))(vb_, xy_c)
                return jnp.einsum('bdqp,bqp->bqd', samp, w_c,
                                  preferred_element_type=jnp.float32)

            out_l = jnp.zeros((B * H, Q, D), dtype=jnp.float32)
            for p0 in range(0, P, pc):
                out_l = out_l + chunk_term(vb, xy[:, :, p0:p0 + pc],
                                           w_l[:, :, p0:p0 + pc])
            return out_l
        if point_chunk > 0:
            # same transient-bounding lever for the per-corner path (pure
            # fp reassociation of the P-axis reduction)
            @jax.checkpoint
            def chunk_term_nb(v_, xy_c, w_c):
                samp = jax.vmap(
                    lambda vf, c: _bilinear_gather_cf(vf, c, h, w))(v_, xy_c)
                return jnp.einsum('bdqp,bqp->bqd', samp, w_c,
                                  preferred_element_type=jnp.float32)

            out_l = jnp.zeros((B * H, Q, D), dtype=jnp.float32)
            for p0 in range(0, P, point_chunk):
                out_l = out_l + chunk_term_nb(v, xy[:, :, p0:p0 + point_chunk],
                                              w_l[:, :, p0:p0 + point_chunk])
            return out_l
        samp = jax.vmap(
            lambda vf, c: _bilinear_gather_cf(vf, c, h, w))(v, xy)
        # samp: (B*H, D, Q, P)
        return jnp.einsum('bdqp,bqp->bqd', samp, w_l,
                          preferred_element_type=jnp.float32)

    out = jnp.zeros((B * H, Q, D), dtype=jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        # (B*H, D, h*w): payload channel-first, gather axis last
        v = value_levels[lvl].reshape(B * H, h * w, D).swapaxes(1, 2)
        loc = sampling_locations[:, :, :, lvl]            # B,Q,H,P,2
        w_l = jnp.moveaxis(attention_weights[:, :, :, lvl], 2, 1)
        w_l = w_l.reshape(B * H, Q, P)
        out = out + jax.checkpoint(
            lambda v_, l_, w_, h_=h, w__=w: level_term(v_, l_, w_, h_, w__))(
            v, loc, w_l)
    return jnp.moveaxis(out.reshape(B, H, Q, D), 1, 2)    # B,Q,H,D


def _msda_dense_shared(value_levels, sampling_locations, attention_weights,
                       spatial_shapes, bundle_corners="none"):
    """Fast path for head-shared sampling locations: ONE gather per
    (b, q, p) point with the full H*D payload (6x fewer gather rows than the
    per-head path — XLA TPU gathers are row-rate-bound). Gathered payloads and
    transients run in bf16 (this is the explicit AMP-style speed mode); the
    attention reduction accumulates fp32.

    ``bundle_corners`` composes the 2x2 corner bundle on top ("full": one
    4*H*D-channel row per point, 4x fewer rows again; "pairs": two
    2*H*D-channel rows). Bundled payloads stay FP32 — bf16 payloads composed
    with bundling reproducibly fault the TPU worker (docs/PERFORMANCE.md),
    and bundled rows are row-rate-bound / payload-insensitive anyway, so the
    bundled shared path is both faster AND closer to the per-head fp32 math
    than the unbundled bf16 one."""
    if bundle_corners is True:
        bundle_corners = "full"
    elif not bundle_corners:
        bundle_corners = "none"
    B, Q, H, Lv, P, _ = sampling_locations.shape
    D = value_levels[0].shape[-1]
    C = H * D

    # every transient is (B, H*D, Q) — big Q axis trailing, zero tile padding
    out = jnp.zeros((B, H * D, Q), dtype=jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        # (B, H*D, h*w): all heads' channels as one payload
        v = value_levels[lvl].reshape(B, H, h * w, D)
        v = jnp.moveaxis(v, 2, 3).reshape(B, H * D, h * w)
        if bundle_corners == "full":
            v = _bundle_corners_2d(v, h, w)               # (B, 4C, h*w) fp32
        elif bundle_corners == "pairs":
            v = _bundle_pairs_x(v, h, w)                  # (B, 2C, h*w) fp32
        else:
            v = v.astype(jnp.bfloat16)
        attn_l = attention_weights[:, :, :, lvl]          # B,Q,H,P

        def point_term(v_, loc, attn_p):
            # per-head attention for this point, channel-expanded (B, H*D, Q)
            # bf16 in the unbundled mode: this broadcast is the biggest
            # backward temp (145 MB f32 each on the flagship) and the fast
            # path is explicitly lossy
            w_p = jnp.repeat(jnp.moveaxis(attn_p, 1, 2), D, axis=1)
            x = loc[..., 0] * w - 0.5
            y = loc[..., 1] * h - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx, fy = x - x0, y - y0
            x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
            if bundle_corners == "full":
                bx = jnp.clip(x0i, 0, max(w - 2, 0))
                by = jnp.clip(y0i, 0, max(h - 2, 0))
                wx0, wx1 = _axis_block_weights(bx, x0i, fx)
                wy0, wy1 = _axis_block_weights(by, y0i, fy)
                lin = by * w + bx
                g = jax.vmap(lambda vf, i: jnp.take(vf, i, axis=1))(
                    v_, lin)                               # (B, 4C, Q)
                acc = (wy0 * wx0)[:, None, :] * g[:, 0:C] \
                    + (wy0 * wx1)[:, None, :] * g[:, C:2 * C] \
                    + (wy1 * wx0)[:, None, :] * g[:, 2 * C:3 * C] \
                    + (wy1 * wx1)[:, None, :] * g[:, 3 * C:4 * C]
                return acc * w_p
            if bundle_corners == "pairs":
                bx = jnp.clip(x0i, 0, max(w - 2, 0))
                wx0, wx1 = _axis_block_weights(bx, x0i, fx)
                acc = None
                for yi, wyi in ((y0i, 1.0 - fy), (y0i + 1, fy)):
                    valid_y = (yi >= 0) & (yi <= h - 1)
                    lin = jnp.clip(yi, 0, h - 1) * w + bx
                    g = jax.vmap(lambda vf, i: jnp.take(vf, i, axis=1))(
                        v_, lin)                           # (B, 2C, Q)
                    term = (wyi * valid_y * wx0)[:, None, :] * g[:, 0:C] \
                        + (wyi * valid_y * wx1)[:, None, :] * g[:, C:2 * C]
                    acc = term if acc is None else acc + term
                return acc * w_p
            w_p = w_p.astype(jnp.bfloat16)
            acc = None
            for yi, wyi in ((y0i, 1 - fy), (y0i + 1, fy)):
                for xi, wxi in ((x0i, 1 - fx), (x0i + 1, fx)):
                    valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) &
                             (yi <= h - 1))
                    lin = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
                    g = jax.vmap(lambda vf, i: jnp.take(vf, i, axis=1))(
                        v_, lin)                           # (B, H*D, Q)
                    cw = (wyi * wxi * valid)[:, None, :].astype(v_.dtype)
                    term = cw * g
                    acc = term if acc is None else acc + term
            return acc * w_p

        for p in range(P):
            # checkpoint per point: the backward otherwise materializes every
            # point's (B, H*D, Q) transient simultaneously (~45 GB flagship)
            out = out + jax.checkpoint(point_term)(
                v, sampling_locations[:, :, 0, lvl, p], attn_l[..., p])
    return jnp.moveaxis(out.reshape(B, H, D, Q), 3, 1)    # B,Q,H,D


def ms_deform_attn(value, spatial_shapes, sampling_locations, attention_weights,
                   query_chunk: int = 0, shared_locations: bool = False,
                   bundle_corners="none", point_chunk: int = 0,
                   query_unroll: int = 0):
    """Multi-scale deformable attention.

    Args:
      value: (B, L, H, D) flattened multi-level features,
        L = sum(h*w for h, w in spatial_shapes).
      spatial_shapes: static sequence of (h, w) ints per level.
      sampling_locations: (B, Q, H, Lv, P, 2), normalized [0, 1] (x, y).
      attention_weights: (B, Q, H, Lv, P), already softmaxed over Lv*P.
      query_chunk: if > 0, process queries in chunks of this size to bound
        transient memory (padded to a multiple; zero-cost for the padding).
      shared_locations: all heads sample head-0's locations (TPU fast mode,
        see ``DeformHeads.shared_locations``) — one gather per point with the
        full H*D payload.
      bundle_corners: "none" (default), "pairs" (x-pair rows, 2 gather rows
        per point) or "full"/True (2x2 corner rows, 1 gather row per point).
        Exact reassociations of the 4-corner computation; see ``_msda_dense``.
      point_chunk: if > 0, accumulate the P (sampling-point) axis in chunks
        of this size — bounds the per-level gather transient that sets the
        fused train step's HBM peak (see ``_msda_dense``). 0 keeps the
        historical behavior (bundled: P // fan; unbundled: unchunked).
      query_unroll: if > 1, split the query axis into this many slices with
        a PYTHON loop (unrolled at trace time) and concatenate. Unlike
        ``query_chunk`` (a ``lax.map``, which reliably faults the TPU
        runtime when nested inside the encoder's ``nn.scan`` — CLAUDE.md),
        unrolling is scan-safe; each slice's gather transients are bounded
        at Q/n at the cost of n-x more HLO for this op. Memory lever for the
        fused train step; a no-op for eval latency (same total rows).

    Returns:
      (B, Q, H * D) — fp32 accumulation regardless of the value dtype.
    """
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    B, L, H, D = value.shape
    Q = sampling_locations.shape[1]
    assert L == sum(h * w for h, w in spatial_shapes), \
        f"L={L} vs shapes {spatial_shapes}"

    if query_unroll > 1:
        qs = -(-Q // query_unroll)
        outs = []
        for q0 in range(0, Q, qs):
            outs.append(ms_deform_attn(
                value, spatial_shapes,
                sampling_locations[:, q0:q0 + qs],
                attention_weights[:, q0:q0 + qs],
                query_chunk=query_chunk, shared_locations=shared_locations,
                bundle_corners=bundle_corners, point_chunk=point_chunk))
        return jnp.concatenate(outs, axis=1)

    # split the flattened pyramid once (static level boundaries)
    value_levels = []
    start = 0
    for h, w in spatial_shapes:
        value_levels.append(
            jnp.moveaxis(value[:, start:start + h * w], 2, 1)
            .reshape(B, H, h, w, D))
        start += h * w

    if shared_locations:
        out = _msda_dense_shared(value_levels, sampling_locations,
                                 attention_weights, spatial_shapes,
                                 bundle_corners=bundle_corners)
        return out.reshape(B, Q, H * D)

    if query_chunk <= 0 or query_chunk >= Q:
        out = _msda_dense(value_levels, sampling_locations, attention_weights,
                          spatial_shapes, bundle_corners=bundle_corners,
                          point_chunk=point_chunk)
        return out.reshape(B, Q, H * D)

    pad = (-Q) % query_chunk
    loc = jnp.pad(sampling_locations, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0)))
    att = jnp.pad(attention_weights, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
    n_chunks = (Q + pad) // query_chunk
    loc = loc.reshape(B, n_chunks, query_chunk, *loc.shape[2:]).swapaxes(0, 1)
    att = att.reshape(B, n_chunks, query_chunk, *att.shape[2:]).swapaxes(0, 1)

    def body(args):
        loc_c, att_c = args
        return _msda_dense(value_levels, loc_c, att_c, spatial_shapes,
                           bundle_corners=bundle_corners,
                           point_chunk=point_chunk)

    out = jax.lax.map(body, (loc, att))                  # n_chunks,B,Qc,H,D
    out = out.swapaxes(0, 1).reshape(B, Q + pad, H, D)[:, :Q]
    return out.reshape(B, Q, H * D)
