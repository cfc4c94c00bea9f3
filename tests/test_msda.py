"""MSDeformAttn core-op golden test vs the mmcv PyTorch fallback semantics.

The torch reference below re-implements ``multi_scale_deformable_attn_pytorch``
(the reference repo's only usable golden for its CUDA kernel, SURVEY §4):
per-level ``grid_sample(align_corners=False, zeros)`` then attention-weighted
reduction.
"""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from selfocc_tpu.ops.msda import ms_deform_attn


def torch_msda(value, spatial_shapes, sampling_locations, attention_weights):
    bs, _, num_heads, d = value.shape
    _, nq, _, nl, np_, _ = sampling_locations.shape
    value_list = value.split([h * w for h, w in spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    out = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(
            bs * num_heads, d, h, w)
        g = sampling_grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        out.append(s)
    att = attention_weights.transpose(1, 2).reshape(
        bs * num_heads, 1, nq, nl * np_)
    res = (torch.stack(out, dim=-2).flatten(-2) * att).sum(-1)
    return res.view(bs, num_heads * d, nq).transpose(1, 2).contiguous()


def _random_case(seed, bs=2, q=37, heads=3, d=4, shapes=((6, 8), (3, 4)), p=5):
    rng = np.random.RandomState(seed)
    L = sum(h * w for h, w in shapes)
    value = rng.randn(bs, L, heads, d).astype(np.float32)
    loc = rng.uniform(-0.2, 1.2, size=(bs, q, heads, len(shapes), p, 2)).astype(np.float32)
    att = rng.rand(bs, q, heads, len(shapes), p).astype(np.float32)
    att = att / att.sum(axis=(-1, -2), keepdims=True)
    return value, loc, att, shapes


def test_msda_vs_torch():
    value, loc, att, shapes = _random_case(0)
    ours = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(att)))
    ref = torch_msda(torch.from_numpy(value), shapes,
                     torch.from_numpy(loc), torch.from_numpy(att)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_msda_query_chunking_equivalence():
    value, loc, att, shapes = _random_case(1, q=53)
    full = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(att)))
    chunked = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(att),
        query_chunk=16))
    np.testing.assert_allclose(full, chunked, atol=1e-6)


def test_msda_shared_locations_matches_dense():
    """When every head's locations coincide, the shared-location fast path
    must equal the per-head path exactly."""
    value, loc, att, shapes = _random_case(5, q=29, heads=4, d=4, p=3)
    loc_shared = np.broadcast_to(loc[:, :, :1], loc.shape).copy()
    ref = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(loc_shared), jnp.asarray(att)))
    fast = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(loc_shared), jnp.asarray(att),
        shared_locations=True))
    # the fast path gathers in bf16 (AMP-style) -> ~3 decimal digits
    np.testing.assert_allclose(fast, ref, atol=2e-2, rtol=2e-2)


def test_msda_bundled_corners_matches_torch():
    """Opt-in corner-bundled gather path (one fat row per point) is exactly
    the 4-corner computation reassociated — golden vs the torch fallback."""
    value, loc, att, shapes = _random_case(3)
    ours = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(att),
        bundle_corners=True))
    ref = torch_msda(torch.from_numpy(value), shapes,
                     torch.from_numpy(loc), torch.from_numpy(att)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_msda_pair_bundled_matches_torch():
    """"pairs" bundling (x-adjacent rows, 2 gather rows per point) is exactly
    the 4-corner computation reassociated — golden vs the torch fallback."""
    value, loc, att, shapes = _random_case(7)
    ours = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(att),
        bundle_corners="pairs"))
    ref = torch_msda(torch.from_numpy(value), shapes,
                     torch.from_numpy(loc), torch.from_numpy(att)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_msda_point_chunk_matches_torch():
    """``point_chunk`` (P-axis accumulation chunking — the fused train
    step's HBM-peak lever, ops/msda.py) is a pure fp reassociation in every
    bundle mode — golden vs the torch fallback, forward AND value-grad."""
    import jax
    value, loc, att, shapes = _random_case(11)
    ref = torch_msda(torch.from_numpy(value), shapes,
                     torch.from_numpy(loc), torch.from_numpy(att)).numpy()
    base_grad = None
    for mode in ("none", "pairs", "full"):
        for pc in (1, 2, 3):
            fn = lambda v: ms_deform_attn(
                v, shapes, jnp.asarray(loc), jnp.asarray(att),
                bundle_corners=mode, point_chunk=pc)
            ours = np.asarray(fn(jnp.asarray(value)))
            np.testing.assert_allclose(ours, ref, atol=1e-5)
            g = np.asarray(jax.grad(lambda v: fn(v).sum())(jnp.asarray(value)))
            if base_grad is None:
                base_grad = g
            np.testing.assert_allclose(g, base_grad, atol=1e-5)


def test_msda_bf16_values_fp32_accumulate():
    """bf16 value payloads (the attn_value_bf16 lever): locations/weights
    stay fp32, the gathered payload rounds to bf16, the attention reduction
    accumulates fp32 — output is fp32 and within bf16 rounding of the fp32
    path, in every bundle mode."""
    value, loc, att, shapes = _random_case(11)
    ref = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(att)))
    for bundle in ("none", "pairs", "full"):
        out = ms_deform_attn(
            jnp.asarray(value).astype(jnp.bfloat16), shapes,
            jnp.asarray(loc), jnp.asarray(att), bundle_corners=bundle)
        assert out.dtype == jnp.float32, bundle
        np.testing.assert_allclose(np.asarray(out), ref,
                                   atol=2e-2, rtol=2e-2, err_msg=bundle)


def test_msda_query_unroll_matches_torch():
    """``query_unroll`` (Python-unrolled query split — the scan-safe train
    memory lever, unlike the lax.map ``query_chunk``) is the same function:
    golden vs the torch fallback in every bundle mode, fwd + value-grad,
    including an unroll that does not divide Q evenly."""
    import jax
    value, loc, att, shapes = _random_case(11)
    want = torch_msda(torch.from_numpy(value), shapes,
                      torch.from_numpy(loc), torch.from_numpy(att)).numpy()
    for mode in ("none", "full"):
        for n in (2, 4):  # q=37 → uneven slices
            out = np.asarray(ms_deform_attn(
                jnp.asarray(value), shapes, jnp.asarray(loc),
                jnp.asarray(att), bundle_corners=mode, query_unroll=n))
            np.testing.assert_allclose(out, want, atol=2e-5, rtol=2e-5,
                                       err_msg=f"{mode}/qu{n}")
        g_ref = jax.grad(lambda v: ms_deform_attn(
            v, shapes, jnp.asarray(loc), jnp.asarray(att),
            bundle_corners=mode).sum())(jnp.asarray(value))
        g_qu = jax.grad(lambda v: ms_deform_attn(
            v, shapes, jnp.asarray(loc), jnp.asarray(att),
            bundle_corners=mode, query_unroll=3).sum())(jnp.asarray(value))
        np.testing.assert_allclose(np.asarray(g_qu), np.asarray(g_ref),
                                   atol=2e-5, rtol=2e-5, err_msg=mode)


def test_msda_shared_bundled_matches_dense_fp32():
    """Shared-locations + corner bundling (full and pairs): the bundled
    shared path keeps FP32 payloads (bf16+bundling faults the TPU worker,
    docs/PERFORMANCE.md), so unlike the bf16 unbundled shared path it must
    match the per-head fp32 computation to reassociation tolerance —
    forward AND value-gradient."""
    import jax

    value, loc, att, shapes = _random_case(9, q=29, heads=4, d=4, p=3)
    loc_shared = np.broadcast_to(loc[:, :, :1], loc.shape).copy()
    ref = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(loc_shared),
        jnp.asarray(att)))

    for mode in ("full", "pairs"):
        fast = np.asarray(ms_deform_attn(
            jnp.asarray(value), shapes, jnp.asarray(loc_shared),
            jnp.asarray(att), shared_locations=True, bundle_corners=mode))
        np.testing.assert_allclose(fast, ref, atol=1e-5, rtol=1e-5)

    def loss(v, bundle, shared):
        return jnp.sum(ms_deform_attn(
            v, shapes, jnp.asarray(loc_shared), jnp.asarray(att),
            shared_locations=shared, bundle_corners=bundle) ** 2)

    g_ref = np.asarray(jax.grad(loss)(jnp.asarray(value), "none", False))
    for mode in ("full", "pairs"):
        g = np.asarray(jax.grad(loss)(jnp.asarray(value), mode, True))
        np.testing.assert_allclose(g, g_ref, atol=1e-4, rtol=1e-4)
