"""Grid<->meter mapping tests.

Golden oracle: the reference implementation itself
(``/root/reference/model/encoder/bevformer/mappings.py``) loaded standalone —
it depends only on torch — and compared on random points for every mapping
mode the shipped configs use.
"""
import importlib.util
import os

import numpy as np
import pytest
import jax.numpy as jnp

from selfocc_tpu.geometry.mappings import make_mapping

REF = "/root/reference/model/encoder/bevformer/mappings.py"


def _load_reference():
    spec = importlib.util.spec_from_file_location("ref_mappings", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


needs_ref = pytest.mark.skipif(not os.path.exists(REF),
                               reason="reference repo not mounted")

LINEAR_ARGS = dict(
    nonlinear_mode='linear',
    h_size=[128, 0], h_range=[40.0, 0], h_half=False,
    w_size=[128, 0], w_range=[40.0, 0], w_half=False,
    d_size=[24, 0], d_range=[-1.0, 5.4, 5.4])           # nuscenes_occ.py:193-203

LINEAR_TWO_SEG = dict(
    nonlinear_mode='linear',
    h_size=[2, 2], h_range=[2, 4], h_half=False,
    w_size=[2, 2], w_range=[2, 4], w_half=False,
    d_size=[2, 2], d_range=[-1., 1., 5.])               # mappings.py __main__

HALF_ARGS = dict(
    nonlinear_mode='linear',
    h_size=[128, 0], h_range=[51.2, 0], h_half=True,
    w_size=[128, 0], w_range=[25.6, 0], w_half=False,
    d_size=[32, 0], d_range=[-2.0, 4.4, 4.4])           # kitti_occ.py:165-187

NONLIN_ARGS = dict(
    nonlinear_mode='linear_upscale',
    h_size=[128, 32], h_range=[51.2, 28.8], h_half=False,
    w_size=[128, 32], w_range=[51.2, 28.8], w_half=False,
    d_size=[20, 10], d_range=[-4.0, 4.0, 12.0])         # mappings defaults


@needs_ref
@pytest.mark.parametrize("args,span", [
    (LINEAR_ARGS, (45.0, 45.0, -2.0, 6.5)),
    (LINEAR_TWO_SEG, (7.0, 7.0, -1.5, 6.0)),
    (HALF_ARGS, (30.0, 55.0, -3.0, 5.0)),
    (NONLIN_ARGS, (85.0, 85.0, -6.0, 12.0)),
], ids=["linear", "two-seg", "half", "nonlinear"])
def test_vs_reference(args, span):
    import torch
    ref_mod = _load_reference()
    ref = ref_mod.GridMeterMapping(**args)
    ours = make_mapping(**args)

    assert (ours.size_h, ours.size_w, ours.size_d) == \
        (ref.size_h, ref.size_w, ref.size_d)

    rng = np.random.RandomState(0)
    # meters covering in-range and out-of-range points
    x_span, y_span, z_lo, z_hi = span
    xyz = np.stack([
        rng.uniform(-x_span, x_span, 500),
        rng.uniform(-y_span, y_span, 500),
        rng.uniform(z_lo, z_hi, 500)], axis=-1).astype(np.float32)
    g_ref = ref.meter2grid(torch.from_numpy(xyz)).numpy()
    g_ours = np.asarray(ours.meter2grid(jnp.asarray(xyz)))
    np.testing.assert_allclose(g_ours, g_ref, atol=1e-3)

    g_ref_n = ref.meter2grid(torch.from_numpy(xyz), True).numpy()
    g_ours_n = np.asarray(ours.meter2grid(jnp.asarray(xyz), True))
    np.testing.assert_allclose(g_ours_n, g_ref_n, atol=1e-4)

    grid = np.stack([
        rng.uniform(0, ref.size_h - 1, 500),
        rng.uniform(0, ref.size_w - 1, 500),
        rng.uniform(0, ref.size_d - 1, 500)], axis=-1).astype(np.float32)
    m_ref = ref.grid2meter(torch.from_numpy(grid)).numpy()
    m_ours = np.asarray(ours.grid2meter(jnp.asarray(grid)))
    np.testing.assert_allclose(m_ours, m_ref, atol=1e-3)

    # 2D (plane) variant used by the encoder's plane meters
    grid2 = grid[:, :2]
    m2_ref = ref.grid2meter(torch.from_numpy(grid2)).numpy()
    m2_ours = np.asarray(ours.grid2meter(jnp.asarray(grid2)))
    np.testing.assert_allclose(m2_ours, m2_ref, atol=1e-3)


@pytest.mark.parametrize("args", [LINEAR_ARGS, LINEAR_TWO_SEG, HALF_ARGS, NONLIN_ARGS],
                         ids=["linear", "two-seg", "half", "nonlinear"])
def test_round_trip(args):
    m = make_mapping(**args)
    rng = np.random.RandomState(1)
    grid = np.stack([
        rng.uniform(0, m.size_h - 1, 300),
        rng.uniform(0, m.size_w - 1, 300),
        rng.uniform(0, m.size_d - 1, 300)], axis=-1).astype(np.float32)
    meter = m.grid2meter(jnp.asarray(grid))
    back = np.asarray(m.meter2grid(meter))
    np.testing.assert_allclose(back, grid, atol=2e-3)


@pytest.mark.parametrize("mode,kwargs", [
    ("linear", dict(h_size=[8, 4], h_range=[10.0, 6.0], h_half=False,
                    w_size=[8, 4], w_range=[10.0, 6.0], w_half=False,
                    d_size=[6, 3], d_range=[-1.0, 3.0, 6.0])),
    ("linear", dict(h_size=[128, 0], h_range=[40.0, 0], h_half=False,
                    w_size=[128, 0], w_range=[40.0, 0], w_half=False,
                    d_size=[24, 0], d_range=[-1.0, 5.4, 5.4])),
    ("linear_upscale", dict(h_size=[8, 4], h_range=[10.0, 10.0],
                            w_size=[8, 4], w_range=[10.0, 10.0],
                            d_size=[6, 3], d_range=[-1.0, 3.0, 7.0])),
])
def test_meter2grid_axis_separable(mode, kwargs):
    """The separable uniform-grid query (``TPVSDFField.query_geo_uniform``)
    assumes meter2grid maps axes independently (h<-y only, w<-x only,
    d<-z only) for EVERY mapping mode — pin it: per-axis indices extracted
    with the other two coordinates zeroed must equal the full-grid mapping,
    and the factored resample must match the 8-corner gather."""
    import jax.numpy as jnp
    from selfocc_tpu.geometry.mappings import make_mapping
    from selfocc_tpu.ops.interp import (separable_grid_resample_cf,
                                        trilinear_sample_cf)

    m = make_mapping(nonlinear_mode=mode, **kwargs)
    rng = np.random.RandomState(3)
    xs = jnp.asarray(rng.uniform(-22, 22, 7).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-22, 22, 6).astype(np.float32))
    zs = jnp.asarray(rng.uniform(-3, 9, 5).astype(np.float32))

    xyz = jnp.stack(jnp.meshgrid(ys, xs, zs, indexing="ij"),
                    axis=-1)[..., [1, 0, 2]]
    full = np.asarray(m.meter2grid(xyz))                 # (6, 7, 5, 3)

    z = jnp.zeros_like
    gh = m.meter2grid(jnp.stack([z(ys), ys, z(ys)], -1))[..., 0]
    gw = m.meter2grid(jnp.stack([xs, z(xs), z(xs)], -1))[..., 1]
    gd = m.meter2grid(jnp.stack([z(zs), z(zs), zs], -1))[..., 2]
    np.testing.assert_allclose(full[..., 0],
                               np.broadcast_to(np.asarray(gh)[:, None, None],
                                               full.shape[:-1]), rtol=1e-6)
    np.testing.assert_allclose(full[..., 1],
                               np.broadcast_to(np.asarray(gw)[None, :, None],
                                               full.shape[:-1]), rtol=1e-6)
    np.testing.assert_allclose(full[..., 2],
                               np.broadcast_to(np.asarray(gd)[None, None, :],
                                               full.shape[:-1]), rtol=1e-6)

    vol = jnp.asarray(rng.randn(4, m.size_h, m.size_w,
                                m.size_d).astype(np.float32))
    sep = separable_grid_resample_cf(vol, gh, gw, gd)
    ref = trilinear_sample_cf(vol, jnp.asarray(full), "zeros")
    np.testing.assert_allclose(np.moveaxis(np.asarray(sep), 0, -1),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)
