"""Encoder reference-point tables vs the reference implementation (loaded
standalone — torch-only module)."""
import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference/model/encoder/tpvformer/utils.py"
needs_ref = pytest.mark.skipif(not os.path.exists(REF),
                               reason="reference repo not mounted")


@needs_ref
def test_cross_view_ref_points_match_reference():
    import torch
    from selfocc_tpu.models.encoder import get_cross_view_ref_points
    spec = importlib.util.spec_from_file_location("ref_utils", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # the reference concat requires uniform point counts (all shipped configs
    # use num_points_self=[12]*3)
    for (h, w, z, p) in [(5, 7, 3, (4, 4, 4)), (9, 9, 4, (3, 3, 3))]:
        ref = mod.get_cross_view_ref_points(h, w, z, list(p)).numpy()
        ours = np.asarray(get_cross_view_ref_points(h, w, z, p))
        assert ours.shape == ref.shape, (ours.shape, ref.shape)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


@needs_ref
def test_tpv_ref_3d_matches_reference_construction():
    """Rebuild the reference's ref_3d buffers (tpvformer_encoder.py:131-154)
    with torch and compare to ours."""
    import torch
    from selfocc_tpu.geometry.mappings import make_mapping
    from selfocc_tpu.models.encoder import tpv_ref_3d

    spec = importlib.util.spec_from_file_location(
        "ref_mappings", "/root/reference/model/encoder/bevformer/mappings.py")
    ref_map_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_map_mod)

    args = dict(nonlinear_mode='linear',
                h_size=[4, 0], h_range=[10.0, 0], h_half=False,
                w_size=[4, 0], w_range=[10.0, 0], w_half=False,
                d_size=[4, 0], d_range=[-1.0, 3.0, 3.0])
    num_points_cross = (3, 3, 2)

    ref_map = ref_map_mod.GridMeterMapping(**args)
    size_h, size_w, size_d = ref_map.size_h, ref_map.size_w, ref_map.size_d

    # ---- reference construction (tpvformer_encoder.py:84-150)
    hw_grid = torch.stack(
        [torch.arange(size_h, dtype=torch.float).unsqueeze(-1).expand(-1, size_w),
         torch.arange(size_w, dtype=torch.float).unsqueeze(0).expand(size_h, -1),
         torch.zeros(size_h, size_w)], dim=-1)
    zh_grid = torch.stack(
        [torch.arange(size_h, dtype=torch.float).unsqueeze(0).expand(size_d, -1),
         torch.zeros(size_d, size_h),
         torch.arange(size_d, dtype=torch.float).unsqueeze(-1).expand(-1, size_h)],
        dim=-1)
    wz_grid = torch.stack(
        [torch.zeros(size_w, size_d),
         torch.arange(size_w, dtype=torch.float).unsqueeze(-1).expand(-1, size_d),
         torch.arange(size_d, dtype=torch.float).unsqueeze(0).expand(size_w, -1)],
        dim=-1)

    uniform_d = torch.linspace(0, size_d - 1, num_points_cross[2])
    hw_3d = torch.cat([
        hw_grid[..., [0, 1]].unsqueeze(2).expand(-1, -1, num_points_cross[2], -1),
        uniform_d.reshape(1, 1, -1, 1).expand(size_h, size_w, -1, -1)], dim=-1)
    ref_hw = ref_map.grid2meter(hw_3d).flatten(0, 1).transpose(0, 1)

    uniform_w = torch.linspace(0, size_w - 1, num_points_cross[1])
    zh_3d = torch.cat([
        zh_grid[..., :1].unsqueeze(2).expand(-1, -1, num_points_cross[1], -1),
        uniform_w.reshape(1, 1, -1, 1).expand(size_d, size_h, -1, -1),
        zh_grid[..., 2:].unsqueeze(2).expand(-1, -1, num_points_cross[1], -1)],
        dim=-1)
    ref_zh = ref_map.grid2meter(zh_3d).flatten(0, 1).transpose(0, 1)

    uniform_h = torch.linspace(0, size_h - 1, num_points_cross[0])
    wz_3d = torch.cat([
        uniform_h.reshape(1, 1, -1, 1).expand(size_w, size_d, -1, -1),
        wz_grid[..., [1, 2]].unsqueeze(2).expand(-1, -1, num_points_cross[0], -1)],
        dim=-1)
    ref_wz = ref_map.grid2meter(wz_3d).flatten(0, 1).transpose(0, 1)

    ours = tpv_ref_3d(make_mapping(**args), num_points_cross)
    for mine, theirs in zip(ours, (ref_hw, ref_zh, ref_wz)):
        np.testing.assert_allclose(np.asarray(mine), theirs.numpy(), atol=1e-5)
