"""eval_iou faithfulness: post-crops, OpenOccupancy GT scatter, and the
Occ3D ego-grid resample checked golden against torch.nn.functional.grid_sample
with the reference's exact normalization (reference eval_iou.py:151-164,
210-259)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import eval_iou as ei


def test_occ3d_crops_exact():
    occ = np.ones((200, 200, 16), np.int32)
    out = ei.apply_occ3d_crops(occ)
    # interior survives
    assert out[6:-6, 6:-6, :12].all()
    # reference eval_iou.py:228-233
    assert not out[..., 12:].any()
    assert not out[:6].any() and not out[-6:].any()
    assert not out[:, :6].any() and not out[:, -6:].any()
    assert occ.all(), "input must not be mutated"
    # exact survivor count
    assert out.sum() == (200 - 12) * (200 - 12) * 12


def test_openocc_crops_exact():
    occ = np.ones((512, 512, 40), np.int32)
    out = ei.apply_openocc_crops(occ)
    assert out[6:-6, 6:-6, 5:-4].all()
    # reference eval_iou.py:252-257
    assert not out[..., -4:].any() and not out[..., :5].any()
    assert not out[:6].any() and not out[-6:].any()
    assert not out[:, :6].any() and not out[:, -6:].any()
    assert out.sum() == (512 - 12) * (512 - 12) * (40 - 9)


def test_openocc_gt_grid_reorder():
    # row (c0, c1, c2) marks gt[c1, c2, c0] (reference eval_iou.py:261-263:
    # gt_occ[:, [1, 2, 0]] used as (dim0, dim1, dim2) index lists)
    coords = np.array([[3, 1, 2], [45, 5, 6]])
    gt = ei.openocc_gt_grid(coords)
    assert gt[1, 2, 3] == 1
    assert gt.sum() == 1  # second row: c0=45 >= 40 (dim2) -> dropped


def test_openocc_gt_grid_matches_reference_semantics():
    rng = np.random.RandomState(0)
    coords = np.stack([rng.randint(0, 40, 50), rng.randint(0, 512, 50),
                       rng.randint(0, 512, 50)], 1)
    # reference: gt[coords[:, 1], coords[:, 2], coords[:, 0]] = 1
    ref = np.zeros((512, 512, 40), np.int32)
    ref[coords[:, 1], coords[:, 2], coords[:, 0]] = 1
    got = ei.openocc_gt_grid(coords)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("scene_size", [0, 4])
def test_occ3d_resample_matches_torch_grid_sample(scene_size):
    """The jax resample must reproduce the reference's
    F.grid_sample(sdf[None,None], pts[..., [2,0,1]]*2-1, bilinear,
    align_corners=True) bit-for-bit (to fp32 tolerance)."""
    pcr, expansion = ei.OCC3D_SCENES[scene_size]
    rng = np.random.RandomState(1)
    H, W, D = 32, 32, 8
    sdf = rng.randn(H, W, D).astype(np.float32)
    # small rigid ego2lidar
    theta = 0.1
    ego2lidar = np.eye(4)
    ego2lidar[:2, :2] = [[np.cos(theta), -np.sin(theta)],
                         [np.sin(theta), np.cos(theta)]]
    ego2lidar[:3, 3] = [1.5, -2.0, 0.3]

    pts = ei.occ3d_ego_to_grid_coords(pcr, expansion, ego2lidar)
    ours = ei.resample_volume_at(sdf, pts, pcr, expansion)

    # reference formulation
    norm = np.stack([
        (pts[..., 0] - pcr[0]) / expansion[0],
        (pts[..., 1] - pcr[1]) / expansion[1],
        (pts[..., 2] - pcr[2]) / expansion[2]], -1)
    grid = torch.from_numpy(norm[..., [2, 0, 1]] * 2 - 1).float()[None]
    ref = F.grid_sample(
        torch.from_numpy(sdf)[None, None], grid,
        mode="bilinear", align_corners=True)[0, 0].numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_occ3d_resample_multichannel():
    pcr, expansion = ei.OCC3D_SCENES[0]
    rng = np.random.RandomState(2)
    logits = rng.randn(16, 16, 8, 5).astype(np.float32)
    ego2lidar = np.eye(4)
    pts = ei.occ3d_ego_to_grid_coords(pcr, expansion, ego2lidar)
    ours = ei.resample_volume_at(logits, pts, pcr, expansion)
    assert ours.shape == (200, 200, 16, 5)
    norm = np.stack([
        (pts[..., 0] - pcr[0]) / expansion[0],
        (pts[..., 1] - pcr[1]) / expansion[1],
        (pts[..., 2] - pcr[2]) / expansion[2]], -1)
    grid = torch.from_numpy(norm[..., [2, 0, 1]] * 2 - 1).float()[None]
    vol = torch.from_numpy(logits).permute(3, 0, 1, 2)[None]  # 1,C,H,W,D
    ref = F.grid_sample(vol, grid, mode="bilinear",
                        align_corners=True)[0].permute(1, 2, 3, 0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_sem_space_lut_applied():
    """Flagship config trains sem in OpenSeeD space (21 classes) so eval must
    LUT-remap; tiny config stays in nuScenes space."""
    from selfocc_tpu.configs.experiments import get_config
    flagship = get_config("nuscenes_occ")
    assert flagship.sem_space == "openseed"
    assert flagship.model.head.sem_dims == 21
    tiny = get_config("tiny")
    assert tiny.sem_space == "nuscenes"

    from selfocc_tpu.utils.metrics import openseed2nuscenes
    sem = np.array([[0, 7, 20], [11, 19, 5]])
    out = openseed2nuscenes(sem)
    # openseed {barrier->1, person->7, sky->0, truck->10, tree->16, crane->5}
    np.testing.assert_array_equal(out, [[1, 7, 0], [10, 16, 5]])


@pytest.mark.parametrize("shard", [False, True])
def test_query_grid_occ3d_matches_staged(shard):
    """The fused on-device Occ3D query (``GridOccEvaluator.query_grid_occ3d``)
    must reproduce the staged fetch -> ``resample_volume_at`` -> argmax path
    exactly — fusion only removes the dense grid's host<->device round trip
    (~900 MB/frame of logits at the flagship 512x512x40 grid)."""
    import jax
    from utils_tiny import TINY_PC_RANGE, make_cameras, tiny_config
    from selfocc_tpu.models.segmentor import TPVSegmentor
    from selfocc_tpu.utils.eval_lib import GridOccEvaluator

    if shard and len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")

    cfg = tiny_config(num_cams=2, sem=True)
    model = TPVSegmentor(cfg=cfg.model)
    rs = np.random.RandomState(7)
    imgs = rs.rand(1, 2, *cfg.input_size, 3).astype(np.float32)
    cams = make_cameras(2, cfg.input_size)
    l2i = np.asarray(cams["lidar2img"], np.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, l2i,
                           method="prepare")
    ev = GridOccEvaluator(model, variables, shard=shard)
    volume = ev.prepare(imgs, l2i)

    pcr = list(TINY_PC_RANGE)
    expansion = [pcr[3] - pcr[0], pcr[4] - pcr[1], pcr[5] - pcr[2]]
    reso = 1.6  # 12x12x2 grid — not divisible by the 8-device mesh
    # metric query points straddling the AABB (exercises zeros padding)
    pts = np.stack([rs.uniform(pcr[k] - 2, pcr[k + 3] + 2, size=(9, 7, 4))
                    for k in range(3)], -1).astype(np.float32)

    fused = ev.query_grid_occ3d(volume, tuple(pcr), reso, pts, pcr,
                                expansion)
    staged = ev.query_grid(volume, tuple(pcr), reso)
    sdf_r = ei.resample_volume_at(staged["sdf"], pts, pcr, expansion)
    logits_r = ei.resample_volume_at(staged["logits"], pts, pcr, expansion)

    assert fused["sdf_r"].shape == (9, 7, 4)
    np.testing.assert_allclose(fused["sdf_r"], sdf_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(fused["sem_r"], np.argmax(logits_r, -1))

    if shard:
        # 6x6x1 grid = 36 points, NOT divisible by the 8-device mesh —
        # exercises the pad-then-slice path inside the fused jit
        reso = 2.9
        flat, _, n36, _ = ev._flat_grid(tuple(pcr), reso)
        assert flat.shape[0] != n36
        fused = ev.query_grid_occ3d(volume, tuple(pcr), reso, pts, pcr,
                                    expansion)
        staged = ev.query_grid(volume, tuple(pcr), reso)
        np.testing.assert_allclose(
            fused["sdf_r"],
            ei.resample_volume_at(staged["sdf"], pts, pcr, expansion),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(
            fused["sem_r"],
            np.argmax(ei.resample_volume_at(staged["logits"], pts, pcr,
                                            expansion), -1))


def test_query_grid_keys_selects_fetch():
    """``keys=`` must restrict what query_grid returns (the OpenOccupancy
    scoring path fetches only sdf+sem, skipping the dense logits grid)."""
    import jax
    from utils_tiny import TINY_PC_RANGE, make_cameras, tiny_config
    from selfocc_tpu.models.segmentor import TPVSegmentor
    from selfocc_tpu.utils.eval_lib import GridOccEvaluator

    cfg = tiny_config(num_cams=2, sem=True)
    model = TPVSegmentor(cfg=cfg.model)
    rs = np.random.RandomState(3)
    imgs = rs.rand(1, 2, *cfg.input_size, 3).astype(np.float32)
    l2i = np.asarray(make_cameras(2, cfg.input_size)["lidar2img"],
                     np.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, l2i,
                           method="prepare")
    ev = GridOccEvaluator(model, variables, shard=False)
    volume = ev.prepare(imgs, l2i)

    full = ev.query_grid(volume, TINY_PC_RANGE, 1.6)
    sel = ev.query_grid(volume, TINY_PC_RANGE, 1.6, keys=("sdf", "sem"))
    assert set(sel) == {"sdf", "sem", "xyz"}
    assert {"sdf", "sem", "logits"} <= set(full)
    np.testing.assert_array_equal(sel["sdf"], full["sdf"])
    np.testing.assert_array_equal(sel["sem"], full["sem"])


def test_separable_query_matches_gather():
    """GridOccEvaluator(query="separable") must match the gather evaluator
    to fp32 reassociation tolerance on both query_grid and the fused occ3d
    path (same interpolant, factored rounding order)."""
    import jax
    from utils_tiny import TINY_PC_RANGE, make_cameras, tiny_config
    from selfocc_tpu.models.segmentor import TPVSegmentor
    from selfocc_tpu.utils.eval_lib import GridOccEvaluator

    cfg = tiny_config(num_cams=2, sem=True)
    model = TPVSegmentor(cfg=cfg.model)
    rs = np.random.RandomState(11)
    imgs = rs.rand(1, 2, *cfg.input_size, 3).astype(np.float32)
    l2i = np.asarray(make_cameras(2, cfg.input_size)["lidar2img"],
                     np.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, l2i,
                           method="prepare")
    ev_g = GridOccEvaluator(model, variables, shard=False)
    ev_s = GridOccEvaluator(model, variables, shard=False,
                            query="separable")
    volume = ev_g.prepare(imgs, l2i)

    pcr = list(TINY_PC_RANGE)
    expansion = [pcr[3] - pcr[0], pcr[4] - pcr[1], pcr[5] - pcr[2]]
    reso = 1.6
    g = ev_g.query_grid(volume, tuple(pcr), reso)
    s = ev_s.query_grid(volume, tuple(pcr), reso)
    assert s["sdf"].shape == g["sdf"].shape
    np.testing.assert_allclose(s["sdf"], g["sdf"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s["logits"], g["logits"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(s["xyz"], g["xyz"])

    pts = np.stack([rs.uniform(pcr[k] - 2, pcr[k + 3] + 2, size=(9, 7, 4))
                    for k in range(3)], -1).astype(np.float32)
    fg = ev_g.query_grid_occ3d(volume, tuple(pcr), reso, pts, pcr,
                               expansion)
    fs = ev_s.query_grid_occ3d(volume, tuple(pcr), reso, pts, pcr,
                               expansion)
    np.testing.assert_allclose(fs["sdf_r"], fg["sdf_r"], rtol=1e-5,
                               atol=1e-6)
    # argmax can differ only on exact logit ties; none expected here
    np.testing.assert_array_equal(fs["sem_r"], fg["sem_r"])
