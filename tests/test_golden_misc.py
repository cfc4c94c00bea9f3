"""Golden tests vs more runnable reference code: metric_util (MeanIoU /
IoU / the cityscapes->semantickitti LUT) and the TPV positional encoding.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "tests" not in sys.path:
    sys.path.insert(0, "tests")
import ref_shim

pytestmark = pytest.mark.skipif(not ref_shim.reference_available(),
                                reason="reference repo not present")


@pytest.fixture(scope="module")
def ref_metric(request):
    """Load the reference's utils/metric_util.py by file path (the shim's
    'utils' stub deliberately doesn't expose the reference utils package —
    root-level name collisions) with .cuda() neutralized for CPU."""
    ref_shim.install_shims()
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    request.addfinalizer(lambda: setattr(torch.Tensor, "cuda", orig_cuda))
    spec = importlib.util.spec_from_file_location(
        "ref_metric_util",
        os.path.join(ref_shim.REF_ROOT, "utils", "metric_util.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_mean_iou_golden(ref_metric):
    """(miou, occ_iou) match the reference's MeanIoU on the plain-tensor
    branch with a mask, incl. the seen==0 -> iou=1 convention."""
    from selfocc_tpu.utils.metrics import MeanIoU

    rng = np.random.RandomState(0)
    pred = rng.randint(0, 5, (2, 40, 40, 4))
    gt = rng.randint(0, 5, (2, 40, 40, 4))
    gt[1] = 4                      # class 3 unseen in sample 1's region
    mask = rng.rand(2, 40, 40, 4) > 0.3

    args = ([1, 2, 3, 4], 0, ["a", "b", "c", "d"], True)
    ref = ref_metric.MeanIoU(*args)
    ref.reset()
    ours = MeanIoU(*args)
    for s in range(2):
        ref._after_step(torch.from_numpy(pred[s]), torch.from_numpy(gt[s]),
                        torch.from_numpy(mask[s]))
        ours._after_step(pred[s], gt[s], mask[s])
    r_miou, r_iou = ref._after_epoch()
    o_miou, o_iou = ours._after_epoch()
    assert o_miou == pytest.approx(float(r_miou), rel=1e-6)
    assert o_iou == pytest.approx(float(r_iou), rel=1e-6)


def test_mean_iou_occ3d_dict_golden(ref_metric):
    """Occ3D dict-target branch: label 17 -> empty remap, z-slab crop from
    the nonzero band, mask_camera gating (reference metric_util.py:90-118)."""
    from selfocc_tpu.utils.metrics import MeanIoU

    rng = np.random.RandomState(1)
    pred = rng.randint(0, 18, (30, 30, 8))
    sem = rng.randint(0, 18, (30, 30, 8))
    sem[..., :2] = 17
    sem[..., 6:] = 17                      # empty slabs top+bottom
    masks = (rng.rand(30, 30, 8) > 0.4)
    targets = {"semantics": sem.copy(),
               "mask_camera": masks.astype(np.uint8)}

    args = (list(range(1, 17)), 0, [f"c{i}" for i in range(1, 17)], True)
    ref = ref_metric.MeanIoU(*args)
    ref.reset()
    ours = MeanIoU(*args)
    ref._after_step(torch.from_numpy(pred.copy()),
                    {k: v.copy() for k, v in targets.items()})
    ours._after_step(pred.copy(), {k: v.copy() for k, v in targets.items()})
    r_miou, r_iou = ref._after_epoch()
    o_miou, o_iou = ours._after_epoch()
    assert o_miou == pytest.approx(float(r_miou), rel=1e-6)
    assert o_iou == pytest.approx(float(r_iou), rel=1e-6)


def test_binary_iou_golden(ref_metric):
    """IoU: dense prediction vs (n, 3) occupied-voxel index targets
    (reference metric_util.py:168-219)."""
    from selfocc_tpu.utils.metrics import IoU

    rng = np.random.RandomState(2)
    pred = (rng.rand(20, 20, 6) > 0.6).astype(np.int32)
    idx = np.stack(np.nonzero(rng.rand(20, 20, 6) > 0.7), -1)

    # the reference's IoU._after_epoch all_reduces unconditionally
    # (metric_util.py:221-223) — single-process no-op here
    ref_metric.dist = types.SimpleNamespace(
        all_reduce=lambda *a, **k: None, barrier=lambda: None,
        is_initialized=lambda: False)
    ref = ref_metric.IoU()
    ref.reset()
    ours = IoU()
    ref._after_step(torch.from_numpy(pred), torch.from_numpy(idx))
    ours._after_step(pred, idx)
    r = ref._after_epoch()
    o = ours._after_epoch()
    assert o == pytest.approx(float(r), rel=1e-6)


def test_cityscapes_lut_golden(ref_metric):
    from selfocc_tpu.utils.metrics import cityscapes2semantickitti
    sem = np.random.RandomState(3).randint(0, 19, (7, 9))
    ref = ref_metric.cityscapes2semantickitti(torch.from_numpy(sem))
    got = cityscapes2semantickitti(sem)
    np.testing.assert_array_equal(got, ref.numpy())


def test_tpv_positional_encoding_golden():
    """TPVPositionalEncoding == the reference module
    (tpvformer_pos_embed.py:17-58) on the same plane meters with shared
    Linear weights: per-plane pc_range normalization + fourier features +
    Linear."""
    import jax
    import jax.numpy as jnp
    m = ref_shim.load_ref("model.encoder.tpvformer.tpvformer_pos_embed")

    from selfocc_tpu.configs.experiments import get_config
    from selfocc_tpu.geometry.mappings import make_mapping
    from selfocc_tpu.models.encoder import (TPVPositionalEncoding,
                                            normalize_plane_meters,
                                            tpv_plane_meters)

    cfg = get_config("tiny")
    mapping_args = cfg.model.encoder.mapping_args
    pc_range = list(cfg.model.encoder.pc_range)
    num_freqs = (3, 4, 5)

    # UN-normalized plane meters (the reference normalizes internally)
    mapping = make_mapping(**mapping_args)
    hw, zh, wz = tpv_plane_meters(mapping)
    torch.manual_seed(0)
    ref = m.TPVPositionalEncoding(
        num_freqs=list(num_freqs), embed_dims=16,
        tpv_meters=[torch.from_numpy(np.asarray(p)) for p in (hw, zh, wz)],
        tot_range=pc_range).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.uniform_(-0.3, 0.3)
    with torch.no_grad():
        ref_out = ref()

    ours = TPVPositionalEncoding(num_freqs=num_freqs, embed_dims=16,
                                 tot_range=pc_range,
                                 mapping_args=mapping_args)
    sd = ref.state_dict()
    params = {}
    for name in ("hw", "zh", "wz"):
        params[f"position_layer_{name}"] = {
            "kernel": jnp.asarray(sd[f"position_layer_{name}.weight"]
                                  .numpy().T),
            "bias": jnp.asarray(sd[f"position_layer_{name}.bias"].numpy())}
    variables = ours.init(jax.random.PRNGKey(0))
    got = ours.apply({"params": params, "consts": variables["consts"]})
    for g, r in zip(got, ref_out):
        r = r.numpy().reshape(-1, 16)
        g = np.asarray(g).reshape(-1, 16)
        np.testing.assert_allclose(g, r, atol=2e-5)


def test_img2lidar_golden():
    """rays_from_img2lidar + apply_novel_view == the reference's
    Img2LiDAR.forward incl. the novel-view pose offset (img2lidar.py:25-70:
    yaw-rotate the 3x3 block, then translate the origin)."""
    import jax.numpy as jnp
    m = ref_shim.load_ref("model.head.nerfacc_head.img2lidar")

    rng = np.random.RandomState(4)
    N, R = 3, 11
    i2l = rng.randn(1, N, 4, 4).astype(np.float32)
    rays = (rng.rand(R, 2) * 100).astype(np.float32)
    novel = [1.0, -2.0, 0.5, 30.0]

    ref = m.Img2LiDAR(trans_kw="img2lidar", novel_view=novel)
    metas = [{"img2lidar": [i2l[0, k].copy() for k in range(N)]}]
    with torch.no_grad():
        r_origin, r_dir = ref(metas, torch.from_numpy(rays))

    from selfocc_tpu.geometry.projection import (apply_novel_view,
                                                 rays_from_img2lidar)
    moved = apply_novel_view(jnp.asarray(i2l), novel)
    o, d = rays_from_img2lidar(moved, jnp.asarray(rays))
    np.testing.assert_allclose(np.asarray(o), r_origin.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), r_dir.numpy(), atol=1e-4)

    # plain path (no novel view)
    ref2 = m.Img2LiDAR(trans_kw="img2lidar")
    with torch.no_grad():
        r_o2, r_d2 = ref2(metas, torch.from_numpy(rays))
    o2, d2 = rays_from_img2lidar(jnp.asarray(i2l), jnp.asarray(rays))
    np.testing.assert_allclose(np.asarray(o2), r_o2.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), r_d2.numpy(), atol=1e-5)


def test_fixed_ray_sampler_golden():
    """Fixed-mode ray grid == the reference RaySampler buffer
    (ray_sampler.py:23-31)."""
    m = ref_shim.load_ref("model.head.nerfacc_head.ray_sampler")
    ref = m.RaySampler(ray_sample_mode="fixed", ray_number=[6, 10],
                       ray_img_size=[48, 96])
    from selfocc_tpu.geometry.ray_sampler import RaySampler
    ours = RaySampler(ray_sample_mode="fixed", ray_number=(6, 10),
                      ray_img_size=(48, 96))
    np.testing.assert_allclose(np.asarray(ours()), ref().numpy(), atol=1e-6)
