"""Goldens vs the reference's own runnable code: the TPVPositionLifter
(Fourier-feature queries, ``model/lifter/tpv_pos_lifter.py:18-86``) and
SSCMetrics (``utils/scenerf_metric.py:30-215``, the scorer behind
eval_iou_kitti's SC/SSC numbers)."""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "tests" not in sys.path:
    sys.path.insert(0, "tests")
import ref_shim

pytestmark = pytest.mark.skipif(not ref_shim.reference_available(),
                                reason="reference repo not present")

import jax
import jax.numpy as jnp

from utils_tiny import TINY_MAPPING, TINY_PC_RANGE


def test_tpv_position_lifter_golden():
    m = ref_shim.load_ref("model.lifter.tpv_pos_lifter")
    torch.manual_seed(0)
    C, num_freqs = 16, [3, 4, 5]
    ref = m.TPVPositionLifter(
        embed_dims=C, tot_range=list(TINY_PC_RANGE), num_freqs=num_freqs,
        mapping_args=dict(TINY_MAPPING)).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.uniform_(-0.3, 0.3)
        feats = [torch.zeros(1, 2, 8, 4, 6)]
        ref_out = ref(feats)["representation"]

    from selfocc_tpu.models.lifter import TPVPositionLifter
    sd = ref.state_dict()
    params = {
        f"position_layer_{n}": {
            "kernel": jnp.asarray(sd[f"position_layer_{n}.weight"].numpy().T),
            "bias": jnp.asarray(sd[f"position_layer_{n}.bias"].numpy())}
        for n in ("hw", "zh", "wz")}
    ours = TPVPositionLifter(embed_dims=C, tot_range=tuple(TINY_PC_RANGE),
                             num_freqs=tuple(num_freqs),
                             mapping_args=dict(TINY_MAPPING))
    got = ours.apply({"params": params},
                     [jnp.zeros((1, 2, 4, 6, 8))])["representation"]
    for g, r in zip(got, ref_out):
        assert g.shape == tuple(r.shape)
        np.testing.assert_allclose(np.asarray(g), r.numpy(), atol=2e-5)


def test_ssc_metrics_golden(monkeypatch):
    """SSCMetrics accumulation + stats == the reference class on random
    batched grids with ignore labels. The reference hard-codes .cuda() and
    torch.distributed collectives — neutralized here so its own math runs
    on CPU."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
    # "utils" in sys.modules is the shim's stub namespace (tb_wrapper) —
    # load the reference's scenerf_metric by file path instead
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_scenerf_metric", "/root/reference/utils/scenerf_metric.py")
    sm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sm)
    monkeypatch.setattr(sm.dist, "barrier", lambda *a, **k: None)
    monkeypatch.setattr(sm.dist, "all_reduce", lambda *a, **k: None)

    n_classes = 5
    rng = np.random.RandomState(11)
    ref = sm.SSCMetrics(n_classes)

    from selfocc_tpu.utils.scenerf_metric import SSCMetrics
    ours = SSCMetrics(n_classes)

    for _ in range(3):
        gt = rng.randint(0, n_classes, size=(2, 300)).astype(np.int64)
        gt[rng.rand(*gt.shape) < 0.1] = 255          # ignore label
        pred = rng.randint(0, n_classes, size=(2, 300)).astype(np.int64)
        nonempty = (rng.rand(2, 300) > 0.2).astype(np.int64)
        ref.add_batch(torch.from_numpy(pred), torch.from_numpy(gt),
                      nonempty=torch.from_numpy(nonempty))
        ours.add_batch(pred, gt, nonempty=nonempty)

    r = ref.get_stats()
    g = ours.get_stats()
    assert g["precision"] == pytest.approx(float(r["precision"]), abs=1e-6)
    assert g["recall"] == pytest.approx(float(r["recall"]), abs=1e-6)
    assert g["iou"] == pytest.approx(float(r["iou"]), abs=1e-6)
    np.testing.assert_allclose(np.asarray(g["iou_ssc"], np.float64),
                               r["iou_ssc"].numpy(), atol=1e-6)
    assert g["iou_ssc_mean"] == pytest.approx(float(r["iou_ssc_mean"]),
                                              abs=1e-6)
