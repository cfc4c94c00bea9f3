"""SemTeacher offline semantic maps + SSCMetrics sanity (reference
utils/openseed_utils.py and scenerf_metric behaviors)."""
import numpy as np
import pytest


def test_sem_teacher_roundtrip(tmp_path):
    from selfocc_tpu.utils.openseed_utils import SemTeacher
    sem = np.random.randint(0, 17, size=(32, 48)).astype(np.uint8)
    np.save(tmp_path / "cam0.jpg.npy", sem)
    t = SemTeacher(str(tmp_path), apply_lut=False)
    assert t.available()
    got = t.load_sem_map("/data/some/where/cam0.jpg")
    np.testing.assert_array_equal(got, sem)
    assert t.load_sem_map("/missing/other.jpg") is None
    batch = t.load_batch(["/x/cam0.jpg", "/x/cam0.jpg"])
    assert batch.shape == (2, 32, 48)


def test_user_teacher_lut_wiring(tmp_path):
    """A user-supplied teacher in a NON-OpenSeeD label space plugs in via
    the ``lut`` argument (docs/PARITY.md teacher caveat): SemTeacher remaps
    precomputed maps through it, callables work too, and the default stays
    the openseed->nuscenes LUT."""
    from selfocc_tpu.utils.metrics import openseed2nuscenes
    from selfocc_tpu.utils.openseed_utils import SemTeacher, apply_label_lut

    sem = np.arange(12, dtype=np.uint8).reshape(3, 4) % 5
    np.save(tmp_path / "cam0.jpg.npy", sem)

    # custom 5-class teacher space -> 3-class training space
    lut = np.array([0, 2, 2, 1, 0], np.int64)
    t = SemTeacher(str(tmp_path), lut=lut)
    np.testing.assert_array_equal(t.load_sem_map("/x/cam0.jpg"), lut[sem])

    # callable LUT
    t2 = SemTeacher(str(tmp_path), lut=lambda s: (s + 1) % 5)
    np.testing.assert_array_equal(t2.load_sem_map("/x/cam0.jpg"),
                                  (sem + 1) % 5)

    # default = openseed->nuscenes (the reference's remap)
    t3 = SemTeacher(str(tmp_path))
    np.testing.assert_array_equal(t3.load_sem_map("/x/cam0.jpg"),
                                  openseed2nuscenes(sem))

    # out-of-range teacher ids clamp instead of crashing
    np.testing.assert_array_equal(
        apply_label_lut(np.array([0, 4, 99]), lut), np.array([0, 0, 0]))


def test_jax_teacher_lut_applied():
    """JaxSemTeacher applies a user LUT to its argmax maps (wiring only —
    the forward is stubbed; the real model is HF-goldened elsewhere)."""
    from selfocc_tpu.utils.openseed_utils import JaxSemTeacher

    t = JaxSemTeacher.__new__(JaxSemTeacher)   # skip the heavy model build
    t.variables = None
    t.lut = np.array([5, 6, 7], np.int64)
    t._forward = lambda v, imgs, size: np.zeros((1,) + size, np.uint8) + 2
    out = t(np.zeros((1, 8, 8, 3)), size=(4, 4))
    assert out.shape == (1, 4, 4)
    assert (out == 7).all()


def test_sem_teacher_unavailable(tmp_path):
    from selfocc_tpu.utils.openseed_utils import SemTeacher
    t = SemTeacher(str(tmp_path / "nope"))
    assert not t.available()


def test_ssc_metrics_perfect_and_ignore():
    from selfocc_tpu.utils.scenerf_metric import SSCMetrics
    m = SSCMetrics(n_classes=4)
    gt = np.random.randint(0, 4, size=(500,))
    gt[:50] = 255                              # ignored
    pred = gt.copy()
    pred[:50] = 1
    m.add_batch(pred, gt)
    s = m.get_stats()
    assert s["iou"] == pytest.approx(1.0)
    assert s["precision"] == pytest.approx(1.0)
    assert s["recall"] == pytest.approx(1.0)
    np.testing.assert_allclose(s["iou_ssc"], np.ones(4), atol=1e-6)

    m.reset()
    wrong = (gt + 1) % 4                       # occupied stays occupied
    wrong[gt == 0] = 0
    m.add_batch(wrong, gt)
    s2 = m.get_stats()
    assert s2["iou_ssc_mean"] < 1.0


def test_meaniou_dict_target_occ3d_path():
    """Occ3D dict-target branch (reference metric_util.py:90-118): dataset
    empty label remap, camera masking, and the GT-derived z-slab crop that
    forces predictions outside the labeled slab to empty."""
    from selfocc_tpu.utils.metrics import MeanIoU

    m = MeanIoU([1], empty_label=0, label_str=["c1"], use_mask=True,
                dataset_empty_label=17)
    sem = np.zeros((4, 4, 6), np.int64) + 17        # all free
    sem[:, :, 2:4] = 1                              # labeled slab z=2..3
    mask = np.ones((4, 4, 6), bool)
    mask[0] = False                                 # camera-invisible slice

    pred = np.zeros((4, 4, 6), np.int64)
    pred[:, :, 2:4] = 1                             # correct inside slab
    pred[:, :, 5] = 1                               # spurious above slab
    m._after_step(pred, {"semantics": sem, "mask_camera": mask})
    # z-crop removes the z=5 spurious hits; masking removes row 0
    assert m.total_correct[0] == (3 * 4 * 2)
    assert m.total_positive[0] == (3 * 4 * 2)
    assert m.total_seen[0] == (3 * 4 * 2)
