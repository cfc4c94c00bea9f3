"""Golden test running the REFERENCE's own SemanticKITTI dataset
(``dataset/kitti/kitti_dataset_one_frame.py``, imported unmodified via
ref_shim) against this repo's ``Kitti_One_Frame`` on the same fabricated
odometry tree. Pins neighbor-window indexing (incl. the val-split 5-frame
stride + voxel-GT glob), every calibration matrix chain (lidar2img /
img2lidar / img2prevImg / img2nextImg / temImg2lidar incl. the transxy
velodyne<->cam flip), the lidar depth GT projection, and the 2D semantic
label path.

Note the reference indexes ``self.scans`` in ``glob.glob`` order (unsorted);
comparisons go through each side's ``frame2scan`` map.
"""
import os

import numpy as np
import pytest

from ref_shim import load_ref, reference_available
from test_kitti_dataset import _make_mini_kitti

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")

_KW = dict(sequences=["00"], frames_interval=0.4, sequence_distance=4,
           crop_size=[60, 120], cur_prob=1.0, choose_nearest=True)


def _build_pair(tmp_path, split="train", **over):
    root = _make_mini_kitti(tmp_path, with_voxels=(split == "val"))
    kw = dict(_KW, **over)
    ref_mod = load_ref("dataset.kitti.kitti_dataset_one_frame")
    ref_ds = ref_mod.Kitti_One_Frame(split, root=root,
                                     preprocess_root=os.path.join(root, "p"),
                                     **kw)
    from selfocc_tpu.data.kitti_dataset import Kitti_One_Frame
    our_ds = Kitti_One_Frame(split=split, root=root, **kw)
    return ref_ds, our_ds


def _frame_ids(ds):
    return sorted(ds.frame2scan.keys())


def _compare_scan_items(ref_ds, our_ds, key, depth=False, sem=False):
    ref_item = ref_ds[ref_ds.frame2scan[key]]
    our_item = our_ds[our_ds.frame2scan[key]]
    r_imgs, r = ref_item
    o_imgs, o = our_item
    for k in ("lidar2img", "img2lidar", "img2prevImg", "img2nextImg",
              "temImg2lidar"):
        np.testing.assert_allclose(np.asarray(o[k]), np.asarray(r[k]),
                                   atol=1e-9, rtol=1e-9, err_msg=key + k)
    assert o["token"] == r["token"] and o["sequence"] == r["sequence"]
    for which in range(4):
        for oi, ri in zip(o_imgs[which], r_imgs[which]):
            np.testing.assert_array_equal(np.asarray(oi), np.asarray(ri))
    if depth:
        np.testing.assert_allclose(o["depth_loc"], r["depth_loc"],
                                   atol=1e-6)
        np.testing.assert_allclose(o["depth_gt"], r["depth_gt"], atol=1e-6)
        np.testing.assert_array_equal(o["depth_mask"], r["depth_mask"])
    if sem:
        np.testing.assert_array_equal(np.asarray(o["sem"]),
                                      np.asarray(r["sem"]))


def test_train_split_parity(tmp_path):
    ref_ds, our_ds = _build_pair(tmp_path, return_depth=True)
    assert _frame_ids(ref_ds) == _frame_ids(our_ds)
    for key in _frame_ids(ref_ds):
        r = ref_ds.scans[ref_ds.frame2scan[key]]
        o = our_ds.scans[our_ds.frame2scan[key]]
        assert r["prev_frame_ids"] == o["prev_frame_ids"], key
        assert r["next_frame_ids"] == o["next_frame_ids"], key
        np.testing.assert_allclose(r["prev_dists"], o["prev_dists"])
        np.testing.assert_allclose(r["next_dists"], o["next_dists"])
    for key in _frame_ids(ref_ds)[2:5]:
        _compare_scan_items(ref_ds, our_ds, key, depth=True)


def test_val_split_parity(tmp_path):
    """val indexes by the voxels/ completion GT with a 5-frame neighbor
    stride (kitti_dataset_one_frame.py:107-123,156-161)."""
    ref_ds, our_ds = _build_pair(tmp_path, split="val", sequence_distance=8)
    assert _frame_ids(ref_ds) == _frame_ids(our_ds)
    assert len(ref_ds) == len(our_ds) and len(ref_ds) > 0
    for key in _frame_ids(ref_ds):
        r = ref_ds.scans[ref_ds.frame2scan[key]]
        o = our_ds.scans[our_ds.frame2scan[key]]
        assert r["prev_frame_ids"] == o["prev_frame_ids"], key
        assert r["next_frame_ids"] == o["next_frame_ids"], key


def test_strict_false_and_sem(tmp_path):
    """strict=False self-inclusion + the 2D sem-label path.

    Known (deliberate) divergence: the reference's self-inclusion appends
    ``curr_pose`` (kitti_dataset_one_frame.py:246-247) — a STALE variable
    from the earlier paired_dists loop, i.e. the pose of whatever frame
    ``glob.glob`` yielded last, not the current scan's pose. The resulting
    img2prevImg/img2nextImg for self-anchored frames is glob-order-dependent
    garbage (and unused: eval only consumes lidar2img/img2lidar/
    temImg2lidar, and training runs strict=True). We store the ACTUAL
    current pose, so our self-anchor img2prevImg is the identity. The
    comparison therefore skips img2prevImg/img2nextImg exactly where the
    nearest anchor neighbor is the self-inclusion."""
    sem_root = tmp_path / "sem" / "00" / "image_02"
    os.makedirs(sem_root)
    rng = np.random.RandomState(0)
    for i in range(8):
        np.save(str(sem_root / f"{i:06d}.png.npy"),
                rng.randint(0, 20, (60, 120)).astype(np.uint8))
    ref_ds, our_ds = _build_pair(tmp_path, strict=False, return_sem=True,
                                 sem_path=str(tmp_path / "sem"))
    for key in _frame_ids(ref_ds)[:3]:
        r = ref_ds.scans[ref_ds.frame2scan[key]]
        o = our_ds.scans[our_ds.frame2scan[key]]
        # strict=False self-inclusion at the tail
        assert r["prev_frame_ids"][-1] == o["prev_frame_ids"][-1] == \
            r["frame_id"]
        self_anchored = (r["prev_frame_ids"][0] == r["frame_id"] or
                         r["next_frame_ids"][0] == r["frame_id"])
        ref_item = ref_ds[ref_ds.frame2scan[key]]
        our_item = our_ds[our_ds.frame2scan[key]]
        keys = ("lidar2img", "img2lidar", "temImg2lidar") if self_anchored \
            else ("lidar2img", "img2lidar", "temImg2lidar", "img2prevImg",
                  "img2nextImg")
        for k in keys:
            np.testing.assert_allclose(np.asarray(our_item[1][k]),
                                       np.asarray(ref_item[1][k]),
                                       atol=1e-9, rtol=1e-9,
                                       err_msg=key + k)
        if self_anchored:
            # ours is the sane value: identity (anchor == itself)
            np.testing.assert_allclose(
                np.asarray(our_item[1]["img2prevImg"])[0], np.eye(4),
                atol=1e-9)
        np.testing.assert_array_equal(np.asarray(our_item[1]["sem"]),
                                      np.asarray(ref_item[1]["sem"]))
