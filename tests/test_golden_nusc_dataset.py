"""Golden test running the REFERENCE's own nuScenes dataset
(``dataset/dataset_one_frame_sweeps_dist.py``, imported unmodified via
ref_shim with mmengine.load / mmcv imread / pyquaternion stubbed) against
this repo's ``nuScenes_One_Frame_Sweeps_Dist`` on the SAME fabricated
on-disk tree + infos pkl.

This pins three things at once: (1) the pkl schema our fabricator (and
examine_sweeps.py) writes is exactly what the reference consumes, (2) every
calibration matrix (lidar2img / img2lidar / temImg2lidar / img2prevImg /
img2nextImg / ego2lidar / intrinsic / cam2ego, incl. the quaternion math we
inlined) agrees to fp64 precision, and (3) the lidar depth-GT projection
(get_depth_from_lidar) and image reads agree.
"""
import numpy as np
import pytest

from ref_shim import load_ref, reference_available
from test_nuscenes_dataset import _make_mini_nuscenes

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")

# deterministic sampling: cur anchor + nearest prev/next
_DET = dict(crop_size=[64, 96], min_dist=0.4, max_dist=5.0, strict=True,
            cur_prob=1.0, choose_nearest=True, ego_centric=False)

_MAT_KEYS = ("lidar2img", "img2lidar", "temImg2lidar", "img2prevImg",
             "img2nextImg", "ego2lidar", "intrinsic", "cam2ego")


def _build_pair(tmp_path, **over):
    data_path, pkl, _ = _make_mini_nuscenes(tmp_path, with_lidar=True)
    kw = dict(_DET, data_path=data_path, imageset=pkl)
    kw.update(over)
    ref_mod = load_ref("dataset.dataset_one_frame_sweeps_dist")
    ref_ds = ref_mod.nuScenes_One_Frame_Sweeps_Dist(**kw)
    from selfocc_tpu.data.nuscenes_dataset import nuScenes_One_Frame_Sweeps_Dist
    our_ds = nuScenes_One_Frame_Sweeps_Dist(**kw)
    return ref_ds, our_ds


def _compare_item(ref_item, our_item, depth=False):
    (r_imgs, r_metas) = ref_item
    (o_imgs, o_metas) = our_item
    for k in _MAT_KEYS:
        np.testing.assert_allclose(np.asarray(o_metas[k]),
                                   np.asarray(r_metas[k]),
                                   atol=1e-9, rtol=1e-9, err_msg=k)
    assert o_metas["token"] == r_metas["token"]
    for which in range(4):  # input, curr, prev, next image groups
        assert len(o_imgs[which]) == len(r_imgs[which])
        for o, r in zip(o_imgs[which], r_imgs[which]):
            np.testing.assert_array_equal(np.asarray(o), np.asarray(r))
    assert [p.replace("//", "/") for p in o_metas["curr_imgs_path"]] == \
        [p.replace("//", "/") for p in r_metas["curr_imgs_path"]]
    if depth:
        np.testing.assert_allclose(o_metas["depth_loc"],
                                   r_metas["depth_loc"], atol=1e-6)
        np.testing.assert_allclose(o_metas["depth_gt"],
                                   r_metas["depth_gt"], atol=1e-6)
        np.testing.assert_array_equal(o_metas["depth_mask"],
                                      r_metas["depth_mask"])


def test_deterministic_item_parity(tmp_path):
    ref_ds, our_ds = _build_pair(tmp_path)
    assert len(ref_ds) == len(our_ds)
    for idx in (2, 3):
        _compare_item(ref_ds[idx], our_ds[idx])


def test_ego_centric_and_depth_parity(tmp_path):
    ref_ds, our_ds = _build_pair(tmp_path, ego_centric=True,
                                 return_depth=True)
    _compare_item(ref_ds[2], our_ds[2], depth=True)


def test_eval_dataset_parity(tmp_path):
    """nuScenes_One_Frame_Eval vs the reference's own
    dataset_one_frame_eval.py on the same temporal_v2-format pkl fixture:
    per-neighbor temImg2lidar chains, the lidar depth GT per anchor, and
    the deterministic item structure."""
    from test_novel_eval_datasets import make_nuscenes_eval_fixture

    data_path, pkl = make_nuscenes_eval_fixture(tmp_path, n_frames=3,
                                                num_cams=2)
    kw = dict(data_path=data_path, imageset=pkl, crop_size=[64, 96])
    ref_mod = load_ref("dataset.dataset_one_frame_eval")
    ref_ds = ref_mod.nuScenes_One_Frame_Eval(**kw)
    from selfocc_tpu.data.nuscenes_eval_dataset import nuScenes_One_Frame_Eval
    our_ds = nuScenes_One_Frame_Eval(**kw)
    assert len(ref_ds) == len(our_ds)
    for idx in range(len(ref_ds)):
        r_in, r_anchor, r_metas = ref_ds[idx]
        o_in, o_anchor, o_metas = our_ds[idx]
        for k in ("lidar2img", "img2lidar", "ego2lidar", "intrinsic"):
            np.testing.assert_allclose(np.asarray(o_metas[k]),
                                       np.asarray(r_metas[k]),
                                       atol=1e-9, rtol=1e-9, err_msg=k)
        np.testing.assert_allclose(o_metas["temImg2lidars"],
                                   r_metas["temImg2lidars"], atol=1e-9,
                                   rtol=1e-9)
        np.testing.assert_allclose(o_metas["frame_dists"],
                                   r_metas["frame_dists"])
        assert len(o_anchor) == len(r_anchor)
        for oa, ra in zip(o_anchor, r_anchor):
            for o, r in zip(oa, ra):
                np.testing.assert_array_equal(np.asarray(o), np.asarray(r))
        for o, r in zip(o_metas["depth_gt"], r_metas["depth_gt"]):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=1e-6)
        for o, r in zip(o_metas["depth_mask"], r_metas["depth_mask"]):
            np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


def test_neighbor_lists_parity(tmp_path):
    """The precomputed prev/next neighbor lists + distances (the sampling
    domain, dataset_one_frame_sweeps_dist.py:115-151) must agree for every
    keyframe, incl. the strict=False self-inclusion."""
    for strict in (True, False):
        ref_ds, our_ds = _build_pair(tmp_path, strict=strict)
        for scene, samples in ref_ds.scene_infos.items():
            ours = our_ds.scene_infos[scene]
            for i, s in enumerate(samples):
                assert list(map(tuple, s["prev_samples"])) == \
                    list(map(tuple, ours[i]["prev_samples"])), (strict, i)
                assert list(map(tuple, s["next_samples"])) == \
                    list(map(tuple, ours[i]["next_samples"])), (strict, i)
                np.testing.assert_allclose(s["prev_dists"],
                                           ours[i]["prev_dists"])
                np.testing.assert_allclose(s["next_dists"],
                                           ours[i]["next_dists"])
