"""Sampler / feat-tools / temporal-pkl utility tests."""
import numpy as np
import jax
import jax.numpy as jnp

from selfocc_tpu.data.sampler import DistributedSampler
from selfocc_tpu.utils.feat_tools import multi2single_scale
from selfocc_tpu.utils.temporal_pkl import sort_infos_by_scene


def test_sampler_shards_and_resume():
    n = 23
    all_idx = []
    for rank in range(4):
        s = DistributedSampler(n, num_replicas=4, rank=rank, seed=1)
        s.set_epoch(3)
        all_idx.append(list(s))
    # every index covered (with wrap padding)
    flat = sorted(set(i for shard in all_idx for i in shard))
    assert flat == list(range(n))
    # resume skips consumed indices deterministically
    s = DistributedSampler(n, num_replicas=4, rank=2, seed=1)
    s.set_epoch(3)
    full = list(s)
    s2 = DistributedSampler(n, num_replicas=4, rank=2, seed=1)
    s2.set_epoch(3)
    s2.set_last_iter(2)
    assert list(s2) == full[2:]
    # next epoch resets the skip
    s2.set_epoch(4)
    assert len(list(s2)) == len(full)


def test_multi2single_scale():
    f0 = jnp.ones((1, 2, 8, 12, 4))
    f1 = jnp.ones((1, 2, 4, 6, 4)) * 2
    out = multi2single_scale([f0, f1], target_index=0, mode="sum")
    assert out.shape == (1, 2, 8, 12, 4)
    np.testing.assert_allclose(np.asarray(out), 3.0)
    out_m = multi2single_scale([f0, f1], target_index=0, mode="mean")
    np.testing.assert_allclose(np.asarray(out_m), 1.5)


def test_sort_infos_by_scene():
    infos = [
        {"scene_token": "b", "timestamp": 2},
        {"scene_token": "a", "timestamp": 5},
        {"scene_token": "b", "timestamp": 1},
        {"scene_token": "a", "timestamp": 3},
    ]
    sorted_infos, scene_info = sort_infos_by_scene(infos)
    assert [s["scene_token"] for s in sorted_infos] == ["a", "a", "b", "b"]
    assert scene_info == {"a": (0, 1), "b": (2, 3)}
    assert sorted_infos[0]["timestamp"] == 3
