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


def test_all_configs_resolve_and_build():
    """Every registered config resolves, and its model constructs (catches
    dataclass typos / bad plumbing without paying init cost)."""
    from selfocc_tpu.configs.experiments import _CONFIGS, get_config
    from selfocc_tpu.models.segmentor import TPVSegmentor
    for name in _CONFIGS:
        cfg = get_config(name)
        assert cfg.name == name
        model = TPVSegmentor(cfg=cfg.model)
        assert model is not None
    # reference-style path resolution
    assert get_config("config/nuscenes/nuscenes_occ.py").name == "nuscenes_occ"


def test_training_is_deterministic_given_seed():
    """Two runs from the same seed produce bitwise-identical first-step
    losses (guards hidden nondeterminism in sampling/dropout plumbing)."""
    import jax
    import jax.numpy as jnp
    from selfocc_tpu.data.synthetic import SyntheticDataset
    from selfocc_tpu.models.segmentor import TPVSegmentor
    from selfocc_tpu.utils.train_lib import init_train_state, make_train_step
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from utils_tiny import tiny_config

    cfg = tiny_config(sem=False, backbone='tiny')
    ds = SyntheticDataset(num_cams=cfg.num_cams, input_size=cfg.input_size,
                          img_size=cfg.img_size, num_classes=cfg.num_classes,
                          length=2)
    batch = {k: jnp.asarray(v) for k, v in ds[0].items()}

    def one_step():
        model = TPVSegmentor(cfg=cfg.model)
        state = init_train_state(model, cfg, jax.random.PRNGKey(7), batch)
        step = make_train_step(model, cfg)
        _, metrics = step(state, batch, jax.random.PRNGKey(11))
        return float(metrics["total"])

    assert one_step() == one_step()
