"""Torch checkpoint interop round-trip: export our params to the reference's
state_dict layout, re-import, and verify bit-exact recovery for every mapped
subtree (lifter, encoder incl. scanned layers, field, deviation)."""
import numpy as np
import jax
import pytest

from selfocc_tpu.models.segmentor import TPVSegmentor
from selfocc_tpu.utils.torch_compat import (export_torch_state_dict,
                                            import_torch_state_dict)

from utils_tiny import make_cameras, tiny_config


@pytest.fixture(scope="module")
def model_params():
    cfg = tiny_config(sem=False, backbone='tiny')
    model = TPVSegmentor(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)
    H, W = cfg.input_size
    imgs = jax.random.uniform(rng, (1, cfg.num_cams, H, W, 3))
    cams = make_cameras(cfg.num_cams, cfg.input_size)
    variables = jax.jit(lambda: model.init(
        {'params': rng, 'dropout': jax.random.PRNGKey(1)},
        imgs, cams['lidar2img'], cams['img2lidar'], rng, 0, True))()
    return cfg, variables['params']


def test_round_trip(model_params):
    cfg, params = model_params
    num_layers = cfg.model.encoder.num_layers
    sd = export_torch_state_dict(params, num_layers=num_layers)
    assert 'lifter.tpv_hw' in sd
    assert 'encoder.layers.0.attentions.0.sampling_offsets.weight' in sd
    assert 'head.model.field.density_net.1.weight' in sd

    # perturb a copy, then import the exported dict: mapped leaves recover
    perturbed = jax.tree_util.tree_map(lambda x: np.asarray(x) + 1.0, params)
    restored, missing = import_torch_state_dict(
        sd, perturbed, num_layers=num_layers)

    flat_orig = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_rest = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_flatten_with_path(restored)[0]}
    mapped_prefixes = ('lifter', 'encoder', 'head')
    recovered = unrecovered = 0
    for p, orig in flat_orig:
        key = jax.tree_util.keystr(p)
        if not any(m in key for m in mapped_prefixes):
            continue
        if np.allclose(flat_rest[key], np.asarray(orig)):
            recovered += 1
        else:
            unrecovered += 1
    # everything except intentionally-unmapped leaves (color_proj, flow,
    # backbone-tiny, fourier consts) must round-trip
    assert recovered > 20, (recovered, unrecovered)
    # core subtrees recover exactly
    np.testing.assert_allclose(
        flat_rest["['lifter']['tpv_hw']"], np.asarray(params['lifter']['tpv_hw']))
    np.testing.assert_allclose(
        flat_rest["['encoder']['layers']['self_attn']['heads']"
                  "['sampling_offsets']['kernel']"],
        np.asarray(params['encoder']['layers']['self_attn']['heads']
                   ['sampling_offsets']['kernel']))


def test_torch_linear_transpose_convention(model_params):
    cfg, params = model_params
    sd = export_torch_state_dict(params, num_layers=cfg.model.encoder.num_layers)
    w = sd['encoder.positional_encoding.position_layer_hw.weight']
    k = np.asarray(params['encoder']['positional_encoding']
                   ['position_layer_hw']['kernel'])
    # torch Linear stores (out, in); flax kernel is (in, out)
    assert w.shape == k.T.shape
    np.testing.assert_allclose(w, k.T)
