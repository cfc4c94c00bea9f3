"""End-to-end segmentor tests: forward, loss, gradients — the minimum slice.

Everything runs under jit (eager dispatch of the full graph is prohibitively
slow on the CPU test backend); ``model.init`` is jitted too.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from selfocc_tpu.losses import MultiLoss
from selfocc_tpu.models.segmentor import TPVSegmentor

from utils_tiny import make_cameras, tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(sem=True)
    model = TPVSegmentor(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)
    H, W = cfg.input_size
    imgs = jax.random.uniform(rng, (1, cfg.num_cams, H, W, 3))
    cams = make_cameras(cfg.num_cams, cfg.input_size)

    @jax.jit
    def init():
        return model.init(
            {'params': rng, 'dropout': jax.random.PRNGKey(1)},
            imgs, cams['lidar2img'], cams['img2lidar'], rng, 0, True)

    variables = init()
    return cfg, model, variables, imgs, cams


def test_train_forward_and_loss_grads(setup):
    cfg, model, variables, imgs, cams = setup
    rng = jax.random.PRNGKey(2)
    loss_fn = MultiLoss(cfg.loss_cfgs)
    H, W = cfg.img_size
    sup = jax.random.uniform(jax.random.PRNGKey(3),
                             (1, cfg.num_cams, H, W, 3)) / 256.0
    sem_gt = jax.random.randint(jax.random.PRNGKey(4),
                                (1, cfg.num_cams, H, W), 0, cfg.num_classes)
    eye = jnp.tile(jnp.eye(4), (1, cfg.num_cams, 1, 1))

    def total_loss(params):
        out, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats'],
             'consts': variables['consts']},
            imgs, cams['lidar2img'], cams['img2lidar'], rng, 0, True,
            rngs={'dropout': jax.random.PRNGKey(5)},
            mutable=['batch_stats'])
        inputs = {cfg.loss_input_convertion[k]: out[k]
                  for k in cfg.loss_input_convertion if k in out}
        inputs.update({
            'curr_imgs': sup, 'prev_imgs': sup, 'next_imgs': sup,
            'color_imgs': sup, 'sem_gt': sem_gt,
            'img2prevImg': eye, 'img2nextImg': eye,
        })
        return loss_fn(inputs)

    (tot, ldict), grads = jax.jit(
        jax.value_and_grad(total_loss, has_aux=True))(variables['params'])
    assert np.isfinite(float(tot))
    assert set(ldict) == {c['type'] for c in cfg.loss_cfgs}
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    nonzero = {jax.tree_util.keystr(p): float(jnp.abs(g).sum())
               for p, g in flat}
    assert any(v > 0 for k, v in nonzero.items() if 'lifter' in k)
    assert any(v > 0 for k, v in nonzero.items() if 'density' in k)
    assert any(v > 0 for k, v in nonzero.items() if 'img_backbone' in k)


def test_forward_occ_grid(setup):
    cfg, model, variables, imgs, cams = setup
    out = jax.jit(lambda v, i, l: model.apply(v, i, l, method='forward_occ'))(
        variables, imgs, cams['lidar2img'])
    assert out['sdf'].shape == (20, 20, 4)
    assert out['sem'].shape == (20, 20, 4)
    assert np.isfinite(np.asarray(out['sdf'])).all()


def test_prepare_and_chunked_render_matches_direct(setup):
    cfg, model, variables, imgs, cams = setup
    volume = jax.jit(lambda v, i, l: model.apply(v, i, l, method='prepare'))(
        variables, imgs, cams['lidar2img'])
    assert volume.ndim == 4

    render = jax.jit(lambda v, vol, o, d: model.apply(
        v, vol, o, d, method='render_rays'))
    origin = jnp.zeros((40, 3))
    direction = jax.random.normal(jax.random.PRNGKey(7), (40, 3))
    full = render(variables, volume, origin, direction)
    a = render(variables, volume, origin[:20], direction[:20])
    b = render(variables, volume, origin[20:], direction[20:])
    np.testing.assert_allclose(
        np.asarray(full['depth']),
        np.concatenate([np.asarray(a['depth']), np.asarray(b['depth'])]),
        atol=1e-5)
    assert np.isfinite(np.asarray(full['depth'])).all()


def test_bev_variant_forward():
    """BEVFormer single-plane encoder + tpv=False head (nuscenes_occ_bev
    analog) runs end-to-end."""
    import dataclasses
    cfg = tiny_config(sem=False, backbone='tiny')
    model_cfg = dataclasses.replace(
        cfg.model, lifter_type='BEVQueryLifter', use_bev_encoder=True,
        head=dataclasses.replace(cfg.model.head, tpv=False,
                                 return_uniform_sdf=True))
    model = TPVSegmentor(cfg=model_cfg)
    rng = jax.random.PRNGKey(0)
    H, W = cfg.input_size
    imgs = jax.random.uniform(rng, (1, cfg.num_cams, H, W, 3))
    cams = make_cameras(cfg.num_cams, cfg.input_size)
    variables = jax.jit(lambda: model.init(
        {'params': rng, 'dropout': jax.random.PRNGKey(1)},
        imgs, cams['lidar2img'], cams['img2lidar'], rng, 0, True))()
    out, _ = jax.jit(lambda v: model.apply(
        v, imgs, cams['lidar2img'], cams['img2lidar'], rng, 0, True,
        rngs={'dropout': rng}, mutable=['batch_stats']))(variables)
    R = cfg.num_rays[0] * cfg.num_rays[1]
    assert out['ms_depths'][0].shape == (1, cfg.num_cams, R)
    assert 'uniform_sdf' in out
    assert np.isfinite(np.asarray(out['ms_depths'][0])).all()


def test_unet2d_backbone_pyramid():
    """Reference output contract: out_feature channels at strides 2/4/8/16
    (unet2d.py:120-126), EfficientNet encoder underneath."""
    from selfocc_tpu.models.efficientnet import EfficientNetConfig
    from selfocc_tpu.models.unet2d import UNet2D
    m = UNet2D(out_feature=32,
               encoder_cfg=EfficientNetConfig(width_coefficient=0.25,
                                              depth_coefficient=0.35))
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 64, 96, 3))
    variables = jax.jit(lambda: m.init(rng, x))()
    outs, _ = jax.jit(lambda v: m.apply(v, x, train=True,
                                        mutable=['batch_stats']))(variables)
    assert [o.shape for o in outs] == [
        (2, 32, 48, 32), (2, 16, 24, 32), (2, 8, 12, 32), (2, 4, 6, 32)]


def test_bf16_compute_dtype_forward():
    """AMP analog: bf16 backbone/neck compute, fp32 outputs, finite losses."""
    import dataclasses
    cfg = tiny_config(sem=False)
    model_cfg = dataclasses.replace(cfg.model, compute_dtype='bfloat16')
    model = TPVSegmentor(cfg=model_cfg)
    rng = jax.random.PRNGKey(0)
    H, W = cfg.input_size
    imgs = jax.random.uniform(rng, (1, cfg.num_cams, H, W, 3))
    cams = make_cameras(cfg.num_cams, cfg.input_size)
    variables = jax.jit(lambda: model.init(
        {'params': rng, 'dropout': jax.random.PRNGKey(1)},
        imgs, cams['lidar2img'], cams['img2lidar'], rng, 0, True))()
    # params stay fp32
    leaves = jax.tree_util.tree_leaves(variables['params'])
    assert all(l.dtype == jnp.float32 for l in leaves)
    out, _ = jax.jit(lambda v: model.apply(
        v, imgs, cams['lidar2img'], cams['img2lidar'], rng, 0, True,
        rngs={'dropout': rng}, mutable=['batch_stats']))(variables)
    assert out['ms_depths'][0].dtype == jnp.float32
    assert np.isfinite(np.asarray(out['ms_depths'][0])).all()
