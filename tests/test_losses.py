"""Loss-layer tests: analytically known cases + shape/registry checks."""
import numpy as np
import jax
import jax.numpy as jnp

from selfocc_tpu.losses import (EikonalLoss, MultiLoss, RGBLossMS,
                                ReprojLossMonoMultiNew,
                                ReprojLossMonoMultiNewCombine, SemCELossMS,
                                SoftSparsityLoss, EdgeLoss3DMS, build_loss)

B, N, RH, RW, S = 1, 2, 4, 6, 8
R = RH * RW
IMG = (16, 24)  # H, W


def _ray_grid():
    ys, xs = np.meshgrid(np.arange(RH), np.arange(RW), indexing='ij')
    rays = np.stack([xs * (IMG[1] / RW), ys * (IMG[0] / RH)], -1).reshape(-1, 2)
    return jnp.asarray(rays.astype(np.float32))


def _base_inputs(seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(B, N, IMG[0], IMG[1], 3).astype(np.float32)
    weights = rng.rand(B, N, R, S).astype(np.float32) * 0.1
    ts = np.cumsum(rng.rand(B, N, R, S).astype(np.float32) + 0.5, axis=-1)
    eye = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    return {
        'curr_imgs': jnp.asarray(img),
        'prev_imgs': jnp.asarray(img),
        'next_imgs': jnp.asarray(img),
        'color_imgs': jnp.asarray(img),
        'weights': jnp.asarray(weights),
        'ts': jnp.asarray(ts),
        'img2prevImg': jnp.asarray(eye),
        'img2nextImg': jnp.asarray(eye),
        'ms_rays': _ray_grid(),
    }


def test_eikonal_unit_gradients_zero():
    loss = EikonalLoss(weight=0.1)
    g = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    out = loss({'eik_grad': jnp.asarray(g)})
    assert abs(float(out)) < 1e-10


def test_soft_sparsity():
    loss = SoftSparsityLoss(weight=1.0, input_dict={'density': 'uniform_sdf'})
    sdf = jnp.asarray(np.array([1.0, 2.0, -1.0, -3.0], np.float32))
    np.testing.assert_allclose(float(loss({'uniform_sdf': sdf})), 1.0, atol=1e-6)


def test_rgb_loss_perfect_prediction():
    inputs = _base_inputs()
    loss = RGBLossMS(weight=1.0, img_size=list(IMG), no_ssim=False,
                     ray_resize=[RH, RW])
    # render colors exactly equal to GT at ray locations
    from selfocc_tpu.ops.interp import bilinear_sample
    imgs = inputs['color_imgs'].reshape(B * N, IMG[0], IMG[1], 3)
    xn = inputs['ms_rays'][:, 0] / IMG[1] * 2 - 1
    yn = inputs['ms_rays'][:, 1] / IMG[0] * 2 - 1
    pix = jnp.stack([(xn + 1) * .5 * (IMG[1] - 1), (yn + 1) * .5 * (IMG[0] - 1)], -1)
    gt = jax.vmap(lambda im: bilinear_sample(im, pix, 'zeros'))(imgs)
    inputs['ms_colors'] = [gt.reshape(B, N, R, 3)]
    out = loss(inputs)
    assert abs(float(out)) < 1e-5


def test_sem_ce_perfect_prediction():
    inputs = _base_inputs()
    C = 5
    rng = np.random.RandomState(1)
    sem_gt = rng.randint(0, C, size=(B, N, IMG[0], IMG[1]))
    rays = np.asarray(inputs['ms_rays']).astype(int)
    gt_at_rays = sem_gt[:, :, rays[:, 1], rays[:, 0]]
    sem_pred = jax.nn.one_hot(jnp.asarray(gt_at_rays), C)
    loss = SemCELossMS(weight=1.0, img_size=list(IMG), ray_resize=[RH, RW])
    out = loss({'sem': [sem_pred], 'sem_gt': jnp.asarray(sem_gt),
                'ms_rays': inputs['ms_rays']})
    assert float(out) < 1e-5


def test_reproj_combine_identical_frames_zero():
    """prev == next == curr with identity reprojection -> zero photometric loss."""
    inputs = _base_inputs()
    loss = ReprojLossMonoMultiNewCombine(
        weight=1.0, no_ssim=False, img_size=list(IMG), ray_resize=[RH, RW],
        input_dict={
            'curr_imgs': 'curr_imgs', 'prev_imgs': 'prev_imgs',
            'next_imgs': 'next_imgs', 'weights': 'weights', 'ts': 'ts',
            'img2prevImg': 'img2prevImg', 'img2nextImg': 'img2nextImg',
            'ms_rays': 'ms_rays'})
    out = loss(inputs)
    assert abs(float(out)) < 1e-4


def test_reproj_new_identical_frames_zero():
    inputs = _base_inputs()
    loss = ReprojLossMonoMultiNew(
        weight=1.0, no_ssim=False, img_size=list(IMG), ray_resize=[RH, RW],
        input_dict={
            'curr_imgs': 'curr_imgs', 'prev_imgs': 'prev_imgs',
            'next_imgs': 'next_imgs', 'weights': 'weights', 'ts': 'ts',
            'img2prevImg': 'img2prevImg', 'img2nextImg': 'img2nextImg',
            'ms_rays': 'ms_rays'})
    out = loss(inputs)
    assert abs(float(out)) < 1e-4


def test_reproj_combine_shifted_frames_positive():
    inputs = _base_inputs()
    rng = np.random.RandomState(3)
    inputs['prev_imgs'] = jnp.asarray(
        rng.rand(B, N, IMG[0], IMG[1], 3).astype(np.float32))
    inputs['next_imgs'] = jnp.asarray(
        rng.rand(B, N, IMG[0], IMG[1], 3).astype(np.float32))
    loss = ReprojLossMonoMultiNewCombine(
        weight=1.0, no_ssim=True, img_size=list(IMG), ray_resize=[RH, RW],
        input_dict={
            'curr_imgs': 'curr_imgs', 'prev_imgs': 'prev_imgs',
            'next_imgs': 'next_imgs', 'weights': 'weights', 'ts': 'ts',
            'img2prevImg': 'img2prevImg', 'img2nextImg': 'img2nextImg',
            'ms_rays': 'ms_rays'})
    assert float(loss(inputs)) > 1e-3


def test_edge_loss_constant_depth_zero():
    inputs = _base_inputs()
    loss = EdgeLoss3DMS(weight=1.0, img_size=list(IMG), ray_resize=[RH, RW])
    depth = jnp.ones((B, N, R))
    out = loss({'curr_imgs': inputs['curr_imgs'], 'ms_depths': [depth],
                'ms_rays': inputs['ms_rays']})
    assert abs(float(out)) < 1e-6


def test_multi_loss_container():
    ml = MultiLoss([
        dict(type='EikonalLoss', weight=0.1),
        dict(type='SecondGradLoss', weight=0.01),
    ])
    g = jnp.asarray(np.random.RandomState(0).randn(10, 3).astype(np.float32))
    tot, d = ml({'eik_grad': g, 'second_grad': g})
    assert set(d) == {'EikonalLoss', 'SecondGradLoss'}
    np.testing.assert_allclose(float(tot),
                               float(d['EikonalLoss'] + d['SecondGradLoss']),
                               rtol=1e-6)


def test_losses_are_jittable_and_differentiable():
    inputs = _base_inputs()
    loss = ReprojLossMonoMultiNewCombine(
        weight=1.0, no_ssim=False, img_size=list(IMG), ray_resize=[RH, RW],
        input_dict={
            'curr_imgs': 'curr_imgs', 'prev_imgs': 'prev_imgs',
            'next_imgs': 'next_imgs', 'weights': 'weights', 'ts': 'ts',
            'img2prevImg': 'img2prevImg', 'img2nextImg': 'img2nextImg',
            'ms_rays': 'ms_rays'})

    def f(w):
        i = dict(inputs)
        i['weights'] = w
        return loss(i)

    g = jax.jit(jax.grad(f))(inputs['weights'])
    assert g.shape == inputs['weights'].shape
    assert np.isfinite(np.asarray(g)).all()
