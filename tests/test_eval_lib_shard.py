"""Camera-sharded prepare (model parallelism over the camera axis) must be
numerically identical to the replicated prepare — GSPMD only changes WHERE
the per-camera backbone/encoder value work runs, not what is computed."""
import numpy as np
import pytest

import jax

from utils_tiny import tiny_config
from selfocc_tpu.models.segmentor import TPVSegmentor
from selfocc_tpu.utils.eval_lib import ChunkedRenderer


@pytest.mark.parametrize("num_cams", [8, 6])
def test_prepare_shard_matches_replicated(num_cams):
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    cfg = tiny_config(num_cams=num_cams)
    model = TPVSegmentor(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)
    imgs = np.random.RandomState(1).rand(
        1, num_cams, *cfg.input_size, 3).astype(np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32), (1, num_cams, 1, 1))
    l2i[..., :3, 3] = np.random.RandomState(2).randn(1, num_cams, 3)
    variables = model.init(rng, imgs, l2i, method="prepare")

    plain = ChunkedRenderer(model, variables, shard=False,
                            volume_dtype="float32")
    sharded = ChunkedRenderer(model, variables, shard=False,
                              volume_dtype="float32", prepare_shard=True)
    v0 = np.asarray(plain.prepare(imgs, l2i))
    v1 = np.asarray(sharded.prepare(imgs, l2i))
    assert v0.shape == v1.shape
    np.testing.assert_allclose(v1, v0, atol=2e-5)


def test_grid_occ_sharded_matches_forward_occ():
    """GridOccEvaluator (grid axis sharded over the mesh) must reproduce the
    single-jit ``TPVSegmentor.forward_occ`` exactly — sharding only moves
    WHERE grid points are queried (VERDICT r3 #2)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    import jax.numpy as jnp
    from utils_tiny import TINY_PC_RANGE, make_cameras
    from selfocc_tpu.utils.eval_lib import GridOccEvaluator

    cfg = tiny_config(num_cams=2, sem=True)
    model = TPVSegmentor(cfg=cfg.model)
    rs = np.random.RandomState(5)
    imgs = rs.rand(1, 2, *cfg.input_size, 3).astype(np.float32)
    cams = make_cameras(2, cfg.input_size)
    l2i = np.asarray(cams["lidar2img"], np.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, l2i,
                           method="prepare")

    aabb, reso = TINY_PC_RANGE, 1.6   # 12x12x2 grid — not 8-divisible
    ref = jax.jit(lambda v, i, l: model.apply(
        v, i, l, aabb=aabb, resolution=reso, method="forward_occ"))(
        variables, imgs, l2i)
    ev = GridOccEvaluator(model, variables, shard=True)
    assert ev.n_shard == len(jax.devices())
    got = ev.forward_occ(imgs, l2i, aabb, reso)

    for k in ("sdf", "sem", "logits", "xyz"):
        assert k in got and k in ref
        assert np.asarray(got[k]).shape == np.asarray(ref[k]).shape
        # ~1e-6 float reassociation: forward_occ fuses decode+query in ONE
        # jit, the evaluator splits prepare/query into two compilations
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(ref[k]), atol=1e-5)


def test_camera_kwargs_threading():
    """camera_kwargs: {} for plain configs; intrinsic/cam2ego (batched) for
    camera-aware ones, threaded through ChunkedRenderer.prepare (ADVICE r2:
    camera-aware configs could not run eval at all)."""
    import jax.numpy as jnp
    from selfocc_tpu.utils.eval_lib import camera_kwargs

    num_cams = 2
    plain_cfg = tiny_config(num_cams=num_cams)
    cfg = tiny_config(num_cams=num_cams, enc_kw=dict(camera_aware=True))
    rs = np.random.RandomState(3)
    K = np.tile(np.eye(4, dtype=np.float32), (num_cams, 1, 1))
    K[:, 0, 0] = K[:, 1, 1] = 100.0
    c2e = np.tile(np.eye(4, dtype=np.float32), (num_cams, 1, 1))
    c2e[:, :3, 3] = rs.randn(num_cams, 3)
    batch = {"intrinsic": K[None], "cam2ego": c2e[None]}

    assert camera_kwargs(plain_cfg, batch) == {}
    kw = camera_kwargs(cfg, batch)
    assert kw["intrinsic"].shape == (1, num_cams, 4, 4)
    # raw (N, 4, 4) metas normalize to batched
    kw_m = camera_kwargs(cfg, {"intrinsic": K, "cam2ego": c2e})
    assert kw_m["cam2ego"].shape == (1, num_cams, 4, 4)
    with pytest.raises(KeyError, match="cam2ego"):
        camera_kwargs(cfg, {"intrinsic": K})

    model = TPVSegmentor(cfg=cfg.model)
    imgs = rs.rand(1, num_cams, *cfg.input_size, 3).astype(np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32), (1, num_cams, 1, 1))
    variables = model.init(jax.random.PRNGKey(0), imgs, l2i,
                           method="prepare", **kw)
    renderer = ChunkedRenderer(model, variables, shard=False,
                               volume_dtype="float32")
    vol = renderer.prepare(imgs, l2i, **kw)
    assert np.isfinite(np.asarray(vol)).all()


def test_geo_only_keeps_volume_fp32():
    """Depth-family outputs engage geo_only, where the gather is issue-rate
    bound and payload-insensitive (tools/profile_render.py) — the renderer
    must keep the decoded volume fp32 (exactness for free) instead of the
    bf16 speed default, which only pays off on wide-row renders."""
    cfg = tiny_config()
    model = TPVSegmentor(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)
    imgs = np.random.RandomState(1).rand(
        1, cfg.num_cams, *cfg.input_size, 3).astype(np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32), (1, cfg.num_cams, 1, 1))
    variables = model.init(rng, imgs, l2i, method="prepare")

    depth_r = ChunkedRenderer(model, variables, shard=False,
                              outputs=("depth", "max_depth"))
    assert depth_r.volume_dtype == "float32"
    assert np.asarray(depth_r.prepare(imgs, l2i)).dtype == np.float32
    full_r = ChunkedRenderer(model, variables, shard=False,
                             outputs=("depth", "rgb", "sem"))
    assert full_r.volume_dtype == "bfloat16"
    explicit = ChunkedRenderer(model, variables, shard=False,
                               volume_dtype="float32", outputs=("rgb",))
    assert explicit.volume_dtype == "float32"
