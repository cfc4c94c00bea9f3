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
