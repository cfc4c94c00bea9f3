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
