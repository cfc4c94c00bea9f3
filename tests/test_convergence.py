"""Training convergence on the exact-geometry synthetic scene (VERDICT r1
weak #6: 'nothing would catch a sign error in a loss gradient').

Trains the tiny config several hundred steps and asserts (a) the total loss
drops materially and (b) the rendered-depth abs_rel against the procedural
scene's exact GT improves vs the random init. Uses a constant-LR variant of
the tiny config (its 90-step decay is too aggressive for a 600-step run).
CPU runtime: ~1 min compile + ~1 min training.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from selfocc_tpu.data.synthetic import SyntheticDataset
from selfocc_tpu.geometry.ray_sampler import RaySampler
from selfocc_tpu.models.segmentor import TPVSegmentor
from selfocc_tpu.ops.interp import bilinear_sample
from selfocc_tpu.utils.eval_lib import ChunkedRenderer, rays_for_cams
from selfocc_tpu.utils.train_lib import init_train_state, make_train_step

from utils_tiny import tiny_config

N_STEPS = 600


def _depth_absrel(cfg, model, state, batch):
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if state.consts is not None:
        variables["consts"] = state.consts
    renderer = ChunkedRenderer(model, variables, chunk=256, shard=False,
                               volume_dtype="float32")
    rh, rw = cfg.num_rays
    rays = RaySampler(ray_sample_mode="fixed", ray_number=(rh, rw),
                      ray_img_size=tuple(cfg.img_size))()
    vol = renderer.prepare(batch["imgs"], batch["lidar2img"])
    origin, direction = rays_for_cams(batch["img2lidar"], rays)
    out = renderer.render(vol, origin, direction)
    depth = out["depth"].reshape(cfg.num_cams, rh, rw)
    loc = np.asarray(batch["depth_loc"])
    gt = np.asarray(batch["depth_gt"])
    mask = np.asarray(batch["depth_mask"])
    errs = []
    for c in range(cfg.num_cams):
        pix = np.stack([loc[c, :, 0] * (rw - 1), loc[c, :, 1] * (rh - 1)], -1)
        pred = np.asarray(bilinear_sample(
            jnp.asarray(depth[c][..., None]), jnp.asarray(pix),
            "border"))[..., 0]
        m = mask[c]
        if m.sum():
            errs.append(np.abs(pred[m] - gt[c][m]) / gt[c][m])
    return float(np.concatenate(errs).mean())


def test_training_improves_loss_and_depth():
    cfg = tiny_config(sem=True, backbone="tiny")
    cfg = dataclasses.replace(cfg, lr=3e-3, multistep_decay_t=(10 * N_STEPS,),
                              warmup_iters=20)
    ds = SyntheticDataset(num_cams=cfg.num_cams, input_size=cfg.input_size,
                          img_size=cfg.img_size, num_classes=cfg.num_classes,
                          length=4)
    batches = [{k: jnp.asarray(v) for k, v in ds[i].items()}
               for i in range(len(ds))]
    model = TPVSegmentor(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, rng, batches[0])
    step = make_train_step(model, cfg)

    absrel_init = _depth_absrel(cfg, model, state, batches[0])

    losses, reprojs = [], []
    for i in range(N_STEPS):
        state, metrics = step(state, batches[i % len(batches)],
                              jax.random.fold_in(rng, i))
        losses.append(float(metrics["total"]))
        reprojs.append(float(
            metrics.get("ReprojLossMonoMultiNewCombine", 0.0)))

    first, last = np.mean(losses[:20]), np.mean(losses[-20:])
    assert np.isfinite(losses).all()
    assert last < 0.75 * first, \
        f"total loss did not drop materially: {first:.4f} -> {last:.4f}"
    # the photometric term must carry real signal (a /256 supervision-scale
    # bug once silenced it at ~1e-4 while the total still 'improved')
    assert np.mean(reprojs[:20]) > 1e-3, \
        f"reproj loss is numerically dead: {np.mean(reprojs[:20]):.2e}"

    absrel_trained = _depth_absrel(cfg, model, state, batches[0])
    assert absrel_trained < 0.9 * absrel_init, (
        f"rendered depth did not improve vs exact synthetic GT: "
        f"{absrel_init:.4f} -> {absrel_trained:.4f}")
