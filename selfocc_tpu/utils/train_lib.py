"""Training library: optimizer, LR schedules, train-step builders (single-chip
and data-parallel over a mesh).

Replaces the reference driver internals (``train.py:113-130`` optim wrapper +
scheduler, ``:237-251`` grad-accumulation/clipping, DDP allreduce) with optax +
``shard_map``/``psum`` over an ICI mesh.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..configs.base import Config
from ..losses import MultiLoss
from ..parallel.mesh import DATA_AXIS


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    consts: Any = None   # 'consts' collection: precomputed reference tables

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)


def make_lr_schedule(cfg: Config) -> Callable:
    """Warmup (1e-6 -> lr over warmup_iters) then MultiStepLR decay at
    ``multistep_decay_t`` global steps (reference ``nuscenes_occ.py:14-21``) or
    cosine to zero (``_base_/schedule.py`` CosineLRScheduler path)."""
    total = cfg.steps_per_epoch * cfg.max_epochs

    if cfg.multisteplr:
        boundaries = {int(t): cfg.multistep_decay_rate
                      for t in cfg.multistep_decay_t}
        base = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    else:
        base = optax.cosine_decay_schedule(cfg.lr, max(total - cfg.warmup_iters, 1))

    warmup = optax.linear_schedule(1e-6, cfg.lr, cfg.warmup_iters)

    def sched(step):
        return jnp.where(step < cfg.warmup_iters, warmup(step), base(step))
    return sched


def _backbone_label(path, _):
    keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    return "backbone" if any("img_backbone" in str(k) for k in keys) else "rest"


def make_optimizer(cfg: Config, grad_accumulation: int = 1):
    """AdamW, backbone lr x ``backbone_lr_mult`` (reference
    ``nuscenes_occ.py:23-34``), global-norm clip ``grad_max_norm``
    (``_base_/optimizer.py``), optional gradient accumulation
    (``train.py:237-251``). ``freeze_img_backbone/neck`` zero those subtrees'
    updates (the reference's ``requires_grad_(False)``,
    ``tpv_segmentor.py:29-32``; BN running stats still update)."""
    sched = make_lr_schedule(cfg)

    def scaled(mult):
        return optax.adamw(lambda s: sched(s) * mult,
                           weight_decay=cfg.weight_decay)

    frozen = []
    if cfg.model.freeze_img_backbone:
        frozen.append("img_backbone")
    if cfg.model.freeze_img_neck:
        frozen.append("img_neck")

    def label(path, leaf):
        keys = [str(getattr(k, "key", getattr(k, "name", ""))) for k in path]
        if any(f in k for k in keys for f in frozen):
            return "frozen"
        return _backbone_label(path, leaf)

    # frozen grads are zeroed BEFORE the global-norm clip: the reference's
    # requires_grad_(False) params have no grads at all, so they must not
    # inflate the clip norm applied to the trainable params
    pre = []
    if frozen:
        pre.append(optax.masked(
            optax.set_to_zero(),
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, leaf: label(path, leaf) == "frozen", params)))
    tx = optax.chain(
        *pre,
        optax.clip_by_global_norm(cfg.grad_max_norm),
        optax.multi_transform(
            {"backbone": scaled(cfg.backbone_lr_mult), "rest": scaled(1.0),
             "frozen": optax.set_to_zero()},
            lambda params: jax.tree_util.tree_map_with_path(label, params)),
    )
    if grad_accumulation > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accumulation)
    return tx, sched


def build_loss_inputs(cfg: Config, out: Dict, batch: Dict) -> Dict:
    """Remap head outputs via ``loss_input_convertion`` and merge batch
    supervision tensors (reference ``train.py:232-234``)."""
    inputs = {cfg.loss_input_convertion[k]: out[k]
              for k in cfg.loss_input_convertion if k in out}
    for k in ("curr_imgs", "prev_imgs", "next_imgs", "color_imgs", "sem_gt",
              "img2prevImg", "img2nextImg"):
        if k in batch:
            inputs[k] = batch[k]
    return inputs


def make_loss_fn(model, cfg: Config):
    loss_fn = MultiLoss(cfg.loss_cfgs)
    trans_kw = cfg.model.head.trans_kw

    def compute(params, batch_stats, consts, batch, rng, global_iter):
        drop_rng, fwd_rng = jax.random.split(rng)
        variables = {"params": params, "batch_stats": batch_stats}
        if consts is not None:
            variables["consts"] = consts
        # aug plumbing (reference transform_3d.py:323-377 -> tpv_segmentor
        # flip, bevformer/utils.py:198-204 focal ratios)
        aug_kwargs = {}
        if "flip" in batch:
            aug_kwargs["flip"] = batch["flip"]
        if "focal_ratios_x" in batch:
            aug_kwargs["focal_ratios_x"] = batch["focal_ratios_x"]
            aug_kwargs["focal_ratios_y"] = batch["focal_ratios_y"]
        if cfg.model.encoder.camera_aware:
            aug_kwargs["intrinsic"] = batch["intrinsic"]
            aug_kwargs["cam2ego"] = batch["cam2ego"]
        out, mutated = model.apply(
            variables,
            batch["imgs"], batch["lidar2img"], batch[trans_kw],
            fwd_rng, global_iter, True,
            rngs={"dropout": drop_rng}, mutable=["batch_stats"],
            **aug_kwargs)
        inputs = build_loss_inputs(cfg, out, batch)
        tot, ldict = loss_fn(inputs)
        return tot, (ldict, mutated["batch_stats"])
    return compute


def make_train_step(model, cfg: Config):
    """Single-chip jitted train step."""
    compute = make_loss_fn(model, cfg)

    # donate the incoming state: without it the old AND new params/opt-state
    # are simultaneously live (~1 GB on the flagship), part of the 18 GB
    # train-step peak that OOMed a 16 GB v5e
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        (tot, (ldict, new_bs)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params, state.batch_stats,
                                   state.consts, batch, rng, state.step)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        metrics = dict(ldict, total=tot,
                       grad_norm=optax.global_norm(grads))
        return state, metrics
    return step


def make_mp_train_step(model, cfg: Config, mesh):
    """MODEL-parallel train step: ONE bs=1 sample, params replicated, the
    encoder's TPV-query axis sharded over ``mesh`` (``parallel.mesh.
    maybe_shard`` hints + GSPMD propagation). Numerically identical to the
    single-chip step (gradient-parity-checked in dryrun_multichip); memory
    scales down with the mesh — the route to the reference-exact DENSE
    flagship step (72 GB single-chip) on a v5e slice."""
    compute = make_loss_fn(model, cfg)

    def step(state: TrainState, batch, rng):
        (tot, (ldict, new_bs)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params, state.batch_stats,
                                   state.consts, batch, rng, state.step)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        metrics = dict(ldict, total=tot,
                       grad_norm=optax.global_norm(grads))
        return state, metrics

    jstep = jax.jit(step, donate_argnums=(0,))

    def run(state, batch, rng):
        # the mesh context must be live at trace AND dispatch time for the
        # in-model maybe_shard hints to resolve the "model" axis
        with jax.sharding.set_mesh(mesh):
            return jstep(state, batch, rng)
    return run


def make_dp_train_step(model, cfg: Config, mesh):
    """Data-parallel train step over ``mesh``: each device consumes one bs=1
    sample (the reference's DP regime: 1 sample/GPU, ``train.py:175-176``);
    gradients and metrics are ``psum``ed across ICI (replacing DDP allreduce).
    """
    compute = make_loss_fn(model, cfg)
    from jax.sharding import PartitionSpec as P

    def per_device(state, batch, rng):
        # batch leaves: (n_dev, ...) sharded -> this device sees (1, ...)
        rng = rng[0]
        (tot, (ldict, new_bs)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params, state.batch_stats,
                                   state.consts,
                                   jax.tree_util.tree_map(lambda x: x[0], batch),
                                   rng, state.step)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        tot = jax.lax.pmean(tot, DATA_AXIS)
        ldict = jax.lax.pmean(ldict, DATA_AXIS)
        new_bs = jax.lax.pmean(new_bs, DATA_AXIS)  # SyncBN (train.py:81-83)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        metrics = dict(ldict, total=tot, grad_norm=optax.global_norm(grads))
        return state, metrics

    sharded = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def jit_init_on_cpu(init_fn):
    """Run a flax ``init`` on the CPU backend and transfer the variables to
    the default device. Param initialization only needs shapes + RNG — running
    it on CPU avoids compiling the entire forward graph a second time on the
    accelerator (the init jit traces the same ~full model as the train step).
    """
    default = jax.devices()[0]
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is None or default.platform == "cpu":
        return jax.jit(init_fn)()
    with jax.default_device(cpu):
        variables = jax.jit(init_fn)()
    return jax.device_put(variables, default)


def init_train_state(model, cfg: Config, rng, sample_batch,
                     grad_accumulation: int = 1) -> TrainState:
    trans_kw = cfg.model.head.trans_kw
    variables = jit_init_on_cpu(
        lambda: model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            sample_batch["imgs"], sample_batch["lidar2img"],
            sample_batch[trans_kw], rng, 0, True))
    tx, _ = make_optimizer(cfg, grad_accumulation)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), tx=tx,
        consts=variables.get("consts"))
