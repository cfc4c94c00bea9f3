"""Shared eval-driver machinery: model loading, chunked/sharded rendering.

Implements the reference eval call stacks (SURVEY §3.2-3.4) the TPU way:
``prepare`` decodes the field once per frame, then the 2.16M-ray render runs
as jit-compiled fixed-size chunks — optionally sharded across all chips over
the ray axis (`shard_map`-style NamedSharding), the single biggest TPU win
vs the reference's serialized 90k-ray loop (~90 min on GPU,
``eval_depth.py:242`` / README).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.base import Config
from ..configs.experiments import get_config
from ..geometry.projection import rays_from_img2lidar
from ..geometry.ray_sampler import RaySampler
from ..models.segmentor import TPVSegmentor


def load_model_for_eval(config_name: str, ckpt_path: str = ""):
    """Build the model + variables (random init when no checkpoint — enough
    for pipeline validation; real checkpoints restore via Orbax)."""
    cfg = get_config(config_name)
    model = TPVSegmentor(cfg=cfg.model)
    return cfg, model


def enable_max_depth(cfg):
    """Force ``return_max_depth`` on (the reference sets it in every
    eval driver that scores the argmax-weight render, e.g.
    ``eval_novel_depth.py:70``). Output-only flag — the param tree is
    unchanged, so checkpoints restore as-is. Returns (cfg, model)."""
    if not cfg.model.head.return_max_depth:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, head=dataclasses.replace(
                cfg.model.head, return_max_depth=True)))
    return cfg, TPVSegmentor(cfg=cfg.model)


def init_variables(model, cfg: Config, sample: Dict, seed: int = 42):
    from .train_lib import jit_init_on_cpu
    rng = jax.random.PRNGKey(seed)
    trans_kw = cfg.model.head.trans_kw
    return jit_init_on_cpu(lambda: model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        sample["imgs"], sample["lidar2img"], sample[trans_kw],
        rng, 0, True))


def restore_eval_variables(model, cfg, sample, ckpt_path: str, seed=42,
                           torch_ckpt: str = ""):
    """Random-init then restore params/batch_stats from an Orbax dir when
    given (reference ``load_from`` path, ``train.py:164-170``).

    ``torch_ckpt`` instead overlays a reference-SelfOcc ``.pth``
    (``ref_import.convert_reference_state_dict``) — covers backbone, neck,
    lifter, encoder, deviation; unmatched keys are logged."""
    variables = init_variables(model, cfg, sample, seed)
    if torch_ckpt:
        import logging
        import torch
        from .ref_import import convert_reference_state_dict, merge_imported
        sd = torch.load(torch_ckpt, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}
        params, stats, unmatched = convert_reference_state_dict(sd)
        if unmatched:
            logging.getLogger("selfocc").warning(
                "torch ckpt: %d keys not imported (first: %s)",
                len(unmatched), unmatched[:5])
        return merge_imported(variables, params, stats)
    if ckpt_path:
        from .train_lib import TrainState, make_optimizer
        from .checkpoint import load_checkpoint
        import optax
        tx, _ = make_optimizer(cfg)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]), tx=tx)
        restored = load_checkpoint(ckpt_path, state)
        if restored is not None:
            state = restored[0]
            new_vars = {"params": state.params,
                        "batch_stats": state.batch_stats}
            if "consts" in variables:   # recomputable tables, not in ckpt
                new_vars["consts"] = variables["consts"]
            variables = new_vars
    return variables


def camera_kwargs(cfg: Config, batch: Dict) -> Dict:
    """``intrinsic``/``cam2ego`` kwargs for CameraAwareSE configs.

    Returns {} unless ``cfg.model.encoder.camera_aware``; then the batch (or
    metas dict) MUST carry both params — the reference encoder consumes
    ``metas['intrinsic']/['cam2ego']`` unconditionally when camera-aware
    (``tpvformer_encoder.py:106-116``), and every eval/vis driver threads
    them through prepare/forward_occ via this helper."""
    if not cfg.model.encoder.camera_aware:
        return {}
    missing = [k for k in ("intrinsic", "cam2ego") if k not in batch]
    if missing:
        raise KeyError(
            f"camera_aware=True but the dataset item carries no {missing}; "
            "camera-aware eval needs intrinsic+cam2ego in the batch/metas "
            "(data/wrapper.py forwards them when the dataset provides them)")
    K = jnp.asarray(batch["intrinsic"], jnp.float32)
    c2e = jnp.asarray(batch["cam2ego"], jnp.float32)
    # drivers pass either batched (B, N, 4, 4) wrapper arrays or raw
    # per-frame (N, 4, 4) metas — normalize to batched
    if K.ndim == 3:
        K, c2e = K[None], c2e[None]
    return {"intrinsic": K, "cam2ego": c2e}


class ChunkedRenderer:
    """Renders a full fixed ray grid in jitted chunks against a prepared
    volume; optionally shards each chunk's ray axis over all devices."""

    def __init__(self, model, variables, chunk: int = 32768,
                 shard: bool = True, volume_dtype: str = "bfloat16",
                 outputs=("depth", "rgb", "acc", "sem"),
                 prepare_shard: bool = False):
        self.model = model
        self.variables = variables
        self.chunk = chunk
        # camera-axis model parallelism for prepare (backbone/neck/encoder
        # value computation are per-camera; GSPMD shards them and inserts
        # the all-gathers the cross-attention needs). Off by default: exact
        # numerics but only profitable when prepare dominates and cameras
        # divide the mesh; bit-equality vs unsharded is tested on the CPU
        # mesh (tests/test_eval_lib_shard.py).
        self.prepare_shard = prepare_shard and len(jax.devices()) > 1
        # the render is HBM-gather-bound; bf16 volumes triple throughput
        # (alpha/compositing math stays fp32 — see ops/interp.py)
        self.volume_dtype = volume_dtype
        # CRITICAL: return ONLY the requested outputs from the jit — XLA then
        # dead-code-eliminates the unused chains (second_grad's 6 extra fat
        # gathers, SH color eval, 21-class softmax compositing...). Returning
        # the full head dict and discarding host-side cost 25x on the
        # flagship depth eval (8.9k vs 222k rays/s, measured).
        self.outputs = tuple(outputs)
        # When every requested output is channel-0-derived (depth/weights/
        # geometry), render geo_only: the sample gather reads just the sdf
        # channel instead of the full [sdf|SH|sem] stack. DCE alone can't do
        # this — the corner-bundled volume fuses all channels into one fat
        # gather row, so unused channels still cost HBM bandwidth (~2x on
        # the flagship depth eval, docs/PERFORMANCE.md).
        geo_outputs = {"depth", "weights", "acc", "fars", "inv_s", "sdf",
                       "sigma", "eik_grad", "ts", "deltas", "normal_vis",
                       "surface_sdf", "max_depth"}
        geo_only = set(self.outputs) <= geo_outputs
        if geo_only and self.volume_dtype == "bfloat16":
            # measured (tools/profile_render.py, v5e): the geo_only render is
            # bound by gather ISSUE rate (~145M rows/s) and is payload- AND
            # index-insensitive at its 8-channel row size — fp32 rows render
            # at the SAME speed as bf16. So depth-family evals keep the
            # decoded volume in fp32: bf16 rounding bought nothing here, and
            # dropping it removes the one deviation the depth-parity path
            # still had. Wide-row renders (sem/SH outputs) stay bf16 — there
            # the halved payload IS the measured 2-3x (docs/PERFORMANCE.md).
            self.volume_dtype = "float32"
        # variables/volume are jit ARGUMENTS (closure capture would bake the
        # decoded volume + params into the compiled module as constants)
        def _render_fn(v, vol, o, d):
            r = model.apply(v, vol, o, d, geo_only=geo_only,
                            method="render_rays")
            return {k: r[k] for k in self.outputs if k in r}
        if shard and len(jax.devices()) > 1:
            from ..parallel.mesh import batch_sharded, make_mesh, replicated
            mesh = make_mesh()
            self._render = jax.jit(
                _render_fn,
                in_shardings=(replicated(mesh), replicated(mesh),
                              batch_sharded(mesh), batch_sharded(mesh)))
        else:
            self._render = jax.jit(_render_fn)

    def prepare(self, imgs, lidar2img, flip=False, intrinsic=None,
                cam2ego=None):
        """Backbone -> encoder -> decoded volume (cast to volume_dtype).

        One jit per (camera-aware?, flip?, n_cam) signature — mixing call
        shapes on the same renderer must not collide with a baked first-call
        signature. ``flip=True`` runs the backbone's mirrored path
        (flip-TTA, reference eval_depth.py:168-183)."""
        if not hasattr(self, "_prepare_fns"):
            self._prepare_fns = {}
        cam_aware = intrinsic is not None
        key = (cam_aware, bool(flip), int(imgs.shape[1]))
        if key not in self._prepare_fns:
            dt = jnp.dtype(self.volume_dtype)
            shard_kw = {}
            if self.prepare_shard:
                from ..parallel.mesh import make_mesh
                from jax.sharding import NamedSharding, PartitionSpec as P
                # imgs (B, N_cam, H, W, 3): shard the camera axis over the
                # largest submesh that divides it (pjit needs divisibility);
                # the decoded volume comes back replicated for the
                # ray-sharded render
                n_cam = int(imgs.shape[1])
                n_dev = len(jax.devices())
                n = max(k for k in range(1, n_dev + 1) if n_cam % k == 0)
                mesh = make_mesh(jax.devices()[:n])
                cam_sh = NamedSharding(mesh, P(None, "data"))
                rep = NamedSharding(mesh, P())
                shard_kw = dict(
                    in_shardings=((rep,) + (cam_sh, rep)
                                  + (rep, rep) * cam_aware),
                    out_shardings=rep)
            do_flip = bool(flip)
            if cam_aware:
                # CameraAwareSE configs need the camera params in prepare
                self._prepare_fns[key] = jax.jit(
                    lambda v, i, l, K, c2e: self.model.apply(
                        v, i, l, flip=do_flip, intrinsic=K, cam2ego=c2e,
                        method="prepare").astype(dt), **shard_kw)
            else:
                self._prepare_fns[key] = jax.jit(
                    lambda v, i, l: self.model.apply(
                        v, i, l, flip=do_flip,
                        method="prepare").astype(dt), **shard_kw)
        if cam_aware:
            return self._prepare_fns[key](self.variables, imgs, lidar2img,
                                          intrinsic, cam2ego)
        return self._prepare_fns[key](self.variables, imgs, lidar2img)

    def render(self, volume, origin, direction) -> Dict[str, np.ndarray]:
        """origin/direction: (R, 3). Returns host-side dict of per-ray
        outputs (depth, rgb, acc, sem?)."""
        R = origin.shape[0]
        pad = (-R) % self.chunk
        o = jnp.pad(origin, ((0, pad), (0, 0)))
        d = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)
        n_chunks = o.shape[0] // self.chunk
        outs = []
        for i in range(n_chunks):
            outs.append(self._render(
                self.variables, volume,
                o[i * self.chunk:(i + 1) * self.chunk],
                d[i * self.chunk:(i + 1) * self.chunk]))
        res = {}
        for k in outs[0]:
            res[k] = np.concatenate(
                [np.asarray(jax.device_get(x[k])) for x in outs])[:R]
        return res


class GridOccEvaluator:
    """``forward_occ`` over all chips (VERDICT r3 #2): decode the field once
    per frame (optionally camera-sharded), then query the uniform occupancy
    grid with the flattened point axis sharded across the mesh — the mirror
    of the ray-sharded ``ChunkedRenderer`` for the eval_iou call stack
    (reference ``eval_iou.py:166-289``). Falls back to a single-device jit
    on one chip. Sharded == unsharded is asserted on the CPU mesh
    (``tests/test_eval_lib_shard.py``) and in ``dryrun_multichip``."""

    def __init__(self, model, variables, shard: bool = True,
                 prepare_shard: bool = False, query: str = "gather"):
        self.model = model
        self.variables = variables
        # "gather" = the parity default (8 corner-gather rows per point,
        # bit-matches the reference's grid_sample path); "separable" = the
        # factored per-axis query (``TPVSDFField.query_geo_uniform``): same
        # interpolant, ~1 ulp fp32 rounding difference, whole-axis
        # bandwidth instead of gather rows. Separable runs as one
        # replicated program (no grid sharding — it is already far off the
        # gather issue-rate ceiling that sharding divides).
        assert query in ("gather", "separable"), query
        self.query = query
        # the occupancy numbers feed IoU parity claims: keep the decoded
        # volume fp32 (unlike the depth render's bf16 fast path)
        self._prep = ChunkedRenderer(model, variables, shard=False,
                                     volume_dtype="float32",
                                     prepare_shard=prepare_shard)

        def _occ_fn(v, vol, xyz):
            return model.apply(v, vol, xyz, method="occ_from_volume")

        def _occ_sep_fn(v, vol, xs, ys, zs):
            return model.apply(v, vol, xs, ys, zs, method="occ_uniform")

        if shard and len(jax.devices()) > 1:
            from ..parallel.mesh import batch_sharded, make_mesh, replicated
            mesh = make_mesh()
            self.n_shard = int(mesh.devices.size)
            self._occ = jax.jit(
                _occ_fn,
                in_shardings=(replicated(mesh), replicated(mesh),
                              batch_sharded(mesh)))
        else:
            self.n_shard = 1
            self._occ = jax.jit(_occ_fn)
        self._occ_sep = jax.jit(_occ_sep_fn)
        self._occ3d_jits: Dict = {}
        self._occ3d_sep = None

    def prepare(self, imgs, lidar2img, flip=False, intrinsic=None,
                cam2ego=None):
        return self._prep.prepare(imgs, lidar2img, flip=flip,
                                  intrinsic=intrinsic, cam2ego=cam2ego)

    def _axes(self, aabb, resolution):
        """Per-axis uniform metric coordinates — identical linspace math to
        ``NeuSHead.get_uniform_sdf``."""
        xs = jnp.linspace(aabb[0], aabb[3],
                          int((aabb[3] - aabb[0]) / resolution))
        ys = jnp.linspace(aabb[1], aabb[4],
                          int((aabb[4] - aabb[1]) / resolution))
        zs = jnp.linspace(aabb[2], aabb[5],
                          int((aabb[5] - aabb[2]) / resolution))
        return xs, ys, zs

    def _flat_grid(self, aabb, resolution):
        """Uniform metric grid (see ``_axes``), flattened with the point
        axis padded to the shard count."""
        xs, ys, zs = self._axes(aabb, resolution)
        H, W, D = ys.shape[0], xs.shape[0], zs.shape[0]
        xyz = jnp.stack(jnp.meshgrid(ys, xs, zs, indexing="ij"), axis=-1)
        xyz = xyz[..., [1, 0, 2]]
        flat = xyz.reshape(-1, 3)
        n = flat.shape[0]
        pad = (-n) % self.n_shard
        if pad:
            flat = jnp.concatenate([flat, flat[-1:].repeat(pad, 0)], 0)
        return flat, (H, W, D), n, xyz

    def query_grid(self, volume, aabb, resolution,
                   keys=None) -> Dict[str, np.ndarray]:
        """Uniform-grid query (see ``_flat_grid``), cropped back to the
        unpadded grid. ``keys`` selects which outputs cross the host link —
        the dense (512,512,40,C) logits grid is ~900 MB fp32 and the axon
        tunnel makes its fetch the eval_iou frame bottleneck
        (``tools/probe_occ_split.py``); the OpenOccupancy scoring path only
        needs ``("sdf", "sem")``."""
        if self.query == "separable":
            xs, ys, zs = self._axes(aabb, resolution)
            out = self._occ_sep(self.variables, volume, xs, ys, zs)
            if keys is not None:
                out = {k: out[k] for k in keys if k in out}
            res = {k: np.asarray(jax.device_get(self._shrink(k, v)))
                   for k, v in out.items()}
            xyz = jnp.stack(jnp.meshgrid(ys, xs, zs, indexing="ij"),
                            axis=-1)[..., [1, 0, 2]]
            res["xyz"] = np.asarray(xyz)
            return res
        flat, (H, W, D), n, xyz = self._flat_grid(aabb, resolution)
        out = self._occ(self.variables, volume, flat)
        if keys is not None:
            out = {k: out[k] for k in keys if k in out}
        res = {k: np.asarray(jax.device_get(self._shrink(k, v)))[:n].reshape(
            (H, W, D) + tuple(v.shape[1:])) for k, v in out.items()}
        res["xyz"] = np.asarray(xyz)
        return res

    @staticmethod
    def _shrink(key, v):
        """Fetch the dense argmax grid as uint8 (classes < 256 always) —
        the int32 sem grid is 42 MB/frame through the axon tunnel."""
        return v.astype(jnp.uint8) if key == "sem" else v

    def _occ3d_jit(self, grid_shape):
        """Fused forward_occ + Occ3D ego-grid resample, compiled per dense
        grid shape: uniform-grid query -> (H,W,D[,C]) volumes -> trilinear
        resample at fractional ego-grid indices -> argmax semantics, all on
        device. The staged path (reference ``eval_iou.py:210-250``) fetches
        the dense logits grid to host and re-uploads it for
        ``resample_volume_at`` — two ~900 MB tunnel crossings per frame;
        this jit moves only the (200,200,16) results."""
        if grid_shape not in self._occ3d_jits:
            H, W, D = grid_shape
            model = self.model
            n = H * W * D

            def fn(v, vol, flat, idx):
                from ..ops.interp import trilinear_sample
                out = model.apply(v, vol, flat, method="occ_from_volume")
                sdf = out["sdf"][:n].reshape(H, W, D)[..., None]
                res = {"sdf_r": trilinear_sample(sdf, idx, "zeros")[..., 0]}
                if "logits" in out:
                    logits = out["logits"][:n].reshape(H, W, D, -1)
                    res["sem_r"] = jnp.argmax(
                        trilinear_sample(logits, idx, "zeros"), axis=-1)
                return res

            if self.n_shard > 1:
                from ..parallel.mesh import (batch_sharded, make_mesh,
                                             replicated)
                mesh = make_mesh()
                self._occ3d_jits[grid_shape] = jax.jit(
                    fn, in_shardings=(replicated(mesh), replicated(mesh),
                                      batch_sharded(mesh),
                                      replicated(mesh)))
            else:
                self._occ3d_jits[grid_shape] = jax.jit(fn)
        return self._occ3d_jits[grid_shape]

    def query_grid_occ3d(self, volume, aabb, resolution, pts, pcr,
                         expansion) -> Dict[str, np.ndarray]:
        """Occ3D-path query: uniform grid + resample at metric lidar-frame
        points ``pts`` (``eval_iou.occ3d_ego_to_grid_coords``) in one device
        program. Index math is identical to ``eval_iou.resample_volume_at``
        (align-corners, (H,W,D) <-> (y,x,z) layout); parity with the staged
        fetch->resample path is asserted in ``tests/test_eval_iou.py``."""
        xs, ys, zs = self._axes(aabb, resolution)
        H, W, D = ys.shape[0], xs.shape[0], zs.shape[0]
        pts = np.asarray(pts)
        fy = (pts[..., 1] - pcr[1]) / expansion[1] * (H - 1)
        fx = (pts[..., 0] - pcr[0]) / expansion[0] * (W - 1)
        fz = (pts[..., 2] - pcr[2]) / expansion[2] * (D - 1)
        idx = jnp.asarray(np.stack([fy, fx, fz], -1), jnp.float32)
        if self.query == "separable":
            if self._occ3d_sep is None:
                model = self.model

                def sep_fn(v, vol, sxs, sys, szs, sidx):
                    from ..ops.interp import trilinear_sample
                    out = model.apply(v, vol, sxs, sys, szs,
                                      method="occ_uniform")
                    res = {"sdf_r": trilinear_sample(
                        out["sdf"][..., None], sidx, "zeros")[..., 0]}
                    if "logits" in out:
                        res["sem_r"] = jnp.argmax(trilinear_sample(
                            out["logits"], sidx, "zeros"), axis=-1)
                    return res

                self._occ3d_sep = jax.jit(sep_fn)
            out = self._occ3d_sep(self.variables, volume, xs, ys, zs, idx)
            return {k: np.asarray(jax.device_get(v))
                    for k, v in out.items()}
        flat, (H, W, D), _, _ = self._flat_grid(aabb, resolution)
        out = self._occ3d_jit((H, W, D))(self.variables, volume, flat, idx)
        return {k: np.asarray(jax.device_get(v)) for k, v in out.items()}

    def forward_occ(self, imgs, lidar2img, aabb, resolution, flip=False,
                    intrinsic=None, cam2ego=None,
                    keys=None) -> Dict[str, np.ndarray]:
        """prepare + query_grid — drop-in for the single-jit
        ``TPVSegmentor.forward_occ`` eval call."""
        volume = self.prepare(imgs, lidar2img, flip=flip,
                              intrinsic=intrinsic, cam2ego=cam2ego)
        return self.query_grid(volume, aabb, resolution, keys=keys)


def prep_input_imgs(input_imgs, cfg: Config):
    """Val-pipeline (Normalize -> RandomScale(cfg.scale_rate) -> Pad div 32)
    on a list of raw HWC images -> (1, N, H, W, 3) network input — for raw
    eval datasets that bypass the TemporalDatasetWrapper (the reference wraps
    them in the standard val wrapper, ``dataset/__init__.py:20-106``)."""
    import numpy as np
    from ..data.transforms import (IMG_NORM, NormalizeMultiviewImage,
                                   PadMultiViewImage,
                                   RandomScaleImageMultiViewImage,
                                   forward_aug)
    transforms = [NormalizeMultiviewImage(**IMG_NORM)]
    if cfg.scale_rate != 1:
        transforms.append(RandomScaleImageMultiViewImage([cfg.scale_rate]))
    transforms.append(PadMultiViewImage(size_divisor=32))
    imgs, _ = forward_aug(list(input_imgs), {}, transforms)
    return jnp.asarray(np.stack(imgs).astype(np.float32))[None]


def eval_ray_grid(cfg: Config, num_rays=None):
    """Fixed eval ray grid (reference ``modify_for_eval`` NUM_RAYS,
    ``utils/config_tools.py:1-14``)."""
    num_rays = num_rays or cfg.eval_num_rays
    sampler = RaySampler(ray_sample_mode="fixed", ray_number=tuple(num_rays),
                         ray_img_size=tuple(cfg.img_size))
    return sampler()


def eval_trans_mats(batch, cfg: Config):
    """Matrices the eval render projects rays through: ``trans_kw_eval``
    when set, else ``trans_kw`` (reference ``Img2LiDAR`` eval-key selection,
    ``model/head/nerfacc_head/img2lidar.py:21,31-35``), falling back to
    ``img2lidar`` when the eval batch doesn't carry the temporal key — with
    the eval dataset's ``cur_prob=1`` the temporal and current matrices
    coincide, so the fallback is exact."""
    h = cfg.model.head
    kw = h.trans_kw_eval or h.trans_kw
    if isinstance(kw, (list, tuple)):
        kw = kw[0]
    return batch[kw] if kw in batch else batch["img2lidar"]


def rays_for_cams(img2lidar, rays):
    """(1, N, 4, 4) + (R, 2) -> flat origins/directions (N*R, 3)."""
    origin, direction = rays_from_img2lidar(img2lidar, rays)
    _, N, R = direction.shape[:3]
    origin = jnp.broadcast_to(origin[0, :, None, :], (N, R, 3)).reshape(-1, 3)
    return origin, direction[0].reshape(-1, 3)


# ------------------------------------------------------------ novel-view eval
def novel_eval_first_sample(ds, cfg, real: bool):
    """Init-shaped sample dict from either a raw novel-eval dataset
    (``(input_imgs, _, metas)`` tuples) or a canonical-batch dataset."""
    if real:
        input_imgs, _, metas0 = ds[0]
        return {"imgs": prep_input_imgs(input_imgs, cfg),
                "lidar2img": jnp.asarray(metas0["lidar2img"],
                                         jnp.float32)[None],
                cfg.model.head.trans_kw: jnp.asarray(
                    metas0["img2lidar"], jnp.float32)[None]}
    return {k: jnp.asarray(v) for k, v in ds[0].items()
            if not isinstance(v, (str, dict))}


def run_novel_depth_eval(ds, real: bool, cfg, renderer, logger,
                         num_samples: int = 0, offsets=(-2.0, -1.0, 1.0, 2.0),
                         depth_key: str = "depth"):
    """Shared novel-view depth loop for ``eval_novel_depth[_kitti]``
    (reference ``eval_novel_depth.py:133-229``): decode the field once per
    sample, render depth from each temporal neighbor's poses
    (``render_img2lidar = temImg2lidars[src]``), and bucket depth errors by
    ``ceil(source_distance)``. ``depth_key`` selects the scored render —
    "depth" or "max_depth" (the reference's ``--depth-tgt raw|max``,
    ``eval_novel_depth.py:174-177``). Returns the bucket dict and logs the
    table."""
    import math
    from collections import defaultdict

    from ..ops.interp import bilinear_sample
    from .metrics import cal_depth_metric

    rays = eval_ray_grid(cfg)
    rh, rw = cfg.eval_num_rays
    buckets = defaultdict(lambda: defaultdict(list))
    n = min(num_samples or len(ds), len(ds))

    def score(depth, loc, gt_all, mask_all, bucket):
        pix = np.stack([loc[..., 0] * (rw - 1), loc[..., 1] * (rh - 1)], -1)
        for c in range(cfg.num_cams):
            m = np.asarray(mask_all[c]).astype(bool)
            if m.sum() == 0:
                continue
            pred = np.asarray(bilinear_sample(
                jnp.asarray(depth[c][..., None]), jnp.asarray(pix[c]),
                "border"))[..., 0][m]
            for k, v in cal_depth_metric(pred,
                                         np.asarray(gt_all[c])[m]).items():
                buckets[bucket][k].append(v)

    for i in range(n):
        if real:
            input_imgs, _, metas = ds[i]
            imgs = prep_input_imgs(input_imgs, cfg)
            lidar2img = jnp.asarray(metas["lidar2img"], jnp.float32)[None]
            volume = renderer.prepare(imgs, lidar2img,
                                      **camera_kwargs(cfg, metas))
            for j, tem in enumerate(metas["temImg2lidars"]):
                origin, direction = rays_for_cams(
                    jnp.asarray(tem, jnp.float32)[None], rays)
                depth = renderer.render(volume, origin, direction)[
                    depth_key].reshape(cfg.num_cams, rh, rw)
                score(depth, np.asarray(metas["depth_loc"][j]),
                      metas["depth_gt"][j], metas["depth_mask"][j],
                      math.ceil(metas["frame_dists"][j]))
            logger.info(f"[{i + 1}/{n}] rendered "
                        f"{len(metas['temImg2lidars'])} novel views")
            continue
        batch = {k: jnp.asarray(v) for k, v in ds[i].items()
                 if not isinstance(v, (str, dict))}
        volume = renderer.prepare(batch["imgs"], batch["lidar2img"],
                                  **camera_kwargs(cfg, batch))
        if not hasattr(ds, "novel_view_sample"):
            continue
        for off in offsets:
            nb = ds.novel_view_sample(i, off)
            origin, direction = rays_for_cams(
                jnp.asarray(nb["temImg2lidar"]), rays)
            depth = renderer.render(volume, origin, direction)[
                depth_key].reshape(cfg.num_cams, rh, rw)
            score(depth, nb["depth_loc"], nb["depth_gt"], nb["depth_mask"],
                  math.ceil(nb["frame_dist"]))
        logger.info(f"[{i + 1}/{n}] rendered {len(offsets)} novel views")

    logger.info(("{:>8} | " * 8).format(
        "dist", "abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"))
    for b in sorted(buckets):
        vals = [np.mean(buckets[b][k]) for k in
                ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")]
        logger.info((f"{b:>8} | " + "{: 8.3f} | " * 7).format(*vals))
    return buckets
