"""Occupancy IoU/mIoU evaluation driver — TPU rewrite of the reference
``eval_iou.py`` (SURVEY §3.2).

Per sample: ``forward_occ`` evaluates the SDF (+ semantics) on a uniform
metric grid over the AABB, thresholds ``sdf <= --thresh`` into occupancy,
then scores against labels exactly like the reference:

  * Occ3D path (``--occ3d``): transform the 200x200x16 ego grid through
    ``ego2lidar``, trilinear-sample the SDF (and sem-logit) volumes with
    zeros padding / align-corners semantics (reference ``eval_iou.py:
    210-250``), re-threshold, then apply the fixed post-crops
    ``occ[..., 12:] = 0`` + 6-voxel lateral borders (``:228-233``).
    GT from Occ3D ``labels.npz`` (17 = free; ``mask_camera`` honored with
    ``--use-mask``).
  * OpenOccupancy path (no ``--occ3d``): score the native uniform grid
    (default resolution 0.2 -> 512x512x40 over [-51.2,51.2]^2 x [-5,3])
    against the sparse ``.npy`` voxel-coordinate labels scattered into a
    dense grid (reference ``:260-283``), after the z-crops
    ``occ[..., -4:] = 0``/``occ[..., :5] = 0`` + lateral borders
    (``:252-259``). Semantic mIoU scatters the labels' class column into
    the same frame — a deliberate fix of the reference, whose sem path
    drops the class column and scores against raw coordinates
    (``:41, :266-270``).
  * synthetic fallback: procedural GT occupancy grid (pipeline validation).

Predicted semantics are remapped ``openseed->nuscenes`` at eval when the
config trains the sem head in OpenSeeD space (reference ``:249-251``).

Flags mirror the reference: ``--occ3d --resolution --thresh --sem --use-mask
--scene-size --density --save-sem``.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

# reference eval_iou.py:174-196 — (point_cloud_range, expansion) per
# --scene-size under --occ3d; expansion always equals the full range.
OCC3D_SCENES = {
    0: ([-51.2, -51.2, -4.0, 51.2, 51.2, 4.0], [102.4, 102.4, 8.0]),
    1: ([-40.0, -40.0, -2.8, 40.0, 40.0, 3.6], [80.0, 80.0, 6.4]),
    2: ([-40.0, -40.0, -3.1, 40.0, 40.0, 3.9], [80.0, 80.0, 7.0]),
    3: ([-40.0, -40.0, -3.2, 40.0, 40.0, 4.0], [80.0, 80.0, 7.2]),
    4: ([-40.0, -40.0, -1.0, 40.0, 40.0, 5.4], [80.0, 80.0, 6.4]),
    5: ([-51.2, -51.2, -5.0, 51.2, 51.2, 3.0], [102.4, 102.4, 8.0]),
    6: ([-51.2, -51.2, -4.0, 51.2, 51.2, 5.0], [102.4, 102.4, 9.0]),
}
# reference eval_iou.py:174-175 — fixed AABB when scoring OpenOccupancy
OPENOCC_PCR = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]

NUSC_LABELS = [
    "barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
    "pedestrian", "traffic_cone", "trailer", "truck", "driveable_surface",
    "other_flat", "sidewalk", "terrain", "manmade", "vegetation"]


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--py-config", required=True)
    ap.add_argument("--work-dir", default="work_dirs/eval_iou")
    ap.add_argument("--ckpt-path", default="")
    ap.add_argument("--torch-ckpt", default="",
                    help="reference-SelfOcc .pth to import")
    ap.add_argument("--resolution", type=float, default=0.2)
    ap.add_argument("--thresh", type=float, default=0.0)
    ap.add_argument("--occ3d", action="store_true")
    ap.add_argument("--sem", action="store_true")
    ap.add_argument("--use-mask", action="store_true")
    ap.add_argument("--scene-size", type=int, default=0)
    ap.add_argument("--openocc-grid", type=int, nargs=3,
                    default=[512, 512, 40],
                    help="OpenOccupancy label-frame shape (reference fixes "
                         "512x512x40, eval_iou.py:262)")
    ap.add_argument("--density", action="store_true",
                    help="field is a density (occupied = value >= thresh)")
    ap.add_argument("--save-sem", default="")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--num-samples", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-shard", action="store_true",
                    help="disable grid sharding (single-device jit)")
    ap.add_argument("--grid-query", default="gather",
                    choices=["gather", "separable"],
                    help="dense-grid field query: 'gather' (parity default, "
                         "bit-matches the reference grid_sample) or "
                         "'separable' (factored per-axis lerps — same "
                         "interpolant, ~1 ulp fp32 rounding difference, "
                         "far faster on TPU; docs/PERFORMANCE.md)")
    ap.add_argument("--prepare-shard", action="store_true",
                    help="also shard the encoder prepare over the camera "
                         "axis (see eval_depth --prepare-shard)")
    return ap.parse_args()


def read_occ3d_label(path):
    """Occ3D-nuScenes ``labels.npz``: semantics (200,200,16) uint8 with
    17 = free, plus camera/lidar visibility masks (reference
    ``eval_iou.py:26-32``)."""
    data = np.load(path)
    return {"semantics": data["semantics"],
            "mask_camera": data["mask_camera"].astype(bool),
            "mask_lidar": data["mask_lidar"].astype(bool)}


def read_openoccupancy_label(path):
    """OpenOccupancy ``.npy``: rows of occupied voxels. The first three
    columns are the voxel coordinates (reference ``eval_iou.py:34-41``);
    a fourth column, when present, is the nuScenes semantic class (the
    reference DISCARDS it with ``label[:, :3]``, which is why its sem
    mIoU path is broken — see the driver). Returns ``(coords, cls)``
    with ``cls=None`` for 3-column files."""
    label = np.load(path)
    coords = np.asarray(label[:, :3], dtype=np.int64)
    cls = np.asarray(label[:, 3], dtype=np.int64) if label.shape[1] > 3 \
        else None
    return coords, cls


def openocc_gt_grid(coords, shape=(512, 512, 40), cls=None):
    """Scatter sparse OpenOccupancy voxel coords into a dense grid,
    including the reference's axis reorder (``eval_iou.py:261-263``:
    ``gt_occ[:, [1, 2, 0]]`` then used as (dim0, dim1, dim2) indices).
    Binary 0/1 by default; with ``cls`` the per-voxel semantic class is
    scattered instead (0 stays free)."""
    coords = coords[:, [1, 2, 0]]
    gt = np.zeros(shape, dtype=np.int32)
    valid = np.all((coords >= 0) & (coords < np.asarray(shape)), axis=1)
    c = coords[valid]
    gt[c[:, 0], c[:, 1], c[:, 2]] = 1 if cls is None else cls[valid]
    return gt


def occ3d_ego_to_grid_coords(pcr, expansion, ego2lidar):
    """Fractional voxel indices of the 200x200x16 Occ3D ego grid inside the
    uniform prediction volume (reference ``eval_iou.py:151-164, 210-218``:
    grid from ``linspace(-40, 40, 200)`` x ``linspace(-1, 5.4, 16)``,
    transformed by ``ego2lidar``, normalized by ``(p - pcr_min)/expansion``,
    sampled align-corners)."""
    xs = np.linspace(-40.0, 40.0, 200)
    ys = np.linspace(-40.0, 40.0, 200)
    zs = np.linspace(-1.0, 5.4, 16)
    grid = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1)  # X,Y,Z,3
    pts = np.concatenate([grid, np.ones_like(grid[..., :1])], -1)
    pts = (pts @ np.asarray(ego2lidar).T)[..., :3]
    return pts  # metric lidar-frame points, (200,200,16,3)


def resample_volume_at(vol, pts, pcr, expansion):
    """Trilinear-sample a (H,W,D[,C]) lidar-frame volume at metric points
    with torch-``grid_sample`` zeros-padding / align-corners semantics.
    Volume layout (H,W,D) <-> (y,x,z) (see CLAUDE.md); with
    align_corners=True the fractional index is ``norm * (size-1)``."""
    import jax.numpy as jnp
    from selfocc_tpu.ops.interp import trilinear_sample
    H, W, D = vol.shape[:3]
    fy = (pts[..., 1] - pcr[1]) / expansion[1] * (H - 1)
    fx = (pts[..., 0] - pcr[0]) / expansion[0] * (W - 1)
    fz = (pts[..., 2] - pcr[2]) / expansion[2] * (D - 1)
    idx = jnp.asarray(np.stack([fy, fx, fz], -1), jnp.float32)
    v = vol if vol.ndim == 4 else vol[..., None]
    out = np.asarray(trilinear_sample(jnp.asarray(v, jnp.float32), idx,
                                      "zeros"))
    return out if vol.ndim == 4 else out[..., 0]


def apply_occ3d_crops(occ):
    """Fixed Occ3D post-crops (reference ``eval_iou.py:228-233``)."""
    occ = occ.copy()
    occ[..., 12:] = 0
    occ[:6, ...] = 0
    occ[-6:, ...] = 0
    occ[:, :6, :] = 0
    occ[:, -6:, :] = 0
    return occ


def apply_openocc_crops(occ):
    """Fixed non-Occ3D post-crops (reference ``eval_iou.py:252-257``)."""
    occ = occ.copy()
    occ[..., -4:] = 0
    occ[..., :5] = 0
    occ[:6, ...] = 0
    occ[-6:, ...] = 0
    occ[:, :6, :] = 0
    occ[:, -6:, :] = 0
    return occ


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from selfocc_tpu.utils.eval_lib import (camera_kwargs,
                                            load_model_for_eval,
                                            restore_eval_variables)
    from selfocc_tpu.utils.logging_util import get_logger
    from selfocc_tpu.utils.metrics import IoU, MeanIoU, openseed2nuscenes

    cfg, model = load_model_for_eval(args.py_config, args.ckpt_path)
    logger = get_logger(args.work_dir)

    from train import get_dataloader
    ds = get_dataloader(cfg, args.synthetic, phase="val")
    sample = {k: jnp.asarray(v) for k, v in ds[0].items()
              if not isinstance(v, (str, dict))}
    variables = restore_eval_variables(model, cfg, sample, args.ckpt_path,
                                       args.seed,
                                       torch_ckpt=args.torch_ckpt)

    if args.occ3d:
        pcr, expansion = OCC3D_SCENES[args.scene_size]
    else:
        pcr = list(OPENOCC_PCR)
        expansion = [pcr[3] - pcr[0], pcr[4] - pcr[1], pcr[5] - pcr[2]]
    # grid-sharded forward_occ: decode once, query the uniform grid with the
    # point axis sharded over every chip (GridOccEvaluator; single-jit on one
    # device) — the reference's per-frame 512x512x40 query is the eval_iou
    # bottleneck and previously left n-1 chips idle
    from selfocc_tpu.utils.eval_lib import GridOccEvaluator
    evaluator = GridOccEvaluator(model, variables, shard=not args.no_shard,
                                 prepare_shard=args.prepare_shard,
                                 query=args.grid_query)

    # both metrics are MeanIoU instances, dataset_empty_label=0
    # (reference eval_iou.py:138-149)
    iou_metric = MeanIoU([1], 0, ["occupied"], args.use_mask, 0, name="iou")
    miou_metric = MeanIoU(
        list(range(1, 17)), 0, NUSC_LABELS, args.use_mask, 0,
        name="miou") if args.sem else None
    # semantics class space: LUT applied on predictions when the head was
    # trained in OpenSeeD space (reference eval_iou.py:249-251)
    sem_remap = openseed2nuscenes if cfg.sem_space == "openseed" \
        else (lambda s: s)
    # synthetic fallback scoring
    synth_iou = IoU(use_mask=args.use_mask)
    used_synth = False

    n = args.num_samples or len(ds)
    n = min(n, len(ds))
    for i in range(n):
        item = ds[i]
        batch = {k: jnp.asarray(v) for k, v in item.items()
                 if not isinstance(v, (str, dict))}
        volume = evaluator.prepare(batch["imgs"], batch["lidar2img"],
                                   **camera_kwargs(cfg, batch))

        occ3d_targets = None
        if args.occ3d:
            if "occ3d_label_path" in item:
                occ3d_targets = read_occ3d_label(item["occ3d_label_path"])
            elif hasattr(ds, "occ3d_labels"):
                occ3d_targets = ds.occ3d_labels(i)

        if args.occ3d and occ3d_targets is not None:
            ego2lidar = np.asarray(batch.get(
                "ego2lidar", jnp.eye(4)[None]))[0]
            pts = occ3d_ego_to_grid_coords(pcr, expansion, ego2lidar)
            # fused on-device resample: identical math to the staged
            # fetch -> resample_volume_at path (asserted in
            # tests/test_eval_iou.py) without moving the dense ~900 MB
            # logits grid host<->device twice per frame
            outr = evaluator.query_grid_occ3d(volume, tuple(pcr),
                                              args.resolution, pts, pcr,
                                              expansion)
            sdf_r = outr["sdf_r"]
            occ = (sdf_r >= args.thresh) if args.density \
                else (sdf_r <= args.thresh)
            pred_occ_iou = apply_occ3d_crops(occ.astype(np.int32))

            gt_raw = np.asarray(occ3d_targets["semantics"]).copy()
            masks = np.asarray(occ3d_targets["mask_camera"]).astype(bool)
            gt_raw[gt_raw == 17] = 0
            gt_occ_iou = (gt_raw > 0).astype(np.int32)
            iou_metric._after_step(pred_occ_iou, gt_occ_iou,
                                   masks if args.use_mask else None)
            pred_occ_miou = None
            if miou_metric is not None and "sem_r" in outr:
                sem = sem_remap(np.asarray(outr["sem_r"]))
                pred_occ_miou = pred_occ_iou * sem
                miou_metric._after_step(pred_occ_miou, gt_raw,
                                        masks if args.use_mask else None)
        elif not args.occ3d and "openocc_label_path" in item:
            out = evaluator.query_grid(
                volume, tuple(pcr), args.resolution,
                keys=("sdf", "sem") if miou_metric is not None
                else ("sdf",))
            sdf = np.asarray(out["sdf"])
            occ = (sdf >= args.thresh) if args.density \
                else (sdf <= args.thresh)
            pred_occ_iou = apply_openocc_crops(occ.astype(np.int32))
            # the OpenOccupancy label frame is FIXED (512x512x40 in the
            # reference, eval_iou.py:262: gt grid always
            # torch.zeros(512,512,40)); the prediction grid must match or
            # the comparison silently drops labels — the reference would
            # shape-error, we say why
            oshape = tuple(args.openocc_grid)
            if pred_occ_iou.shape != oshape:
                raise SystemExit(
                    f"OpenOccupancy eval needs a {oshape} prediction grid "
                    f"(got {pred_occ_iou.shape}); use --resolution 0.2 with "
                    f"the matching --scene-size AABB (or --openocc-grid)")
            coords, gt_cls = read_openoccupancy_label(
                item["openocc_label_path"])
            # binary grid scattered from coords alone (reference semantics:
            # every labeled row is occupied, even a hypothetical class-0
            # row) — deliberately NOT derived from the class grid below
            gt_occ_iou = openocc_gt_grid(coords, shape=oshape)
            iou_metric._after_step(pred_occ_iou, gt_occ_iou, None)
            pred_occ_miou = None
            if miou_metric is not None:
                sem = sem_remap(np.asarray(out["sem"]))
                pred_occ_miou = pred_occ_iou * sem
                if gt_cls is not None:
                    # the reference's sem scoring here is broken upstream:
                    # it drops the label column at read time (eval_iou.py:
                    # 41 `label[:, :3]`) then passes the raw (n,3)
                    # COORDINATES as mIoU targets (:266-270) — coordinate
                    # values counted as classes. We score the well-defined
                    # dense comparison it was aiming for: scatter the
                    # per-voxel classes into the fixed label frame and
                    # compare like the Occ3D path.
                    gt_occ_miou = openocc_gt_grid(coords, shape=oshape,
                                                  cls=gt_cls)
                    miou_metric._after_step(pred_occ_miou, gt_occ_miou,
                                            None)
                else:
                    logger.warning(
                        "OpenOccupancy label file has no class column; "
                        "binary IoU only (sem predictions still saved "
                        "with --save-sem)")
        elif hasattr(ds, "gt_occupancy"):
            sdf = np.asarray(evaluator.query_grid(
                volume, tuple(pcr), args.resolution, keys=("sdf",))["sdf"])
            occ = (sdf >= args.thresh) if args.density \
                else (sdf <= args.thresh)
            gt = ds.gt_occupancy(pcr, args.resolution)
            tgt_idx = np.stack(np.nonzero(gt), -1)
            synth_iou._after_step(occ.astype(np.float32), tgt_idx)
            used_synth = True
            pred_occ_iou, pred_occ_miou = occ, None
        else:
            logger.warning(f"[{i}] no GT labels available; skipping score")
            continue
        logger.info(f"[{i + 1}/{n}] occupied {pred_occ_iou.mean() * 100:.1f}%")

        if args.save_sem and pred_occ_miou is not None:
            token = str(item.get("token", f"{i:06d}"))
            save_path = os.path.join(args.save_sem, token)
            os.makedirs(save_path, exist_ok=True)
            np.savez_compressed(os.path.join(save_path, "labels.npz"),
                                semantics=pred_occ_miou.astype(np.uint8))

    if used_synth:
        iou = synth_iou._after_epoch(logger=logger)
        logger.info(f"Final IoU: {iou:.2f}")
    else:
        iou_miou, iou_iou = iou_metric._after_epoch(logger=logger)
        logger.info(f"iou_miou: {iou_miou:.4f}, iou_iou: {iou_iou:.4f}")
    if miou_metric is not None and not used_synth:
        miou, occ_iou = miou_metric._after_epoch(logger=logger)
        logger.info(f"miou_miou: {miou:.4f}, miou_iou: {occ_iou:.4f}")


if __name__ == "__main__":
    main()
