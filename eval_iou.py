"""Occupancy IoU/mIoU evaluation driver — TPU rewrite of the reference
``eval_iou.py`` (SURVEY §3.2).

Per sample: ``forward_occ`` evaluates the SDF (+ semantics) on a uniform
metric grid over the AABB, thresholds ``sdf <= --thresh`` into occupancy, then
scores against labels:
  * Occ3D path (``--occ3d``): resample the SDF volume into the 200x200x16 ego
    grid through ``ego2lidar`` trilinear sampling, border-crop, optional
    camera-visibility mask (reference ``eval_iou.py:210-250``).
  * synthetic path: procedural GT occupancy grid (pipeline validation).

Flags mirror the reference: ``--occ3d --resolution --thresh --sem --use-mask
--scene-size --save-sem``.
"""
from __future__ import annotations

import argparse

import numpy as np

# reference eval_iou.py:174-196 scene-size AABBs
SCENE_SIZE_AABBS = {
    0: None,                                   # config default
    1: [-40.0, -40.0, -1.0, 40.0, 40.0, 5.4],
    2: [-51.2, -51.2, -4.0, 51.2, 51.2, 5.0],
}

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
    ap.add_argument("--resolution", type=float, default=0.4)
    ap.add_argument("--thresh", type=float, default=0.0)
    ap.add_argument("--occ3d", action="store_true")
    ap.add_argument("--sem", action="store_true")
    ap.add_argument("--use-mask", action="store_true")
    ap.add_argument("--scene-size", type=int, default=0)
    ap.add_argument("--density", action="store_true",
                    help="field is a density (occupied = value >= thresh)")
    ap.add_argument("--save-sem", default="")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--num-samples", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    return ap.parse_args()


def read_occ3d_label(path):
    """Occ3D-nuScenes ``labels.npz``: semantics (200,200,16) uint8 with
    17 = free, plus camera/lidar visibility masks (reference
    ``eval_iou.py:26-32``)."""
    data = np.load(path)
    return {"semantics": data["semantics"],
            "mask_camera": data["mask_camera"].astype(bool),
            "mask_lidar": data["mask_lidar"].astype(bool)}


def resample_to_occ3d(sdf, sem, aabb, ego2lidar, use_mask):
    """Transform the 200x200x16 Occ3D ego grid through ego2lidar and
    trilinear-sample the SDF/sem volumes (reference ``eval_iou.py:210-250``),
    then border-crop 6 voxels laterally."""
    import jax.numpy as jnp
    from selfocc_tpu.ops.interp import trilinear_sample
    xs = np.linspace(-40 + 0.2, 40 - 0.2, 200)
    ys = np.linspace(-40 + 0.2, 40 - 0.2, 200)
    zs = np.linspace(-1 + 0.2, 5.4 - 0.2, 16)
    grid = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1)  # X,Y,Z,3
    pts = np.concatenate([grid, np.ones_like(grid[..., :1])], -1)
    pts = pts @ np.asarray(ego2lidar).T                     # ego -> lidar
    pts = pts[..., :3]
    H, W, D = sdf.shape
    # lidar meters -> fractional voxel indices of the uniform grid
    fy = (pts[..., 1] - aabb[1]) / (aabb[4] - aabb[1]) * (H - 1)
    fx = (pts[..., 0] - aabb[0]) / (aabb[3] - aabb[0]) * (W - 1)
    fz = (pts[..., 2] - aabb[2]) / (aabb[5] - aabb[2]) * (D - 1)
    idx = jnp.asarray(np.stack([fy, fx, fz], -1))
    sdf_r = np.asarray(trilinear_sample(
        jnp.asarray(sdf)[..., None], idx, "border"))[..., 0]
    sem_r = None
    if sem is not None:
        sem_r = np.asarray(trilinear_sample(
            jnp.asarray(sem).astype(np.float32)[..., None], idx,
            "border"))[..., 0].round().astype(np.int32)
    return sdf_r, sem_r


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from selfocc_tpu.utils.eval_lib import (load_model_for_eval,
                                            restore_eval_variables)
    from selfocc_tpu.utils.logging_util import get_logger
    from selfocc_tpu.utils.metrics import IoU, MeanIoU

    cfg, model = load_model_for_eval(args.py_config, args.ckpt_path)
    logger = get_logger(args.work_dir)

    from train import get_dataloader
    ds = get_dataloader(cfg, args.synthetic)
    sample = {k: jnp.asarray(v) for k, v in ds[0].items()}
    variables = restore_eval_variables(model, cfg, sample, args.ckpt_path,
                                       args.seed,
                                       torch_ckpt=args.torch_ckpt)

    aabb = SCENE_SIZE_AABBS.get(args.scene_size) or list(
        cfg.model.head.roi_aabb)
    occ_fn = jax.jit(lambda v, i, l: model.apply(
        v, i, l, aabb=tuple(aabb), resolution=args.resolution,
        method="forward_occ"))

    iou_metric = IoU(use_mask=args.use_mask)
    miou_metric = MeanIoU(
        class_indices=list(range(1, cfg.num_classes)),
        empty_label=0, label_str=NUSC_LABELS[:cfg.num_classes - 1],
        use_mask=args.use_mask) if args.sem else None

    n = args.num_samples or len(ds)
    n = min(n, len(ds))
    for i in range(n):
        item = ds[i]
        batch = {k: jnp.asarray(v) for k, v in item.items()
                 if not isinstance(v, (str, dict))}
        out = occ_fn(variables, batch["imgs"], batch["lidar2img"])
        sdf = np.asarray(out["sdf"])
        occ = (sdf >= args.thresh) if args.density else (sdf <= args.thresh)
        # z-crop borders (reference eval_iou.py:228-232 analog)
        occ = occ.copy()

        occ3d_targets = None
        if args.occ3d:
            if "occ3d_label_path" in item:
                occ3d_targets = read_occ3d_label(item["occ3d_label_path"])
            elif hasattr(ds, "occ3d_labels"):
                occ3d_targets = ds.occ3d_labels(i)
        if occ3d_targets is not None:
            ego2lidar = np.asarray(batch.get(
                "ego2lidar", jnp.eye(4)[None]))[0]
            sdf_r, sem_r = resample_to_occ3d(
                sdf, np.asarray(out.get("sem")) if args.sem else None,
                aabb, ego2lidar, args.use_mask)
            occ_r = (sdf_r <= args.thresh)
            targets = {k: np.asarray(v) for k, v in occ3d_targets.items()}
            iou_metric._after_step(occ_r, targets, occ3d=True)
            if miou_metric is not None:
                pred_sem = np.where(occ_r, sem_r + 1, 0)
                miou_metric._after_step(pred_sem, targets)
        elif hasattr(ds, "gt_occupancy"):
            gt = ds.gt_occupancy(aabb, args.resolution)
            inter = np.logical_and(occ, gt).sum()
            union = np.logical_or(occ, gt).sum()
            tgt_idx = np.stack(np.nonzero(gt), -1)
            iou_metric._after_step(occ.astype(np.float32), tgt_idx)
        logger.info(f"[{i + 1}/{n}] occ grid {occ.shape}, "
                    f"occupied {occ.mean() * 100:.1f}%")

        if args.save_sem and args.sem:
            np.save(f"{args.save_sem}/sem_{i:04d}.npy",
                    np.asarray(out["sem"]))

    iou = iou_metric._after_epoch(logger=logger)
    logger.info(f"Final IoU: {iou:.2f}")
    if miou_metric is not None:
        miou, occ_iou = miou_metric._after_epoch(logger=logger)
        logger.info(f"mIoU: {miou:.2f}  occupancy IoU: {occ_iou:.2f}")


if __name__ == "__main__":
    main()
