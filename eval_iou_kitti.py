"""SemanticKITTI occupancy evaluation — TPU rewrite of the reference
``eval_iou_kitti.py`` (SURVEY §2.1).

Per sample: ``forward_occ`` on the fixed front-only AABB
``[-25.6, 0, -2.0, 25.6, 51.2, 4.4]`` (reference ``:163``), threshold the SDF,
apply the reference post-crop (``pred[..., 28:]=0`` z-crop + 6-voxel lateral
borders, ``:180-190``), then score binary IoU + SceneRF-style ``SSCMetrics``
against the remapped 256x256x32 voxel labels; ``--sem`` adds mIoU through the
cityscapes->semantickitti LUT.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

KITTI_AABB = (-25.6, 0.0, -2.0, 25.6, 51.2, 4.4)


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--py-config", default="kitti_occ")
    ap.add_argument("--work-dir", default="work_dirs/eval_iou_kitti")
    ap.add_argument("--ckpt-path", default="")
    ap.add_argument("--torch-ckpt", default="",
                    help="reference-SelfOcc .pth to import")
    ap.add_argument("--kitti-root", default="data/kitti")
    ap.add_argument("--resolution", type=float, default=0.2)
    ap.add_argument("--thresh", type=float, default=0.0)
    ap.add_argument("--sem", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--num-samples", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-shard", action="store_true",
                    help="disable grid sharding (single-device jit)")
    return ap.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from selfocc_tpu.data.semantic_kitti_io import read_semantic_kitti_voxels
    from selfocc_tpu.utils.eval_lib import (camera_kwargs,
                                            load_model_for_eval,
                                            restore_eval_variables)
    from selfocc_tpu.utils.logging_util import get_logger
    from selfocc_tpu.utils.metrics import (IoU, MeanIoU,
                                           cityscapes2semantickitti)
    from selfocc_tpu.utils.scenerf_metric import SSCMetrics

    cfg, model = load_model_for_eval(args.py_config, args.ckpt_path)
    logger = get_logger(args.work_dir)

    from train import get_dataloader
    ds = get_dataloader(cfg, args.synthetic, phase="val")
    from train import as_arrays
    sample = as_arrays(ds[0])
    variables = restore_eval_variables(model, cfg, sample, args.ckpt_path,
                                       args.seed,
                                       torch_ckpt=args.torch_ckpt)

    # grid-sharded forward_occ (see eval_iou.py / GridOccEvaluator)
    from selfocc_tpu.utils.eval_lib import GridOccEvaluator
    evaluator = GridOccEvaluator(model, variables,
                                 shard=not getattr(args, "no_shard", False))

    iou_metric = IoU()
    scenerf_metric = SSCMetrics(n_classes=20)
    miou_metric = MeanIoU(
        class_indices=list(range(1, 20)), empty_label=0,
        label_str=[f"c{i}" for i in range(1, 20)]) if args.sem else None

    n = args.num_samples or len(ds)
    n = min(n, len(ds))
    for i in range(n):
        batch = as_arrays(ds[i])
        out = evaluator.forward_occ(batch["imgs"], batch["lidar2img"],
                                    KITTI_AABB, args.resolution,
                                    keys=("sdf", "sem") if args.sem
                                    else ("sdf",),
                                    **camera_kwargs(cfg, batch))
        pred_occ = (np.asarray(out["sdf"]) <= args.thresh).astype(np.int32)

        # reference post-crop (eval_iou_kitti.py:180-190)
        pred_occ[..., 28:] = 0
        pred_occ[-6:, ...] = 0
        pred_occ[:, :6, :] = 0
        pred_occ[:, -6:, :] = 0

        token = batch.get("token")
        seq = batch.get("sequence")
        if not args.synthetic and token is not None:
            label_path = os.path.join(
                args.kitti_root, "dataset/sequences", str(seq), "voxels",
                f"{token}.label")
            invalid_path = label_path.replace(".label", ".invalid")
            gt_raw = read_semantic_kitti_voxels(label_path, invalid_path)
            gt_raw = np.flip(gt_raw, 1)                     # (:174)
            gt = gt_raw.copy()
            gt[gt == 255] = 0
            gt_idx = np.stack(np.nonzero(gt), -1)
            iou_metric._after_step(pred_occ, gt_idx)
            scenerf_metric.add_batch(pred_occ[None], gt_raw[None])
            if miou_metric is not None:
                sem = cityscapes2semantickitti(np.asarray(out["sem"]))
                miou_metric._after_step(pred_occ * sem, gt_raw,
                                        gt_raw != 255)
        elif hasattr(ds, "gt_occupancy"):
            gt = ds.gt_occupancy(list(KITTI_AABB), args.resolution)
            gt = gt[:pred_occ.shape[0], :pred_occ.shape[1], :pred_occ.shape[2]]
            gt_idx = np.stack(np.nonzero(gt), -1)
            iou_metric._after_step(pred_occ, gt_idx)
            scenerf_metric.add_batch(pred_occ[None], gt[None].astype(np.int32))
        logger.info(f"[{i + 1}/{n}] occupied {pred_occ.mean() * 100:.2f}%")

    iou = iou_metric._after_epoch(logger=logger)
    stats = scenerf_metric.get_stats()
    logger.info(f"IoU: {iou:.2f}")
    logger.info(f"SceneRF iou: {stats['iou']:.4f} precision: "
                f"{stats['precision']:.4f} recall: {stats['recall']:.4f}")
    if miou_metric is not None:
        miou, occ_iou = miou_metric._after_epoch(logger=logger)
        logger.info(f"mIoU: {miou:.2f} IoU: {occ_iou:.2f}")


if __name__ == "__main__":
    main()
