"""Scene-level 3D occupancy visualization — TPU rewrite of the reference
``vis_3d_scene.py``: accumulates per-frame occupancy predictions into one
global point cloud using the ego poses (``ego2lidar``/frame transforms),
exporting merged ``.ply``/``.npy`` artifacts (mayavi-free, see ``vis_3d.py``).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from vis_3d import NUSC_COLORS, write_ply


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--py-config", required=True)
    ap.add_argument("--work-dir", default="work_dirs/vis_3d_scene")
    ap.add_argument("--ckpt-path", default="")
    ap.add_argument("--resolution", type=float, default=0.4)
    ap.add_argument("--thresh", type=float, default=0.0)
    ap.add_argument("--sem", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--num-samples", type=int, default=8)
    ap.add_argument("--frame-spacing", type=float, default=2.0,
                    help="synthetic ego displacement per frame")
    ap.add_argument("--seed", type=int, default=42)
    # scene-walk vis dataset (reference *_vis variants): when --imageset
    # exists, walk ONE scene's keyframes via nuScenes_Scene_Vis instead of
    # the training dataset
    ap.add_argument("--imageset", default="",
                    help="nuScenes infos pkl for the scene-walk vis dataset")
    ap.add_argument("--data-path", default="data/nuscenes/")
    ap.add_argument("--scene-token", default=None,
                    help="scene to walk (default: first in the pkl)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from selfocc_tpu.utils.eval_lib import (camera_kwargs,
                                            load_model_for_eval,
                                            restore_eval_variables)
    from selfocc_tpu.utils.logging_util import get_logger

    cfg, model = load_model_for_eval(args.py_config, args.ckpt_path)
    logger = get_logger(args.work_dir)
    os.makedirs(args.work_dir, exist_ok=True)

    if args.imageset and os.path.exists(args.imageset):
        from selfocc_tpu.data.vis_dataset import (VisDatasetWrapper,
                                                  nuScenes_Scene_Vis)
        raw = nuScenes_Scene_Vis(
            data_path=args.data_path, imageset=args.imageset,
            scene_token=args.scene_token, crop_size=tuple(cfg.img_size),
            ego_centric=bool(cfg.train_dataset_args.get("ego_centric")),
            num_cams=cfg.num_cams)
        ds = VisDatasetWrapper(raw, cfg)
        logger.info(f"scene-walk vis: scene {raw.scene_token}, "
                    f"{len(ds)} keyframes")
    else:
        from train import get_dataloader
        ds = get_dataloader(cfg, args.synthetic, phase="val")
    from train import as_arrays
    sample = as_arrays(ds[0])
    variables = restore_eval_variables(model, cfg, sample, args.ckpt_path,
                                       args.seed)
    aabb = list(cfg.model.head.roi_aabb)
    occ_fn = jax.jit(lambda v, i, l, **ck: model.apply(
        v, i, l, aabb=tuple(aabb), resolution=args.resolution,
        method="forward_occ", **ck))

    all_pts, all_colors = [], []
    for i in range(min(args.num_samples, len(ds))):
        batch = as_arrays(ds[i])
        out = occ_fn(variables, batch["imgs"], batch["lidar2img"],
                     **camera_kwargs(cfg, batch))
        occ = np.asarray(out["sdf"]) <= args.thresh
        pts = np.asarray(out["xyz"])[occ]
        # lift frame-local points into the scene frame. Real datasets carry
        # lidar2global chains; the synthetic scene moves the ego along +x.
        if "lidar2global" in batch:
            m = np.asarray(batch["lidar2global"])[0]
            pts = pts @ m[:3, :3].T + m[:3, 3]
        else:
            pts = pts + np.array([args.frame_spacing * i, 0.0, 0.0])
        if args.sem and "sem" in out:
            sem = np.asarray(out["sem"])[occ]
            colors = NUSC_COLORS[np.clip(sem, 0, len(NUSC_COLORS) - 1)]
        else:
            z = pts[:, 2]
            zn = (z - z.min()) / max(np.ptp(z), 1e-9) if len(z) else z
            colors = (np.stack([zn, 1 - zn, np.full_like(zn, 0.5)], -1)
                      * 255).astype(np.uint8)
        all_pts.append(pts)
        all_colors.append(colors)
        logger.info(f"[{i}] accumulated {occ.sum()} voxels")

    pts = np.concatenate(all_pts) if all_pts else np.zeros((0, 3))
    colors = np.concatenate(all_colors) if all_colors else np.zeros((0, 3),
                                                                    np.uint8)
    np.save(f"{args.work_dir}/scene_points.npy", pts)
    write_ply(f"{args.work_dir}/scene.ply", pts, colors)
    logger.info(f"scene cloud: {len(pts)} points -> {args.work_dir}/scene.ply")


if __name__ == "__main__":
    main()
