"""2D visualization driver — TPU rewrite of the reference ``vis_pics.py``:
renders per-camera depth maps (magma colormap) and RGB from the prepared
field, optionally from ``--novel-view`` offset poses
(reference ``vis_pics.py:56-63, 111, 208-245``).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def save_depth_map(depth, path, max_depth=None):
    """Magma-colormapped inverse-depth image (reference ``vis_pics.py:56-63``)."""
    import matplotlib
    import cv2
    disp = 1.0 / np.maximum(depth, 1e-3)
    if max_depth is not None:
        disp = np.clip(disp, 1.0 / max_depth, None)
    disp = (disp - disp.min()) / max(disp.max() - disp.min(), 1e-9)
    cmap = matplotlib.colormaps["magma"]
    rgb = (cmap(disp)[..., :3] * 255).astype(np.uint8)
    cv2.imwrite(path, rgb[..., ::-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--py-config", required=True)
    ap.add_argument("--work-dir", default="work_dirs/vis_pics")
    ap.add_argument("--ckpt-path", default="")
    ap.add_argument("--torch-ckpt", default="",
                    help="reference-SelfOcc .pth to import")
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--num-samples", type=int, default=1)
    ap.add_argument("--novel-view", type=float, nargs=4, default=None,
                    help="dx dy dz yaw_deg pose offset")
    ap.add_argument("--max-depth", type=float, default=80.0)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax.numpy as jnp
    from selfocc_tpu.geometry.projection import apply_novel_view
    from selfocc_tpu.utils.eval_lib import (ChunkedRenderer, camera_kwargs,
                                            eval_ray_grid,
                                            load_model_for_eval,
                                            eval_trans_mats,
                                            rays_for_cams,
                                            restore_eval_variables)
    from selfocc_tpu.utils.logging_util import get_logger

    cfg, model = load_model_for_eval(args.py_config, args.ckpt_path)
    logger = get_logger(args.work_dir)
    os.makedirs(args.work_dir, exist_ok=True)

    from train import get_dataloader
    ds = get_dataloader(cfg, args.synthetic, phase="val")
    from train import as_arrays
    sample = as_arrays(ds[0])
    variables = restore_eval_variables(model, cfg, sample, args.ckpt_path,
                                       args.seed,
                                       torch_ckpt=args.torch_ckpt)
    renderer = ChunkedRenderer(model, variables, chunk=args.batch,
                               outputs=("depth", "rgb"))
    rays = eval_ray_grid(cfg)
    rh, rw = cfg.eval_num_rays

    import cv2
    for i in range(min(args.num_samples, len(ds))):
        batch = as_arrays(ds[i])
        volume = renderer.prepare(batch["imgs"], batch["lidar2img"],
                                  **camera_kwargs(cfg, batch))
        i2l = eval_trans_mats(batch, cfg)
        if args.novel_view is not None:
            i2l = apply_novel_view(i2l, args.novel_view)
        origin, direction = rays_for_cams(i2l, rays)
        out = renderer.render(volume, origin, direction)
        depth = out["depth"].reshape(cfg.num_cams, rh, rw)
        rgb = out["rgb"].reshape(cfg.num_cams, rh, rw, -1)
        for c in range(cfg.num_cams):
            save_depth_map(depth[c],
                           f"{args.work_dir}/depth_{i:03d}_cam{c}.png",
                           args.max_depth)
            if rgb.shape[-1] == 3:
                img = np.clip(np.asarray(rgb[c]) * 256 * 255, 0, 255)
                cv2.imwrite(f"{args.work_dir}/rgb_{i:03d}_cam{c}.png",
                            img.astype(np.uint8)[..., ::-1])
        logger.info(f"[{i}] wrote {cfg.num_cams} depth/rgb maps")


if __name__ == "__main__":
    main()
