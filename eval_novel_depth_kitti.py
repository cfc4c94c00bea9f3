"""Novel-view depth synthesis evaluation on SemanticKITTI — TPU rewrite of
``eval_novel_depth_kitti.py`` (SURVEY §2.1): same flow as
``eval_novel_depth.py`` but monocular and with KITTI neighbor poses.
"""
from __future__ import annotations

import argparse
import math
from collections import defaultdict

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--py-config", default="kitti_novel_depth")
    ap.add_argument("--work-dir", default="work_dirs/eval_novel_depth_kitti")
    ap.add_argument("--ckpt-path", default="")
    ap.add_argument("--torch-ckpt", default="",
                    help="reference-SelfOcc .pth to import")
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--num-samples", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import jax.numpy as jnp
    from selfocc_tpu.ops.interp import bilinear_sample
    from selfocc_tpu.utils.eval_lib import (ChunkedRenderer, eval_ray_grid,
                                            load_model_for_eval,
                                            rays_for_cams,
                                            restore_eval_variables)
    from selfocc_tpu.utils.logging_util import get_logger
    from selfocc_tpu.utils.metrics import cal_depth_metric

    cfg, model = load_model_for_eval(args.py_config, args.ckpt_path)
    logger = get_logger(args.work_dir)

    from train import get_dataloader
    ds = get_dataloader(cfg, args.synthetic)
    sample = {k: jnp.asarray(v) for k, v in ds[0].items()}
    variables = restore_eval_variables(model, cfg, sample, args.ckpt_path,
                                       args.seed,
                                       torch_ckpt=args.torch_ckpt)
    renderer = ChunkedRenderer(model, variables, chunk=args.batch)
    rays = eval_ray_grid(cfg)
    rh, rw = cfg.eval_num_rays

    buckets = defaultdict(lambda: defaultdict(list))
    n = min(args.num_samples or len(ds), len(ds))
    offsets = [-2.0, -1.0, 1.0, 2.0]
    for i in range(n):
        batch = {k: jnp.asarray(v) for k, v in ds[i].items()}
        volume = renderer.prepare(batch["imgs"], batch["lidar2img"])
        if not hasattr(ds, "novel_view_sample"):
            # real KITTI: neighbors provided by the dataset as temImg2lidars
            continue
        for off in offsets:
            nb = ds.novel_view_sample(i, off)
            origin, direction = rays_for_cams(
                jnp.asarray(nb["temImg2lidar"]), rays)
            out = renderer.render(volume, origin, direction)
            depth = out["depth"].reshape(cfg.num_cams, rh, rw)
            loc = nb["depth_loc"]
            pix = np.stack([loc[..., 0] * (rw - 1), loc[..., 1] * (rh - 1)],
                           -1)
            bucket = math.ceil(nb["frame_dist"])
            for c in range(cfg.num_cams):
                m = nb["depth_mask"][c]
                if m.sum() == 0:
                    continue
                pred = np.asarray(bilinear_sample(
                    jnp.asarray(depth[c][..., None]), jnp.asarray(pix[c]),
                    "border"))[..., 0][m]
                md = cal_depth_metric(pred, nb["depth_gt"][c][m])
                for k, v in md.items():
                    buckets[bucket][k].append(v)
        logger.info(f"[{i + 1}/{n}] novel views rendered")

    logger.info(("{:>8} | " * 8).format(
        "dist", "abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"))
    for b in sorted(buckets):
        vals = [np.mean(buckets[b][k]) for k in
                ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")]
        logger.info((f"{b:>8} | " + "{: 8.3f} | " * 7).format(*vals))


if __name__ == "__main__":
    main()
