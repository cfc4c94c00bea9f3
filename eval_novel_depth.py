"""Novel-view depth synthesis evaluation — TPU rewrite of the reference
``eval_novel_depth.py`` (SURVEY §3.4).

Per sample: decode the field once (``prepare``), then for each temporal
neighbor render depth from the neighbor's camera poses
(``render_img2lidar = temImg2lidars[source]``, reference
``eval_novel_depth.py:169-171``) and accumulate per-distance-bucket depth
errors (bucketed by ``ceil(source_distance)``).
"""
from __future__ import annotations

import argparse
import math
from collections import defaultdict

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--py-config", required=True)
    ap.add_argument("--work-dir", default="work_dirs/eval_novel_depth")
    ap.add_argument("--ckpt-path", default="")
    ap.add_argument("--torch-ckpt", default="",
                    help="reference-SelfOcc .pth to import")
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--num-samples", type=int, default=0)
    ap.add_argument("--offsets", type=float, nargs="*",
                    default=[-2.0, -1.0, 1.0, 2.0],
                    help="synthetic ego offsets standing in for neighbors")
    ap.add_argument("--seed", type=int, default=42)
    return ap.parse_args()


def main():
    args = parse_args()
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
    n = args.num_samples or len(ds)
    n = min(n, len(ds))
    for i in range(n):
        batch = {k: jnp.asarray(v) for k, v in ds[i].items()}
        volume = renderer.prepare(batch["imgs"], batch["lidar2img"])
        for off in args.offsets:
            if hasattr(ds, "novel_view_sample"):
                nb = ds.novel_view_sample(i, off)
            else:
                continue
            origin, direction = rays_for_cams(
                jnp.asarray(nb["temImg2lidar"]), rays)
            out = renderer.render(volume, origin, direction)
            depth = out["depth"].reshape(cfg.num_cams, rh, rw)
            loc = nb["depth_loc"]
            pix = np.stack([loc[..., 0] * (rw - 1), loc[..., 1] * (rh - 1)], -1)
            bucket = math.ceil(nb["frame_dist"])
            for c in range(cfg.num_cams):
                m = nb["depth_mask"][c]
                if m.sum() == 0:
                    continue
                pred = np.asarray(bilinear_sample(
                    jnp.asarray(depth[c][..., None]), jnp.asarray(pix[c]),
                    "border"))[..., 0][m]
                gt = nb["depth_gt"][c][m]
                md = cal_depth_metric(pred, gt)
                for k, v in md.items():
                    buckets[bucket][k].append(v)
        logger.info(f"[{i + 1}/{n}] rendered {len(args.offsets)} novel views")

    logger.info(("{:>8} | " * 8).format(
        "dist", "abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"))
    for b in sorted(buckets):
        vals = [np.mean(buckets[b][k]) for k in
                ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")]
        logger.info((f"{b:>8} | " + "{: 8.3f} | " * 7).format(*vals))


if __name__ == "__main__":
    main()
