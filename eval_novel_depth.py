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

    # real novel-view eval dataset (reference eval_novel_depth.py:133-229 over
    # nuScenes_One_Frame_Eval); synthetic novel_view_sample fallback
    real_ds = None
    if not args.synthetic:
        try:
            from selfocc_tpu.data import build_dataset
            real_ds = build_dataset(cfg, phase="novel_eval")
        except FileNotFoundError:
            real_ds = None
    from train import get_dataloader
    ds = real_ds if real_ds is not None else get_dataloader(cfg, True)

    if real_ds is not None:
        from selfocc_tpu.utils.eval_lib import prep_input_imgs
        input_imgs, _, metas0 = ds[0]
        sample = {"imgs": prep_input_imgs(input_imgs, cfg),
                  "lidar2img": jnp.asarray(metas0["lidar2img"],
                                           jnp.float32)[None],
                  cfg.model.head.trans_kw: jnp.asarray(
                      metas0["img2lidar"], jnp.float32)[None]}
    else:
        sample = {k: jnp.asarray(v) for k, v in ds[0].items()}
    variables = restore_eval_variables(model, cfg, sample, args.ckpt_path,
                                       args.seed,
                                       torch_ckpt=args.torch_ckpt)
    renderer = ChunkedRenderer(model, variables, chunk=args.batch,
                               outputs=("depth",))
    rays = eval_ray_grid(cfg)
    rh, rw = cfg.eval_num_rays

    buckets = defaultdict(lambda: defaultdict(list))
    n = args.num_samples or len(ds)
    n = min(n, len(ds))

    def score(depth, loc, gt_all, mask_all, bucket):
        pix = np.stack([loc[..., 0] * (rw - 1), loc[..., 1] * (rh - 1)], -1)
        for c in range(cfg.num_cams):
            m = np.asarray(mask_all[c]).astype(bool)
            if m.sum() == 0:
                continue
            pred = np.asarray(bilinear_sample(
                jnp.asarray(depth[c][..., None]), jnp.asarray(pix[c]),
                "border"))[..., 0][m]
            md = cal_depth_metric(pred, np.asarray(gt_all[c])[m])
            for k, v in md.items():
                buckets[bucket][k].append(v)

    for i in range(n):
        if real_ds is not None:
            input_imgs, _, metas = ds[i]
            imgs = prep_input_imgs(input_imgs, cfg)
            lidar2img = jnp.asarray(metas["lidar2img"], jnp.float32)[None]
            volume = renderer.prepare(imgs, lidar2img)
            # per temporal neighbor: render from its poses
            # (render_img2lidar = temImg2lidars[src], reference :169-171)
            for j, tem in enumerate(metas["temImg2lidars"]):
                origin, direction = rays_for_cams(
                    jnp.asarray(tem, jnp.float32)[None], rays)
                out = renderer.render(volume, origin, direction)
                depth = out["depth"].reshape(cfg.num_cams, rh, rw)
                score(depth, np.asarray(metas["depth_loc"][j]),
                      metas["depth_gt"][j], metas["depth_mask"][j],
                      math.ceil(metas["frame_dists"][j]))
            logger.info(f"[{i + 1}/{n}] rendered "
                        f"{len(metas['temImg2lidars'])} novel views")
            continue
        batch = {k: jnp.asarray(v) for k, v in ds[i].items()
                 if not isinstance(v, (str, dict))}
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
            score(depth, nb["depth_loc"], nb["depth_gt"], nb["depth_mask"],
                  math.ceil(nb["frame_dist"]))
        logger.info(f"[{i + 1}/{n}] rendered {len(args.offsets)} novel views")

    logger.info(("{:>8} | " * 8).format(
        "dist", "abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"))
    for b in sorted(buckets):
        vals = [np.mean(buckets[b][k]) for k in
                ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")]
        logger.info((f"{b:>8} | " + "{: 8.3f} | " * 7).format(*vals))


if __name__ == "__main__":
    main()
