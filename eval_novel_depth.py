"""Novel-view depth synthesis evaluation — TPU rewrite of the reference
``eval_novel_depth.py`` (SURVEY §3.4).

Per sample: decode the field once (``prepare``), then for each temporal
neighbor render depth from the neighbor's camera poses
(``render_img2lidar = temImg2lidars[source]``, reference
``eval_novel_depth.py:169-171``) and accumulate per-distance-bucket depth
errors (bucketed by ``ceil(source_distance)``). The shared loop lives in
``utils/eval_lib.run_novel_depth_eval`` (also used by the KITTI driver).
"""
from __future__ import annotations

import argparse


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
    ap.add_argument("--depth-tgt", default="raw", choices=["raw", "max"],
                    help="scored render: raw (expected depth) or max (the "
                         "argmax-weight render, reference "
                         "eval_novel_depth.py:174-177)")
    ap.add_argument("--seed", type=int, default=42)
    return ap.parse_args()


def main():
    args = parse_args()
    from selfocc_tpu.utils.eval_lib import (ChunkedRenderer,
                                            enable_max_depth,
                                            load_model_for_eval,
                                            novel_eval_first_sample,
                                            restore_eval_variables,
                                            run_novel_depth_eval)
    from selfocc_tpu.utils.logging_util import get_logger

    cfg, model = load_model_for_eval(args.py_config, args.ckpt_path)
    depth_key = "depth" if args.depth_tgt == "raw" else "max_depth"
    if args.depth_tgt == "max":
        cfg, model = enable_max_depth(cfg)
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

    sample = novel_eval_first_sample(ds, cfg, real_ds is not None)
    variables = restore_eval_variables(model, cfg, sample, args.ckpt_path,
                                       args.seed,
                                       torch_ckpt=args.torch_ckpt)
    renderer = ChunkedRenderer(model, variables, chunk=args.batch,
                               outputs=(depth_key,))
    run_novel_depth_eval(ds, real_ds is not None, cfg, renderer, logger,
                         num_samples=args.num_samples,
                         offsets=tuple(args.offsets),
                         depth_key=depth_key)


if __name__ == "__main__":
    main()
