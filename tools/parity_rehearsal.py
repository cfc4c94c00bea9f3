"""One-command north-star parity dress rehearsal (VERDICT r3 #8).

The day a real reference checkpoint + dataset are available, this runs the
whole released-checkpoint parity check in one go:

  1. import the reference ``.pth`` (``ref_import``), report unmatched keys;
  2. export it back (``ref_export``) and re-import — the round-trip gate
     (max |a - b| per collection must be ~0);
  3. run the eval_depth metric loop on N samples with the imported weights;
  4. run the eval_iou loop (``--occ3d`` for Occ3D labels);
  5. print one summary table to compare against the reference paper numbers
     (BASELINE.md: nuScenes Occ3D IoU 53.2 / abs_rel 0.215 north star).

Usage:
  python tools/parity_rehearsal.py --py-config nuscenes_occ \\
      --torch-ckpt /path/to/selfocc_released.pth [--occ3d --sem] \\
      [--num-samples 50] [--synthetic]

``--synthetic`` (or a config whose dataset roots are absent) exercises the
identical code path on procedural data — the smoke-tested mode
(tests/test_drivers.py::test_parity_rehearsal_smoke).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--py-config", required=True)
    ap.add_argument("--torch-ckpt", required=True,
                    help="reference-SelfOcc .pth to rehearse against")
    ap.add_argument("--work-dir", default="work_dirs/parity_rehearsal")
    ap.add_argument("--num-samples", type=int, default=10)
    ap.add_argument("--resolution", type=float, default=0.4)
    ap.add_argument("--thresh", type=float, default=0.0)
    ap.add_argument("--occ3d", action="store_true")
    ap.add_argument("--sem", action="store_true")
    ap.add_argument("--use-mask", action="store_true")
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--no-shard", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    return ap.parse_args(argv)


def _roundtrip_gate(variables, work_dir, logger):
    """export -> re-import -> max |diff| per imported leaf."""
    import jax
    import torch
    from selfocc_tpu.utils.ref_export import save_reference_pth
    from selfocc_tpu.utils.ref_import import (convert_reference_state_dict,
                                              merge_imported)
    path = os.path.join(work_dir, "reexport.pth")
    save_reference_pth(variables, path)
    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd)
    params, stats, unmatched = convert_reference_state_dict(sd)
    re_vars = merge_imported(variables, params, stats)
    err = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(re_vars["params"])):
        err = max(err, float(np.max(np.abs(np.asarray(a) - np.asarray(b)))))
    logger.info(f"round-trip: exported {len(sd)} tensors, "
                f"{len(unmatched)} unmatched on re-import, "
                f"max param |diff| {err:.3e}")
    return err


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.work_dir, exist_ok=True)
    from selfocc_tpu.utils.logging_util import get_logger
    logger = get_logger(args.work_dir)

    # ---- 1. import + round-trip gate (cheap, catches mapping drift first)
    import jax.numpy as jnp
    from selfocc_tpu.utils.eval_lib import (load_model_for_eval,
                                            restore_eval_variables)
    cfg, model = load_model_for_eval(args.py_config, "")
    from train import as_arrays, get_dataloader
    ds = get_dataloader(cfg, args.synthetic, phase="val")
    sample = as_arrays(ds[0])
    variables = restore_eval_variables(model, cfg, sample, "", args.seed,
                                       torch_ckpt=args.torch_ckpt)
    rt_err = _roundtrip_gate(variables, args.work_dir, logger)

    # ---- 2. depth eval (reference Table 1 / BASELINE.md abs_rel)
    logger.info("=== eval_depth ===")
    import eval_depth
    depth_argv = ["--py-config", args.py_config, "--work-dir", args.work_dir,
                  "--torch-ckpt", args.torch_ckpt, "--batch",
                  str(args.batch), "--num-samples", str(args.num_samples),
                  "--seed", str(args.seed)]
    if args.synthetic:
        depth_argv.append("--synthetic")
    if args.no_shard:
        depth_argv.append("--no-shard")
    old_argv = sys.argv
    try:
        sys.argv = ["eval_depth.py"] + depth_argv
        eval_depth.main()
    finally:
        sys.argv = old_argv

    # ---- 3. occupancy eval (reference Table 4 / BASELINE.md IoU)
    logger.info("=== eval_iou ===")
    import eval_iou
    iou_argv = ["--py-config", args.py_config, "--work-dir", args.work_dir,
                "--torch-ckpt", args.torch_ckpt,
                "--resolution", str(args.resolution),
                "--thresh", str(args.thresh),
                "--num-samples", str(args.num_samples),
                "--seed", str(args.seed)]
    for flag, on in (("--occ3d", args.occ3d), ("--sem", args.sem),
                     ("--use-mask", args.use_mask),
                     ("--synthetic", args.synthetic),
                     ("--no-shard", args.no_shard)):
        if on:
            iou_argv.append(flag)
    try:
        sys.argv = ["eval_iou.py"] + iou_argv
        eval_iou.main()
    finally:
        sys.argv = old_argv

    logger.info("=== parity rehearsal summary ===")
    logger.info(f"ckpt: {args.torch_ckpt}")
    logger.info(f"round-trip max param diff: {rt_err:.3e} (gate: < 1e-5)")
    logger.info("depth/IoU tables above; north star (BASELINE.md): "
                "Occ3D IoU within 0.5 of 53.2, abs_rel ~0.215 on the "
                "released nuscenes_occ checkpoint")
    if rt_err > 1e-5:
        raise SystemExit(f"round-trip gate FAILED: {rt_err:.3e}")


if __name__ == "__main__":
    main()
