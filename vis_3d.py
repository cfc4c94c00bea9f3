"""3D occupancy visualization — TPU rewrite of the reference ``vis_3d.py``.

The reference renders voxels with mayavi behind a virtual X display
(``vis_3d.py:1-12``); neither is in this image, so this driver exports the
thresholded occupancy voxels as (a) ``.npy`` grids, (b) colored point-cloud
``.ply`` files loadable in any viewer, and (c) optional matplotlib
top-down/side projections — same data, portable presentation.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

# nuScenes 17-class colormap (RGB), matching the reference's vis palette
NUSC_COLORS = np.array([
    [0, 0, 0], [112, 128, 144], [220, 20, 60], [255, 127, 80],
    [255, 158, 0], [233, 150, 70], [255, 61, 99], [0, 0, 230],
    [47, 79, 79], [255, 140, 0], [255, 99, 71], [0, 207, 191],
    [175, 0, 75], [75, 0, 75], [112, 180, 60], [222, 184, 135],
    [0, 175, 0]], dtype=np.uint8)


def write_ply(path, xyz, rgb):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(xyz)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p, c in zip(xyz, rgb):
            f.write(f"{p[0]:.3f} {p[1]:.3f} {p[2]:.3f} {c[0]} {c[1]} {c[2]}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--py-config", required=True)
    ap.add_argument("--work-dir", default="work_dirs/vis_3d")
    ap.add_argument("--ckpt-path", default="")
    ap.add_argument("--torch-ckpt", default="",
                    help="reference-SelfOcc .pth to import")
    ap.add_argument("--resolution", type=float, default=0.4)
    ap.add_argument("--thresh", type=float, default=0.0)
    ap.add_argument("--sem", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--num-samples", type=int, default=1)
    ap.add_argument("--png", action="store_true",
                    help="also write matplotlib projection images")
    ap.add_argument("--seed", type=int, default=42)
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

    from train import get_dataloader
    ds = get_dataloader(cfg, args.synthetic, phase="val")
    from train import as_arrays
    sample = as_arrays(ds[0])
    variables = restore_eval_variables(model, cfg, sample, args.ckpt_path,
                                       args.seed,
                                       torch_ckpt=args.torch_ckpt)
    aabb = list(cfg.model.head.roi_aabb)
    occ_fn = jax.jit(lambda v, i, l, **ck: model.apply(
        v, i, l, aabb=tuple(aabb), resolution=args.resolution,
        method="forward_occ", **ck))

    for i in range(min(args.num_samples, len(ds))):
        batch = as_arrays(ds[i])
        out = occ_fn(variables, batch["imgs"], batch["lidar2img"],
                     **camera_kwargs(cfg, batch))
        sdf = np.asarray(out["sdf"])
        xyz = np.asarray(out["xyz"])
        occ = sdf <= args.thresh
        np.save(f"{args.work_dir}/occ_{i:03d}.npy", occ)
        pts = xyz[occ]
        if args.sem and "sem" in out:
            sem = np.asarray(out["sem"])[occ]
            colors = NUSC_COLORS[np.clip(sem, 0, len(NUSC_COLORS) - 1)]
            np.save(f"{args.work_dir}/sem_{i:03d}.npy", np.asarray(out["sem"]))
        else:
            z = pts[:, 2]
            zn = (z - z.min()) / max(z.max() - z.min(), 1e-9) if len(z) else z
            colors = (np.stack([zn, 1 - zn, np.full_like(zn, 0.5)], -1)
                      * 255).astype(np.uint8)
        write_ply(f"{args.work_dir}/occ_{i:03d}.ply", pts, colors)
        if args.png:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, axes = plt.subplots(1, 2, figsize=(12, 6))
            axes[0].scatter(pts[:, 0], pts[:, 1], s=0.5,
                            c=colors / 255.0)
            axes[0].set_title("top-down")
            axes[1].scatter(pts[:, 0], pts[:, 2], s=0.5, c=colors / 255.0)
            axes[1].set_title("side")
            fig.savefig(f"{args.work_dir}/occ_{i:03d}.png", dpi=120)
            plt.close(fig)
        logger.info(f"[{i}] {occ.sum()} occupied voxels exported")


if __name__ == "__main__":
    main()
