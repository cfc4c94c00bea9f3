"""Offline OpenSeeD semantic-map precompute (run where torch+GPU+detectron2
are available; NOT on the TPU host).

Produces per-image ``<img_basename>.npy`` uint8 label maps consumed by
``selfocc_tpu.utils.openseed_utils.SemTeacher``. Mirrors the reference's
online teacher (``utils/openseed_utils.py:12-62``): OpenSeeD Swin-T with the
21-class nuScenes vocabulary, argmax semantic map per image.
"""
import argparse
import glob
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-glob", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--openseed-config", default="openseed_swint_lang.yaml")
    ap.add_argument("--openseed-ckpt", required=True)
    args = ap.parse_args()

    try:
        import torch
        from openseed import build_model
        from openseed.BaseModel import BaseModel
        from detectron2.data import MetadataCatalog
        from utils.arguments import load_opt_from_config_files
    except ImportError as e:
        raise SystemExit(
            "OpenSeeD + detectron2 required; run in the reference's conda "
            "env (docs/installation.md)") from e

    from selfocc_tpu.utils.openseed_utils import NUSCENES_CLASSES

    opt = load_opt_from_config_files([args.openseed_config])
    model = BaseModel(opt, build_model(opt)).from_pretrained(
        args.openseed_ckpt).eval().cuda()
    model.model.sem_seg_head.predictor.lang_encoder.get_text_embeddings(
        NUSCENES_CLASSES, is_eval=True)

    os.makedirs(args.out_dir, exist_ok=True)
    with torch.no_grad():
        for p in sorted(glob.glob(args.img_glob)):
            import cv2
            img = cv2.imread(p)[..., ::-1].copy()
            t = torch.from_numpy(img).permute(2, 0, 1).float().cuda()
            out = model.forward([{"image": t, "height": img.shape[0],
                                  "width": img.shape[1]}])
            sem = out[0]["sem_seg"].argmax(0).byte().cpu().numpy()
            np.save(os.path.join(args.out_dir,
                                 os.path.basename(p) + ".npy"), sem)
            print(p)


if __name__ == "__main__":
    main()
