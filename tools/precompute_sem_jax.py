"""Semantic-map precompute with the in-JAX teacher — runs ON the TPU host
(no external GPU/torch dependency, unlike ``precompute_openseed.py``).

Loads an HF Swin-UperNet checkpoint (``--teacher-ckpt``, ``.bin``/``.pt``/
``.safetensors``) through ``utils/swin_import.py`` and writes per-image
``<img_basename>.npy`` uint8 label maps consumed by
``selfocc_tpu.utils.openseed_utils.SemTeacher`` — the same artifact the
reference's online OpenSeeD teacher produces
(``utils/openseed_utils.py:55-62``).
"""
import argparse
import glob
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-glob", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--teacher-ckpt", required=True,
                    help="HF UperNet(Swin) checkpoint file")
    ap.add_argument("--batch", type=int, default=8,
                    help="images per device batch (same-size images only)")
    args = ap.parse_args()

    from selfocc_tpu.utils.openseed_utils import JaxSemTeacher
    teacher = JaxSemTeacher.from_checkpoint(args.teacher_ckpt)

    try:
        import cv2
        read = lambda p: cv2.imread(p)[..., ::-1].copy()
    except ImportError:
        from PIL import Image
        read = lambda p: np.asarray(Image.open(p).convert("RGB"))

    os.makedirs(args.out_dir, exist_ok=True)
    paths = sorted(glob.glob(args.img_glob))
    if not paths:
        raise SystemExit(f"no images match {args.img_glob!r}")
    batch, names = [], []

    def flush():
        if not batch:
            return
        maps = teacher(np.stack(batch))
        for name, m in zip(names, maps):
            np.save(os.path.join(args.out_dir, name + ".npy"), m)
            print(name)
        batch.clear()
        names.clear()

    shape = None
    for p in paths:
        img = read(p)
        if shape is not None and img.shape != shape:
            flush()
        shape = img.shape
        batch.append(img)
        names.append(os.path.basename(p))
        if len(batch) >= args.batch:
            flush()
    flush()


if __name__ == "__main__":
    main()
