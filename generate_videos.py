"""Demo-video assembly — TPU rewrite of the reference ``generate_videos.py``:
tiles the per-camera renders produced by ``vis_pics.py`` (and optional 3D
projections from ``vis_3d.py --png``) into mp4 clips with cv2.
"""
from __future__ import annotations

import argparse
import glob
import os

import cv2
import numpy as np


def cat_images(frame_paths, cols=3):
    """Tile camera views into one canvas (reference ``generate_videos.py:6-50``)."""
    imgs = [cv2.imread(p) for p in frame_paths]
    imgs = [i for i in imgs if i is not None]
    if not imgs:
        return None
    h = min(i.shape[0] for i in imgs)
    w = min(i.shape[1] for i in imgs)
    imgs = [cv2.resize(i, (w, h)) for i in imgs]
    rows = -(-len(imgs) // cols)
    canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
    for k, img in enumerate(imgs):
        r, c = divmod(k, cols)
        canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = img
    return canvas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src-dir", required=True,
                    help="directory of vis_pics outputs")
    ap.add_argument("--out", default="demo.mp4")
    ap.add_argument("--pattern", default="depth_{idx:03d}_cam{cam}.png")
    ap.add_argument("--num-cams", type=int, default=6)
    ap.add_argument("--fps", type=int, default=10)
    args = ap.parse_args()

    idx = 0
    frames = []
    while True:
        paths = [os.path.join(args.src_dir,
                              args.pattern.format(idx=idx, cam=c))
                 for c in range(args.num_cams)]
        if not all(os.path.exists(p) for p in paths):
            break
        canvas = cat_images(paths)
        if canvas is None:
            break
        frames.append(canvas)
        idx += 1
    if not frames:
        print("no frames found")
        return
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"),
                         args.fps, (w, h))
    for f in frames:
        vw.write(f)
    vw.release()
    print(f"wrote {len(frames)} frames to {args.out}")


if __name__ == "__main__":
    main()
