"""Time the novel-view eval stack per-stage on the real chip (VERDICT r4 #7).

Mirrors eval_novel_depth.py's call pattern exactly (prepare once, then one
render per novel view) but with forced-fetch timing around each stage, so
the docs row can say prepare_s + s/view instead of a whole-driver wall time.

Usage: python tools/probe_novel_bundle.py [config=nuscenes_novel_depth_bundle]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "nuscenes_novel_depth_bundle"
    from selfocc_tpu.utils.jax_cache import enable as enable_jax_cache
    enable_jax_cache()
    from selfocc_tpu.configs.experiments import get_config
    from selfocc_tpu.data.synthetic import SyntheticDataset
    from selfocc_tpu.models.segmentor import TPVSegmentor
    from selfocc_tpu.utils.eval_lib import (ChunkedRenderer, eval_ray_grid,
                                            init_variables, rays_for_cams)

    cfg = get_config(config)
    model = TPVSegmentor(cfg=cfg.model)
    ds = SyntheticDataset(num_cams=cfg.num_cams, input_size=cfg.input_size,
                          img_size=cfg.img_size)
    batch = {k: jnp.asarray(v) for k, v in ds[0].items()
             if not isinstance(v, (str, dict))}
    variables = init_variables(model, cfg, batch)
    renderer = ChunkedRenderer(model, variables, chunk=32768,
                               outputs=("depth",))
    rays = eval_ray_grid(cfg)

    def fetch(x):
        return float(jnp.asarray(x).sum()) if hasattr(x, "sum") else x

    # warm both stages (compile)
    vol = renderer.prepare(batch["imgs"], batch["lidar2img"])
    fetch(vol[0, :2, :2, :2])
    origin, direction = rays_for_cams(batch["lidar2img"], rays)
    out = renderer.render(vol, origin, direction)
    fetch(out["depth"])

    t0 = time.time()
    vol = renderer.prepare(batch["imgs"], batch["lidar2img"])
    fetch(vol[0, :2, :2, :2])
    prep_s = time.time() - t0

    view_s = []
    for _ in range(4):   # the eval renders 4 novel offsets per sample
        t0 = time.time()
        out = renderer.render(vol, origin, direction)
        fetch(out["depth"])
        view_s.append(time.time() - t0)

    print(json.dumps({
        "config": cfg.name,
        "prepare_s": round(prep_s, 2),
        "view_s": [round(v, 2) for v in view_s],
        "view_s_median": round(sorted(view_s)[len(view_s) // 2], 2),
        "frame_4views_s": round(prep_s + sum(view_s), 2),
        "rays_per_view": int(cfg.num_cams * cfg.eval_num_rays[0]
                             * cfg.eval_num_rays[1]),
    }))


if __name__ == "__main__":
    main()
