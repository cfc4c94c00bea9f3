"""Quantify the eval-skip fast tier's depth deviation + speedup (VERDICT r4 #5).

Renders the SAME flagship frame (same prepared volume, same 2.16M-ray
surround grid) twice through ChunkedRenderer — once with the config's
eval_skip_* knobs (coarse sdf pass + inverse-CDF fine placement) and once
with the exact 256-uniform march — and reports depth-delta statistics plus
both render times. The deviation pinned analytically in
tests/test_eval_skip.py gets its flagship-scale number here.

    python tools/skip_delta.py [CONFIG]   # default nuscenes_occ_fast
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="nuscenes_occ_fast")
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--rays", type=int, nargs=2, default=[450, 800])
    args = ap.parse_args()

    import jax
    from selfocc_tpu.utils.jax_cache import enable as enable_jax_cache
    enable_jax_cache()
    import jax.numpy as jnp
    from selfocc_tpu.configs.experiments import get_config
    from selfocc_tpu.data.synthetic import SyntheticDataset
    from selfocc_tpu.models.segmentor import TPVSegmentor
    from selfocc_tpu.utils.eval_lib import (ChunkedRenderer, eval_ray_grid,
                                            init_variables, rays_for_cams)

    cfg = get_config(args.config)
    if cfg.model.head.eval_skip_coarse <= 0:
        # no shipped recipe carries the knobs anymore (measured dead end —
        # docs/PERFORMANCE.md); opt them in here so the measurement stays
        # reproducible
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, head=dataclasses.replace(
                cfg.model.head, eval_skip_coarse=64, eval_skip_fine=64)))
    model_skip = TPVSegmentor(cfg=cfg.model)
    exact_head = dataclasses.replace(cfg.model.head, eval_skip_coarse=0,
                                     eval_skip_fine=0)
    model_exact = TPVSegmentor(cfg=dataclasses.replace(cfg.model,
                                                       head=exact_head))

    ds = SyntheticDataset(num_cams=cfg.num_cams, input_size=cfg.input_size,
                          img_size=cfg.img_size)
    batch = {k: jnp.asarray(v) for k, v in ds[0].items()}
    variables = init_variables(model_skip, cfg, batch)

    r_skip = ChunkedRenderer(model_skip, variables, chunk=args.chunk,
                             shard=False, outputs=("depth",))
    r_exact = ChunkedRenderer(model_exact, variables, chunk=args.chunk,
                              shard=False, outputs=("depth",))
    vol = r_skip.prepare(batch["imgs"], batch["lidar2img"])
    jax.block_until_ready(vol)

    rays = eval_ray_grid(cfg, tuple(args.rays))
    origin, direction = rays_for_cams(batch["img2lidar"], rays)

    results = {}
    for tag, r in (("skip", r_skip), ("exact", r_exact)):
        d = r.render(vol, origin[:args.chunk], direction[:args.chunk])  # warm
        jax.block_until_ready(d["depth"])
        t0 = time.time()
        out = r.render(vol, origin, direction)
        depth = np.asarray(out["depth"])   # device_get forces completion
        _ = float(depth.reshape(-1)[0])
        results[tag] = (time.time() - t0, depth)

    t_skip, d_skip = results["skip"]
    t_exact, d_exact = results["exact"]
    delta = np.abs(d_skip - d_exact)
    rel = delta / np.maximum(d_exact, 1e-3)
    print(json.dumps({
        "metric": "eval_skip_depth_delta",
        "config": cfg.name,
        "rays": int(d_skip.size),
        "skip_render_s": round(t_skip, 2),
        "exact_render_s": round(t_exact, 2),
        "speedup": round(t_exact / t_skip, 2),
        "abs_delta_mean_m": round(float(delta.mean()), 4),
        "abs_delta_p95_m": round(float(np.percentile(delta, 95)), 4),
        "abs_delta_max_m": round(float(delta.max()), 4),
        "rel_delta_mean": round(float(rel.mean()), 5),
    }))


if __name__ == "__main__":
    main()
