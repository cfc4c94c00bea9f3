"""Ablation profile of the eval PREPARE (VERDICT r4 #6).

Round 4 cut the reference-exact frame's prepare 18.8 -> 7.9 s with the 2x2
MSDA corner bundle; this script names what dominates the remaining time by
timing nested pipeline prefixes (same compiled style as bench.py: jit with
params/inputs as arguments, forced fetch at the end):

  img_feat   backbone + neck                       (extract_img_feat)
  rep        + lifter + full TPV encoder           (get_representation)
  prepare    + field decode to the (C, H, W, D) volume  (prepare)

Differences attribute stage cost: encoder = rep - img_feat, decode =
prepare - rep. Run on the real chip:

    python tools/profile_prepare.py [CONFIG] [--repeat 3]

Defaults to the reference-exact ``nuscenes_occ_compact_bundle``. Writes one
JSON line; workload identical to ``bench.py --frame``'s prepare.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="nuscenes_occ_compact_bundle")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    import jax
    from selfocc_tpu.utils.jax_cache import enable as enable_jax_cache
    enable_jax_cache()
    import jax.numpy as jnp
    from selfocc_tpu.configs.experiments import get_config
    from selfocc_tpu.data.synthetic import SyntheticDataset
    from selfocc_tpu.models.segmentor import TPVSegmentor
    from selfocc_tpu.utils.eval_lib import init_variables

    cfg = get_config(args.config)
    model = TPVSegmentor(cfg=cfg.model)
    ds = SyntheticDataset(num_cams=cfg.num_cams, input_size=cfg.input_size,
                          img_size=cfg.img_size)
    batch = {k: jnp.asarray(v) for k, v in ds[0].items()}
    variables = init_variables(model, cfg, batch)
    eval_vars = {k: variables[k] for k in ("params", "batch_stats", "consts")
                 if k in variables}
    imgs, l2i = batch["imgs"], batch["lidar2img"]

    def fetch(x):
        # tunnel-safe: force a tiny device->host pull (block_until_ready can
        # return early under axon); reduce on device first
        leaves = jax.tree_util.tree_leaves(x)
        jax.block_until_ready(leaves)
        return float(jnp.sum(leaves[-1].astype(jnp.float32)))

    stages = {
        "img_feat": jax.jit(lambda v, i: model.apply(
            v, i, method="extract_img_feat")),
        "rep": jax.jit(lambda v, i, l: model.apply(
            v, i, l, method="get_representation")),
        "prepare": jax.jit(lambda v, i, l: model.apply(
            v, i, l, method="prepare")),
    }
    inputs = {
        "img_feat": (eval_vars, imgs),
        "rep": (eval_vars, imgs, l2i),
        "prepare": (eval_vars, imgs, l2i),
    }

    out = {"metric": "prepare_ablation", "config": cfg.name, "unit": "s"}
    for tag, fn in stages.items():
        fetch(fn(*inputs[tag]))                    # compile + warm
        ts = []
        for _ in range(max(1, args.repeat)):
            t0 = time.time()
            fetch(fn(*inputs[tag]))
            ts.append(time.time() - t0)
        out[tag + "_s"] = round(float(np.median(ts)), 2)
        out[tag + "_repeats"] = [round(t, 2) for t in ts]
    out["encoder_s"] = round(out["rep_s"] - out["img_feat_s"], 2)
    out["decode_s"] = round(out["prepare_s"] - out["rep_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
