"""Split the occ-query frame time into device compute vs tunnel fetch.

bench.py's forward_occ entry (52 s query, round-5 battery) times
``GridOccEvaluator.query_grid`` which device_gets sdf + sem + the full
(512,512,40,C) logits grid (~900 MB fp32). This probe separates:
  compute_s  — the _occ jit with only a scalar forced fetch
  sdf_sem_s  — device_get of sdf + sem (what the OpenOcc eval path needs)
  logits_s   — device_get of the logits grid (Occ3D path, pre-fusion)

Usage: python tools/probe_occ_split.py [config=nuscenes_occ_compact_bundle]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "nuscenes_occ_compact_bundle"
    from selfocc_tpu.utils.jax_cache import enable as enable_jax_cache
    enable_jax_cache()
    from selfocc_tpu.configs.experiments import get_config
    from selfocc_tpu.data.synthetic import SyntheticDataset
    from selfocc_tpu.models.segmentor import TPVSegmentor
    from selfocc_tpu.utils.eval_lib import GridOccEvaluator, init_variables

    cfg = get_config(config)
    model = TPVSegmentor(cfg=cfg.model)
    ds = SyntheticDataset(num_cams=cfg.num_cams, input_size=cfg.input_size,
                          img_size=cfg.img_size)
    batch = {k: jnp.asarray(v) for k, v in ds[0].items()}
    variables = init_variables(model, cfg, batch)
    ev = GridOccEvaluator(model, variables, shard=False)

    pcr = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    resolution = 0.2

    vol = ev.prepare(batch["imgs"], batch["lidar2img"])
    _ = float(jnp.sum(vol[0, :2, :2, :2].astype(jnp.float32)))

    # rebuild the flat grid exactly as query_grid does
    xs = jnp.linspace(pcr[0], pcr[3], int((pcr[3] - pcr[0]) / resolution))
    ys = jnp.linspace(pcr[1], pcr[4], int((pcr[4] - pcr[1]) / resolution))
    zs = jnp.linspace(pcr[2], pcr[5], int((pcr[5] - pcr[2]) / resolution))
    H, W, D = ys.shape[0], xs.shape[0], zs.shape[0]
    xyz = jnp.stack(jnp.meshgrid(ys, xs, zs, indexing="ij"), axis=-1)
    flat = xyz[..., [1, 0, 2]].reshape(-1, 3)

    out = ev._occ(ev.variables, vol, flat)          # compile
    _ = float(out["sdf"][:4].sum())

    t0 = time.time()
    out = ev._occ(ev.variables, vol, flat)
    jax.block_until_ready(out)
    _ = float(out["sdf"][:4].sum())
    compute_s = time.time() - t0

    t0 = time.time()
    sdf = np.asarray(jax.device_get(out["sdf"]))
    sem = np.asarray(jax.device_get(out["sem"]))
    sdf_sem_s = time.time() - t0

    t0 = time.time()
    logits = np.asarray(jax.device_get(out["logits"]))
    logits_s = time.time() - t0

    print(json.dumps({
        "config": cfg.name,
        "grid": [int(H), int(W), int(D)],
        "compute_s": round(compute_s, 2),
        "sdf_sem_fetch_s": round(sdf_sem_s, 2),
        "logits_fetch_s": round(logits_s, 2),
        "logits_mb": round(logits.nbytes / 1e6, 1),
        "sdf_sem_mb": round((sdf.nbytes + sem.nbytes) / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
