"""Dissect GridOccEvaluator.query_grid latency: device compute vs host fetch.

bench.py's round-5 forward_occ entry measured query_s=52 s for the
512x512x40 grid (0.2M points/s) — far below the render's gather rate. The
two suspects are (a) the occ_from_volume computation itself and (b) the
device_get of the full output dict (sdf 42 MB + sem 42 MB + 21-class
logits 880 MB fp32) through the axon tunnel. This probe times each stage
separately on the exact bench_occ workload.

    python tools/probe_occ_query.py [config]          # default compact_bundle
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cfg_name = sys.argv[1] if len(sys.argv) > 1 else \
        "nuscenes_occ_compact_bundle"
    import jax
    import jax.numpy as jnp
    from selfocc_tpu.utils.jax_cache import enable as enable_jax_cache
    enable_jax_cache()
    from selfocc_tpu.configs.experiments import get_config
    from selfocc_tpu.data.synthetic import SyntheticDataset
    from selfocc_tpu.models.segmentor import TPVSegmentor
    from selfocc_tpu.utils.eval_lib import GridOccEvaluator, init_variables

    cfg = get_config(cfg_name)
    model = TPVSegmentor(cfg=cfg.model)
    ds = SyntheticDataset(num_cams=cfg.num_cams, input_size=cfg.input_size,
                          img_size=cfg.img_size)
    batch = {k: jnp.asarray(v) for k, v in ds[0].items()}
    variables = init_variables(model, cfg, batch)
    ev = GridOccEvaluator(model, variables, shard=False)

    pcr = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    vol = ev.prepare(batch["imgs"], batch["lidar2img"])
    jax.block_until_ready(vol)

    # rebuild the same flat grid query_grid uses
    xs = jnp.linspace(pcr[0], pcr[3], int((pcr[3] - pcr[0]) / 0.2))
    ys = jnp.linspace(pcr[1], pcr[4], int((pcr[4] - pcr[1]) / 0.2))
    zs = jnp.linspace(pcr[2], pcr[5], int((pcr[5] - pcr[2]) / 0.2))
    xyz = jnp.stack(jnp.meshgrid(ys, xs, zs, indexing="ij"), axis=-1)
    flat = xyz[..., [1, 0, 2]].reshape(-1, 3)
    n = flat.shape[0]
    print(f"points={n:,}")

    occ = ev._occ  # the exact jit query_grid calls

    # warm up (compile)
    out = occ(ev.variables, vol, flat)
    jax.block_until_ready(out)

    # (1) device compute only — forced by a scalar fetch per output
    t0 = time.time()
    out = occ(ev.variables, vol, flat)
    jax.block_until_ready(out)
    forced = {k: float(v.reshape(-1)[:1].astype(jnp.float32)[0])
              for k, v in out.items()}
    t_compute = time.time() - t0
    print(f"compute_s={t_compute:.2f}  (forced {forced})")

    # (2) per-output fetch cost
    for k, v in out.items():
        t0 = time.time()
        host = jax.device_get(v)
        dt = time.time() - t0
        mb = host.nbytes / 2**20
        print(f"fetch {k}: {mb:.0f} MB in {dt:.2f} s "
              f"({mb / max(dt, 1e-9):.0f} MB/s) dtype={host.dtype}")

    # (3) full query_grid as bench_occ times it
    t0 = time.time()
    _ = ev.query_grid(vol, pcr, 0.2)
    print(f"query_grid_s={time.time() - t0:.2f}")


if __name__ == "__main__":
    main()
