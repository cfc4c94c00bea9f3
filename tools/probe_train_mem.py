"""One-step train-memory probe: does a recipe's fused train step fit?

Builds a named config (plus optional encoder-field overrides), runs ONE
training step on the default backend, and prints either the device memory
stats after the step or the XLA OOM headline ("Used X of Y hbm").  Used to
chase the reference-exact 16 GB v5e train fit (docs/PERFORMANCE.md):

    python tools/probe_train_mem.py nuscenes_occ_compact_train \
        --enc msda_bundle=pairs

On CPU (--cpu) it instead prints the compiled program's memory analysis
(argument/output/temp bytes) — no 16 GB ceiling, but the temp-size ladder
across recipes mirrors the TPU ranking and costs no tunnel round-trips.
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--enc", action="append", default=[],
                    help="encoder override key=value (value parsed as "
                         "python literal, falling back to str)")
    ap.add_argument("--head", action="append", default=[],
                    help="head override key=value")
    ap.add_argument("--model", action="append", default=[],
                    help="model-level override key=value (e.g. "
                         "remat_backbone=True)")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend and print memory_analysis()")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from selfocc_tpu.configs.experiments import get_config
    from selfocc_tpu.models.segmentor import TPVSegmentor
    from selfocc_tpu.utils.train_lib import (
        init_train_state, make_train_step)
    from selfocc_tpu.utils.jax_cache import enable as enable_jax_cache
    enable_jax_cache()

    def parse(kvs):
        out = {}
        for kv in kvs:
            k, v = kv.split("=", 1)
            try:
                import ast
                out[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                out[k] = v
        return out

    cfg = get_config(args.config)
    enc_over, head_over = parse(args.enc), parse(args.head)
    model_cfg = cfg.model
    model_over = parse(args.model)
    if model_over:
        model_cfg = dataclasses.replace(model_cfg, **model_over)
    if enc_over:
        model_cfg = dataclasses.replace(
            model_cfg, encoder=dataclasses.replace(model_cfg.encoder,
                                                   **enc_over))
    if head_over:
        model_cfg = dataclasses.replace(
            model_cfg, head=dataclasses.replace(model_cfg.head, **head_over))
    cfg = dataclasses.replace(cfg, model=model_cfg)
    model = TPVSegmentor(cfg=model_cfg)

    from selfocc_tpu.data.synthetic import SyntheticDataset
    ds = SyntheticDataset(num_cams=cfg.num_cams, input_size=cfg.input_size,
                          img_size=cfg.img_size,
                          num_classes=cfg.num_classes, length=2)
    batch = {k: jnp.asarray(v) for k, v in ds[0].items()}

    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, rng, batch)
    step = make_train_step(model, cfg)

    if args.cpu:
        lowered = step.lower(state, batch, rng)
        t0 = time.time()
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        print(f"compile_s={time.time() - t0:.1f}")
        print(f"temp_bytes={ma.temp_size_in_bytes:,} "
              f"({ma.temp_size_in_bytes / 2**30:.2f} GiB)  "
              f"arg_bytes={ma.argument_size_in_bytes:,}  "
              f"out_bytes={ma.output_size_in_bytes:,}  "
              f"gen_bytes={ma.generated_code_size_in_bytes:,}")
        return

    t0 = time.time()
    try:
        state, metrics = step(state, batch, rng)
        total = float(metrics["total"])
    except Exception as e:  # noqa: BLE001 — report the OOM headline and exit
        msg = str(e)
        with open("/tmp/probe_train_mem_last_error.txt", "w") as f:
            f.write(msg)
        for line in msg.splitlines():
            if ("Used" in line and "hbm" in line) or "Exceeded" in line:
                print("OOM:", line.strip())
                print("(full report: /tmp/probe_train_mem_last_error.txt)")
                sys.exit(2)
        print("FAILED:", msg[:2000])
        sys.exit(3)
    print(f"step ok: total={total:.4f}  first_step_s={time.time() - t0:.1f}")
    for d in jax.local_devices():
        stats = d.memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak is not None:
            print(f"peak_bytes_in_use={peak:,} ({peak / 2**30:.2f} GiB)")
    # steady-state timing: two more steps, forced fetch
    for _ in range(2):
        t1 = time.time()
        state, metrics = step(state, batch, rng)
        _ = float(metrics["total"])
        print(f"steady_step_s={time.time() - t1:.2f}")


if __name__ == "__main__":
    main()
