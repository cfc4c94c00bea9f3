"""Bisect CPU compile time of the dryrun's tiny train graph.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/bisect_compile.py VARIANT
Variants toggle one graph feature each; prints trace/compile seconds.
No persistent cache — every run measures a true cold compile.
"""
import dataclasses
import os
import sys
import time

import numpy as np


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    import jax
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    from selfocc_tpu.utils.train_lib import init_train_state, make_loss_fn

    cfg, model = ge._flagship(tiny=True)
    if variant == "noremat":
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, encoder=dataclasses.replace(
                cfg.model.encoder, remat_layers=False)))
    elif variant == "noloss":
        cfg = dataclasses.replace(cfg, loss_cfgs=[
            dict(type="EikonalLoss", weight=0.1)])
    elif variant == "nobackbone":
        pass  # placeholder
    from selfocc_tpu.models.segmentor import TPVSegmentor
    model = TPVSegmentor(cfg=cfg.model)

    batch = ge._example_batch(cfg)
    rng = jax.random.PRNGKey(0)
    t0 = time.monotonic()
    state = init_train_state(model, cfg, rng, batch)
    t_init = time.monotonic() - t0

    compute = make_loss_fn(model, cfg)
    grad_fn = jax.jit(jax.grad(compute, has_aux=True))
    t0 = time.monotonic()
    lowered = grad_fn.lower(state.params, state.batch_stats, state.consts,
                            batch, rng, state.step)
    t_trace = time.monotonic() - t0
    t0 = time.monotonic()
    lowered.compile()
    t_compile = time.monotonic() - t0
    print(f"{variant}: init={t_init:.1f}s trace+lower={t_trace:.1f}s "
          f"compile={t_compile:.1f}s", flush=True)


if __name__ == "__main__":
    main()
