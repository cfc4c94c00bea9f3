"""Microbench: XLA native gather vs the Pallas DMA row-gather
(ops/gather_rows.py) on render-shaped workloads.

The eval render fetches one bundled corner row per (ray, sample):
~100M rows/s via XLA on a v5e regardless of payload up to ~256 channels
(docs/PERFORMANCE.md) — ~5% of HBM speed-of-light for 400 B rows. This
prints one JSON line per (layout, rows/s) so we can tell whether an
explicit DMA pipeline moves that ceiling. Run on the real TPU
(tools/tpu_battery.sh includes it); CPU numbers are meaningless.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    """Axon-safe forced sync of a SMALL array. block_until_ready can return
    before execution completes under the axon tunnel, so force a host fetch —
    but only of a scalar: fetching the full gathered (rows, C) output would
    time the 100s-of-MB host transfer, not the gather."""
    import jax
    jax.block_until_ready(x)
    return float(np.asarray(x).reshape(-1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 21,
                    help="gathered rows per call (default 2M ~ one 8192-ray"
                         " x 256-sample chunk)")
    ap.add_argument("--table-rows", type=int, default=257 * 257 * 25,
                    help="table size (flagship voxel count)")
    ap.add_argument("--channels", type=int, default=200,
                    help="row payload (flagship bundled row: 8 corners x"
                         " 25 ch)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--inflight", type=int, default=16)
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--skip-pallas", action="store_true",
                    help="XLA baselines only (a Pallas remote-compile crash "
                         "wounds the axon tunnel for minutes — run XLA "
                         "timings in a clean process first)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from selfocc_tpu.ops.gather_rows import gather_rows

    rng = np.random.RandomState(0)
    table = jnp.asarray(
        rng.randn(args.table_rows, args.channels), args.dtype)
    idx = jnp.asarray(
        rng.randint(0, args.table_rows, size=(args.rows,)), jnp.int32)

    def timed(fn, *a, **kw):
        out = fn(*a, **kw)          # compile + warm
        fetch(out)
        ts = []
        for _ in range(args.repeat):
            t0 = time.time()
            fetch(fn(*a, **kw))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    # reduce INSIDE the jit so only a scalar crosses the tunnel; the sum
    # consumes every gathered row, so the gather cannot be DCE'd
    results = {}
    take = jax.jit(
        lambda t, i: jnp.take(t, i, axis=0).astype(jnp.float32).sum())
    results["xla_take_rows_per_sec_m"] = round(
        args.rows / timed(take, table, idx) / 1e6, 1)

    # channel-first column gather — the production ops/interp.py layout
    table_cf = jnp.asarray(np.asarray(table).T.copy())
    take_cf = jax.jit(
        lambda t, i: jnp.take(t, i, axis=1).astype(jnp.float32).sum())
    results["xla_take_cf_rows_per_sec_m"] = round(
        args.rows / timed(take_cf, table_cf, idx) / 1e6, 1)

    if args.skip_pallas:
        results.update(rows=args.rows, channels=args.channels,
                       dtype=args.dtype)
        print(json.dumps(results))
        return

    try:
        gather_sum = jax.jit(
            lambda t, i: gather_rows(
                t, i, block=args.block,
                inflight=args.inflight).astype(jnp.float32).sum())
        dt = timed(gather_sum, table, idx)
        results["pallas_dma_rows_per_sec_m"] = round(
            args.rows / dt / 1e6, 1)
    except Exception as e:            # remote compiler has crashed on some
        results["pallas_error"] = f"{type(e).__name__}: {e}"[:200]

    results.update(rows=args.rows, channels=args.channels,
                   dtype=args.dtype, block=args.block,
                   inflight=args.inflight)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
