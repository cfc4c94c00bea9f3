"""Profiling pass on the headline geo_only render (VERDICT r3 weak #7).

BENCH_r03 measured the 2.16M-ray surround depth render at 144M gather
rows/s with hbm_util 0.52 — the "row-rate-bound" claim leaves ~2x HBM
headroom unexplained. This script decomposes the render into ablations
that attribute the time, so the ceiling story is measured rather than
asserted:

Program ablations (same production rays, progressively smaller programs):
  full        the production geo_only render (bench.py headline)
  gather_grad positions -> meter2grid -> bundled corner gather + closed-form
              grad (drops the NeuS alpha/transmittance/depth chain)
  gather_raw  positions -> meter2grid -> the row gather alone (drops the
              lerp-weight math)
  index_only  positions -> meter2grid -> linear indices, summed (NO table
              read — the VPU index-math cost)

Data ablations (the SAME compiled full program, different ray streams):
  shuffled    rays randomly permuted across the whole frame — destroys the
              ray-major index coherence the production render enjoys
  samehit     every ray identical — all gather rows hit one cache line;
              an upper bound on everything-but-HBM-row-fetch

Reading the result: if full ~= gather_raw, the NeuS chain + weights math are
fully fused/free and there is no fixable stall — the row gather IS the
render. samehit/full then bounds how much of the remaining time is the
memory system fetching distinct rows (the real ceiling), and
full vs shuffled shows what production locality is already worth.

Run on the real TPU chip: `python tools/profile_render.py [--repeat 3]`.
Writes one JSON line; reference workload identical to bench.py's headline.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import cost_analysis, utilization  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--cams", type=int, default=6)
    ap.add_argument("--rays", type=int, nargs=2, default=[450, 800])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests; the "
                         "JAX_PLATFORMS env var is ignored under axon)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from selfocc_tpu.utils.jax_cache import enable as enable_jax_cache
    enable_jax_cache()
    import jax.numpy as jnp
    from selfocc_tpu.configs.experiments import get_config
    from selfocc_tpu.data.synthetic import SyntheticDataset
    from selfocc_tpu.geometry.mappings import make_mapping
    from selfocc_tpu.geometry.projection import rays_from_img2lidar
    from selfocc_tpu.geometry.ray_sampler import RaySampler
    from selfocc_tpu.models import neus
    from selfocc_tpu.models.heads import NeuSHead
    from selfocc_tpu.ops.interp import (bundle_corners_cf,
                                        trilinear_sample_cf_bundled_with_grad)
    from selfocc_tpu.utils.train_lib import jit_init_on_cpu

    cfg = get_config("nuscenes_occ")
    h = cfg.model.head
    head = NeuSHead(
        roi_aabb=tuple(h.roi_aabb), mapping_args=h.mapping_args,
        resolution=h.resolution, near_plane=h.near_plane,
        far_plane=h.far_plane, num_samples=h.num_samples,
        beta_init=h.beta_init, return_sem=h.return_sem,
        ray_sample_mode="fixed", ray_number=(4, 6),
        ray_img_size=tuple(cfg.img_size), render_bkgd="white",
        embed_dims=h.embed_dims, color_dims=h.color_dims,
        sem_dims=h.sem_dims, density_layers=h.density_layers,
        sh_deg=h.sh_deg, sh_act=h.sh_act, tpv=h.tpv, bundle_volume=True)

    rng = jax.random.PRNGKey(0)
    m = make_mapping(**h.mapping_args)
    H, W, D = m.size_h, m.size_w, m.size_d
    k1, k2, k3 = jax.random.split(rng, 3)
    rep = [jax.random.normal(k1, (1, H * W, h.embed_dims)) * 0.1,
           jax.random.normal(k2, (1, D * H, h.embed_dims)) * 0.1,
           jax.random.normal(k3, (1, W * D, h.embed_dims)) * 0.1]
    ds = SyntheticDataset(num_cams=args.cams, input_size=(64, 96),
                          img_size=tuple(cfg.img_size))
    img2lidar = jnp.asarray(ds[0]["img2lidar"])
    variables = jit_init_on_cpu(lambda: head.init(
        {"params": rng, "dropout": rng}, rep, img2lidar, rng, 0, True))
    volume = jax.jit(lambda: head.apply(variables, rep, method="prepare"))()
    if args.dtype != "float32":
        volume = volume.astype(args.dtype)

    sampler = RaySampler(ray_sample_mode="fixed",
                         ray_number=tuple(args.rays),
                         ray_img_size=tuple(cfg.img_size))
    rays = sampler()
    origin, direction = rays_from_img2lidar(img2lidar, rays)
    R = rays.shape[0]
    origin = jnp.broadcast_to(origin[0, :, None, :],
                              (args.cams, R, 3)).reshape(-1, 3)
    direction = direction[0].reshape(-1, 3)
    total_rays = origin.shape[0]
    pad = (-total_rays) % args.chunk
    origin = jnp.pad(origin, ((0, pad), (0, 0)))
    direction = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)

    def chunked(o, d):
        n = o.shape[0] // args.chunk
        return (o.reshape(n, args.chunk, 3), d.reshape(n, args.chunk, 3), n)

    # --- the three ray streams (data ablations share the full program) ----
    streams = {}
    streams["full"] = chunked(origin, direction)
    perm = jax.random.permutation(jax.random.PRNGKey(7), origin.shape[0])
    streams["shuffled"] = chunked(origin[perm], direction[perm])
    streams["samehit"] = chunked(
        jnp.broadcast_to(origin[:1], origin.shape),
        jnp.broadcast_to(direction[:1], direction.shape))

    # --- programs -----------------------------------------------------------
    def sample_positions(mod, o, d):
        # the production sampling preamble (heads.render_rays, deterministic)
        d = d.astype(jnp.float32)
        dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
        ud = d / dn
        near, far = neus.ray_aabb_near_far(
            o.astype(jnp.float32), ud, mod.roi_aabb,
            mod.near_plane, mod.far_plane)
        segs = neus.sample_uniform(near, far, mod.num_samples, None)
        return o[:, None, :] + ud[:, None, :] * segs.mids[..., None]

    def full_fn(v, vol, o, d):
        return head.apply(v, vol, o, d, train=False, geo_only=True,
                          method="render_rays")["depth"]

    def gather_grad_fn(v, vol, o, d):
        def body(mod, vol, o, d):
            pos = sample_positions(mod, o, d)
            qvol = vol[:1]
            geo, grad = mod.field.query_geo_grad_bundled(
                bundle_corners_cf(qvol), qvol.shape, pos)
            return jnp.sum(geo["sdf"]) + jnp.sum(grad)
        return head.apply(v, vol, o, d, method=body)

    def gather_raw_fn(v, vol, o, d):
        def body(mod, vol, o, d):
            pos = sample_positions(mod, o, d)
            qvol = vol[:1]
            bundle = bundle_corners_cf(qvol)
            grid = mod.field.mapping.meter2grid(pos.reshape(-1, 3))
            C, Hh, Ww, Dd = qvol.shape
            bh = jnp.clip(jnp.floor(grid[:, 0]).astype(jnp.int32), 0, Hh - 2)
            bw = jnp.clip(jnp.floor(grid[:, 1]).astype(jnp.int32), 0, Ww - 2)
            bd = jnp.clip(jnp.floor(grid[:, 2]).astype(jnp.int32), 0, Dd - 2)
            lin = (bh * (Ww - 1) + bw) * (Dd - 1) + bd
            g = jnp.take(bundle, lin, axis=1)              # (8C, N)
            return jnp.sum(g.astype(jnp.float32))
        return head.apply(v, vol, o, d, method=body)

    def index_only_fn(v, vol, o, d):
        def body(mod, vol, o, d):
            pos = sample_positions(mod, o, d)
            qvol = vol[:1]
            grid = mod.field.mapping.meter2grid(pos.reshape(-1, 3))
            C, Hh, Ww, Dd = qvol.shape
            bh = jnp.clip(jnp.floor(grid[:, 0]).astype(jnp.int32), 0, Hh - 2)
            bw = jnp.clip(jnp.floor(grid[:, 1]).astype(jnp.int32), 0, Ww - 2)
            bd = jnp.clip(jnp.floor(grid[:, 2]).astype(jnp.int32), 0, Dd - 2)
            lin = (bh * (Ww - 1) + bw) * (Dd - 1) + bd
            # touch one volume element so the arg isn't dead, but no gather
            return jnp.sum(lin) + vol[0, 0, 0, 0].astype(jnp.float32)
        return head.apply(v, vol, o, d, method=body)

    programs = {
        "full": full_fn,
        "gather_grad": gather_grad_fn,
        "gather_raw": gather_raw_fn,
        "index_only": index_only_fn,
    }

    def run(tag, fn, stream):
        o, d, n = stream
        jfn = jax.jit(fn)
        lowered = jfn.lower(variables, volume, o[0], d[0])
        ca = cost_analysis(lowered.compile())
        _ = np.asarray(jfn(variables, volume, o[0], d[0]))  # warm
        reps = []
        for _ in range(max(1, args.repeat)):
            t0 = time.time()
            outs = [jfn(variables, volume, o[i], d[i]) for i in range(n)]
            jax.block_until_ready(outs)
            _ = float(np.asarray(outs[-1]).reshape(-1)[0])  # forced fetch
            reps.append(time.time() - t0)
        dt = float(np.median(reps))
        rec = {"s": round(dt, 3),
               "rows_per_sec_m": round(
                   total_rays * head.num_samples / dt / 1e6, 1)}
        rec.update(utilization(ca, dt, n_exec=n))
        return rec

    out = {"metric": "render_profile", "total_rays": total_rays,
           "samples": head.num_samples, "dtype": args.dtype}
    for tag, fn in programs.items():
        out[tag] = run(tag, fn, streams["full"])
    for tag in ("shuffled", "samehit"):
        out[tag] = run(tag, full_fn, streams[tag])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
