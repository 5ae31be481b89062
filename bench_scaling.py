#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE.md north star: >=85% rays/s/chip
retained at 1 chip -> 1 host -> N hosts).

Renders the flagship path-traced scene with the sample space sharded
over meshes of 1, 2, 4, ... N devices (fixed total work) and reports
rays/sec and per-device efficiency vs the 1-device run.

On real multi-chip hardware this measures ICI scaling; with
--cpu N it runs on N virtual CPU devices, which validates the sharding
machinery and collective layout but NOT real efficiency (the virtual
devices share the host's cores). The driver's single real chip gives the
1-chip baseline.

Prints one JSON line per mesh size.
"""
import argparse
import json
import math
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="use N virtual CPU devices instead of the "
                         "default backend")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=4)
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpuprt_jax_cache" +
                      ("_cpu" if args.cpu else ""))

    from __graft_entry__ import _flagship_scene
    from tpuprt import render as R
    from tpuprt.parallel import shard
    from tpuprt.samplers.samplers import SamplerConfig

    xres = yres = args.res
    scene = _flagship_scene(xres, yres)
    opts = R.RenderOptions(
        xres=xres, yres=yres,
        sampler=SamplerConfig(kind="lowdiscrepancy",
                              pixelsamples=args.spp),
        filter_kind="box", filter_xwidth=0.5, filter_ywidth=0.5,
        integrator="path", max_depth=args.depth,
        chunk_size=1 << 14)
    total_samples = xres * yres * args.spp
    # Path rays per camera sample: 1 camera + per-bounce (intersect +
    # shadow + BSDF) — use the integrator's own counter for honesty.
    ndev_all = len(jax.devices())

    base_rate = None
    sizes = [1 << i for i in range(int(math.log2(ndev_all)) + 1)]
    for n in sizes:
        mesh = shard.make_mesh(n)
        shard.render_sharded(scene, opts, mesh)           # compile warmup
        t0 = time.time()
        shard.render_sharded(scene, opts, mesh)
        dt = time.time() - t0
        rate = total_samples / dt
        per_dev = rate / n
        if base_rate is None:
            base_rate = per_dev
        eff = per_dev / base_rate
        print(json.dumps({
            "metric": "samples_per_sec", "devices": n,
            "value": round(rate, 1), "unit": "samples/s",
            "per_device": round(per_dev, 1),
            "efficiency_vs_1dev": round(eff, 4),
            "backend": jax.default_backend(),
            "virtual_cpu": bool(args.cpu)}), flush=True)


if __name__ == "__main__":
    main()
